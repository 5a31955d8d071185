"""Geo-distance query family — the reference's actual query payload.

Reference: the plugin maps every OSM entity with geo_point / geo_shape
fields (``src/main/resources/plugin.properties:10-11``) and its
integration tests query with GeoDistance filters and geo-distance sort
(``src/test/java/.../model/entity/ESNodeITest.java:61-194``,
``ESWayITest.java:97-224``); shape math (centroid / length / area) lives
in ``src/main/java/.../model/shape/ESShape.java:160-228``. The
transcript graft has no geometry column, so this module exposes the
same query semantics over ANY (lat, lon) DOUBLE column pair:

* great-circle (haversine) distance — the geo_distance filter,
* distance-ascending sort with an id tiebreak — geo-distance sort,
* bounding-box containment — geo_bounding_box,
* geo_centroid / path length — the ESShape centroid/length analogs.

Scale notes (100 TB): distance is a pure per-row kernel, so every stage
here is a streaming vectorized ``map_batches`` over Arrow batches — NO
shuffle, ever. Top-k uses per-block partial top-k plus a tiny driver
merge of (num_blocks x k) candidate rows (never a global sort
exchange); centroid/length move one partial row per block. The driver
never sees more than O(blocks * k) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# IUGG mean earth radius, km — pinned: the SQL oracle must use the same
# constant and the same operation ORDER as haversine_km for bit-equal
# distances (both sides call the platform libm).
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat: np.ndarray, lon: np.ndarray, origin_lat: float, origin_lon: float
) -> np.ndarray:
    """Vectorized great-circle distance (km) from each (lat, lon) degree
    pair to the origin. Operation order is part of the spec (the DuckDB
    oracle mirrors it term for term):

        a = sin(dphi/2)^2 + cos(phi0) * cos(phi) * sin(dlmb/2)^2
        d = 2 * R * asin(sqrt(min(a, 1)))
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    sp = np.sin(np.radians(lat - origin_lat) / 2.0)
    sl = np.sin(np.radians(lon - origin_lon) / 2.0)
    a = sp * sp + (
        np.cos(np.radians(origin_lat)) * np.cos(np.radians(lat)) * (sl * sl)
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def _np(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False)


def _with_dist(
    batch: pa.Table, lat_col: str, lon_col: str,
    origin: tuple[float, float], dist_col: str = "dist_km",
) -> pa.Table:
    d = haversine_km(_np(batch[lat_col]), _np(batch[lon_col]), *origin)
    return batch.append_column(dist_col, pa.array(d, pa.float64()))


def geo_distance_filter(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    origin: tuple[float, float], radius_km: float,
) -> rd.Dataset:
    """GeoDistance filter analog (ESNodeITest.java:138-165): keep rows
    whose haversine distance to ``origin`` is <= ``radius_km``; a
    ``dist_km`` column is appended (ES returns the sort distance the
    same way). Pure streaming map_batches — composes with any
    downstream stage."""

    def f(batch: pa.Table) -> pa.Table:
        t = _with_dist(batch, lat_col, lon_col, origin)
        return t.filter(pc.less_equal(t["dist_km"], radius_km))

    return ds.map_batches(f, batch_format="pyarrow")


def geo_distance_topk(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    origin: tuple[float, float], k: int, id_col: str,
    radius_km: float | None = None,
    after: tuple | None = None,
) -> pa.Table:
    """Geo-distance sort analog (ESNodeITest.java:167-194): the k rows
    nearest to ``origin``, ordered (dist_km asc, id asc) — the id
    tiebreak mirrors the engine-wide doc_id tiebreak. Optional
    ``radius_km`` composes the GeoDistance filter in the same pass.

    Per-block partial top-k inside map_batches, then one driver merge
    over the <= blocks*k candidates — no global sort shuffle for k
    rows (same shape as pipelines.events_top20_by_value).

    ``after`` is the ES search_after cursor on THIS sort: a
    (dist_km, id) pair — only rows strictly after it in (dist asc,
    id asc) qualify. The cursor distance is a previous page's own
    haversine output, so float equality on the tie leg is sound (the
    same-arithmetic argument _after_keep makes for scores)."""
    if k <= 0:
        return pa.table({})
    keys = [("dist_km", "ascending"), (id_col, "ascending")]

    def local_topk(batch: pa.Table) -> pa.Table:
        t = _with_dist(batch, lat_col, lon_col, origin)
        if radius_km is not None:
            t = t.filter(pc.less_equal(t["dist_km"], radius_km))
        if after is not None:
            ad, aid = float(after[0]), after[1]
            t = t.filter(pc.or_(
                pc.greater(t["dist_km"], ad),
                pc.and_(pc.equal(t["dist_km"], ad),
                        pc.greater(t[id_col], aid)),
            ))
        return t.take(pc.sort_indices(t, sort_keys=keys).slice(0, k))

    cands = [
        t for t in ray.get(
            ds.map_batches(local_topk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not cands:
        sch = ds.schema().base_schema
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in sch}
        )
        return empty.append_column("dist_km", pa.array([], pa.float64()))
    merged = pa.concat_tables(cands)
    return merged.take(pc.sort_indices(merged, sort_keys=keys).slice(0, k))


def geo_bounding_box_count(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    top_left: tuple[float, float], bottom_right: tuple[float, float],
) -> int:
    """geo_bounding_box filter analog, consumed as a count: rows with
    bottom_right.lat <= lat <= top_left.lat and
    top_left.lon <= lon <= bottom_right.lon (the ES corner convention;
    boxes crossing the antimeridian are out of scope — documented).
    One streaming pass; the driver sees one int per block."""
    t_lat, l_lon = top_left
    b_lat, r_lon = bottom_right

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch[lat_col], b_lat),
                pc.less_equal(batch[lat_col], t_lat),
            ),
            pc.and_(
                pc.greater_equal(batch[lon_col], l_lon),
                pc.less_equal(batch[lon_col], r_lon),
            ),
        )
        n = pc.sum(pc.cast(m, pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    part = ds.map_batches(f, batch_format="pyarrow")
    return sum(r["n"] for r in part.take_all())  # O(blocks) rows


def geo_centroid(
    ds: rd.Dataset, lat_col: str, lon_col: str,
) -> tuple[float, float, int]:
    """geo_centroid aggregation analog (ESShape.getCentroid,
    ESShape.java:160-185 computes the arithmetic mean of the point set;
    ES's geo_centroid agg does the same): (mean lat, mean lon, n).

    Exactness: when the columns are INTEGER micro-units the per-block
    sums and the driver total are exact (int64), so the final division
    is deterministic regardless of block order; float columns are
    summed per block in float64 (ulp-level block-order sensitivity,
    same caveat ES documents for its own agg)."""

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = batch[lat_col], batch[lon_col]
        if pa.types.is_integer(lat.type):
            slat = pc.sum(pc.cast(lat, pa.int64())).as_py() or 0
            slon = pc.sum(pc.cast(lon, pa.int64())).as_py() or 0
            return pa.table({
                "slat_i": pa.array([slat], pa.int64()),
                "slon_i": pa.array([slon], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64()),
            })
        return pa.table({
            "slat_f": pa.array([pc.sum(lat).as_py() or 0.0], pa.float64()),
            "slon_f": pa.array([pc.sum(lon).as_py() or 0.0], pa.float64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if not n:
        return (float("nan"), float("nan"), 0)
    if rows and "slat_i" in rows[0]:
        return (
            sum(r["slat_i"] for r in rows) / n,
            sum(r["slon_i"] for r in rows) / n,
            n,
        )
    return (
        float(sum(r["slat_f"] for r in rows)) / n,
        float(sum(r["slon_f"] for r in rows)) / n,
        n,
    )


def path_length_km(lats: np.ndarray, lons: np.ndarray) -> float:
    """ESShape length analog (ESShape.java:187-205: sum of consecutive
    vertex distances along a way's point list) — haversine over the
    consecutive pairs of ONE geometry. Per-geometry kernel; callers
    apply it inside map_batches over a list<point> column."""
    lats = np.asarray(lats, dtype=np.float64)
    if lats.size < 2:
        return 0.0
    lons = np.asarray(lons, dtype=np.float64)
    # haversine_km is origin-based; segments need the pairwise form:
    sp = np.sin(np.radians(np.diff(lats)) / 2.0)
    sl = np.sin(np.radians(np.diff(lons)) / 2.0)
    a = sp * sp + (
        np.cos(np.radians(lats[:-1])) * np.cos(np.radians(lats[1:]))
        * (sl * sl)
    )
    d = 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
    return float(d.sum())


# ---------------------------------------------------------------------------
# ESShape parity: planar (degree-space) geometry, the reference's actual
# math. ESShape.build() (ESShape.java:160-228) computes JTS *planar*
# geometry over (lon, lat) degree coordinates and converts afterwards:
# length = JTS getLength() [Euclidean degrees] * degrees2Dist(1, R), and
# area = JTS getArea() [degrees^2] * degrees2Dist(1, R)^2 (its
# degree2ToKm2 takes sqrt, converts, squares — algebraically the same).
# DEG_TO_KM mirrors spatial4j DistanceUtils.degrees2Dist(1,
# EARTH_MEAN_RADIUS_KM); we pin the module-wide EARTH_RADIUS_KM
# (6371.0088 vs spatial4j's 6371.0087714 — 4th-decimal divergence,
# documented) so the SQL oracles share one constant.
# ---------------------------------------------------------------------------

DEG_TO_KM = np.pi / 180.0 * EARTH_RADIUS_KM

POINT, LINESTRING, POLYGON = "POINT", "LINESTRING", "POLYGON"


def shape_type(lats: np.ndarray, lons: np.ndarray) -> str:
    """ESShapeType classification (ESShape.java:176-187): one vertex =
    POINT, open vertex list = LINESTRING, first == last = POLYGON.
    Raises on an empty list like the reference builder."""
    n = len(lats)
    if n == 0:
        raise ValueError("shape has no vertices")  # ESShape.java:178-179
    if n == 1:
        return POINT
    if lats[0] == lats[-1] and lons[0] == lons[-1]:
        return POLYGON
    return LINESTRING


def planar_length_km(lats: np.ndarray, lons: np.ndarray) -> float:
    """JTS getLength() semantics (ESShape.java:163 path): sum of
    EUCLIDEAN degree-space segment lengths, converted once to km.
    (path_length_km above is the haversine variant this engine prefers
    for real distance sorts; this one is the reference-exact planar
    analog.) For a POLYGON vertex list the closure edge must already be
    present (first == last), matching JTS LinearRing input."""
    lats = np.asarray(lats, dtype=np.float64)
    if lats.size < 2:
        return 0.0
    lons = np.asarray(lons, dtype=np.float64)
    seg = np.hypot(np.diff(lons), np.diff(lats))
    return float(seg.sum() * DEG_TO_KM)


def shoelace_area_km2(lats: np.ndarray, lons: np.ndarray) -> float:
    """JTS getArea() semantics (ESShape.java:162 + degree2ToKm2,
    ESShape.java:219-224): planar shoelace over the closed (lon, lat)
    degree ring, |.|/2, converted deg^2 -> km^2. Non-polygons (open or
    degenerate vertex lists) have zero area, as JTS returns for
    Point/LineString geometries."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    if lats.size < 4 or lats[0] != lats[-1] or lons[0] != lons[-1]:
        return 0.0  # not a closed ring (JTS needs >= 4 incl. closure)
    x, y = lons, lats
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    return float(abs(cross.sum()) / 2.0 * DEG_TO_KM * DEG_TO_KM)


def planar_centroid(lats: np.ndarray, lons: np.ndarray) -> tuple[float, float]:
    """JTS getCentroid() semantics (ESShape.java:164-165): area-weighted
    centroid for polygons, length-weighted segment-midpoint centroid for
    linestrings, arithmetic mean for points — with JTS's degeneracy
    chain (zero-area polygon falls back to the line centroid, zero-
    length line to the point mean). Returns (lat, lon)."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    st = shape_type(lats, lons)
    x, y = lons, lats
    if st == POLYGON:
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a2 = cross.sum()  # 2 * signed area
        if a2 != 0.0:
            cx = ((x[:-1] + x[1:]) * cross).sum() / (3.0 * a2)
            cy = ((y[:-1] + y[1:]) * cross).sum() / (3.0 * a2)
            return (float(cy), float(cx))
        # degenerate ring -> JTS line-centroid fallback
    if st != POINT:
        seg = np.hypot(np.diff(x), np.diff(y))
        total = seg.sum()
        if total > 0.0:
            mx = (x[:-1] + x[1:]) / 2.0
            my = (y[:-1] + y[1:]) / 2.0
            return (float((my * seg).sum() / total),
                    float((mx * seg).sum() / total))
        # zero-length line -> point-mean fallback
    return (float(y.mean()), float(x.mean()))


def point_in_polygon(
    lats: np.ndarray, lons: np.ndarray,
    poly: list[tuple[float, float]],
) -> np.ndarray:
    """Vectorized even-odd ray casting (ES geo_polygon query semantics):
    True where (lat, lon) lies strictly inside the polygon given as
    [(lat, lon), ...] vertices (closure implicit). Boundary points
    follow the half-open edge rule (y_i <= y < y_j), the standard
    crossing-count convention; contract queries pick polygons whose
    edges avoid the data grid so the oracle's half-plane test agrees
    exactly (pinned by test)."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    py = np.array([p[0] for p in poly], dtype=np.float64)
    px = np.array([p[1] for p in poly], dtype=np.float64)
    inside = np.zeros(lats.shape, dtype=bool)
    n = px.size
    for i in range(n):  # O(vertices) iterations, each fully vectorized
        j = (i - 1) % n
        cond = (py[i] <= lats) != (py[j] <= lats)
        # horizontal edges have cond == False everywhere; keep the
        # division warning-free with a dummy denominator there
        dy = py[j] - py[i]
        xi = px[i] + (lats - py[i]) / (dy if dy != 0.0 else 1.0) * (px[j] - px[i])
        inside ^= cond & (lons < np.where(cond, xi, np.inf))
    return inside


def geo_polygon_count(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    poly: list[tuple[float, float]],
) -> int:
    """geo_polygon filter consumed as a count: one streaming vectorized
    pass, one int per block to the driver."""

    def f(batch: pa.Table) -> pa.Table:
        m = point_in_polygon(_np(batch[lat_col]), _np(batch[lon_col]), poly)
        return pa.table({"n": pa.array([int(m.sum())], pa.int64())})

    return sum(r["n"] for r in ds.map_batches(f, batch_format="pyarrow").take_all())


def geo_bounds(
    ds: rd.Dataset, lat_col: str, lon_col: str,
) -> tuple[float, float, float, float, int]:
    """ES geo_bounds aggregation: the tight bounding box of the point
    set as (top_lat, left_lon, bottom_lat, right_lon, n). Per-block
    min/max partials, O(blocks) driver merge. Antimeridian-wrapping
    boxes are out of scope (same note as geo_bounding_box_count)."""

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = batch[lat_col], batch[lon_col]
        return pa.table({
            "top": pa.array([pc.max(lat).as_py()], pa.float64()),
            "bottom": pa.array([pc.min(lat).as_py()], pa.float64()),
            "left": pa.array([pc.min(lon).as_py()], pa.float64()),
            "right": pa.array([pc.max(lon).as_py()], pa.float64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    rows = [r for r in ds.map_batches(partial, batch_format="pyarrow").take_all()
            if r["n"]]
    if not rows:
        nan = float("nan")
        return (nan, nan, nan, nan, 0)
    return (
        max(r["top"] for r in rows), min(r["left"] for r in rows),
        min(r["bottom"] for r in rows), max(r["right"] for r in rows),
        sum(r["n"] for r in rows),
    )


def geo_distance_range_counts(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    origin: tuple[float, float], edges_km: list[float],
) -> list[tuple[str, int]]:
    """ES geo_distance aggregation: doc counts per distance ring around
    ``origin``; ``edges_km`` are the interior bucket boundaries, buckets
    are [from, to) with open first/last ends, keyed "from-to" like the
    range agg (search._range_agg_key convention). Per-block bincount
    partials -> O(blocks * buckets) driver rows, no shuffle."""
    from .search import _range_agg_key

    e = np.asarray(edges_km, dtype=np.float64)
    nb = e.size + 1

    def partial(batch: pa.Table) -> pa.Table:
        d = haversine_km(_np(batch[lat_col]), _np(batch[lon_col]), *origin)
        idx = np.searchsorted(e, d, side="right")
        counts = np.bincount(idx, minlength=nb)
        return pa.table({
            "b": pa.array(np.arange(nb, dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    totals = np.zeros(nb, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        totals[r["b"]] += r["n"]
    bounds = [None, *[float(v) for v in e], None]
    return [
        (_range_agg_key(bounds[i], bounds[i + 1]), int(totals[i]))
        for i in range(nb)
    ]


# ---------------------------------------------------------------------------
# geohash_grid aggregation (ES geo_point bucketing). Standard geohash:
# interleave lon/lat bits MSB-first starting with lon, base32 alphabet
# "0123456789bcdefghjkmnpqrstuvwxyz"; precision p = 5p bits total,
# ceil(5p/2) lon bits + floor(5p/2) lat bits. Encoding is fully
# vectorized (uint64 bit ops); pinned by the public test vectors
# (ezs42, u4pruydqqvj) in tests.
# ---------------------------------------------------------------------------

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bins(
    lats: np.ndarray, lons: np.ndarray, precision: int
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(lon_bin, lat_bin, lon_bits, lat_bits) for the given precision:
    the integer cell coordinates the geohash string encodes."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon_bin = np.floor((np.asarray(lons, np.float64) + 180.0) / 360.0
                       * (1 << lon_bits)).astype(np.int64)
    lat_bin = np.floor((np.asarray(lats, np.float64) + 90.0) / 180.0
                       * (1 << lat_bits)).astype(np.int64)
    np.clip(lon_bin, 0, (1 << lon_bits) - 1, out=lon_bin)  # lon=180 edge
    np.clip(lat_bin, 0, (1 << lat_bits) - 1, out=lat_bin)
    return lon_bin, lat_bin, lon_bits, lat_bits


def geohash_encode(
    lats: np.ndarray, lons: np.ndarray, precision: int = 5
) -> np.ndarray:
    """Vectorized geohash strings at ``precision`` chars for each
    (lat, lon) degree pair."""
    lon_bin, lat_bin, lon_bits, lat_bits = _geohash_bins(lats, lons, precision)
    # interleave MSB-first: even global bit positions (0-indexed from the
    # top) take lon bits, odd take lat bits
    total = np.zeros(lon_bin.shape, dtype=np.uint64)
    lon_u = lon_bin.astype(np.uint64)
    lat_u = lat_bin.astype(np.uint64)
    bits = 5 * precision
    for pos in range(bits):
        if pos % 2 == 0:  # lon bit
            src = (lon_u >> np.uint64(lon_bits - 1 - pos // 2)) & np.uint64(1)
        else:  # lat bit
            src = (lat_u >> np.uint64(lat_bits - 1 - pos // 2)) & np.uint64(1)
        total |= src << np.uint64(bits - 1 - pos)
    chars = np.empty((len(total), precision), dtype="U1")
    lut = np.array(list(_GEOHASH32))
    for c in range(precision):
        idx = (total >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = lut[idx.astype(np.int64)]
    out = np.empty(len(total), dtype=f"U{precision}")
    for i in range(precision):  # join per char column (precision <= 12)
        out = np.char.add(out, chars[:, i]) if i else chars[:, 0].astype(f"U{precision}")
    return out


def geohash_decode_bins(h: str) -> tuple[int, int]:
    """Inverse of the bin interleave: geohash string -> (lon_bin,
    lat_bin) integer cell coordinates at the string's precision."""
    total = 0
    for ch in h:
        total = (total << 5) | _GEOHASH32.index(ch)
    bits = 5 * len(h)
    lon_bin = lat_bin = 0
    for pos in range(bits):
        bit = (total >> (bits - 1 - pos)) & 1
        if pos % 2 == 0:
            lon_bin = (lon_bin << 1) | bit
        else:
            lat_bin = (lat_bin << 1) | bit
    return lon_bin, lat_bin


def geohash_grid(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    precision: int = 5, top_n: int = 10,
) -> list[tuple[str, int]]:
    """ES geohash_grid aggregation: top ``top_n`` cells by doc count at
    ``precision``, ordered (count desc, geohash asc — deterministic tie
    order; ES leaves ties unspecified). Map-side combine: each block
    emits its distinct (cell, count) partials — bounded by 32^precision
    per block — then one tiny driver merge; no row-level shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        h = geohash_encode(
            _np(batch[lat_col]), _np(batch[lon_col]), precision
        )
        cells, counts = np.unique(h, return_counts=True)
        return pa.table({
            "cell": pa.array(cells.tolist(), pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    acc: dict[str, int] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc[r["cell"]] = acc.get(r["cell"], 0) + r["n"]
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]


# ---------------------------------------------------------------------------
# geotile_grid aggregation (ES geo_point bucketing on web-mercator
# "zoom/x/y" slippy-map tiles). x is linear in lon; y is the mercator
# projection with the standard +-85.0511287798066 latitude clamp
# (atan(sinh(pi)) — the square-world bound). Bins are plain ints so the
# SQL oracle reproduces them with the same double expression; tile
# boundaries are transcendental in lat, so no finite data grid point
# lies exactly on one.
# ---------------------------------------------------------------------------

MERCATOR_LAT_MAX = 85.0511287798066


def geotile_bins(
    lats: np.ndarray, lons: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """(tile_x, tile_y) slippy-map tile coordinates at ``zoom`` for each
    (lat, lon) degree pair. Math order is pinned (radians -> tan + sec
    -> log -> /pi) and mirrored term-for-term by the SQL oracle."""
    n = 1 << zoom
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    lat_c = np.clip(lats, -MERCATOR_LAT_MAX, MERCATOR_LAT_MAX)
    x = np.floor((lons + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat_c)
    merc = np.log(np.tan(rad) + 1.0 / np.cos(rad))
    y = np.floor((1.0 - merc / np.pi) / 2.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)  # lon == 180 edge
    np.clip(y, 0, n - 1, out=y)  # clamp rounding at the poles
    return x, y


def geotile_grid(
    ds: rd.Dataset, lat_col: str, lon_col: str,
    zoom: int = 7, top_n: int = 10,
) -> list[tuple[int, int, int]]:
    """ES geotile_grid aggregation: top ``top_n`` tiles by doc count at
    ``zoom``, as (tile_x, tile_y, count) ordered count desc then (x, y)
    asc (deterministic tie order; ES leaves ties unspecified). Same
    map-side-combine shape as geohash_grid: per-block distinct-cell
    partials (bounded by 4^zoom per block), tiny driver merge."""

    def partial(batch: pa.Table) -> pa.Table:
        x, y = geotile_bins(_np(batch[lat_col]), _np(batch[lon_col]), zoom)
        key = x * (np.int64(1) << np.int64(zoom)) + y
        cells, counts = np.unique(key, return_counts=True)
        return pa.table({
            "cell": pa.array(cells),
            "n": pa.array(counts.astype(np.int64)),
        })

    acc: dict[int, int] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc[r["cell"]] = acc.get(r["cell"], 0) + r["n"]
    n = 1 << zoom
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    return [(int(c) // n, int(c) % n, int(cnt)) for c, cnt in ranked]


# ---------------------------------------------------------------------------
# geo_shape envelope relations (the reference's GeoShape post-filter:
# ESNodeITest.java:61-130 / ESWayITest.java:97-160 filter ways/nodes by
# a square shape, default ES ShapeRelation INTERSECTS). Envelope
# algebra over (ymin, xmin, ymax, xmax) boxes; callers bring exact
# integer coordinates so the SQL oracle is pure comparisons.
# ---------------------------------------------------------------------------

DISJOINT, INTERSECTS, WITHIN, CONTAINS = (
    "DISJOINT", "INTERSECTS", "WITHIN", "CONTAINS",
)


def envelope_relation(
    ymin: np.ndarray, xmin: np.ndarray, ymax: np.ndarray, xmax: np.ndarray,
    query_env: tuple[float, float, float, float],
) -> np.ndarray:
    """Vectorized box-vs-box relation classification against a query
    envelope (qymin, qxmin, qymax, qxmax). Mutually exclusive classes,
    checked in ES precedence order: DISJOINT (no overlap, boundary
    touch counts as overlap like ES INTERSECTS), WITHIN (way box inside
    the query box, boundary-inclusive), CONTAINS (way box covers the
    query box), else INTERSECTS (partial overlap)."""
    qymin, qxmin, qymax, qxmax = query_env
    disjoint = (xmax < qxmin) | (xmin > qxmax) | (ymax < qymin) | (ymin > qymax)
    within = (xmin >= qxmin) & (xmax <= qxmax) & (ymin >= qymin) & (ymax <= qymax)
    contains = (xmin <= qxmin) & (xmax >= qxmax) & (ymin <= qymin) & (ymax >= qymax)
    out = np.full(ymin.shape, INTERSECTS, dtype=object)
    out[contains] = CONTAINS
    out[within] = WITHIN  # a box equal to the query env counts as WITHIN
    out[disjoint] = DISJOINT
    return out
