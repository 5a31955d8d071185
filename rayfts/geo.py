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
) -> pa.Table:
    """Geo-distance sort analog (ESNodeITest.java:167-194): the k rows
    nearest to ``origin``, ordered (dist_km asc, id asc) — the id
    tiebreak mirrors the engine-wide doc_id tiebreak. Optional
    ``radius_km`` composes the GeoDistance filter in the same pass.

    Per-block partial top-k inside map_batches, then one driver merge
    over the <= blocks*k candidates — no global sort shuffle for k
    rows (same shape as pipelines.events_top20_by_value)."""
    if k <= 0:
        return pa.table({})
    keys = [("dist_km", "ascending"), (id_col, "ascending")]

    def local_topk(batch: pa.Table) -> pa.Table:
        t = _with_dist(batch, lat_col, lon_col, origin)
        if radius_km is not None:
            t = t.filter(pc.less_equal(t["dist_km"], radius_km))
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
