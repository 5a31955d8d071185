"""Geo family — GeoDistance filter, distance sort, bbox, centroid, length.

Reference semantics: ESNodeITest.java:61-194 / ESWayITest.java:97-224
(GeoDistance filter + geo-distance sort) and ESShape.java:160-228
(centroid / length). Tests pin haversine against known city distances,
topk against a brute-force numpy twin, sharded == global parity for the
partial-top-k merge, and exact integer centroids.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayfts.geo import (
    EARTH_RADIUS_KM,
    geo_bounding_box_count,
    geo_centroid,
    geo_distance_filter,
    geo_distance_topk,
    haversine_km,
    path_length_km,
)

SF = (37.7749, -122.4194)
LA = (34.0522, -118.2437)
NYC = (40.7128, -74.0060)


def _points(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "pid": pa.array(np.arange(n, dtype=np.int64)),
            "lat": pa.array(rng.uniform(-90, 90, n)),
            "lon": pa.array(rng.uniform(-180, 180, n)),
        }
    )


def test_haversine_known_distances():
    d = haversine_km(
        np.array([LA[0], NYC[0]]), np.array([LA[1], NYC[1]]), *SF
    )
    assert d[0] == pytest.approx(559.12, abs=1.0)    # SF-LA
    assert d[1] == pytest.approx(4129.0, abs=10.0)   # SF-NYC
    # identity and antipode bounds
    assert haversine_km(np.array([SF[0]]), np.array([SF[1]]), *SF)[0] == 0.0
    assert float(
        haversine_km(np.array([-SF[0]]), np.array([SF[1] + 180.0]), *SF)[0]
    ) == pytest.approx(np.pi * EARTH_RADIUS_KM, rel=1e-9)


def test_filter_topk_match_brute_force(ray_session):
    t = _points()
    ds = rd.from_arrow(t).repartition(7)
    lat = t["lat"].to_numpy()
    lon = t["lon"].to_numpy()
    d = haversine_km(lat, lon, *SF)

    radius = 6000.0
    got = geo_distance_filter(ds, "lat", "lon", SF, radius).to_arrow_refs()
    import ray as _ray

    within = pa.concat_tables(_ray.get(got))
    assert sorted(within["pid"].to_pylist()) == \
        sorted(np.flatnonzero(d <= radius).tolist())
    assert within.column_names[-1] == "dist_km"

    k = 15
    top = geo_distance_topk(ds, "lat", "lon", SF, k=k, id_col="pid")
    order = np.lexsort((t["pid"].to_numpy(), d))[:k]
    assert top["pid"].to_pylist() == [int(i) for i in order]
    assert np.allclose(top["dist_km"].to_numpy(), d[order], rtol=0, atol=0)
    # radius composes with the sort
    top_r = geo_distance_topk(
        ds, "lat", "lon", SF, k=k, id_col="pid", radius_km=2000.0
    )
    want = [int(i) for i in order if d[i] <= 2000.0]
    assert top_r["pid"].to_pylist() == want[:k]


def test_topk_sharded_equals_global(ray_session):
    """Partial-top-k + driver merge over ANY partitioning equals the
    global answer — the multi-node parity claim."""
    t = _points(800, seed=11)
    k = 25
    want = geo_distance_topk(
        rd.from_arrow(t).repartition(1), "lat", "lon", SF, k=k, id_col="pid"
    )
    for parts in (3, 16):
        got = geo_distance_topk(
            rd.from_arrow(t).repartition(parts), "lat", "lon", SF,
            k=k, id_col="pid",
        )
        assert got.equals(want), parts


def test_bbox_and_centroid(ray_session):
    t = _points()
    ds = rd.from_arrow(t).repartition(5)
    lat = t["lat"].to_numpy()
    lon = t["lon"].to_numpy()
    inside = (
        (lat >= 10.0) & (lat <= 50.0) & (lon >= -40.0) & (lon <= 40.0)
    )
    n = geo_bounding_box_count(ds, "lat", "lon", (50.0, -40.0),
                               (10.0, 40.0))
    assert n == int(inside.sum())
    # integer micro-unit centroid is EXACT (block-order independent)
    ti = pa.table(
        {
            "lat_u": pa.array([100, 200, 400], pa.int64()),
            "lon_u": pa.array([-100, 0, 400], pa.int64()),
        }
    )
    clat, clon, cn = geo_centroid(rd.from_arrow(ti).repartition(3),
                                  "lat_u", "lon_u")
    assert (clat, clon, cn) == (700 / 3, 100.0, 3)
    # float path agrees with numpy means to float tolerance
    flat, flon, fn = geo_centroid(ds, "lat", "lon")
    assert fn == t.num_rows
    assert flat == pytest.approx(lat.mean(), rel=1e-12)
    assert flon == pytest.approx(lon.mean(), rel=1e-12)
    # empty input
    assert geo_centroid(
        rd.from_arrow(ti.slice(0, 0)), "lat_u", "lon_u"
    )[2] == 0


def test_path_length():
    # SF -> LA -> NYC: sum of the two legs
    lats = np.array([SF[0], LA[0], NYC[0]])
    lons = np.array([SF[1], LA[1], NYC[1]])
    leg1 = haversine_km(np.array([LA[0]]), np.array([LA[1]]), *SF)[0]
    leg2 = haversine_km(np.array([NYC[0]]), np.array([NYC[1]]), *LA)[0]
    assert path_length_km(lats, lons) == pytest.approx(
        leg1 + leg2, rel=1e-12
    )
    assert path_length_km(lats[:1], lons[:1]) == 0.0
    assert path_length_km(np.array([]), np.array([])) == 0.0


def _geo_corpus(n=60, seed=13):
    """Transcript-schema table + (lat, lon) doubles; every 7th doc has
    null coordinates."""
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    null = np.arange(n) % 7 == 3
    texts = [
        ("alpha beta" if i % 2 == 0 else "gamma delta") + f" tok{i}"
        for i in range(n)
    ]
    return pa.table(
        {
            "conv_id": pa.array([f"conv-{i:07d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user" if i % 2 else "tool" for i in range(n)]),
            "text": pa.array(texts),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([1_000_000 * i for i in range(n)],
                           pa.timestamp("us")),
            "lat": pa.array([None if m else float(v)
                             for v, m in zip(lat, null)], pa.float64()),
            "lon": pa.array([None if m else float(v)
                             for v, m in zip(lon, null)], pa.float64()),
        }
    ), lat, lon, null


def test_searcher_geo_distance_sort(ray_session, tmp_path):
    from rayfts.admin import exclude_docs
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.search import Searcher

    t, lat, lon, null = _geo_corpus()
    d = str(tmp_path / "gidx")
    build_index(rd.from_arrow(t),
                cfg=IndexJobConfig(index_dir=d, term_buckets=4))
    s = Searcher(d)
    dist = haversine_km(lat, lon, *SF)
    k = 12

    def brute(mask, radius=None):
        ok = mask & ~null
        idx = np.flatnonzero(ok)
        dd = dist[idx]
        if radius is not None:
            keep = dd <= radius
            idx, dd = idx[keep], dd[keep]
        order = np.lexsort((idx, dd))[:k]
        out = [(int(idx[i]), float(dd[i])) for i in order]
        if radius is None and len(out) < k:
            out += [(int(x), None)
                    for x in np.flatnonzero(mask & null)[: k - len(out)]]
        return out

    alln = np.ones(len(lat), dtype=bool)
    got = s.search_geo_distance("lat", "lon", SF, k=k)
    want = brute(alln)
    assert [(a, None if b is None else round(b, 9)) for a, b in got] == \
        [(a, None if b is None else round(b, 9)) for a, b in want]
    # query-restricted: only 'alpha' docs (even ids)
    qmask = np.arange(len(lat)) % 2 == 0
    got_q = s.search_geo_distance("lat", "lon", SF, k=k, query="alpha")
    assert [a for a, _ in got_q] == [a for a, _ in brute(qmask)]
    # radius filter: never fills with missing-coordinate docs
    got_r = s.search_geo_distance("lat", "lon", SF, k=50, radius_km=5000.0)
    assert got_r and all(b is not None and b <= 5000.0 for _, b in got_r)
    assert [a for a, _ in got_r] == [a for a, _ in brute(alln, 5000.0)][:50]
    # keyword filter + tombstone compose
    first_tool = next(i for i in range(len(lat))
                      if i % 2 == 0 and not null[i])
    exclude_docs(d, [int(first_tool)])
    s2 = Searcher(d)
    got_t = s2.search_geo_distance("lat", "lon", SF, k=k,
                                   where={"role": "tool"})
    tmask = (np.arange(len(lat)) % 2 == 0)
    tmask[first_tool] = False
    assert [a for a, _ in got_t] == [a for a, _ in brute(tmask)]


def test_sharded_geo_distance_equals_global(ray_session, tmp_path):
    import pyarrow.compute as pc

    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.search import MultiSearcher, Searcher

    t, *_ = _geo_corpus(80, seed=5)
    g = str(tmp_path / "g")
    build_index(rd.from_arrow(t),
                cfg=IndexJobConfig(index_dir=g, term_buckets=4))
    cut = "conv-0000040"
    dirs = []
    for name, tbl in [
        ("a", t.filter(pc.less(t["conv_id"], cut))),
        ("b", t.filter(pc.greater_equal(t["conv_id"], cut))),
    ]:
        dd = str(tmp_path / name)
        build_index(rd.from_arrow(tbl),
                    cfg=IndexJobConfig(index_dir=dd, term_buckets=4))
        dirs.append(dd)
    single = Searcher(g)
    multi = MultiSearcher(dirs)
    for kwargs in (
        {},
        {"query": "alpha"},
        {"radius_km": 4000.0},
        {"query": "gamma", "radius_km": 9000.0},
    ):
        a = single.search_geo_distance("lat", "lon", SF, k=15, **kwargs)
        b = multi.search_geo_distance("lat", "lon", SF, k=15, **kwargs)
        assert a == b, kwargs


# ---------------------------------------------------------------------------
# round-4 additions: geo_polygon / geo_bounds / distance rings /
# geohash_grid / planar ESShape math
# ---------------------------------------------------------------------------


def _half_plane_inside(lats, lons, poly):
    """Strict half-plane containment for a convex CCW polygon — the
    oracle-side predicate (__ray_entry__._poly_half_plane_pred)."""
    inside = np.ones(np.asarray(lats).shape, dtype=bool)
    n = len(poly)
    for i in range(n):
        (yi, xi), (yj, xj) = poly[i], poly[(i + 1) % n]
        inside &= ((xj - xi) * (lats - yi) - (yj - yi) * (lons - xi)) > 0
    return inside


def test_raycast_equals_halfplane():
    """The general ray-casting filter and the convex half-plane oracle
    agree on every centidegree data-grid point near GEO_POLY — the
    agreement the fts_geo_polygon_count oracle depends on."""
    from rayfts.geo import point_in_polygon
    from rayfts.pipelines import GEO_POLY

    # the exact value sets _events_geo can produce, meshed dense around
    # the polygon's bbox (plus margin)
    lat_vals = np.arange(0, 18000, dtype=np.int64) / 100.0 - 90.0
    lon_vals = np.arange(0, 36000, dtype=np.int64) / 100.0 - 180.0
    lat_vals = lat_vals[(lat_vals >= -25.0) & (lat_vals <= 35.0)]
    lon_vals = lon_vals[(lon_vals >= -45.0) & (lon_vals <= 45.0)]
    # mesh in chunks to bound memory (~6000 x 9000 grid)
    for chunk in np.array_split(lat_vals, 12):
        glat, glon = np.meshgrid(chunk, lon_vals, indexing="ij")
        glat, glon = glat.ravel(), glon.ravel()
        rc = point_in_polygon(glat, glon, GEO_POLY)
        hp = _half_plane_inside(glat, glon, GEO_POLY)
        assert np.array_equal(rc, hp)


def test_raycast_nonconvex_and_boundary():
    """Ray casting is general: a concave 'arrow' polygon classifies the
    notch correctly, and the half-open edge rule keeps left/bottom
    boundary inclusion consistent (no double counting on shared edges)."""
    from rayfts.geo import point_in_polygon

    arrow = [(0.0, 0.0), (4.0, 2.0), (0.0, 4.0), (1.5, 2.0)]  # (lat, lon)
    lats = np.array([1.0, 2.0, 0.5, 2.0, 3.5])
    lons = np.array([2.0, 1.2, 2.0, 2.5, 2.0])
    got = point_in_polygon(lats, lons, arrow)
    #       notch(out) in  notch(out) in   near-tip(in)
    assert got.tolist() == [False, True, False, True, True]
    # two rectangles sharing an edge: every point claimed exactly once
    left = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    right = [(0.0, 1.0), (0.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    pts_lat = np.array([0.5, 0.5, 0.5])
    pts_lon = np.array([0.5, 1.0, 1.5])  # middle point ON shared edge
    a = point_in_polygon(pts_lat, pts_lon, left)
    b = point_in_polygon(pts_lat, pts_lon, right)
    assert np.array_equal(a ^ b, np.array([True, True, True]))


def test_geohash_public_vectors():
    """Public geohash test vectors (the canonical examples from the
    original geohash.org description): ezs42 and u4pruydqqvj."""
    from rayfts.geo import geohash_encode

    got5 = geohash_encode(np.array([42.605]), np.array([-5.603]), 5)
    assert got5.tolist() == ["ezs42"]
    got11 = geohash_encode(
        np.array([57.64911]), np.array([10.40744]), 11
    )
    assert got11.tolist() == ["u4pruydqqvj"]


def test_geohash_decode_bins_roundtrip():
    from rayfts.geo import _geohash_bins, geohash_decode_bins, geohash_encode

    rng = np.random.default_rng(11)
    lats = rng.uniform(-90, 90, 200)
    lons = rng.uniform(-180, 180, 200)
    for prec in (1, 2, 5, 7):
        h = geohash_encode(lats, lons, prec)
        lon_bin, lat_bin, _, _ = _geohash_bins(lats, lons, prec)
        dec = np.array([geohash_decode_bins(s) for s in h])
        assert np.array_equal(dec[:, 0], lon_bin)
        assert np.array_equal(dec[:, 1], lat_bin)


def test_geohash_string_order_is_morton_order():
    """Sorting by geohash string == sorting by the interleaved-bit
    integer (base32 alphabet is monotonic) — the tie-order equivalence
    the fts_geohash_grid oracle's ORDER BY relies on."""
    from rayfts.geo import _geohash_bins, geohash_encode

    rng = np.random.default_rng(13)
    lats = rng.uniform(-90, 90, 500)
    lons = rng.uniform(-180, 180, 500)
    h = geohash_encode(lats, lons, 2)
    lon_bin, lat_bin, lon_bits, lat_bits = _geohash_bins(lats, lons, 2)
    morton = np.zeros(len(h), dtype=np.int64)
    for j in range(lon_bits):
        morton += ((lon_bin >> j) & 1) << (2 * j + 1)
    for j in range(lat_bits):
        morton += ((lat_bin >> j) & 1) << (2 * j)
    order_str = np.argsort(h, kind="stable")
    order_int = np.argsort(morton, kind="stable")
    assert np.array_equal(h[order_str], h[order_int])


def test_geo_polygon_bounds_rings_grid_vs_brute(ray_session):
    """Dataset-level geo aggregations match a numpy brute force on
    random points."""
    from rayfts.geo import (
        geo_bounds,
        geo_distance_range_counts,
        geo_polygon_count,
        geohash_encode,
        geohash_grid,
        haversine_km,
        point_in_polygon,
    )

    t = _points(800, seed=21)
    ds = rd.from_arrow(t).repartition(5)
    lats = t["lat"].to_numpy()
    lons = t["lon"].to_numpy()

    poly = [(10.0, -40.0), (-20.0, -20.0), (-15.0, 25.0), (15.0, 40.0),
            (30.0, 5.0)]
    assert geo_polygon_count(ds, "lat", "lon", poly) == int(
        point_in_polygon(lats, lons, poly).sum()
    )

    top, left, bottom, right, n = geo_bounds(ds, "lat", "lon")
    assert (top, left, bottom, right, n) == (
        lats.max(), lons.min(), lats.min(), lons.max(), len(lats)
    )

    edges = [1000.0, 3000.0, 8000.0]
    rows = geo_distance_range_counts(ds, "lat", "lon", SF, edges)
    d = haversine_km(lats, lons, *SF)
    expect = np.bincount(np.searchsorted(edges, d, side="right"),
                         minlength=4)
    assert [c for _, c in rows] == expect.tolist()
    assert [k for k, _ in rows] == [
        "*-1000.0", "1000.0-3000.0", "3000.0-8000.0", "8000.0-*"
    ]

    cells = geohash_grid(ds, "lat", "lon", precision=2, top_n=10)
    h = geohash_encode(lats, lons, 2)
    uniq, cnt = np.unique(h, return_counts=True)
    brute = sorted(zip(uniq.tolist(), cnt.tolist()),
                   key=lambda kv: (-kv[1], kv[0]))[:10]
    assert cells == brute


def test_planar_shape_math():
    """ESShape.build() planar parity (ESShape.java:160-228): unit
    square ring -> area DEG_TO_KM^2, perimeter 4*DEG_TO_KM, centroid at
    the center; degeneracy chain polygon->line->point."""
    from rayfts.geo import (
        DEG_TO_KM,
        planar_centroid,
        planar_length_km,
        shape_type,
        shoelace_area_km2,
    )

    sq_lat = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    sq_lon = np.array([10.0, 11.0, 11.0, 10.0, 10.0])
    assert shape_type(sq_lat, sq_lon) == "POLYGON"
    assert shoelace_area_km2(sq_lat, sq_lon) == pytest.approx(
        DEG_TO_KM * DEG_TO_KM
    )
    assert planar_length_km(sq_lat, sq_lon) == pytest.approx(4 * DEG_TO_KM)
    clat, clon = planar_centroid(sq_lat, sq_lon)
    assert (clat, clon) == (pytest.approx(0.5), pytest.approx(10.5))

    # open L-line: length-weighted midpoint centroid
    l_lat = np.array([0.0, 0.0, 2.0])
    l_lon = np.array([0.0, 2.0, 2.0])
    assert shape_type(l_lat, l_lon) == "LINESTRING"
    assert shoelace_area_km2(l_lat, l_lon) == 0.0
    clat, clon = planar_centroid(l_lat, l_lon)
    assert (clat, clon) == (pytest.approx(0.5), pytest.approx(1.5))

    # zero-area ring falls back to the line centroid
    z_lat = np.array([0.0, 0.0, 0.0])
    z_lon = np.array([0.0, 2.0, 0.0])
    clat, clon = planar_centroid(z_lat, z_lon)
    assert (clat, clon) == (pytest.approx(0.0), pytest.approx(1.0))

    # single point
    assert shape_type(np.array([3.0]), np.array([4.0])) == "POINT"
    assert planar_centroid(np.array([3.0]), np.array([4.0])) == (3.0, 4.0)
    with pytest.raises(ValueError):
        shape_type(np.array([]), np.array([]))


def test_geotile_public_vectors():
    """Slippy-map tile vectors: London at zoom 10 is tile 10/511/340
    (OSM wiki example); zoom 0 is the single world tile; the mercator
    lat clamp maps pole-adjacent points to the edge tile rows."""
    from rayfts.geo import geotile_bins

    x, y = geotile_bins(np.array([51.5074]), np.array([-0.1278]), 10)
    assert (x[0], y[0]) == (511, 340)
    x, y = geotile_bins(np.array([51.5074]), np.array([-0.1278]), 0)
    assert (x[0], y[0]) == (0, 0)
    x, y = geotile_bins(np.array([89.99, -89.99]), np.array([0.0, 0.0]), 7)
    assert y[0] == 0 and y[1] == 127
    # x edges
    x, y = geotile_bins(np.array([0.0, 0.0]), np.array([-180.0, 179.99]), 7)
    assert x[0] == 0 and x[1] == 127


def test_envelope_relation_classes():
    from rayfts.geo import envelope_relation

    env = (10.0, 20.0, 30.0, 40.0)  # (qymin, qxmin, qymax, qxmax)
    ymin = np.array([35.0, 12.0, 5.0, 5.0, 10.0, 30.0])
    xmin = np.array([50.0, 22.0, 15.0, 25.0, 20.0, 40.0])
    ymax = np.array([45.0, 28.0, 35.0, 25.0, 30.0, 50.0])
    xmax = np.array([60.0, 38.0, 45.0, 35.0, 40.0, 60.0])
    got = envelope_relation(ymin, xmin, ymax, xmax, env).tolist()
    #     disjoint  within  contains  overlap-partial  equal  edge-touch
    assert got == ["DISJOINT", "WITHIN", "CONTAINS", "INTERSECTS",
                   "WITHIN", "INTERSECTS"]


def test_geotile_grid_vs_brute(ray_session):
    from rayfts.geo import geotile_bins, geotile_grid

    t = _points(800, seed=33)
    ds = rd.from_arrow(t).repartition(5)
    lats = t["lat"].to_numpy()
    lons = t["lon"].to_numpy()
    got = geotile_grid(ds, "lat", "lon", zoom=4, top_n=10)
    x, y = geotile_bins(lats, lons, 4)
    key = x * 16 + y
    uniq, cnt = np.unique(key, return_counts=True)
    brute = sorted(zip(uniq.tolist(), cnt.tolist()),
                   key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(k // 16, k % 16, c) for k, c in brute]
