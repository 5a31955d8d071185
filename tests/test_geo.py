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
