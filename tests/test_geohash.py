"""Geohash interop (functions.geohash_encode): known public vectors, a
pure-Python bisection reference (the spec algorithm, not our bit math),
and the pinned edge clamps."""

from ult_spark import functions as UF
from ult_spark.functions import GEOHASH32


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Canonical bisection algorithm from the public spec."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH32[ch])
            bit, ch = 0, 0
    return "".join(out)


COORDS = [
    (57.64911, 10.40744),   # the classic public example -> u4pruy...
    (0.0, 0.0), (-33.8688, 151.2093), (40.7128, -74.006),
    (-89.9, -179.9), (89.9, 179.9), (1e-9, -1e-9),
    (12.3456, -98.7654), (-45.0, 45.0),
]


def _spark_gh(spark, coords, p):
    df = spark.createDataFrame(coords, "lat double, lon double")
    return [r["gh"] for r in df.select(UF.geohash_encode("lat", "lon", p).alias("gh")).collect()]


def test_known_vector_and_reference_parity(spark):
    for p in (4, 6, 8):
        got = _spark_gh(spark, COORDS, p)
        want = [_ref_geohash(la, lo, p) for la, lo in COORDS]
        assert got == want, (p, got, want)
    assert _spark_gh(spark, [COORDS[0]], 6)[0] == "u4pruy"


def test_edge_clamps_to_max_cell(spark):
    # lat=90 / lon=180 pin to the max cell: all bits 1 -> 'z' * p
    assert _spark_gh(spark, [(90.0, 180.0)], 4)[0] == "zzzz"
    assert _spark_gh(spark, [(-90.0, -180.0)], 4)[0] == "0000"


def test_bridge_round_trip_equals_direct_cell(spark):
    df = spark.createDataFrame(COORDS, "lat double, lon double")
    for p in (4, 6):
        bits = 5 * p // 2
        out = df.select(
            UF.geohash_to_cell(UF.geohash_encode("lat", "lon", p), p).alias("via"),
            UF.latlon_to_cell("lat", "lon", bits).alias("direct"),
        ).collect()
        assert all(r["via"] == r["direct"] for r in out), (p, out)


def test_bridge_parses_external_strings(spark):
    # strings produced by the REFERENCE bisection, not our encoder
    rows = [(_ref_geohash(la, lo, 6), la, lo) for la, lo in COORDS]
    df = spark.createDataFrame(rows, "gh string, lat double, lon double")
    out = df.select(
        UF.geohash_to_cell("gh", 6).alias("via"),
        UF.latlon_to_cell("lat", "lon", 15).alias("direct"),
    ).collect()
    assert all(r["via"] == r["direct"] for r in out)
