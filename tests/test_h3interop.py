"""H3 structural interop (grid/h3interop.py): bit layout pinned against
the H3 library documentation's own example cells, validity rules,
hex roundtrip, child-range contiguity, and the mixed-resolution
ancestor join vs a brute BETWEEN reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ult_spark.grid import h3interop as H

SF9 = "8928308280fffff"  # docs: latLngToCell(37.775..., -122.418..., 9)
BAY5 = "85283473fffffff"  # docs: the res-5 "getting started" cell
BAY5_KIDS6 = [  # docs: cellToChildren(BAY5, 6)
    "862834707ffffff", "86283470fffffff", "862834717ffffff",
    "86283471fffffff", "862834727ffffff", "86283472fffffff",
    "862834737ffffff",
]


def _df(spark, hexes):
    return spark.createDataFrame(pd.DataFrame({"hex": hexes})).withColumn(
        "h", H.h3_from_hex("hex")
    )


def test_documented_example_cells(spark):
    d = _df(spark, [SF9, BAY5]).select(
        "hex",
        H.h3_resolution("h").alias("res"),
        H.h3_base_cell("h").alias("bc"),
        H.h3_is_valid("h").alias("ok"),
        H.h3_to_hex("h").alias("back"),
        H.h3_to_hex(H.h3_parent("h", 8)).alias("p8"),
    )
    rows = {r.hex: r for r in d.collect()}
    assert rows[SF9].res == 9 and rows[BAY5].res == 5
    assert rows[SF9].bc == 20 and rows[BAY5].bc == 20  # both Bay Area
    assert rows[SF9].ok and rows[BAY5].ok
    assert rows[SF9].back == SF9 and rows[BAY5].back == BAY5
    assert rows[SF9].p8 == "8828308281fffff"  # docs: cellToParent(SF9, 8)


def test_documented_children_via_child_range(spark):
    """The 7 res-6 children the H3 docs list for BAY5 are exactly the
    valid res-6 ids inside child_range(BAY5, 6)."""
    lo, hi = H.h3_child_range(F.col("h"), 6)
    r = _df(spark, [BAY5]).select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    kids = [int(k, 16) for k in BAY5_KIDS6]
    assert min(kids) == r.lo and max(kids) == r.hi
    # each child: in range, parents back to BAY5
    d = _df(spark, BAY5_KIDS6).select(
        "h",
        H.h3_is_valid("h").alias("ok"),
        H.h3_to_hex(H.h3_parent("h", 5)).alias("p5"),
    )
    for row in d.collect():
        assert row.ok and row.p5 == BAY5 and r.lo <= row.h <= r.hi
    # a same-res cell from a DIFFERENT parent is outside
    sf = int(SF9, 16)
    lo9, hi9 = H.h3_child_range(F.col("h"), 9)
    r5 = _df(spark, [BAY5]).select(lo9.alias("lo"), hi9.alias("hi")).collect()[0]
    assert not (r5.lo <= sf <= r5.hi)


def _synth(n, seed, res):
    """n bit-layout-valid H3 ids at ``res`` (random HEXAGON base cells +
    digits — pentagon base cells excluded so every id stays valid under
    the pentagon leading-digit rule)."""
    rng = np.random.default_rng(seed)
    hexagons = np.array(
        [b for b in range(122) if b not in H.PENTAGON_BASE_CELLS]
    )
    v = np.full(n, (1 << 59) | (res << 52), dtype=np.uint64)
    v |= hexagons[rng.integers(0, len(hexagons), n)].astype(np.uint64) << np.uint64(45)
    for r in range(1, 16):
        d = rng.integers(0, 7, n) if r <= res else np.full(n, 7)
        v |= d.astype(np.uint64) << np.uint64((15 - r) * 3)
    return v.astype(np.int64)


def test_validity_and_roundtrip_properties(spark):
    ids = _synth(300, 11, 9)
    pdf = pd.DataFrame({"h": ids})
    d = spark.createDataFrame(pdf).select(
        "h",
        H.h3_is_valid("h").alias("ok"),
        H.h3_from_hex(H.h3_to_hex("h")).alias("rt"),
        H.h3_resolution(H.h3_parent("h", 4)).alias("pres"),
        H.h3_is_valid(H.h3_parent("h", 4)).alias("pok"),
    )
    rows = d.collect()
    assert all(r.ok and r.rt == r.h and r.pres == 4 and r.pok for r in rows)
    # corruptions: wrong mode, digit 7 at an occupied res, digit != 7 below
    bad = np.array(
        [
            ids[0] & ~(np.int64(0xF) << np.int64(59)),  # mode 0
            ids[1] | (np.int64(7) << np.int64((15 - 9) * 3)),  # digit9 = 7
            ids[2] ^ np.int64(0b101),  # digit15 = 7^5 = 2 != 7
            ids[3] | (np.int64(125) << np.int64(45)),  # base cell >= 122
        ],
        dtype=np.int64,
    )
    db = spark.createDataFrame(pd.DataFrame({"h": bad})).select(
        H.h3_is_valid("h").alias("ok")
    )
    assert [r.ok for r in db.collect()] == [False, False, False, False]


RES0_PENTAGONS = [  # the 12 documented res-0 pentagon indexes (public spec)
    "8009fffffffffff", "801dfffffffffff", "8031fffffffffff",
    "804dfffffffffff", "8063fffffffffff", "8075fffffffffff",
    "807ffffffffffff", "8091fffffffffff", "80a7fffffffffff",
    "80c3fffffffffff", "80d7fffffffffff", "80ebfffffffffff",
]


def test_pentagon_base_cells_match_documented_res0_pentagons(spark):
    """The module's PENTAGON_BASE_CELLS tuple and the 12 documented res-0
    pentagon index ids are independent public-spec facts — they must name
    the same 12 base cells, and all 12 ids must be valid pentagons."""
    d = _df(spark, RES0_PENTAGONS).select(
        H.h3_base_cell("h").alias("bc"),
        H.h3_is_valid("h").alias("ok"),
        H.h3_is_pentagon("h").alias("pent"),
        H.h3_resolution("h").alias("res"),
    )
    rows = d.collect()
    assert sorted(r.bc for r in rows) == sorted(H.PENTAGON_BASE_CELLS)
    assert all(r.ok and r.pent and r.res == 0 for r in rows)


def test_pentagon_leading_digit_exclusion(spark):
    """Under a pentagon base cell the FIRST non-center digit can never be
    1 (K axis deleted); hexagon base cells have no such restriction; a 1
    that is not the leading digit is fine even under a pentagon."""
    def mk(bc, digits, res=len("x")):  # res = number of digits given
        v = (1 << 59) | (len(digits) << 52) | (bc << 45)
        for i, d in enumerate(digits):
            v |= d << ((15 - (i + 1)) * 3)
        v |= (1 << ((15 - len(digits)) * 3)) - 1  # trailing 7s
        return v

    pent_bc, hex_bc = 4, 20
    cases = [
        (mk(pent_bc, [1, 0, 0]), False),   # leading digit 1 → invalid
        (mk(pent_bc, [0, 1, 0]), False),   # 0-prefix then 1 → still leading
        (mk(pent_bc, [2, 1, 0]), True),    # 1 after a non-zero → fine
        (mk(pent_bc, [0, 0, 0]), True),    # center child chain (pentagon)
        (mk(pent_bc, [0, 3, 2]), True),
        (mk(hex_bc, [1, 0, 0]), True),     # hexagon base: 1 allowed
        (mk(hex_bc, [0, 1, 0]), True),
    ]
    d = spark.createDataFrame(
        pd.DataFrame({"h": np.array([c[0] for c in cases], dtype=np.int64)})
    ).select(
        H.h3_is_valid("h").alias("ok"), H.h3_is_pentagon("h").alias("pent")
    )
    rows = d.collect()
    assert [r.ok for r in rows] == [c[1] for c in cases]
    # pentagon-ness: only the all-zero-digit pentagon descendant qualifies
    assert [r.pent for r in rows] == [False, False, False, True, False, False, False]
    # SQL twin agrees on every case (same engine pair the oracle uses)
    import duckdb

    con = duckdb.connect()
    got = [
        bool(con.execute(f"SELECT {H.h3_is_valid_sql(str(c[0]))}").fetchone()[0])
        for c in cases
    ]
    con.close()
    assert got == [c[1] for c in cases]


def test_ancestor_join_mixed_resolution_vs_between(spark):
    """h3_ancestor_join (per-resolution equi-join union) must equal the
    brute BETWEEN-on-child-range join on a mixed res-3/res-5 coverage."""
    fine_ids = _synth(400, 7, 9)
    fine = spark.createDataFrame(pd.DataFrame({"h3": fine_ids, "val": np.arange(400)}))
    # coverage: res-3 + res-5 ancestors of a subset (so matches exist)
    anc = (
        fine.limit(120)
        .select(
            F.when(F.col("val") % 2 == 0, H.h3_parent("h3", 3))
            .otherwise(H.h3_parent("h3", 5))
            .alias("h3")
        )
        .distinct()
    )
    got = sorted(
        (r.val, r.cov)
        for r in H.h3_ancestor_join(
            fine, anc.withColumn("cov", H.h3_to_hex("h3")), "h3", "h3"
        ).collect()
    )
    # brute reference: child_range BETWEEN
    lo, hi = H.h3_child_range(F.col("ch3"), 9)
    cov = anc.select(F.col("h3").alias("ch3"), H.h3_to_hex("h3").alias("cov"))
    exp = sorted(
        (r.val, r.cov)
        for r in fine.crossJoin(cov)
        .where((F.col("h3") >= lo) & (F.col("h3") <= hi))
        .collect()
    )
    assert got == exp and len(got) >= 120
