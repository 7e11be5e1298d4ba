"""Affinity partition assigner — reference semantics
(tests mirror radiant/tests/unit/starrocks/test_partition.py:56-465:
bootstrap, affinity reuse, cap rollover)."""

from __future__ import annotations

from radiant_portal_pipeline_spark.cdc.affinity import (
    AffinityPartitionAssigner,
    Strategy,
)

STRATS = [Strategy("wgs", 0x00000000, cap=2), Strategy("wxs", 0x00010000, cap=3)]


def _df(spark, rows, cols="affinity_key string, strategy string"):
    return spark.createDataFrame(rows, cols)


def _adf(spark, rows):
    return spark.createDataFrame(
        rows, "affinity_key string, strategy string, part int"
    )


def test_fresh_assignment_packs_under_caps(spark):
    a = AffinityPartitionAssigner(STRATS)
    delta = _df(
        spark,
        [("u1", "wgs"), ("u2", "wgs"), ("u3", "wgs"), ("x1", "wxs")],
    )
    out = {
        (r["affinity_key"], r["strategy"]): r["part"]
        for r in a.assign(delta, None).collect()
    }
    # wgs cap=2: u1,u2 -> part 0; u3 rolls to part 1 (deterministic order)
    assert out[("u1", "wgs")] == out[("u2", "wgs")] == 0
    assert out[("u3", "wgs")] == 1
    # wxs gets its strategy mask
    assert out[("x1", "wxs")] == 0x00010000


def test_affinity_reuses_existing_partition(spark):
    a = AffinityPartitionAssigner(STRATS)
    assigned = _adf(spark, [("u1", "wgs", 5), ("u1", "wgs", 3)])
    delta = _df(spark, [("u1", "wgs"), ("u9", "wgs")])
    out = {r["affinity_key"]: r["part"] for r in a.assign(delta, assigned).collect()}
    assert out["u1"] == 5  # MAX(part) affinity (reference J10)
    # bootstrap: current part 5 has 1 group, cap 2 -> u9 joins part 5
    assert out["u9"] == 5


def test_bootstrap_rollover_when_current_part_full(spark):
    a = AffinityPartitionAssigner(STRATS)
    assigned = _adf(spark, [("u1", "wgs", 7), ("u2", "wgs", 7)])  # part 7 full
    delta = _df(spark, [("u3", "wgs")])
    out = a.assign(delta, assigned).collect()
    assert out[0]["part"] == 8


def test_rows_of_same_group_share_partition(spark):
    a = AffinityPartitionAssigner(STRATS)
    delta = _df(spark, [("u1", "wgs")] * 4 + [("u2", "wgs")] * 2)
    rows = a.assign(delta, None).collect()
    parts = {r["affinity_key"]: set() for r in rows}
    for r in rows:
        parts[r["affinity_key"]].add(r["part"])
    assert all(len(v) == 1 for v in parts.values())
