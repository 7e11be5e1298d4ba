"""FIXTURES.md F2/F6 property tests: the generator's adversarial knobs
(duplicates, out-of-order delivery, mid-stream schema evolution) must
never change the converged final state, and replay from EVERY epoch
boundary must be byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.cdc.feed import synthetic_feed
from radiant_portal_pipeline_spark.cdc.merge import TranscriptMergeEngine
from radiant_portal_pipeline_spark.lake import LakeTable

N = 6000
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]


def _apply(spark, path, feed, epoch_col="commit_epoch", mode="mor"):
    tbl = TranscriptMergeEngine.create_table(spark, path, num_buckets=8)
    eng = TranscriptMergeEngine(tbl, mode=mode)
    epochs = sorted(r[0] for r in feed.select(epoch_col).distinct().collect())
    for e in epochs:
        eng.merge_batch(feed.filter(F.col(epoch_col) == e), epoch=e)
    return eng


def _state(eng, cols=COLS):
    return sorted(map(tuple, eng.current_state().select(cols).collect()))


def test_duplicates_are_idempotent(spark, tmp_path):
    clean = synthetic_feed(spark, N).cache()
    dup = synthetic_feed(spark, N, dup_frac=0.3).cache()
    assert dup.count() > clean.count()
    a = _state(_apply(spark, str(tmp_path / "a"), clean))
    b = _state(_apply(spark, str(tmp_path / "b"), dup))
    assert a == b


def test_out_of_order_delivery_converges(spark, tmp_path):
    clean = synthetic_feed(spark, N).cache()
    # window > epoch size so stragglers actually cross epoch boundaries
    ooo = synthetic_feed(spark, N, ooo_window=5000).cache()
    moved = ooo.filter(
        F.col("commit_epoch") != F.floor(F.col("lsn") / 2000).cast("long")
    ).count()
    assert moved > 0, "ooo knob must displace events across epochs"
    a = _state(_apply(spark, str(tmp_path / "a"), clean))
    b = _state(_apply(spark, str(tmp_path / "b"), ooo))
    assert a == b


def test_schema_evolution_mid_stream_feed(spark, tmp_path):
    feed = synthetic_feed(spark, N, evolve_from_lsn=3000).cache()
    tbl = TranscriptMergeEngine.create_table(spark, str(tmp_path / "t"), num_buckets=8)
    eng = TranscriptMergeEngine(tbl)
    epochs = sorted(r[0] for r in feed.select("commit_epoch").distinct().collect())
    for e in epochs:
        batch = feed.filter(F.col("commit_epoch") == e)
        if e * 2000 < 3000:  # before evolution: columns don't exist yet
            batch = batch.drop("meta_model", "meta_tokens")
        eng.merge_batch(batch, epoch=e)
    st = eng.current_state()
    assert "meta_model" in st.columns
    with_meta = st.filter(F.col("meta_model").isNotNull()).count()
    without = st.filter(F.col("meta_model").isNull()).count()
    assert with_meta > 0 and without > 0
    # evolved rows carry the right values
    bad = st.filter(
        F.col("meta_model").isNotNull()
        & (F.col("meta_tokens") != (F.col("lsn") % 512).cast("int"))
    ).count()
    assert bad == 0


def test_replay_from_every_epoch_boundary(spark, tmp_path):
    """F6: resume from any boundary reproduces the one-shot state —
    apply epochs [0..k) then, in a fresh engine over the same table,
    re-deliver from epoch k-1 (duplicate) through the end."""
    feed = synthetic_feed(spark, N).cache()
    epochs = sorted(r[0] for r in feed.select("commit_epoch").distinct().collect())
    ref = _state(_apply(spark, str(tmp_path / "ref"), feed))
    for k in range(1, len(epochs) + 1):
        path = str(tmp_path / f"b{k}")
        tbl = TranscriptMergeEngine.create_table(spark, path, num_buckets=8)
        eng = TranscriptMergeEngine(tbl)
        for e in epochs[:k]:
            eng.merge_batch(feed.filter(F.col("commit_epoch") == e), epoch=e)
        # crash + resume: fresh engine, redeliver from epoch k-1 onward
        eng2 = TranscriptMergeEngine(LakeTable(spark, path))
        for e in epochs[k - 1 :]:
            eng2.merge_batch(feed.filter(F.col("commit_epoch") == e), epoch=e)
        assert _state(eng2) == ref, f"divergence resuming at boundary {k}"
