"""Incremental MinHash index: batch-parity, re-index masking, pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.text.dedup import minhash_lsh_dedup
from radiant_portal_pipeline_spark.text.incremental import IncrementalMinHashIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, n=120, n_templates=17):
    """Deterministic docs with planted near-dups: doc i shares a
    template with every j ≡ i (mod n_templates); a per-doc suffix
    varies similarity."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(n):
        words = base.split()
        words[i % len(words)] = f"tok{i % n_templates}"
        suffix = [f"extra{i}"] * (i % 3)
        rows.append((i, " ".join(words + suffix)))
    return _docs(spark, rows)


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_matches_batch_restricted_to_batch(spark, tmp_path):
    corpus = _corpus(spark).localCheckpoint(eager=True)
    b1 = corpus.filter(F.col("doc_id") < 80)
    b2 = corpus.filter(F.col("doc_id") >= 80)

    ix = IncrementalMinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=16)
    ix.update(b1, epoch=0)
    p1 = _pairs(ix.near_dups_of(b1, corpus))
    ix.update(b2, epoch=1)
    p2 = _pairs(ix.near_dups_of(b2, corpus))

    full = _pairs(minhash_lsh_dedup(corpus, threshold=0.4))
    b2_ids = {r["doc_id"] for r in b2.select("doc_id").collect()}
    # step 2 finds exactly the full-corpus pairs touching the new batch
    assert p2 == {p for p in full if p[0] in b2_ids or p[1] in b2_ids}
    # and the union of increments covers the whole batch result
    assert p1 | p2 == full
    assert len(full) > 0  # planted dups actually exist


def test_reindex_masks_stale_bands(spark, tmp_path):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = text + " lambda"
    ix = IncrementalMinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=8)
    v1 = _docs(spark, [(1, text), (2, near)])
    ix.update(v1, epoch=0)
    assert _pairs(ix.near_dups_of(v1, v1)) != set()

    # doc 2 is REWRITTEN to something unrelated: its old band rows must
    # stop producing candidates even though they still sit in the table
    unrelated = "one two three four five six seven eight nine ten eleven twelve"
    v2docs = _docs(spark, [(2, unrelated)])
    corpus = _docs(spark, [(1, text), (2, unrelated)])
    ix.update(v2docs, epoch=1)
    assert _pairs(ix.near_dups_of(v2docs, corpus)) == set()
    # querying doc 1 must not resurrect the stale pair either
    assert _pairs(ix.near_dups_of(_docs(spark, [(1, text)]), corpus)) == set()

    # compaction drops the superseded rows physically
    before = ix.bands.read().count()
    ix.compact()
    after = ix.bands.read().count()
    assert after < before
    assert _pairs(ix.near_dups_of(v2docs, corpus)) == set()


def test_probe_reads_only_probed_buckets(spark, tmp_path):
    corpus = _corpus(spark, n=200).localCheckpoint(eager=True)
    ix = IncrementalMinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=16)
    ix.update(corpus, epoch=0)
    one = corpus.filter(F.col("doc_id") == 3)
    probed = ix.probe_buckets(one)
    opened = ix.bands.live_files(partitions=probed)
    total = ix.bands.live_files()
    # one doc probes at most N_BANDS buckets of 16 — the candidate read
    # must open only those buckets' files (manifest pruning)
    assert 0 < len(opened) < len(total)
    assert set(opened) <= set(total)


def test_k_is_index_identity(spark, tmp_path):
    """Shingle size k determines the stored band hashes — load() must
    take it from the table, never the caller (round-3 review: a k
    mismatch silently returned ~no candidates)."""
    ix = IncrementalMinHashIndex.create(
        spark, str(tmp_path / "ix"), num_buckets=8, k=5
    )
    docs = _docs(spark, [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")])
    ix.update(docs, epoch=0)
    again = IncrementalMinHashIndex.load(spark, str(tmp_path / "ix"))
    assert again.k == 5
    assert _pairs(again.near_dups_of(docs, docs)) == _pairs(
        ix.near_dups_of(docs, docs)
    )


def test_versions_read_is_bucket_pruned(spark, tmp_path):
    """Masking must not scan the whole versions table: only the
    vbuckets of docs the probe collided with are opened."""
    corpus = _corpus(spark, n=200).localCheckpoint(eager=True)
    ix = IncrementalMinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=16)
    ix.update(corpus, epoch=0)
    one = corpus.filter(F.col("doc_id") == 3)
    probed = ix.probe_buckets(one)
    idx_docs = {
        r["doc_id"]
        for r in ix.bands.read(partitions=probed).select("doc_id").distinct().collect()
    }
    from radiant_portal_pipeline_spark.text.incremental import _vbucket
    import pyspark.sql.functions as FF

    vb = sorted(
        r["vb"]
        for r in spark.createDataFrame([(d,) for d in idx_docs], "doc_id long")
        .select(_vbucket(FF.col("doc_id"), 16).alias("vb"))
        .distinct()
        .collect()
    )
    opened = ix.versions.live_files(partitions=vb)
    total = ix.versions.live_files()
    assert set(opened) <= set(total)
    assert len(vb) <= 16


def test_compact_keeps_in_flight_newer_epoch_bands(spark, tmp_path):
    """Round-3 review race, closed: update() appends bands BEFORE
    versions, so a concurrent compact() can see band rows whose version
    row hasn't landed yet. The rewrite must KEEP any band row at an
    epoch NEWER than the doc's known-latest version (or with no version
    row at all) — deleting it would make the doc permanently invisible
    to probes once its version row landed."""
    corpus = _corpus(spark, n=30).localCheckpoint(eager=True)
    ix = IncrementalMinHashIndex.create(spark, str(tmp_path / "ix"), num_buckets=8)
    ix.update(corpus, epoch=0)

    # simulate the in-flight update: bands of epoch 1 landed, version
    # rows not yet (append bands directly, skip the versions append)
    from radiant_portal_pipeline_spark.text.incremental import (
        _BANDS_SCHEMA,
        _banded,
    )

    reindexed = corpus.filter(F.col("doc_id") < 5)
    rows = _banded(reindexed, ix.k, ix.num_buckets).withColumn(
        "epoch", F.lit(1).cast("long")
    )
    laid = rows.select([f.name for f in _BANDS_SCHEMA.fields]).repartition(
        ix.num_buckets, F.col("bucket")
    )
    ix.bands.append(laid, source_id="minhash", epoch=1, layout_ready=True)

    ix.compact()

    # the epoch-1 band rows survived the rewrite
    kept = ix.bands.read().filter(F.col("epoch") == 1).count()
    assert kept > 0
    # ...so when the version row lands, probes still find those docs
    vers = reindexed.select(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(ix.num_buckets))
        .cast("int")
        .alias("vbucket"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(1).cast("long").alias("epoch"),
    ).repartition(ix.num_buckets, F.col("vbucket"))
    ix.versions.append(vers, source_id="minhash", epoch=1, layout_ready=True)
    probe = corpus.filter(F.col("doc_id") == 0)
    found = ix.near_dups_of(probe, corpus)
    assert found.count() > 0
