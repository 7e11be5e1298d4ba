"""Incrementally maintained MinHash/LSH index — CDC meets dedup.

At 100 TB a training-data pipeline cannot re-shingle the corpus every
time a batch of documents arrives; it needs the near-dup index to be a
TABLE that ingestion maintains and queries prune. This module keeps the
banded MinHash signatures (text/dedup.py ``minhash_signatures`` /
``lsh_candidate_pairs`` — same bands, same hashes, so incremental and
batch results are provably comparable) in a bucket-partitioned
:class:`LakeTable`:

- ``update(docs, epoch)`` appends the batch's band rows; a re-ingested
  (updated) document gets fresh rows under the new epoch, and readers
  mask the stale ones with a per-doc latest-epoch watermark (MoR
  semantics — no cross-bucket tombstone chasing, compaction folds the
  table back to one epoch per doc).
- ``near_dups_of(batch, corpus)`` bands ONLY the batch, reads ONLY the
  index buckets those bands hash into (manifest pruning — assertable
  via ``live_files``), candidate-joins, and verifies with exact Jaccard
  over the candidate documents only. Cost scales with the batch and its
  collisions, never with the corpus.

Reference analog: the import pipeline's per-part incremental insert —
new parts update derived artifacts without recomputing closed ones
(radiant/dags/import_part.py staged per-part flow, SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radiant_portal_pipeline_spark.lake import LakeTable
from radiant_portal_pipeline_spark.text.dedup import (
    N_BANDS,
    N_HASHES,
    _jaccard_from_shared,
    _shared_counts_for_candidates,
    minhash_signatures,
    word_shingles,
)

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band_id", T.IntegerType(), False),
        T.StructField("band_hash", T.LongType(), False),
        T.StructField("n_sh", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)


def _banded(docs: DataFrame, k: int, num_buckets: int) -> DataFrame:
    """(bucket, doc_id, band_id, band_hash, n_sh) for a document set —
    the SAME banding as the batch path (minhash_signatures feeds the
    identical band fold used by lsh_candidate_pairs)."""
    sigs = minhash_signatures(docs, k=k)
    rows_per_band = N_HASHES // N_BANDS
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda bi: F.struct(
            bi.cast("int").alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(
                            F.col("sig"), (bi * rows_per_band + r + 1).cast("int")
                        ).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        ),
    )
    sizes = word_shingles(docs, k=k).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    return (
        sigs.select("doc_id", F.explode(bands).alias("b"))
        .select("doc_id", "b.band_id", "b.band_hash")
        .join(sizes, "doc_id")
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("band_id", "band_hash"), F.lit(num_buckets)).cast(
                "int"
            ),
        )
    )


class IncrementalMinHashIndex:
    """LSH band index as a lake table that CDC batches keep current."""

    def __init__(self, table: LakeTable, k: int = 3):
        self.table = table
        self.k = k
        self.num_buckets = int(table.snapshot().properties["num_buckets"])

    @staticmethod
    def create(
        spark: SparkSession, path: str, num_buckets: int = 32, k: int = 3
    ) -> "IncrementalMinHashIndex":
        tbl = LakeTable.create(
            spark,
            path,
            _INDEX_SCHEMA,
            partition_col="bucket",
            properties={
                "num_buckets": num_buckets,
                "manifest_split": True,
                "stats_cols": ["epoch"],
            },
        )
        return IncrementalMinHashIndex(tbl, k=k)

    @staticmethod
    def load(spark: SparkSession, path: str, k: int = 3) -> "IncrementalMinHashIndex":
        return IncrementalMinHashIndex(LakeTable(spark, path), k=k)

    # ------------------------------------------------------------ write

    def update(self, docs: DataFrame, epoch: int) -> None:
        """Index (or re-index) a batch of (doc_id, text) documents.
        Append-only: a doc's previous epoch's rows stay until
        ``compact()``; reads mask them via the latest-epoch watermark.
        Idempotent per epoch (the lake's epoch guard skips replays)."""
        rows = _banded(docs, self.k, self.num_buckets).withColumn(
            "epoch", F.lit(epoch).cast("long")
        )
        laid = rows.select([f.name for f in _INDEX_SCHEMA.fields]).repartition(
            self.num_buckets, F.col("bucket")
        )
        self.table.append(laid, source_id="minhash", epoch=epoch, layout_ready=True)

    def compact(self) -> None:
        """Fold each bucket to its docs' LATEST-epoch rows (drop rows
        superseded by a re-index). Partition-scoped rewrite."""
        snap = self.table.snapshot()
        base_version = snap.version
        cur = self.table.read(version=base_version)
        latest = cur.groupBy("doc_id").agg(F.max("epoch").alias("epoch"))
        fresh = cur.join(latest, ["doc_id", "epoch"], "left_semi").repartition(
            self.num_buckets, F.col("bucket")
        )
        self.table.overwrite_partitions(
            fresh,
            also_replace=sorted(snap.files.keys()),
            layout_ready=True,
            base_version=base_version,
        )

    # ------------------------------------------------------------- read

    def probe_buckets(self, docs: DataFrame) -> list[int]:
        """The index partitions a batch's bands hash into — the read
        set ``near_dups_of`` opens (for pruning assertions)."""
        rows = _banded(docs, self.k, self.num_buckets)
        return sorted(r["bucket"] for r in rows.select("bucket").distinct().collect())

    def near_dups_of(
        self, batch: DataFrame, corpus: DataFrame, threshold: float = 0.4
    ) -> DataFrame:
        """(doc_a, doc_b, jaccard) pairs with at least one side in
        ``batch``, verified by exact Jaccard — same contract as the
        batch ``minhash_lsh_dedup`` restricted to the batch's docs.
        Call ``update(batch, epoch)`` first so within-batch pairs are
        found too. ``corpus`` supplies text for the verify step; only
        candidate docs' rows are read from it (semi join)."""
        probe = _banded(batch, self.k, self.num_buckets).localCheckpoint(eager=True)
        buckets = sorted(
            r["bucket"] for r in probe.select("bucket").distinct().collect()
        )
        idx = self.table.read(partitions=buckets)
        # mask rows superseded by a later re-index of the same doc.
        # The watermark scan is bucket-pruned too: a stale row outside
        # the probed buckets can only FAIL to mask a probed row if the
        # doc's latest epoch lives elsewhere — so the watermark must
        # come from the FULL index, which the per-doc max over the
        # slim (doc_id, epoch) projection keeps cheap (column-pruned
        # scan, hash agg).
        latest = (
            self.table.read()
            .select("doc_id", "epoch")
            .groupBy("doc_id")
            .agg(F.max("epoch").alias("epoch"))
        )
        idx = idx.join(latest, ["doc_id", "epoch"], "left_semi")
        a = probe.alias("a")
        b = idx.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        cand_docs = (
            cands.select(F.col("doc_a").alias("doc_id"))
            .union(cands.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh = word_shingles(
            corpus.join(cand_docs, "doc_id", "left_semi"), k=self.k
        ).localCheckpoint(eager=True)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        shared = _shared_counts_for_candidates(cands, sh)
        return _jaccard_from_shared(shared, sizes, threshold)
