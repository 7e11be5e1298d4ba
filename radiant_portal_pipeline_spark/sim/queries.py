"""Registered similarity-search queries over the ``embeddings`` table.

The DuckDB oracle reproduces the integer-quantized cosine exactly (see
sim/ann.py): BIGINT dot products are associative, so engine summation
order cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import load_table, query
from radiant_portal_pipeline_spark.sim import ann

# DuckDB: quantize, exact integer dot / norms, rounded cosine
_Q = "LIST_TRANSFORM({v}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
_DOT = (
    "LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> {a}[i::INT] * {b}[i::INT]))"
)


def _duck_cosine(a: str, b: str) -> str:
    qa, qb = _Q.format(v=a), _Q.format(v=b)
    return (
        f"ROUND({_DOT.format(a=qa, b=qb)} / "
        f"(SQRT(CAST({_DOT.format(a=qa, b=qa)} AS DOUBLE)) * "
        f"SQRT(CAST({_DOT.format(a=qb, b=qb)} AS DOUBLE))), 4)"
    )


@query(
    "s_cosine_vs_query",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           {_duck_cosine('e.embedding', 'q.qv')} AS cosine
    FROM embeddings e CROSS JOIN q
    """,
)
def s_cosine_vs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine scores vs one probe vector (vec_id=0),
    integer-quantized for engine-exact results. Per-row HOF fold —
    single scan, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    # query side quantized once (in-engine, bit-exact) and the row side
    # materialized once — cosine_q over raw expressions re-evaluated the
    # row transform 3x/row and the query transform+norm per row
    (_, qq, qn), = ann.quantize_centroids(spark, [(0, list(qvec))])
    return (
        emb.select(
            "vec_id", "label", ann.quantized(F.col("embedding")).alias("_qv")
        )
        .withColumn("_nrm", ann.norm_d(F.col("_qv")))
        .select(
            "vec_id",
            "label",
            ann.cosine_from_parts(
                ann.dot_q(F.col("_qv"), F.array(*[F.lit(int(x)) for x in qq])),
                F.col("_nrm"),
                F.lit(float(qn)),
            ).alias("cosine"),
        )
    )


@query(
    "s_ann_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, {_duck_cosine('e.embedding', 'q.qv')} AS cosine
      FROM embeddings e CROSS JOIN q)
    SELECT vec_id, cosine FROM scored
    ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def s_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 by cosine — deterministic order (rounded
    cosine desc, vec_id asc) so the result set is engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ann.brute_force_topk(emb, list(qvec), k=10)


@query(
    "s_embedding_near_dup_pairs",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {_Q.format(v='embedding')} AS qv FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND({_DOT.format(a='a.qv', b='b.qv')} /
                   (SQRT(CAST({_DOT.format(a='a.qv', b='a.qv')} AS DOUBLE)) *
                    SQRT(CAST({_DOT.format(a='b.qv', b='b.qv')} AS DOUBLE))), 4) AS cosine
      FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.3
    """,
)
def s_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup method, not the
    search): candidate pruning by cluster label (a real deployment uses
    IVF buckets — same equi-join shape), exact quantized cosine >=
    threshold on candidates only (threshold tuned to this corpus's
    similarity range — max intra-cluster cosine is ~0.47). Never a full cartesian: the join key
    bounds the pair blow-up exactly like the shingle join in text dedup."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms precomputed ONCE per vector (the dot product is the only
    # genuinely per-pair term; recomputing norms per pair is O(m^2 d))
    q = emb.select(
        "vec_id",
        "label",
        ann.quantized(F.col("embedding")).alias("qv"),
    ).withColumn("nrm", ann.norm_d(F.col("qv")))
    a, b = q.alias("a"), q.alias("b")
    cos = ann.cosine_from_parts(
        ann.dot_q(F.col("a.qv"), F.col("b.qv")), F.col("a.nrm"), F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


@query(
    "s_lsh_vector_near_dup",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_Q.format(v='embedding')} AS qv FROM embeddings),
    bits AS (
      SELECT vec_id, qv,
             LIST_TRANSFORM(RANGE(0, 16), k ->
               CASE WHEN LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i ->
                 qv[i::INT] * (((1103515245 * (k * 64 + (i - 1)) + 12345)
                                % 2001) - 1000))) > 0
               THEN 1 ELSE 0 END) AS b
      FROM q),
    banded AS (
      SELECT vec_id, qv, t.band_id,
             b[(t.band_id * 4 + 1)::INT] + b[(t.band_id * 4 + 2)::INT] * 2 +
             b[(t.band_id * 4 + 3)::INT] * 4 + b[(t.band_id * 4 + 4)::INT] * 8
               AS band_val
      FROM bits, UNNEST(RANGE(0, 4)) AS t(band_id)),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id),
    scored AS (
      SELECT c.vec_a, c.vec_b,
             ROUND({_DOT.format(a='x.qv', b='y.qv')} /
                   (SQRT(CAST({_DOT.format(a='x.qv', b='x.qv')} AS DOUBLE)) *
                    SQRT(CAST({_DOT.format(a='y.qv', b='y.qv')} AS DOUBLE))), 4)
               AS cosine
      FROM cand c JOIN q x ON c.vec_a = x.vec_id JOIN q y ON c.vec_b = y.vec_id)
    SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.3
    """,
)
def s_lsh_vector_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-blind vector near-dup: random-hyperplane LSH (16
    deterministic integer planes, 4x4-bit bands) generates candidates
    with a band equi-join — no labels, no trained centroids — then the
    exact quantized cosine verifies. The DuckDB oracle recomputes the
    IDENTICAL planes from the same LCG, so banding, candidates and
    verification are all value-checked (sim/ann.py
    lsh_vector_near_dup_pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann.lsh_vector_near_dup_pairs(emb, threshold=0.3)


@query("s_ivf_kmeans_train")  # rows-only: iterative algorithm, no SQL twin
def s_ivf_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build: 3 Lloyd iterations of k-means (k=8) over the
    embeddings, returning per-cluster sizes — the coarse-quantizer
    training pass (convergence asserted in tests/test_text_sim.py)."""
    from radiant_portal_pipeline_spark.sim.kmeans import train_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    cents, _hist = train_kmeans(emb, k=8, iters=3)
    assigned = ann.assign_ivf_buckets(emb, cents)
    return assigned.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


@query("s_ann_ivf_topk")  # rows-only: recall vs brute force asserted in tests
def s_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN via a PERSISTED index: 8 deterministic
    centroids (the embeddings of vec_id 1..8), assignment materialized
    ONCE into a bucket-partitioned LakeTable, then a 2-probe query that
    opens only the probed buckets' files (manifest pruning — round 1
    recomputed assignments over the whole table per query)."""
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").between(1, 8)).collect()
    ]
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    index = ann.build_ivf_index(
        spark, emb, cents, tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    )
    return ann.ivf_topk_indexed(index, cents, qvec, k=10, n_probes=2)


@query(
    "s_label_centroid_sim",
    oracle=f"""
    WITH qe AS (
      SELECT label, {_Q.format(v='embedding')} AS qv FROM embeddings)
    SELECT label, COUNT(*) AS n,
           CAST(SUM(LIST_SUM(qv)) AS BIGINT) AS sum_all_dims
    FROM qe GROUP BY label
    """,
)
def s_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulation (the vector-aggregation shape a
    clustering/ANN-build pass needs): posexplode to (label, dim, value)
    rows, then plain SUM per (label, dim) — partial aggregation
    combines map-side and NO aggregation buffer ever holds more than
    one scalar per group (the round-1 collect_list-of-vectors form
    buffered every vector of a label in one buffer — OOM at 10^8
    vectors/label). Same shape the k-means update uses
    (sim/kmeans.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = ann.quantized(F.col("embedding"))
    dims = emb.select("label", F.posexplode(qv).alias("dim", "v"))
    centroid = dims.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n_d")
    )
    return centroid.groupBy("label").agg(
        F.max("n_d").alias("n"),  # every dim has the label's row count
        F.sum("s").cast("long").alias("sum_all_dims"),
    )
