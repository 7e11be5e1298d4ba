"""Similarity search over an embedding column (array<float>).

Portability trick for the DuckDB oracle: embeddings are quantized to
BIGINT (round(x * 1e6)) BEFORE any arithmetic, so dot products and
squared norms are EXACT integers — identical in every engine regardless
of float summation order. The final cosine is a double computed from
those exact integers, rounded — engine-identical.

Scale design:
- brute-force top-k: one scan, per-row HOF dot product (JVM codegen,
  no shuffle until the global top-k), fine up to ~10^7 vectors/probe;
- IVF-style bucketed search: assign every vector to its nearest of C
  deterministic centroids (one broadcast of C vectors), search only the
  probe's bucket(s) — the candidate scan shrinks by ~C×. Centroid
  assignment is itself a per-row HOF argmin — no shuffle; the bucket
  column becomes the partition/prune key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantized(col) -> F.Column:
    """array<float> -> array<bigint>: round(x * 1e6) elementwise."""
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def dot_q(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm2_q(a) -> F.Column:
    return dot_q(a, a)


def norm_d(a) -> F.Column:
    """sqrt of the exact integer squared norm, as double."""
    return F.sqrt(norm2_q(a).cast("double"))


def cosine_from_parts(dot, nrm_a, nrm_b) -> F.Column:
    """The single definition of the engine's rounded cosine — callers
    that precompute norms (e.g. before a pair self-join) share the same
    rounding/scale as cosine_q, so the two can never drift."""
    return F.round(dot / (nrm_a * nrm_b), 4)


def cosine_q(a, b) -> F.Column:
    """Cosine from quantized vectors: exact integer dot / float norms."""
    return cosine_from_parts(dot_q(a, b), norm_d(a), norm_d(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine vs one query vector. Deterministic ordering:
    (rounded cosine desc, id asc)."""
    # query side pre-quantized once (bit-exact, in-engine) and the row
    # side materialized once — same rationale as assign_ivf_buckets
    (_, qq, qn), = quantize_centroids(vectors.sparkSession, [(0, list(query_vec))])
    scored = (
        vectors.select(F.col(id_col), quantized(F.col(vec_col)).alias("_qv"))
        .withColumn("_nrm", norm_d(F.col("_qv")))
        .select(
            F.col(id_col),
            cosine_from_parts(
                dot_q(F.col("_qv"), F.array(*[F.lit(int(x)) for x in qq])),
                F.col("_nrm"),
                F.lit(float(qn)),
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def quantize_py(vec: list[float]) -> list[int]:
    """Driver-side twin of ``quantized`` with BIT-EXACT Spark ROUND
    semantics: Spark's Round(double, 0) is
    BigDecimal.valueOf(d).setScale(0, HALF_UP), and BigDecimal.valueOf
    goes through Double.toString — the shortest decimal representation,
    which is exactly Python's repr(float). So
    Decimal(repr(d)).quantize(1, ROUND_HALF_UP) reproduces the same
    integer for every double (parity asserted over the whole embeddings
    corpus in tests). Used for the constant (query/centroid) side so
    hot paths don't pay a Spark job per quantization."""
    import decimal

    one = decimal.Decimal(1)
    out = []
    for v in vec:
        d = float(v) * SCALE  # same IEEE double product as the column expr
        out.append(
            int(
                decimal.Decimal(repr(d)).quantize(
                    one, rounding=decimal.ROUND_HALF_UP
                )
            )
        )
    return out


def quantize_centroids(
    spark, centroids: list[tuple[int, list[float]]]
) -> list[tuple[int, list[int], float]]:
    """(centroid_id, quantized ints, float norm), driver-side. The
    norm is math.sqrt over the exact integer squared norm — ints stay
    below 2^53 for unit-scale 64-dim embeddings, so the double
    conversion and sqrt are IEEE-identical to Spark's
    SQRT(CAST(.. AS DOUBLE)). ``spark`` is unused (kept for call-site
    stability)."""
    import math

    out = []
    for cid, vec in centroids:
        q = quantize_py(list(vec))
        out.append((int(cid), q, math.sqrt(float(sum(x * x for x in q)))))
    return out


def assign_ivf_buckets(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF bucket assignment: argmax cosine over a broadcast list of
    centroids, computed per-row (no shuffle). ``centroids`` is
    [(centroid_id, vector), ...].

    The row vector is quantized and normed ONCE into real columns and
    the centroid side is pre-quantized (quantize_centroids): inlining
    ``cosine_q(quantized(col), quantized(lit))`` per centroid
    re-evaluated the row-side transform+norm C times per row and the
    centroid-side quantization was not constant-folded (HOFs are not
    foldable) — measured as the dominant cost of the index build."""
    qcents = quantize_centroids(vectors.sparkSession, centroids)
    # struct comparison is field-order lexicographic → (sim, -cid) so
    # array_max picks highest sim, lowest centroid id on ties
    qcols = [
        F.struct(
            cosine_from_parts(
                dot_q(F.col("_qv"), F.array(*[F.lit(int(q)) for q in qv])),
                F.col("_nrm"),
                F.lit(float(nb)),
            ).alias("sim"),
            F.lit(-cid).alias("neg_cid"),
        )
        for cid, qv, nb in qcents
    ]
    best = F.array_max(F.array(*qcols))
    return (
        vectors.select(
            F.col(id_col), F.col(vec_col), quantized(F.col(vec_col)).alias("_qv")
        )
        .withColumn("_nrm", norm_d(F.col("_qv")))
        .select(
            F.col(id_col),
            F.col(vec_col),
            (-best["neg_cid"]).cast("int").alias("bucket"),
        )
    )


N_PLANES = 16
PLANES_PER_BAND = 4


def _plane_coef(k: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane coefficient in
    [-1000, 1000] from an LCG over (plane, dim) — pure integer
    arithmetic, so ANY engine reproduces the same planes exactly (the
    portability requirement for the DuckDB oracle)."""
    return ((1103515245 * (k * 64 + d) + 12345) % 2001) - 1000


def hyperplane_bands(
    vectors: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Random-hyperplane LSH for cosine similarity: 16 sign bits
    (sign of exact integer dot with a fixed pseudo-random plane),
    banded 4x4 — near-angle vectors agree on a whole 4-bit band with
    high probability, so candidate pairs come from a band equi-join
    instead of all pairs. Returns (id, qv, band_id, band_val). This is
    the content-blind counterpart of the label/IVF blocking: it needs
    no labels and no trained centroids."""
    qv = quantized(F.col(vec_col))
    planes = [
        F.array(*[F.lit(_plane_coef(k, d)) for d in range(64)])
        for k in range(N_PLANES)
    ]
    bits = [(dot_q(F.col("qv"), planes[k]) > 0).cast("int") for k in range(N_PLANES)]
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                sum(
                    bits[b * PLANES_PER_BAND + j] * (1 << j)
                    for j in range(PLANES_PER_BAND)
                ).alias("band_val"),
            )
            for b in range(N_PLANES // PLANES_PER_BAND)
        ]
    )
    return (
        vectors.select(F.col(id_col), qv.alias("qv"))
        .select(id_col, "qv", F.explode(bands).alias("b"))
        .select(id_col, "qv", F.col("b.band_id"), F.col("b.band_val"))
    )


def lsh_vector_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ck=None,
) -> DataFrame:
    """Candidate pairs from the hyperplane band join, verified by the
    exact quantized cosine — precision exact, recall set by the
    banding (4 bands x 4 bits). Never a cartesian: the band value is
    the shuffle key, and each band splits the corpus into up to 16
    buckets.

    Exchange hygiene: the band join and the pair dedup move ONLY id
    pairs (never the 64-element vectors — the round-1 lesson from
    s_embedding_near_dup_pairs), and norms are computed once per
    vector, not per pair (cosine_from_parts)."""
    from radiant_portal_pipeline_spark.checkpoint import IterCheckpointer

    ck = ck or IterCheckpointer()  # durable=True on a real cluster
    banded = ck.cut(hyperplane_bands(vectors, vec_col, id_col))
    slim = banded.select(id_col, "band_id", "band_val")
    a, b = slim.alias("a"), slim.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    vecs = banded.select(id_col, "qv").dropDuplicates([id_col]).withColumn(
        "nrm", norm_d(F.col("qv"))
    )
    va = vecs.select(
        F.col(id_col).alias("vec_a"), F.col("qv").alias("qa"), F.col("nrm").alias("na")
    )
    vb = vecs.select(
        F.col(id_col).alias("vec_b"), F.col("qv").alias("qb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cosine",
            cosine_from_parts(
                dot_q(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def rank_probe_buckets(
    centroids: list[tuple[int, list[float]]], query_vec: list[float], n_probes: int
) -> list[int]:
    """Centroid ranking vs the query, driver-side (C is tiny)."""
    import math

    def cos(a, b):
        qa = [round(x * SCALE) for x in a]
        qb = [round(x * SCALE) for x in b]
        d = sum(x * y for x, y in zip(qa, qb))
        return d / (
            math.sqrt(sum(x * x for x in qa)) * math.sqrt(sum(y * y for y in qb))
        )

    ranked = sorted(centroids, key=lambda c: (-cos(c[1], query_vec), c[0]))
    return [cid for cid, _ in ranked[:n_probes]]


def ivf_topk(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot IVF search over an UNindexed table: assigns buckets on
    the fly, then scans only the probed buckets' rows. NOTE this still
    READS the whole table once to compute assignments — the indexed
    path (build_ivf_index + ivf_topk_indexed) is the scale form, where
    assignment is paid once at build time and queries open only the
    probed buckets' FILES via manifest pruning."""
    probe_ids = rank_probe_buckets(centroids, query_vec, n_probes)
    assigned = assign_ivf_buckets(vectors, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("bucket").isin(probe_ids))
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def build_ivf_index(
    spark,
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize the IVF bucket assignment as a bucket-PARTITIONED
    LakeTable (the 'index build' job): one pass over the vectors, rows
    physically clustered by bucket, per-bucket file lists recorded in
    the manifest. At 100 TB this is what makes n_probes/C of the data
    the only data a query touches (round-1 ivf_topk recomputed the
    assignment over the ENTIRE table per query)."""
    from radiant_portal_pipeline_spark.lake import LakeTable

    assigned = assign_ivf_buckets(vectors, centroids, id_col, vec_col)
    tbl = LakeTable.create(
        spark,
        path,
        assigned.schema,
        partition_col="bucket",
        properties={"n_centroids": len(centroids)},
    )
    tbl.append(assigned)
    return tbl


def ivf_topk_indexed(
    index,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against a built index: manifest-level partition
    pruning opens ONLY the probed buckets' files (assert-able via
    index.live_files(partitions=probe_ids))."""
    probe_ids = rank_probe_buckets(centroids, query_vec, n_probes)
    cand = index.read(partitions=probe_ids)
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)
