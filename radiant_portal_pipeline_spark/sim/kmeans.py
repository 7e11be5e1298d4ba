"""Lloyd's k-means over an embedding column, pure DataFrame ops — the
IVF index-build pass (cluster centroids = coarse quantizer). Iterative,
so it has no SQL oracle; convergence properties are asserted in tests.

Each iteration:
1. assign: per-row argmax-cosine over the broadcast centroid list
   (HOF fold, no shuffle);
2. update: new centroid = elementwise mean per cluster — ONE
   posexplode + groupBy(cluster, dim) shuffle of (rows x dims) skinny
   tuples, then a k x dims collect to the driver (the model state is
   tiny; this is the standard Spark Lloyd shape).

Scale: assignment is embarrassingly parallel; the update shuffle keys
on (cluster, dim) — k*dims reducers, never skewed. For 10^9 vectors
one trains on a sample (classic IVF practice), then assigns all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.sim.ann import assign_ivf_buckets


def _centroid_means(
    assigned: DataFrame, vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    dims = (
        assigned.select(
            "bucket", F.posexplode(F.col(vec_col)).alias("dim", "x")
        )
        .groupBy("bucket", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
    )
    rows = dims.collect()
    by_bucket: dict[int, dict[int, float]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], {})[r["dim"]] = r["m"]
    out = []
    for b, dimmap in sorted(by_bucket.items()):
        out.append((b, [dimmap[i] for i in range(len(dimmap))]))
    return out


def train_kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Deterministic init (the k lowest-id vectors), ``iters`` Lloyd
    rounds. Returns (centroids, per-iteration mean cosine-to-centroid —
    monotonically non-decreasing up to quantization)."""
    init = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[0]]) for i, r in enumerate(init)]
    history: list[float] = []
    for _ in range(iters):
        assigned = assign_ivf_buckets(vectors, centroids, id_col, vec_col)
        # quality: mean cosine similarity to the assigned centroid
        from radiant_portal_pipeline_spark.sim.ann import (
            cosine_from_parts,
            dot_q,
            norm_d,
            quantize_centroids,
            quantized,
        )

        # score rows against their own centroid via a join-free trick:
        # recompute best-sim (same argmax the assignment used) — with
        # the row-side quantization/norm materialized once and the
        # centroid side pre-quantized, as in assign_ivf_buckets
        qcents = quantize_centroids(vectors.sparkSession, centroids)
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
        history.append(
            vectors.select(quantized(F.col(vec_col)).alias("_qv"))
            .withColumn("_nrm", norm_d(F.col("_qv")))
            .select(F.avg(best["sim"]).alias("m"))
            .head()["m"]
        )
        centroids = _centroid_means(assigned, vec_col)
        if not centroids:
            break
    return centroids, history


def inertia_proxy(history: list[float]) -> bool:
    """True if mean assigned-cosine never materially degrades (Lloyd
    monotonicity, modulo the 1e-4 rounding in cosine_q)."""
    return all(b >= a - 1e-3 for a, b in zip(history, history[1:]))
