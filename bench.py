"""Benchmark harness.

Default run: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the CDC merge
replay measured at TWO parallelism levels (local[N] and local[4N], one
subprocess each so every level gets a fresh JVM) to evidence the
north-rule scaling criterion. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "cdc_merge": {"events": E, "levels": {"8": {...}, "32": {...}},
                 "scaling_efficiency": ...}}

Sub-modes (used internally): ``--merge-only --cpus K`` runs just the
CDC replay and prints {"seconds":..., "events":...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Official protocol defaults to the 16M-event DESIGN-POINT batch (one
# batch): a production micro-batch at 10^10-event scale amortizes the
# per-batch fixed cost (stage barriers + O(buckets) file writes +
# commit) the way small bench batches do not (round-3 verdict #1).
MERGE_EVENTS = int(os.environ.get("SPARK_GRAFT_MERGE_EVENTS", "16000000"))
MERGE_BATCHES = int(os.environ.get("SPARK_GRAFT_MERGE_BATCHES", "1"))
# 5 interleaved pairs: the pairwise-efficiency spread on this shared
# VM is 0.26-0.54 within ONE quiet run (neighbor load), so the median
# needs more samples than the r3 default of 3
MERGE_RUNS = int(os.environ.get("SPARK_GRAFT_MERGE_RUNS", "5"))
# kept as a separate knob; the interleaved protocol below runs
# max(MERGE_RUNS, MERGE_RUNS_HI) ALTERNATING (lo,hi) pairs
MERGE_RUNS_HI = int(os.environ.get("SPARK_GRAFT_MERGE_RUNS_HI", "5"))
# N -> 4N parallelism pair for the scaling-efficiency evidence. (2, 8)
# stays in this box's unsaturated regime — local[32] on shared-VM disk
# is memory/IO-bandwidth-bound (see BENCH.md), which would measure the
# disk, not the engine's scaling.
SCALE_LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(",")
)
# Bucket count TRACKS the parallelism level (4x cores), as a deployment
# does: bucket count is sized to the cluster and migrated on growth
# (TranscriptMergeEngine.rescale). Holding buckets fixed across levels
# instead charges the small "cluster" 16 files/commit/core of layout
# overhead and the big one 2 — measuring the file count, not the
# engine. Override with SPARK_GRAFT_MERGE_BUCKETS to pin it.
_BUCKETS_ENV = os.environ.get("SPARK_GRAFT_MERGE_BUCKETS")


def merge_buckets(cpus: int) -> int:
    return int(_BUCKETS_ENV) if _BUCKETS_ENV else 4 * cpus
HEADLINE = [
    "q01_pricing_summary",
    "q05_broadcast_dim_enrich",
    "q08_conditional_distinct_freq",
    "q12_range_interval_join",
    "q13_theta_overlap_join",
    "t_ngram_jaccard_dedup",
    "t_minhash_lsh_dedup",
    "t_dedup_groups",
    "s_cosine_vs_query",
    "cdc_lww_dedup",
]


def _cached_feed_dir(
    spark, n_events: int, n_batches: int, hot_every: int, n_convs: int = 9973,
    bucket_by: int | None = None,
) -> str:
    """The synthetic feed is DETERMINISTIC in its parameters, and the
    official protocol regenerates the identical ~GBs in every
    subprocess (datagen is excluded from timing but dominates child
    wall time). Cache it once per parameter tuple under /tmp; children
    run sequentially, and the atomic directory rename makes a torn
    generation invisible (no marker files needed)."""
    import hashlib
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from radiant_portal_pipeline_spark.cdc import feed as feed_mod
    from radiant_portal_pipeline_spark.cdc.feed import synthetic_feed
    from radiant_portal_pipeline_spark.cdc.merge import part_expr

    # salt the key with the generator SOURCE: a logic change in
    # synthetic_feed must invalidate the cache, or later rounds would
    # silently bench stale feeds (round-4 advisor)
    with open(feed_mod.__file__, "rb") as fh:
        feed_src = hashlib.sha256(fh.read()).hexdigest()[:12]
    cache = (
        f"/tmp/bench_feed_cache/ev{n_events}_b{n_batches}"
        f"_hot{hot_every}_nc{n_convs}_{feed_src}"
        + (f"_bk{bucket_by}" if bucket_by else "")
    )
    if os.path.isdir(cache):
        return cache
    staged = f"{cache}-staged-{uuid.uuid4().hex}"
    feed = synthetic_feed(
        spark, n_events, n_convs=n_convs, hot_every=hot_every
    ).withColumn("slice", (F.col("lsn") * n_batches / n_events).cast("int"))
    if bucket_by:
        # model a feed KEYED BY CONVERSATION (Kafka partitioned on
        # conv_id): files within each slice are bucket-clustered, so
        # the reader's tasks arrive pre-bucketed and the merge can run
        # source_bucketed=True (zero full-row exchanges). Uses the
        # ENGINE's own part_expr — an inline copy of the hash could
        # silently drift from the bucket column and void the elision
        feed = feed.repartition(bucket_by, part_expr("conv_id", bucket_by))
    feed.write.partitionBy("slice").mode("overwrite").parquet(staged)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    try:
        os.rename(staged, cache)
    except OSError:  # a concurrent run won the rename — use theirs
        shutil.rmtree(staged, ignore_errors=True)
    return cache


def _merge_replay_seconds(
    spark, n_events: int, mode: str, merge_plan: str = "adaptive",
    hot_every: int = 5, buckets: int | None = None, sink: str = "table",
    n_convs: int = 9973, source_bucketed: bool = False,
) -> dict:
    """Apply a synthetic feed in MERGE_BATCHES epoch slices; wall time.
    MoR additionally times a final compaction + state materialization."""
    from pyspark.sql import functions as F

    from radiant_portal_pipeline_spark.cdc.merge import (
        TranscriptMergeEngine,
        part_expr,
    )

    work = tempfile.mkdtemp(prefix="bench_cdc_")
    # Materialize each micro-batch as its OWN parquet dir (datagen and
    # the write are excluded from timing). This models the production
    # input: a micro-batch is a bounded columnar source holding ONLY its
    # own events — not a filter over the whole cached feed, which would
    # charge every batch a full-feed scan (and charge plans that read
    # the batch twice, like argmax's slim winners pass, a full-feed
    # DESERIALIZE where a columnar source reads three thin columns).
    nb0 = buckets if buckets is not None else merge_buckets(
        spark.sparkContext.defaultParallelism
    )
    feed_dir = _cached_feed_dir(
        spark, n_events, MERGE_BATCHES, hot_every, n_convs=n_convs,
        bucket_by=nb0 if source_bucketed else None,
    )
    batches = [
        spark.read.parquet(f"{feed_dir}/slice={b}") for b in range(MERGE_BATCHES)
    ]

    # JIT/codegen warmup on a throwaway table (excluded from timing)
    nb = nb0  # single derivation — must equal the feed's bucket_by
    warm_tbl = TranscriptMergeEngine.create_table(spark, f"{work}/warm", num_buckets=nb)
    warm = TranscriptMergeEngine(
        warm_tbl, num_buckets=nb, mode=mode, merge_plan=merge_plan
    )
    warm.merge_batch(batches[0].limit(50000), epoch=0)

    tbl = TranscriptMergeEngine.create_table(spark, f"{work}/t", num_buckets=nb)
    engine = TranscriptMergeEngine(
        tbl, num_buckets=nb, mode=mode, merge_plan=merge_plan
    )
    if sink == "noop":
        # scaling-floor probe: the SAME prepared plan (chooser + dedup +
        # layout) driven into Spark's no-op sink — isolates the
        # engine's distributed compute from the box's file/commit path,
        # so the pairwise efficiency of this variant bounds what any
        # write-side engineering could recover on this hardware
        t0 = time.time()
        for b, batch in enumerate(batches):
            prepared, _, _ = engine._prepare_batch(
                batch, source_bucketed=source_bucketed
            )
            prepared.write.format("noop").mode("overwrite").save()
        return {"apply_seconds": time.time() - t0, "compact_seconds": 0.0}
    t0 = time.time()
    for b, batch in enumerate(batches):
        engine.merge_batch(batch, epoch=b, source_bucketed=source_bucketed)
    apply_s = time.time() - t0
    t1 = time.time()
    engine.compact()
    compact_s = time.time() - t1
    return {"apply_seconds": apply_s, "compact_seconds": round(compact_s, 3)}


def floor_probe(cpus: int, n_events: int) -> dict:
    """Box-floor calibration (fresh JVM): two microbenchmarks bracket
    what ANY plan can scale to on this machine. ``cpu_bound`` is
    cache-resident iterated hashing (negligible memory traffic) — on a
    real 4N-executor cluster every workload scales like this, because
    nodes multiply DRAM channels and disks; on one box it is the only
    workload the DRAM bus doesn't throttle. ``mem_stream`` is a
    full-width parquet scan + per-row hash + scalar agg (no shuffle, no
    write, no Python) — pure memory streaming, the regime the merge's
    lean plans live in at high thread counts. Plans are rebuilt per
    run (fresh literals) so JIT warm-up and plan memoization can't
    flatter the numbers."""
    import time

    from pyspark.sql import functions as F

    from radiant_portal_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"floor_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    scan_dir = f"{_cached_feed_dir(spark, n_events, 1, 5)}/slice=0"

    def cpu_df(seed):
        h = F.col("id").cast("string")
        for _ in range(6):
            h = F.sha2(h, 256)
        return (
            spark.range(seed, seed + 4_000_000, 1, 4 * cpus)
            .select(h.alias("h"))
            .agg(F.max("h"))
        )

    def mem_df(seed):
        batch = spark.read.parquet(scan_dir)
        cols = [c for c, dt in batch.dtypes if not dt.startswith("timestamp")]
        return batch.select(
            F.xxhash64(*cols, F.lit(seed)).alias("h")
        ).agg(F.max("h"), F.min("h"))

    def hash_agg_df(seed):
        # the winners-aggregation shape exactly: thin scan, hash-agg on
        # a several-hundred-thousand-key space (hash tables >> cache —
        # the random-access regime, the tightest box bracket for the
        # merge's dedup phases)
        batch = spark.read.parquet(scan_dir)
        return (
            batch.select("conv_id", "turn_idx", (F.col("lsn") + seed).alias("o"))
            .groupBy("conv_id", "turn_idx")
            .agg(F.max("o"))
            .agg(F.count(F.lit(1)))
        )

    out = {"cpus": cpus}
    for label, mk in (
        ("cpu_bound", cpu_df),
        ("mem_stream", mem_df),
        ("hash_agg", hash_agg_df),
    ):
        mk(999).collect()  # JIT warm (fresh seed -> fresh plan)
        best = float("inf")
        for s in (1, 2, 3):
            t0 = time.time()
            mk(s).collect()
            best = min(best, time.time() - t0)
        out[label] = round(best, 3)
    return out


def sustained(
    cpus: int, batch_events: int, n_batches: int, profile: str,
    merge_plan: str = "adaptive", overlap_compact: bool = False,
    pace_sec: float = 0.0, n_convs: int | None = None,
    source_bucketed: bool = False,
) -> dict:
    """Sustained replay: n_batches of batch_events each, per-batch wall
    times recorded (state growth / GC / write-amplification would show
    as a rising trend). Profiles: 'update' (10k convs — every batch
    overwrites the same ~500k keys) and 'insert' (1M convs — ~every
    event a new key, write-bound).

    ``overlap_compact=True`` runs size-tiered incremental compaction
    (min_files_per_bucket=4) in a BACKGROUND thread between applies,
    through the file-scoped concurrent-safe rewrite — the round-4
    insert-heavy lever: the end-of-run compaction tail (86 s on 32M
    final rows in the r4 artifact) amortizes behind the stream instead
    of serializing after it, so throughput-including-compaction
    approaches apply-only throughput."""
    import threading
    import time

    from pyspark.sql import functions as F

    from radiant_portal_pipeline_spark.cdc.feed import synthetic_feed
    from radiant_portal_pipeline_spark.cdc.merge import TranscriptMergeEngine
    from radiant_portal_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"sustained_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    if n_convs is None:  # profile default; --n-convs overrides
        n_convs = 9_973 if profile == "update" else 999_983
    total = batch_events * n_batches
    work = tempfile.mkdtemp(prefix="bench_sus_")
    nb = merge_buckets(cpus)
    feed_dir = _cached_feed_dir(
        spark, total, n_batches, 5, n_convs=n_convs,
        bucket_by=nb if source_bucketed else None,
    )
    warm_tbl = TranscriptMergeEngine.create_table(
        spark, f"{work}/warm", num_buckets=nb
    )
    TranscriptMergeEngine(
        warm_tbl, num_buckets=nb, merge_plan=merge_plan
    ).merge_batch(
        spark.read.parquet(f"{feed_dir}/slice=0").limit(50_000), epoch=0
    )
    tbl = TranscriptMergeEngine.create_table(spark, f"{work}/t", num_buckets=nb)
    eng = TranscriptMergeEngine(tbl, num_buckets=nb, merge_plan=merge_plan)
    per_batch, plans = [], []
    bg: dict = {"thread": None, "times": [], "errors": []}

    def _bg_compact():
        t0 = time.time()
        try:
            eng.compact(concurrent_safe=True, min_files_per_bucket=4)
        except Exception as e:  # noqa: BLE001 — surfaced in the record
            bg["errors"].append(str(e)[:200])
        bg["times"].append(round(time.time() - t0, 2))

    t_all = time.time()
    for b in range(n_batches):
        t0 = time.time()
        st = eng.merge_batch(
            spark.read.parquet(f"{feed_dir}/slice={b}"), epoch=b,
            source_bucketed=source_bucketed,
        )
        per_batch.append(round(time.time() - t0, 2))
        plans.append(st.plan)
        # pace_sec > 0 models a PACED stream (micro-batches arrive on a
        # cadence, the cluster idles between them) — the regime the
        # background fold is FOR: it spends the idle gap, not the
        # apply's cores
        if pace_sec > 0 and b < n_batches - 1:
            time.sleep(max(0.0, pace_sec - (time.time() - t0)))
        # kick a background fold that overlaps the NEXT batch's apply;
        # after the LAST batch there is nothing left to hide behind, so
        # leave the residue to the (separately timed) final compact
        if (
            overlap_compact
            and b < n_batches - 1
            and (bg["thread"] is None or not bg["thread"].is_alive())
        ):
            bg["thread"] = threading.Thread(target=_bg_compact, daemon=True)
            bg["thread"].start()
    apply_s = time.time() - t_all  # the batch loop only
    # the terminal background fold's residue is COMPACTION work, not
    # apply work — charging it to apply_seconds skewed the overlap A/B
    # (round-5 review); it is recorded separately and counted with the
    # compaction side of every derived metric
    bg_tail = 0.0
    if bg["thread"] is not None:
        t_j = time.time()
        bg["thread"].join()
        bg_tail = time.time() - t_j
    t1 = time.time()
    eng.compact(concurrent_safe=overlap_compact)
    compact_s = time.time() - t1
    rows = eng.current_state().count()
    busy_s = sum(per_batch)
    # with pace_sec > 0 the loop time includes idle arrival gaps, so
    # events_per_sec is computed from the BUSY apply time (per-batch
    # sum); unpaced runs keep the loop-wall definition (comparable
    # with earlier rounds)
    rate_base = busy_s if pace_sec > 0 else apply_s
    out = {
        "profile": profile, "cpus": cpus, "events": total,
        "batches": n_batches, "apply_seconds": round(apply_s, 2),
        "busy_apply_seconds": round(busy_s, 2),
        "events_per_sec": round(total / rate_base, 1),
        # same base as events_per_sec (busy time when paced — idle
        # arrival gaps are not a compaction cost) + the fold residue
        "events_per_sec_incl_compact": round(
            total / (rate_base + bg_tail + compact_s), 1
        ),
        "per_batch_seconds": per_batch, "plans": plans,
        "compact_seconds": round(compact_s, 2), "final_rows": rows,
        "overlap_compact": overlap_compact,
        "pace_sec": pace_sec,
        "n_convs": n_convs,
        "source_bucketed": source_bucketed,
        "total_wall_seconds": round(apply_s + bg_tail + compact_s, 2),
    }
    if overlap_compact:
        out["bg_compact_runs"] = len(bg["times"])
        out["bg_compact_seconds"] = bg["times"]
        out["bg_tail_seconds"] = round(bg_tail, 2)
        out["bg_compact_errors"] = bg["errors"]
    return out


def merge_only(
    cpus: int, n_events: int, mode: str, merge_plan: str = "adaptive",
    hot_every: int = 5, sink: str = "table", n_convs: int = 9973,
    source_bucketed: bool = False,
) -> dict:
    from radiant_portal_pipeline_spark.session import get_spark

    # 2x cores: the deployment guidance (session.py docstring) — measured
    # best at the hi level (6.13 vs 6.67 s @8c), neutral at the lo level,
    # with AQE coalescing absorbing the excess
    spark = get_spark(
        app_name=f"bench_merge_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    rec = _merge_replay_seconds(
        spark, n_events, mode, merge_plan, hot_every, sink=sink,
        n_convs=n_convs, source_bucketed=source_bucketed,
    )
    rec.update({"seconds": rec["apply_seconds"], "events": n_events, "cpus": cpus,
                "mode": mode, "merge_plan": merge_plan, "hot_every": hot_every,
                "buckets": merge_buckets(cpus), "sink": sink,
                "n_convs": n_convs, "source_bucketed": source_bucketed})
    return rec


def run_headline(sf_dir: str, cpus: int) -> dict[str, float]:
    from radiant_portal_pipeline_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entry.queries()
    # JVM/codegen warmup so the first headline query isn't charged for it
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def ivf_split(spark, sf_dir: str) -> dict:
    """IVF build vs query timed SEPARATELY (the lumped number buried
    ~all the cost in the build), plus the manifest-pruning evidence:
    the query opens only the probed buckets' files."""
    from pyspark.sql import functions as F

    from radiant_portal_pipeline_spark.sim import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").between(1, 8)).collect()
    ]
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    t0 = time.time()
    index = ann.build_ivf_index(
        spark, emb, cents, tempfile.mkdtemp(prefix="bench_ivf_") + "/index"
    )
    build_s = time.time() - t0
    t1 = time.time()
    ann.ivf_topk_indexed(index, cents, qvec, k=10, n_probes=2).count()
    query_s = time.time() - t1
    probe_ids = ann.rank_probe_buckets(cents, qvec, 2)
    opened = len(index.live_files(partitions=probe_ids))
    total = len(index.live_files())
    return {
        "build_s": round(build_s, 3),
        "query_s": round(query_s, 3),
        "files_opened": opened,
        "files_total": total,
    }


def durability_compare(sf_dir: str, cpus: int) -> dict:
    """Overhead of the executor-loss-safe iterative checkpointing
    (IterCheckpointer durable=True -> parquet rounds) vs the default
    localCheckpoint, on the real dedup_groups workload."""
    from radiant_portal_pipeline_spark.checkpoint import IterCheckpointer
    from radiant_portal_pipeline_spark.session import get_spark
    from radiant_portal_pipeline_spark.text import dedup as D

    spark = get_spark(
        app_name="bench_durability", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.exact_jaccard_pairs(
        docs, threshold=0.4, k=3, max_shingle_freq=50
    ).localCheckpoint(eager=True)  # pair generation excluded from timing
    out = {}
    for label, ck in (
        ("localCheckpoint", None),
        ("durable_parquet", IterCheckpointer(
            durable=True, base_dir=tempfile.mkdtemp(prefix="bench_cc_"))),
    ):
        t0 = time.time()
        n = D.dedup_groups(pairs, ck=ck).count()
        out[label] = {"seconds": round(time.time() - t0, 3), "nodes": n}
        if ck is not None:
            ck.close()
    lc, dp = out["localCheckpoint"]["seconds"], out["durable_parquet"]["seconds"]
    out["overhead_pct"] = round(100.0 * (dp - lc) / lc, 1) if lc else None
    return out


def _compact_cdc(cdc: dict) -> dict:
    """The headline slice of the merge evidence: default-plan absolute
    throughput at both levels, the pairwise-median efficiency, and
    one-number summaries of the weak-scaling / box-floor / null-sink /
    alt-plan evidence. Full records live in the detail file."""

    def lvl(rec: dict) -> dict:
        return {
            k: rec[k]
            for k in ("seconds", "events_per_sec", "compact_seconds", "buckets")
            if k in rec
        }

    out = {
        "events": cdc.get("events"),
        "protocol": cdc.get("protocol"),
        "levels": {k: lvl(v) for k, v in cdc.get("levels", {}).items()},
        "scaling_efficiency": cdc.get("scaling_efficiency"),
        "scaling_efficiency_best_of": cdc.get("scaling_efficiency_best_of"),
        "pairwise_efficiencies": cdc.get("pairwise_efficiencies"),
    }
    wk = cdc.get("weak_scaling", {})
    out["weak_scaling_eff"] = wk.get("efficiency", wk.get("error"))
    bf = cdc.get("box_floor", {})
    out["box_floor"] = (
        {k: bf[k] for k in ("cpu_bound_eff", "mem_stream_eff", "hash_agg_eff")
         if k in bf}
        or bf.get("error")
    )
    ns = cdc.get("null_sink", {})
    out["null_sink"] = {
        "scaling_efficiency": ns.get("scaling_efficiency", ns.get("error")),
        "hi_events_per_sec": max(
            (r.get("events_per_sec", 0) for r in ns.get("levels", {}).values()),
            default=None,
        ),
    }
    ap = cdc.get("alt_plan", {})
    out["alt_plan"] = {
        "plan": ap.get("plan"),
        "scaling_efficiency": ap.get("scaling_efficiency", ap.get("error")),
        "levels_events_per_sec": {
            k: v.get("events_per_sec") for k, v in ap.get("levels", {}).items()
        },
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merge-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--events", type=int, default=MERGE_EVENTS)
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    ap.add_argument(
        "--merge-plan", default="adaptive",
        choices=[
            "adaptive", "argmax", "argmax_broadcast", "hot_split",
            "append_only", "two_phase", "single_exchange",
        ],
    )
    ap.add_argument("--sink", default="table", choices=["table", "noop"])
    ap.add_argument(
        "--source-bucketed", action="store_true",
        help="merge-only: feed files bucket-clustered (keyed source "
             "model) + engine layout-exchange elision",
    )
    ap.add_argument(
        "--n-convs", type=int, default=None,
        help="conversation-key cardinality of the synthetic feed "
             "(merge-only default 9973; sustained derives from the "
             "profile: update=9973, insert=999983)",
    )
    ap.add_argument("--floor-probe", action="store_true")
    ap.add_argument(
        "--sustained", choices=["update", "insert"],
        help="sustained replay profile: --batches x --events per batch",
    )
    ap.add_argument(
        "--pace-sec", type=float, default=0.0,
        help="sustained mode: minimum seconds per batch slot (paced-"
             "stream model; idle gap = pace - apply time)",
    )
    ap.add_argument(
        "--overlap-compact", action="store_true",
        help="sustained mode: size-tiered concurrent-safe compaction in a "
             "background thread between applies (file-scoped rewrite commits)",
    )
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--hot-every", type=int, default=5)
    ap.add_argument("--no-scaling", action="store_true")
    ap.add_argument(
        "--plan-compare", action="store_true",
        help="run plans x skew-levels at --cpus and print one JSON table",
    )
    ap.add_argument(
        "--durability-compare", action="store_true",
        help="time dedup_groups with local vs durable checkpointing",
    )
    args = ap.parse_args()

    if args.floor_probe:
        print(json.dumps(floor_probe(args.cpus, args.events)))
        return

    if args.sustained:
        print(
            json.dumps(
                sustained(
                    args.cpus, args.events, args.batches, args.sustained,
                    args.merge_plan, overlap_compact=args.overlap_compact,
                    pace_sec=args.pace_sec, n_convs=args.n_convs,
                    source_bucketed=args.source_bucketed,
                )
            )
        )
        return

    if args.merge_only:
        print(
            json.dumps(
                merge_only(
                    args.cpus, args.events, args.mode, args.merge_plan,
                    args.hot_every, sink=args.sink,
                    n_convs=args.n_convs if args.n_convs else 9973,
                    source_bucketed=args.source_bucketed,
                )
            )
        )
        return

    if args.durability_compare:
        print(json.dumps({"metric": "durability_compare", "cpus": args.cpus,
                          **durability_compare(SF_DIR, args.cpus)}))
        return

    if args.plan_compare:
        # the adaptive-default evidence table: at each skew level the
        # adaptive chooser must match-or-beat the better static plan
        table = {}
        for hot in (5, 2):  # 20% / 50% of events to one conversation
            for plan in (
                "argmax", "argmax_broadcast", "two_phase",
                "single_exchange", "adaptive",
            ):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--merge-only",
                     "--cpus", str(args.cpus), "--events", str(args.events),
                     "--mode", args.mode, "--merge-plan", plan,
                     "--hot-every", str(hot)],
                    capture_output=True, text=True, timeout=1800,
                )
                if r.returncode != 0 or not r.stdout.strip():
                    raise RuntimeError(
                        f"plan-compare child (plan={plan}, hot={hot}) failed "
                        f"rc={r.returncode}: {r.stderr[-500:]}"
                    )
                rec = json.loads(r.stdout.strip().splitlines()[-1])
                rec["events_per_sec"] = round(rec["events"] / rec["seconds"], 1)
                table[f"hot{100 // hot}pct_{plan}"] = {
                    k: rec[k] for k in ("seconds", "events_per_sec")
                }
        print(json.dumps({"metric": "plan_compare", "cpus": args.cpus,
                          "events": args.events, "table": table}))
        return

    queries = run_headline(SF_DIR, args.cpus)

    from radiant_portal_pipeline_spark.session import get_spark

    ivf = ivf_split(get_spark(app_name="bench"), SF_DIR)
    queries["s_ann_ivf_build"] = ivf["build_s"]
    queries["s_ann_ivf_query"] = ivf["query_s"]

    cdc: dict = {
        "events": args.events,
        "levels": {},
        "runs_per_level": max(MERGE_RUNS, MERGE_RUNS_HI),
        "protocol": "interleaved",
    }
    if not args.no_scaling:
        lo, hi = SCALE_LEVELS

        def one_with_plan(level: int, plan: str, sink: str = "table") -> dict:
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--merge-only",
                    "--cpus",
                    str(level),
                    "--events",
                    str(args.events),
                    "--mode",
                    args.mode,
                    "--merge-plan",
                    plan,
                    "--hot-every",
                    str(args.hot_every),
                    "--sink",
                    sink,
                ],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            if r.returncode != 0 or not r.stdout.strip():
                raise RuntimeError(
                    f"merge-only child (cpus={level}, plan={plan}) failed "
                    f"rc={r.returncode}: {r.stderr[-500:]}"
                )
            return json.loads(r.stdout.strip().splitlines()[-1])

        def one(level: int) -> dict:
            return one_with_plan(level, args.merge_plan)

        # INTERLEAVE the two levels (lo,hi,lo,hi,...): this shared VM
        # drifts hour to hour, and running all lo reps then all hi reps
        # lets the drift masquerade as (anti-)scaling — alternating reps
        # sample both levels under the same box conditions
        best: dict[int, dict] = {}
        pair_eff: list[float] = []
        ratio = hi / lo
        for _ in range(max(MERGE_RUNS, MERGE_RUNS_HI)):
            pair = {}
            for level in (lo, hi):
                rec = one(level)
                pair[level] = rec
                if level not in best or rec["seconds"] < best[level]["seconds"]:
                    best[level] = rec
            # each interleaved (lo, hi) pair runs back-to-back under the
            # same box conditions -> its efficiency is drift-free; the
            # median over pairs is the artifact statistic
            tp = {lv: r["events"] / r["seconds"] for lv, r in pair.items()}
            pair_eff.append(round(tp[hi] / (tp[lo] * ratio), 3))
        for level, rec in best.items():
            rec["events_per_sec"] = round(rec["events"] / rec["seconds"], 1)
            cdc["levels"][str(level)] = rec
        cdc["pairwise_efficiencies"] = pair_eff

        # one (lo, hi) PAIR of the NON-default plan: the artifact then
        # records both sides of the plan trade like-for-like — absolute
        # throughput AND that plan's own pairwise scaling efficiency
        # (r2 continuity: two_phase was the r2 default, so its pair is
        # directly comparable to BENCH_r02)
        alt = "single_exchange" if args.merge_plan == "two_phase" else "two_phase"
        try:
            alt_pair = {lv: one_with_plan(lv, alt) for lv in (lo, hi)}
            for rec in alt_pair.values():
                rec["events_per_sec"] = round(rec["events"] / rec["seconds"], 1)
            tp_alt = {lv: r["events"] / r["seconds"] for lv, r in alt_pair.items()}
            cdc["alt_plan"] = {
                "plan": alt,
                "levels": {str(lv): alt_pair[lv] for lv in (lo, hi)},
                "scaling_efficiency": round(tp_alt[hi] / (tp_alt[lo] * ratio), 3),
            }
        except Exception as e:  # secondary evidence — never fail the bench
            cdc["alt_plan"] = {"plan": alt, "error": str(e)[:200]}

        # one (lo, hi) PAIR of the DEFAULT plan into the no-op sink:
        # same chooser + dedup + layout, zero file/commit work. Its
        # pairwise efficiency is the box's compute-scaling floor for
        # this exact plan — the gap between it and the table-sink
        # number is what write-side engineering could recover here
        try:
            ns_pair = {
                lv: one_with_plan(lv, args.merge_plan, sink="noop")
                for lv in (lo, hi)
            }
            for rec in ns_pair.values():
                rec["events_per_sec"] = round(rec["events"] / rec["seconds"], 1)
            tp_ns = {lv: r["events"] / r["seconds"] for lv, r in ns_pair.items()}
            cdc["null_sink"] = {
                "levels": {str(lv): ns_pair[lv] for lv in (lo, hi)},
                "scaling_efficiency": round(tp_ns[hi] / (tp_ns[lo] * ratio), 3),
            }
        except Exception as e:
            cdc["null_sink"] = {"error": str(e)[:200]}

        # box-floor calibration (fresh JVM per level): cpu_bound is the
        # box's clean-scaling ceiling, mem_stream its DRAM-streaming
        # floor; the merge's recorded efficiency should be read against
        # the mem_stream bracket, because a 4N-executor cluster
        # multiplies memory channels per node while 4N threads on this
        # box share one bus
        try:
            fp = {}
            for lv in (lo, hi):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--floor-probe", "--cpus", str(lv),
                     "--events", str(args.events)],
                    capture_output=True, text=True, timeout=1800,
                )
                if r.returncode != 0 or not r.stdout.strip():
                    raise RuntimeError(r.stderr[-300:])
                fp[lv] = json.loads(r.stdout.strip().splitlines()[-1])
            cdc["box_floor"] = {
                "levels": {str(lv): fp[lv] for lv in (lo, hi)},
                "cpu_bound_eff": round(
                    fp[lo]["cpu_bound"] / (fp[hi]["cpu_bound"] * ratio), 3
                ),
                "mem_stream_eff": round(
                    fp[lo]["mem_stream"] / (fp[hi]["mem_stream"] * ratio), 3
                ),
                "hash_agg_eff": round(
                    fp[lo]["hash_agg"] / (fp[hi]["hash_agg"] * ratio), 3
                ),
            }
        except Exception as e:
            cdc["box_floor"] = {"error": str(e)[:200]}

        # WEAK scaling: events proportional to cores (the deployment
        # question at 10^10 events is "4x the executors, 4x the feed,
        # same wall time?"). eff_weak = t_lo(W) / t_hi(4W); ideal 1.0.
        try:
            wk: dict[int, dict] = {}
            for _rep in range(2):  # interleaved min-of-2 (box drift)
                for lv, ev in ((lo, args.events // int(ratio)), (hi, args.events)):
                    r = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--merge-only", "--cpus", str(lv),
                         "--events", str(ev), "--mode", args.mode,
                         "--merge-plan", args.merge_plan,
                         "--hot-every", str(args.hot_every)],
                        capture_output=True, text=True, timeout=1800,
                    )
                    if r.returncode != 0 or not r.stdout.strip():
                        raise RuntimeError(r.stderr[-300:])
                    rec = json.loads(r.stdout.strip().splitlines()[-1])
                    if lv not in wk or rec["seconds"] < wk[lv]["seconds"]:
                        wk[lv] = rec
            cdc["weak_scaling"] = {
                "levels": {str(lv): wk[lv] for lv in (lo, hi)},
                "efficiency": round(wk[lo]["seconds"] / wk[hi]["seconds"], 3),
            }
        except Exception as e:
            cdc["weak_scaling"] = {"error": str(e)[:200]}
        lo_t = cdc["levels"][str(lo)]["events_per_sec"]
        hi_t = cdc["levels"][str(hi)]["events_per_sec"]
        # primary artifact: median of the per-pair efficiencies (each
        # pair cancels box drift); best-of-level ratio kept as the
        # secondary, drift-exposed statistic
        mid = sorted(pair_eff)[len(pair_eff) // 2] if pair_eff else None
        if pair_eff and len(pair_eff) % 2 == 0:
            se = sorted(pair_eff)
            mid = round((se[len(se) // 2 - 1] + se[len(se) // 2]) / 2, 3)
        cdc["scaling_efficiency"] = mid
        cdc["scaling_efficiency_best_of"] = round(hi_t / (lo_t * (hi / lo)), 3)
        queries["cdc_merge_replay"] = cdc["levels"][str(hi)]["seconds"]

    total = round(sum(queries.values()), 3)
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    full = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "ivf": ivf,
        "cdc_merge": cdc,
    }
    # FULL detail goes to a file; stdout gets a SIZE-BOUNDED headline
    # line. Round 4's official artifact recorded parsed:null because
    # the single JSON line outgrew the driver's tail capture once the
    # box_floor/null_sink/weak_scaling evidence was added — the
    # headline line must stay a few KB no matter how much detail the
    # protocol accumulates.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError as e:
        detail_path = f"unwritable({e})"
    print(json.dumps({**{k: v for k, v in full.items() if k != "cdc_merge"},
                      "cdc_merge": _compact_cdc(cdc),
                      "detail_file": os.path.basename(str(detail_path))}))


if __name__ == "__main__":
    main()
