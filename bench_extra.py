"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; every extra measurement lives here — guide §1).

Modes:
  --headline [--repeats N]    time each headline query (same .count()
                              methodology as bench.py run_headline)
  --explain DIR               write .explain("formatted") for every
                              headline query to DIR/<name>_<tag>.txt
  --tag before|after          file suffix for --explain
  --noop                      additionally time a full-materialization
                              noop-sink write per query (guide §1.4)
  --queries a,b,c             restrict to a subset
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--cpus", type=int, default=CPUS)
    args = ap.parse_args()

    from radiant_portal_pipeline_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench_extra", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    qs = entry.queries()
    names = args.queries.split(",") if args.queries else HEADLINE

    # same warmup as bench.py run_headline
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()

    out: dict = {"sf_dir": SF_DIR, "cpus": args.cpus, "times": {}}
    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
    for name in names:
        if args.explain:
            df = qs[name](spark, SF_DIR)
            with open(
                os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        if args.headline:
            samples = []
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"headline:{name}")
                t0 = time.time()
                qs[name](spark, SF_DIR).count()
                samples.append(round(time.time() - t0, 3))
            rec = {"count": samples}
            if args.noop:
                noops = []
                for _ in range(args.repeats):
                    spark.sparkContext.setJobDescription(f"noop:{name}")
                    t0 = time.time()
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    noops.append(round(time.time() - t0, 3))
                rec["noop"] = noops
            out["times"][name] = rec
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
