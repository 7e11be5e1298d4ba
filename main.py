"""spark-submit entrypoint for the transcript CDC engine.

Usage (cluster):
    zip -r pkg.zip radiant_portal_pipeline_spark/
    spark-submit --py-files pkg.zip main.py <command> [options]

Commands:
    datagen  --events N --out DIR [--convs N] [--dup-frac F]
             [--ooo-window W] — write a deterministic change feed
    replay   --feed DIR --table DIR [--mode mor|cow] [--buckets N]
             [--lineage DIR] — batch-apply the feed epoch by epoch
    stream   --feed DIR --table DIR --checkpoint DIR [...] — tail the
             feed via Structured Streaming (availableNow drain;
             rerunning resumes from the checkpoint)
    compact  --table DIR [--buckets N] — fold MoR deltas
    state    --table DIR [--limit N] — show current (post-LWW) state
    stats    --table DIR --stats DIR — refresh + show derived
             per-conversation aggregates

In local mode the session master comes from SPARK_GRAFT_CPUS; under
spark-submit the cluster master wins (getOrCreate keeps the submitted
conf, and --master is never overridden here).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(args):
    from pyspark.sql import SparkSession

    from radiant_portal_pipeline_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:  # spark-submit already created one
        return active
    if os.environ.get("SPARK_SUBMIT_MODE"):
        return SparkSession.builder.getOrCreate()
    return get_spark(app_name=f"cdc_{args.cmd}")


def main() -> None:
    ap = argparse.ArgumentParser(prog="transcripts-cdc")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("datagen")
    p.add_argument("--events", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--convs", type=int, default=97)
    p.add_argument("--dup-frac", type=float, default=0.0)
    p.add_argument("--ooo-window", type=int, default=0)

    for name in ("replay", "stream"):
        p = sub.add_parser(name)
        p.add_argument("--feed", required=(name == "replay"),
                       help="file-source feed dir (or use --wal-events)")
        p.add_argument("--table", required=True)
        p.add_argument("--mode", default="mor", choices=["mor", "cow"])
        p.add_argument("--buckets", type=int, default=None)  # None = table's stored value (64 for new tables)
        p.add_argument("--lineage")
        if name == "stream":
            p.add_argument("--checkpoint", required=True)
            p.add_argument("--max-files-per-trigger", type=int)
            p.add_argument("--wal-events", type=int, default=None,
                           help="tail the LSN-offset WAL source up to "
                                "this LSN instead of a file feed")
            p.add_argument("--wal-batch-size", type=int, default=100_000)

    p = sub.add_parser("compact")
    p.add_argument("--table", required=True)
    p.add_argument("--buckets", type=int, default=None)  # None = table's stored value (64 for new tables)
    p.add_argument("--min-files", type=int, default=None,
                   help="fold only buckets holding >= this many files")
    p.add_argument("--small-file-bytes", type=int, default=None,
                   help="also fold buckets whose mean file size is below this")

    p = sub.add_parser("state")
    p.add_argument("--table", required=True)
    p.add_argument("--limit", type=int, default=20)

    p = sub.add_parser("stats")
    p.add_argument("--table", required=True)
    p.add_argument("--stats", required=True)
    p.add_argument("--buckets", type=int, default=None)  # None = table's stored value (64 for new tables)

    args = ap.parse_args()
    spark = _spark(args)

    from radiant_portal_pipeline_spark.cdc.feed import synthetic_feed
    from radiant_portal_pipeline_spark.cdc.lineage import LineageWriter
    from radiant_portal_pipeline_spark.cdc.merge import TranscriptMergeEngine
    from radiant_portal_pipeline_spark.lake import LakeTable

    def engine_for(table_path: str, mode: str = "mor", buckets: int | None = None, lineage=None):
        if LakeTable.exists(table_path):
            tbl = LakeTable(spark, table_path)  # stored num_buckets wins
        else:
            tbl = TranscriptMergeEngine.create_table(
                spark, table_path, num_buckets=buckets if buckets else 64
            )
        return TranscriptMergeEngine(
            tbl, num_buckets=buckets, mode=mode, lineage=lineage
        )

    if args.cmd == "datagen":
        feed = synthetic_feed(
            spark,
            args.events,
            n_convs=args.convs,
            dup_frac=args.dup_frac,
            ooo_window=args.ooo_window,
        )
        feed.repartition("commit_epoch").write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.events} events to {args.out}")

    elif args.cmd == "replay":
        # batch replay IS the streaming path with an availableNow drain:
        # micro-batches come from the file-source + checkpoint, never
        # from a driver-side distinct().collect() over the feed (that
        # round-1 form ran one full feed scan PER epoch — it would
        # never finish at the 10^4-batch design point). Re-running with
        # the same table resumes from the replay checkpoint.
        from radiant_portal_pipeline_spark.cdc.stream import run_cdc_stream

        lineage = LineageWriter(spark, args.lineage) if args.lineage else None
        eng = engine_for(args.table, args.mode, args.buckets, lineage)
        res = run_cdc_stream(
            spark,
            args.feed,
            eng,
            os.path.join(args.table, "_replay_ckpt"),
            max_files_per_trigger=1,
        )
        for st in res.batches:
            print(
                f"batch {st.epoch}: skipped={st.skipped} "
                f"parts={st.parts_touched} {st.seconds:.2f}s"
            )

    elif args.cmd == "stream":
        from radiant_portal_pipeline_spark.cdc.stream import run_cdc_stream

        lineage = LineageWriter(spark, args.lineage) if args.lineage else None
        eng = engine_for(args.table, args.mode, args.buckets)
        source_df = None
        if args.wal_events is not None:
            from radiant_portal_pipeline_spark.cdc.wal_source import (
                wal_readstream,
            )

            source_df = wal_readstream(
                spark, n_events=args.wal_events,
                batch_size=args.wal_batch_size,
            )
        elif not args.feed:
            raise SystemExit("stream needs --feed or --wal-events")
        res = run_cdc_stream(
            spark,
            args.feed,
            eng,
            args.checkpoint,
            lineage=lineage,
            max_files_per_trigger=args.max_files_per_trigger,
            source_df=source_df,
        )
        applied = [b.epoch for b in res.batches if not b.skipped]
        print(f"stream drained; applied batches: {applied}")

    elif args.cmd == "compact":
        eng = engine_for(args.table, buckets=args.buckets)
        done = eng.compact(
            min_files_per_bucket=args.min_files,
            small_file_bytes=args.small_file_bytes,
        )
        print(f"compacted {len(done)} bucket(s) in {args.table}")

    elif args.cmd == "state":
        eng = engine_for(args.table)
        df = eng.current_state().orderBy("conv_id", "turn_idx")
        print(f"rows: {df.count()}")
        df.show(args.limit, truncate=40)

    elif args.cmd == "stats":
        from radiant_portal_pipeline_spark.cdc.analytics import ConversationStats

        eng = engine_for(args.table, buckets=args.buckets)
        stats = ConversationStats(spark, args.stats, eng)
        stats.refresh()
        stats.global_rollup().show()


if __name__ == "__main__":
    main()
