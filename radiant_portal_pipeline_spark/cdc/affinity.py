"""Affinity-aware partition assignment — the reference's
``SequencingExperimentPartitionAssigner`` (radiant/tasks/starrocks/
partition.py:91-231, SURVEY.md A10/J10/ST9) re-expressed Spark-first.

The production CDC path uses deterministic hash bucketing
(``part_expr``) per the engine's design; this assigner exists for
workloads that need the reference's semantics instead:

- **affinity**: rows sharing an affinity key (here: the conversation's
  user / case analog) land in the partition that key already occupies;
- **occupancy caps**: each (strategy, part) holds at most ``cap``
  groups; new groups open new partitions when the current one fills;
- **strategy masks**: per-strategy partition id spaces (WGS 0x00000000 /
  WXS 0x00010000 in the reference).

Shape: the heavy lookup (existing assignment per affinity key) is a
grouped join + MAX(part) in Spark (J10); only the NEW affinity groups —
a per-batch-small aggregate — are assigned driver-side, exactly like
the reference's in-Python assigner over the fetched delta.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class AffinityConflict(ValueError):
    """Two affinity dimensions of one row point at DIFFERENT existing
    partitions — the reference treats this as a data error and aborts
    (radiant/tasks/starrocks/partition.py:134-141), never silently
    picks one."""


@dataclass
class Strategy:
    name: str
    mask: int
    cap: int  # affinity groups per partition


@dataclass
class AssignerState:
    """Bootstrapped from MAX(part)/COUNT per strategy (reference
    _bootstrap_state, partition.py:167-193)."""

    counters: dict[str, tuple[int, int]] = field(default_factory=dict)
    # strategy -> (current_part_without_mask, groups_in_current_part)


class AffinityPartitionAssigner:
    def __init__(self, strategies: list[Strategy], max_delta_rows: int = 100_000):
        self.strategies = {s.name: s for s in strategies}
        # stateful occupancy assignment folds the delta SEQUENTIALLY on
        # the driver (the reference's counters are inherently serial);
        # the cap turns "driver OOM three hours in" into an immediate,
        # actionable error
        self.max_delta_rows = int(max_delta_rows)

    def bootstrap(self, assigned: DataFrame) -> AssignerState:
        """``assigned``: (affinity_key, strategy, part) current state."""
        state = AssignerState()
        if assigned is None:
            return state
        rows = (
            assigned.groupBy("strategy", "part")
            .agg(F.countDistinct("affinity_key").alias("n"))
            .groupBy("strategy")
            .agg(
                F.max("part").alias("max_part"),
                F.max(F.struct(F.col("part"), F.col("n"))).alias("top"),
            )
            .collect()
        )
        for r in rows:
            strat = self.strategies[r["strategy"]]
            part = r["max_part"]
            state.counters[r["strategy"]] = (
                part - strat.mask,
                r["top"]["n"],
            )
        return state

    def assign(
        self, delta: DataFrame, assigned: DataFrame | None
    ) -> DataFrame:
        """Assign a partition to every delta row.

        1. affinity lookup: MAX(part) per (affinity_key, strategy) from
           existing state (grouped join — reference J10);
        2. new groups: deterministic driver-side packing under caps,
           ordered by (strategy, affinity_key) for replay stability.

        Returns delta columns + ``part``.
        """
        state = self.bootstrap(assigned)
        if assigned is not None:
            existing = assigned.groupBy("affinity_key", "strategy").agg(
                F.max("part").alias("_aff_part")
            )
            enriched = delta.join(existing, ["affinity_key", "strategy"], "left")
        else:
            enriched = delta.withColumn("_aff_part", F.lit(None).cast("int"))

        new_groups = (
            enriched.filter(F.col("_aff_part").isNull())
            .select("affinity_key", "strategy")
            .distinct()
            .orderBy("strategy", "affinity_key")
            .collect()
        )
        mapping: dict[tuple[str, str], int] = {}
        for r in new_groups:
            strat = self.strategies[r["strategy"]]
            cur, n = state.counters.get(r["strategy"], (0, 0))
            if n >= strat.cap:
                cur, n = cur + 1, 0
            state.counters[r["strategy"]] = (cur, n + 1)
            mapping[(r["strategy"], r["affinity_key"])] = strat.mask + cur

        if mapping:
            # broadcast join, NOT a create_map literal: a map expression
            # embeds O(groups) literals in the plan (Catalyst
            # expression-size limits, driver memory); the broadcast
            # frame ships once per executor and scales to arbitrarily
            # many new groups per batch
            spark = delta.sparkSession
            schema = T.StructType(
                [
                    T.StructField("strategy", T.StringType(), False),
                    T.StructField("affinity_key", T.StringType(), False),
                    T.StructField("_new_part", T.IntegerType(), False),
                ]
            )
            new_groups_df = spark.createDataFrame(
                [(s, k, int(p)) for (s, k), p in mapping.items()], schema
            )
            enriched = enriched.join(
                F.broadcast(new_groups_df), ["strategy", "affinity_key"], "left"
            )
            new_part = F.col("_new_part")
        else:
            enriched = enriched.withColumn("_new_part", F.lit(None).cast("int"))
            new_part = F.col("_new_part")
        return (
            enriched.withColumn(
                "part", F.coalesce(F.col("_aff_part"), new_part).cast("int")
            )
            .drop("_aff_part", "_new_part")
        )

    # ------------------------------------------------- multi-dimension

    def assign_multi(
        self,
        delta: DataFrame,
        assigned: DataFrame | None,
        affinity_cols: list[str],
        id_col: str = "row_id",
    ) -> DataFrame:
        """The reference's FULL affinity semantics: a row carries
        SEVERAL affinity dimensions (patient/seq/case/family in
        partition.py:102-165; the delta view enriches all four,
        staging_sequencing_experiment_delta_create_table.sql:13-97).
        A match on ANY dimension reuses that partition; matches on two
        dimensions pointing at different partitions raise
        ``AffinityConflict``; rows with no match are packed into
        partitions under the strategy cap, and every dimension value of
        an assigned row binds to its partition for LATER rows of the
        same batch (in-batch transitivity — the reference updates its
        key->part dicts as it walks the delta).

        Cap semantics mirror the reference exactly: the limit counts
        ROWS (experiments — 100 WGS / 1000 WXS per part), and an
        affinity-MATCHED row landing in the currently-open partition
        also counts toward it (partition.py:143-146 increments on
        reuse of the open id); matches into older partitions bypass
        the cap entirely.

        Scale shape: the state lookup is a distributed melt + equi-join
        + per-row collect_set (one shuffle keyed on (dim, key)); only
        the per-batch delta rows are walked driver-side — exactly the
        reference's design, which assumes the DELTA is small even when
        the STATE is huge. NULL dimension values are skipped.
        """
        dims = list(affinity_cols)
        key_struct = F.array(
            *[
                F.struct(
                    F.lit(c).alias("dim"), F.col(c).cast("string").alias("key")
                )
                for c in dims
            ]
        )

        if assigned is not None:
            melted_state = (
                assigned.select(
                    "strategy", "part", F.explode(key_struct).alias("_ak")
                )
                .select(
                    "strategy",
                    "part",
                    F.col("_ak.dim").alias("dim"),
                    F.col("_ak.key").alias("key"),
                )
                .filter(F.col("key").isNotNull())
                .distinct()
            )
            melted_delta = (
                delta.select(id_col, "strategy", F.explode(key_struct).alias("_ak"))
                .select(
                    id_col,
                    "strategy",
                    F.col("_ak.dim").alias("dim"),
                    F.col("_ak.key").alias("key"),
                )
                .filter(F.col("key").isNotNull())
            )
            matches = (
                melted_delta.join(melted_state, ["strategy", "dim", "key"])
                .groupBy(id_col)
                .agg(F.collect_set("part").alias("_parts"))
            )
            match_map = {
                r[id_col]: sorted(r["_parts"]) for r in matches.collect()
            }
        else:
            match_map = {}

        # cap check BEFORE the collect: the guard exists to convert a
        # driver OOM into an actionable error, so it must fire while
        # the data is still distributed (limit+count scans at most
        # cap+1 rows), not after a full .collect() already blew the heap
        probe = delta.limit(self.max_delta_rows + 1).count()
        if probe > self.max_delta_rows:
            raise ValueError(
                f"assign_multi got a >{self.max_delta_rows}-row delta; "
                f"stateful occupancy assignment is a DRIVER-side "
                f"sequential fold (the reference's design) capped at "
                f"{self.max_delta_rows} rows per batch — split the "
                f"delta into smaller batches or raise max_delta_rows"
            )
        rows = delta.select(id_col, "strategy", *dims).orderBy(
            "strategy", id_col
        ).collect()  # per-batch delta: small by design (see docstring)

        state = self.bootstrap(None)
        if assigned is not None:
            # seed occupancy from the highest (part, ROW count) pair per
            # strategy — the reference's _bootstrap_state takes exactly
            # max (max_part, max_count) (partition.py:167-193), and its
            # limits count rows, not groups
            occ = (
                assigned.groupBy("strategy", "part")
                .agg(F.count(F.lit(1)).alias("n"))
                .groupBy("strategy")
                .agg(F.max(F.struct(F.col("part"), F.col("n"))).alias("top"))
                .collect()
            )
            for r in occ:
                strat = self.strategies[r["strategy"]]
                state.counters[r["strategy"]] = (
                    r["top"]["part"] - strat.mask,
                    r["top"]["n"],
                )

        batch_bindings: dict[tuple[str, str, str], int] = {}
        out: dict = {}
        for r in rows:
            rid, strategy = r[id_col], r["strategy"]
            strat = self.strategies[strategy]
            candidates = set(match_map.get(rid, []))
            for d in dims:
                k = r[d]
                if k is None:
                    continue
                bound = batch_bindings.get((strategy, d, str(k)))
                if bound is not None:
                    candidates.add(bound)
            if len(candidates) > 1:
                raise AffinityConflict(
                    f"row {rid!r}: affinity dimensions point at partitions "
                    f"{sorted(candidates)} — inconsistent assignment state"
                )
            cur, n = state.counters.get(strategy, (0, 0))
            if candidates:
                part = candidates.pop()
                # reuse of the OPEN partition still occupies a slot
                # (reference partition.py:143-146); older partitions
                # bypass the cap
                if part == strat.mask + cur:
                    state.counters[strategy] = (cur, n + 1)
            else:
                if n >= strat.cap:
                    cur, n = cur + 1, 0
                state.counters[strategy] = (cur, n + 1)
                part = strat.mask + cur
            for d in dims:
                k = r[d]
                if k is not None:
                    batch_bindings[(strategy, d, str(k))] = part
            out[rid] = part

        # map assignments back via a broadcast join, NOT a literal
        # create_map: a map expression embeds O(rows) literals in the
        # plan (Catalyst expression-size limits, driver memory); the
        # broadcast frame ships once per executor
        spark = delta.sparkSession
        id_field = delta.schema[id_col]
        schema = T.StructType(
            [id_field, T.StructField("part", T.IntegerType(), False)]
        )
        assignments = spark.createDataFrame(
            [(rid, int(p)) for rid, p in out.items()], schema
        )
        return delta.join(F.broadcast(assignments), id_col, "left")
