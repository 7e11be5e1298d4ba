"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
training-data operators) as named callables; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible one. The registry lives
in ``radiant_portal_pipeline_spark.operators.registry`` and is populated
by importing the operator modules below.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# populate the registry
import radiant_portal_pipeline_spark.operators.relational  # noqa: F401,E402
import radiant_portal_pipeline_spark.operators.relational2  # noqa: F401,E402
import radiant_portal_pipeline_spark.operators.relational3  # noqa: F401,E402
import radiant_portal_pipeline_spark.cdc.queries  # noqa: F401,E402

# text / similarity / multimodal operator packs. These must fail LOUDLY:
# a swallowed ImportError silently removes whole operator packs from the
# driver's correctness gate (round-1 failure signature: all t_* queries
# present, all s_*/m_* absent).
for _mod in (
    "radiant_portal_pipeline_spark.sim.queries",
    "radiant_portal_pipeline_spark.multimodal.queries",
    "radiant_portal_pipeline_spark.streaming.queries",
    "radiant_portal_pipeline_spark.text.queries",
):
    try:
        __import__(_mod)
    except BaseException as _e:  # noqa: BLE001 — log context, then re-raise
        print(
            f"FATAL: operator pack {_mod} failed to import: {_e!r}",
            file=sys.stderr,
        )
        raise

from radiant_portal_pipeline_spark.operators.registry import (  # noqa: E402
    REGISTRY,
    ordered_registry,
)

# The driver adjudicates the FIRST 50 entries in iteration order.
# ordered_registry() serves them per the DISCLOSED rotation policy
# (registry.py gate comment): new queries, then least-recently
# adjudicated, then the always-gated CDC flagship pack, then last
# round's family representatives — every registered query is externally
# adjudicated at least once per two consecutive rounds.
_ORDERED = ordered_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["cdc_lww_final_state"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ORDERED.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _ORDERED.items() if q.oracle is not None}
