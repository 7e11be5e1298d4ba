"""Generate QUERIES.md — an audit index of every registered driver-
contract query: name, oracle status, first docstring line.

    python tools/gen_query_index.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry
    from radiant_portal_pipeline_spark.operators.registry import (
        GATE_ORDER,
        REGISTRY,
        ordered_registry,
    )

    entry.queries()  # ensure registry populated
    ordered = ordered_registry()
    print("# QUERIES — driver-contract registry index (generated)\n")
    print("Regenerate with `python tools/gen_query_index.py > QUERIES.md`.\n")
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    print(f"{len(REGISTRY)} queries; {n_oracle} DuckDB-oracle-checked, "
          f"{len(REGISTRY) - n_oracle} rows-only (no SQL twin).\n")
    print(
        "The external driver adjudicates the FIRST 50 entries, so "
        "positions 1-50 follow the DISCLOSED rotation policy "
        "(registry.py gate comment): new queries first, then the "
        "least-recently adjudicated, then the always-gated CDC "
        "flagship pack, then last round's family representatives. "
        "Positions 51+ were all green in the previous round's "
        "CORRECTNESS file and rotate back next round — still "
        "registered, still pytest- and local-oracle-covered.\n"
    )
    print("| # | query | check | summary |")
    print("|---|---|---|---|")
    for pos, (name, q) in enumerate(ordered.items(), 1):
        kind = "oracle" if q.oracle is not None else "rows-only"
        if pos <= len(GATE_ORDER):
            kind += " (gated)"
        doc = " ".join((q.doc or "").strip().split("\n\n")[0].split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        print(f"| {pos} | `{name}` | {kind} | {doc} |")


if __name__ == "__main__":
    main()
