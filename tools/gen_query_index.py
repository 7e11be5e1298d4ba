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
    from radiant_portal_pipeline_spark.operators.registry import REGISTRY

    entry.queries()  # ensure registry populated
    print("# QUERIES — driver-contract registry index (generated)\n")
    print("Regenerate with `python tools/gen_query_index.py > QUERIES.md`.\n")
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    print(f"{len(REGISTRY)} queries; {n_oracle} DuckDB-oracle-checked, "
          f"{len(REGISTRY) - n_oracle} rows-only (no SQL twin).\n")
    print("| query | check | summary |")
    print("|---|---|---|")
    for name, q in REGISTRY.items():
        kind = "oracle" if q.oracle is not None else "rows-only"
        doc = " ".join((q.doc or "").strip().split("\n\n")[0].split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        print(f"| `{name}` | {kind} | {doc} |")


if __name__ == "__main__":
    main()
