"""Regenerate CATALOG.md from the live registry (driver-gate order).

Usage: python scripts/gen_catalog.py   (from the repo root)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from kafka_streaming_polymarket_pipeline_spark.plans import registry  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark import plans  # noqa: E402,F401  (side-effect: registers everything)
import __spark_entry__  # noqa: E402,F401  (ensures the full registration path runs)


def main() -> None:
    ordered = registry._ordered()
    lines = [
        "# Query catalog",
        "",
        "Auto-generated from `plans/registry.py` by `scripts/gen_catalog.py`.",
        "Order = driver-gate order: the correctness gate records the first 50",
        "rows each round (see COVERAGE.md for cross-round union coverage).",
        "",
        "| # | Query | Oracle | Summary |",
        "|---|---|---|---|",
    ]
    for i, q in enumerate(ordered, 1):
        kind = "SQL hash" if q.oracle else "rows-only (by design)"
        first = next(iter((q.doc or "").strip().splitlines()), "")
        first = first.replace("|", "\\|")[:64]
        lines.append(f"| {i} | `{q.name}` | {kind} | {first} |")
    lines.append("")
    lines.append(f"Total: {len(ordered)} registered queries.")
    lines.append("")
    open("CATALOG.md", "w").write("\n".join(lines))
    print(f"CATALOG.md regenerated: {len(ordered)} queries")


if __name__ == "__main__":
    main()
