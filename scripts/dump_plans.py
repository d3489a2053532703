"""Regenerate PLANS.md: the formatted physical plan of every
registered query at sf0.001 — the artifact the per-round plan audits
read. Committed as a script (r9) so the dump is reproducible instead
of session-lore.

Usage:  python scripts/dump_plans.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/root/repo/PLANS.md")
    args = ap.parse_args()

    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    lines = ["# Physical plans (sf0.001, local)", ""]
    for name, spec in sorted(all_queries().items()):
        spark.catalog.clearCache()
        try:
            plan = spec.fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - record, don't die
            plan = f"<plan unavailable: {exc}>"
        lines += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
        print(name, flush=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(all_queries())} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
