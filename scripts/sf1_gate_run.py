"""Run the two cap-engaged accuracy gates AT THE PRODUCTION CAP on
the sf1 corpus (VERDICT r9 next-round #3, closing "the gates only
ever run at GATE_CAP=16").

The r9 gates (operators/accuracy.py q_semantic_dedup_check /
q_knn_join_check) force engagement at every test SF via GATE_CAP=16
on a twin-augmented corpus; the sf1 sweep runs the real
BLOCK_CAP=1024 but checks capped == uncapped equality, not the
gates' recall/ratio predicates. This script closes the quadrant: the
twin-augmented sf1 corpus (40k vectors, blocks ~4,000-4,360 against
cap=1024 → g ≈ 4.3, 3 signature bits — squarely inside the banded
sub-split's 64-way envelope) with the gate predicates evaluated
against an engine-side UNCAPPED exact truth, exactly as at test SF.

Usage:
    python scripts/make_scale_data.py          # once (sf1)
    python scripts/sf1_gate_run.py
Writes /root/repo/CORRECTNESS_SF1_GATES.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF1 = "/root/repo/.scale/sf1"
OUT = "/root/repo/CORRECTNESS_SF1_GATES.json"


def main() -> None:
    if not os.path.isdir(SF1):
        sys.exit("run scripts/make_scale_data.py first")

    from roborock_data_pipeline_spark.operators import accuracy, similarity
    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-sf1-gates")
    spark.sparkContext.setLogLevel("ERROR")

    # the production cap, not the test forcing constant
    accuracy.GATE_CAP = similarity.BLOCK_CAP

    report: dict[str, object] = {
        "corpus": SF1,
        "cap": similarity.BLOCK_CAP,
        "note": (
            "cap-engaged gates at the PRODUCTION cap on the "
            "twin-augmented sf1 corpus; truth side is the engine's "
            "uncapped exact all-pairs/knn run (quadratic, hence "
            "script-run rather than per-round)"
        ),
    }
    ok = True
    for name, fn in (
        ("q_semantic_dedup_check", accuracy.q_semantic_dedup_check),
        ("q_knn_join_check", accuracy.q_knn_join_check),
    ):
        t0 = time.perf_counter()
        row = fn(spark, SF1).collect()[0].asDict()
        wall = round(time.perf_counter() - t0, 1)
        gates = {
            k: v for k, v in row.items()
            if k.endswith("_ok") and isinstance(v, bool)
        }
        passed = all(gates.values())
        ok = ok and passed
        report[name] = {"pass": passed, "wall_s": wall, **row}
        print(f"{name}: {'PASS' if passed else 'FAIL'} {row} ({wall}s)",
              flush=True)

    report["all_pass"] = ok
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True, default=str)
    print(json.dumps({"all_pass": ok, "out": OUT}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
