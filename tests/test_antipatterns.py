"""Static anti-pattern guard over the engine source — pins the
scale posture as a test instead of a per-round re-grep:

- ZERO row-at-a-time Python UDFs (the only Python on the hot path is
  Arrow-batched: pandas_udf / mapInPandas / applyInPandas);
- every crossJoin broadcasts a scalar/tiny side (or sits on the
  explicit allowlist with a reason);
- driver-side .collect() stays confined to the files where it is
  documented metadata-sized (dates, centroids, codebooks, manifest
  state) — a new collect anywhere forces a conscious allowlist edit;
- no RDD API on the query path (DataFrame-only engine).
"""

from __future__ import annotations

import os
import re

ENGINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "roborock_data_pipeline_spark",
)

# files allowed to call .collect(), with the maximum number of call
# sites; every one is driver-state-sized (dates / centroids /
# codebooks / audit scalars), never table rows. Raising a number
# here is a conscious review act.
COLLECT_ALLOW = {
    "plans/inspect.py": 1,       # plan-string capture for tests
    "operators/clustering.py": 2,  # k x d centroids
    "operators/similarity.py": 6,  # centroids + PQ codebooks
    "sources/export.py": 1,      # shard manifest (one row per shard)
    "sources/sinks.py": 2,       # audit scalar; delete/update affected-dir
                                 # list (dir names + counts, never rows)
    "pipeline.py": 2,            # touched-date list, CLI status rows
}

# crossJoin sites whose non-broadcast side is provably tiny
CROSSJOIN_ALLOW = {
    # date spine x distinct event types: both driver-small, and the
    # join IS the product being built (scaffold semantics)
    ("operators/layout.py", "spine_days.crossJoin(types)"),
    # two 1-row aggregates (recall gate): scalar x scalar
    ("operators/accuracy.py", "t.crossJoin(a)"),
}


def _engine_files():
    for root, _dirs, files in os.walk(ENGINE):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                yield os.path.relpath(p, ENGINE), open(p).read()


def test_no_row_at_a_time_python_udfs():
    pat = re.compile(r"F\.udf\(|@udf\b|udf\.register|UserDefinedFunction\(")
    hits = [
        f"{rel}: {m.group(0)}"
        for rel, src in _engine_files()
        for m in pat.finditer(src)
    ]
    assert hits == [], f"row-at-a-time UDFs introduced: {hits}"


def test_no_rdd_api_on_query_path():
    # .rdd / sparkContext.parallelize would bypass Catalyst entirely;
    # mapPartitions only exists as the DataFrame mapInPandas form
    pat = re.compile(r"\.rdd\b|parallelize\(|\.mapPartitions\(")
    hits = [
        f"{rel}: {m.group(0)}"
        for rel, src in _engine_files()
        for m in pat.finditer(src)
    ]
    assert hits == [], f"RDD API introduced: {hits}"


def test_crossjoins_broadcast_a_tiny_side():
    bad = []
    for rel, src in _engine_files():
        for line in src.splitlines():
            if "crossJoin" not in line:
                continue
            if "F.broadcast(" in line:
                continue
            if any(
                rel == f and snippet in line
                for f, snippet in CROSSJOIN_ALLOW
            ):
                continue
            bad.append(f"{rel}: {line.strip()}")
    assert bad == [], f"non-broadcast crossJoin introduced: {bad}"


def test_driver_collects_stay_metadata_sized():
    unexpected, over = [], []
    for rel, src in _engine_files():
        n = src.count(".collect()")
        if n == 0:
            continue
        cap = COLLECT_ALLOW.get(rel)
        if cap is None:
            unexpected.append(f"{rel}: {n}")
        elif n > cap:
            over.append(f"{rel}: {n} > {cap}")
    assert unexpected == [], f"collect() in new files: {unexpected}"
    assert over == [], f"collect() count grew: {over}"
