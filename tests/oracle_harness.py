"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet directory, canonicalizes both results (columns
sorted by name, rows sorted by all columns, values stringified), and
diffs them. Used by tests/test_oracle_parity.py and runnable
standalone: python tests/oracle_harness.py [query ...]
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
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
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


def main() -> int:
    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark

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
