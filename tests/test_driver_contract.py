"""Adversarial driver-contract probe (VERDICT r12 #7).

The driver imports ``__spark_entry__`` into ITS OWN SparkSession —
built plain, with whatever defaults its environment carries. The
engine must self-configure via ``session.prepare()`` inside ``load()``
(UTC session timezone, AQE, the footer-sniffed ``events.ts`` parquet
unit) no matter how hostile the ambient session is.

This test rebuilds that situation exactly, in a SUBPROCESS (a second
in-process session would silently reuse the pytest session's JVM and
conf, proving nothing): non-UTC timezone, a pre-set shuffle-partition
count, a non-repo cwd — then runs ``entry()`` plus three probe
queries and asserts oracle parity against DuckDB at the test SF.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# the hostile ambient session a real driver might carry: non-UTC
# timezone, its own shuffle sizing, no engine confs
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    .appName("driver-contract-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

rows = E.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows"

sf = {sf!r}
qs, osql = E.queries(), E.oracle_sql()

import duckdb

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM "
        f"read_parquet('{{sf}}/{{t}}.parquet')"
    )


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for r in df.itertuples(index=False):
        out.append(tuple(
            f"{{v:.6f}}" if isinstance(v, float) else str(v) for v in r
        ))
    return sorted(out)


# probes: the flagship (timestamp bucketing — the timezone trap), a
# date-range filter (unit-sniff trap), and an event-time window
for q in ("q_daily_summary", "q_date_range_filter", "q_tumbling_window"):
    got = canon(qs[q](spark, sf).toPandas())
    want = canon(con.execute(osql[q]).df())
    assert got == want, f"{{q}}: {{len(got)}} vs {{len(want)}} rows or values differ"
    print(q, "ok", len(got))
print("DRIVER-CONTRACT-PASS")
"""


def test_entry_and_probes_under_hostile_session(sf_dir, tmp_path):
    code = _PROBE.format(repo=REPO, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),  # non-repo cwd, like the driver
        capture_output=True,
        text=True,
        timeout=480,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRIVER-CONTRACT-PASS" in proc.stdout, proc.stdout[-2000:]
