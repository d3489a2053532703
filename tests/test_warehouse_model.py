"""Model-based testing of the warehouse DML state machine.

Hypothesis drives random op sequences — append, delete, update,
merge, vacuum, clustered vacuum — against a real warehouse AND a
plain-Python model of the table contents; after every op the two
must agree exactly. Single-op semantics are pinned by their own
suites; what THIS test hunts is interaction bugs (delete after
vacuum rewrites a base; merge after delete re-inserts; vacuum after
merge absorbs the upsert batch; ...) that no hand-written pairing
covers exhaustively.

Kept deliberately small (few examples, short sequences) — each op is
a real Spark job; the value is the randomized INTERLEAVING, not bulk.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from roborock_data_pipeline_spark import schemas
from roborock_data_pipeline_spark.sources import sinks

DEVICES = ["robo-a", "robo-b", "robo-c"]


def _row(device, day, area, status):
    ts = dt.datetime(2024, 3, day, 9)
    return (ts, device, ts, 30.0, float(area), "standard", "vacuum", 0, status)


def _key(r):
    return (r[1], r[0].day, r[4], r[8])


_ops = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(
                st.sampled_from(DEVICES),
                st.integers(1, 9),
                st.integers(1, 50),
            ),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("delete"), st.sampled_from(DEVICES)),
    st.tuples(
        st.just("update"), st.sampled_from(DEVICES), st.integers(51, 99)
    ),
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(st.sampled_from(DEVICES), st.integers(1, 9)),
            min_size=1,
            max_size=2,
            unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(st.just("vacuum"), st.integers(0, 2), st.booleans()),
)


@given(st.lists(_ops, min_size=2, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_dml_interleavings_match_model(spark, ops):
    wh = tempfile.mkdtemp()
    sinks.setup_warehouse(spark, wh)
    model: list[tuple] = []  # mirrors cleaning_records rows
    try:
        for op in ops:
            if op[0] == "append":
                rows = [_row(d, day, area, "ok") for d, day, area in op[1]]
                sinks.append_rows(
                    spark.createDataFrame(rows, schemas.CLEANING_RECORDS),
                    wh,
                    "cleaning_records",
                )
                model.extend(rows)
            elif op[0] == "delete":
                sinks.delete_rows(
                    spark, wh, "cleaning_records",
                    f"device_name = '{op[1]}'",
                )
                model = [r for r in model if r[1] != op[1]]
            elif op[0] == "update":
                device, area = op[1], op[2]
                sinks.update_rows(
                    spark, wh, "cleaning_records",
                    f"device_name = '{device}'",
                    {"area_sqm": str(float(area))},
                )
                model = [
                    r if r[1] != device
                    else r[:4] + (float(area),) + r[5:]
                    for r in model
                ]
            elif op[0] == "merge":
                src_rows = [
                    _row(d, day, 77, "merged") for d, day in op[1]
                ]
                sinks.merge_rows(
                    spark, wh, "cleaning_records",
                    spark.createDataFrame(
                        src_rows, schemas.CLEANING_RECORDS
                    ),
                    on=["device_name"],
                )
                by_dev = {r[1]: r for r in src_rows}
                merged = []
                for r in model:
                    s = by_dev.get(r[1])
                    # matched target rows take the source's non-key cols
                    merged.append(s if s is not None else r)
                matched = {r[1] for r in model}
                merged.extend(
                    s for d, s in by_dev.items() if d not in matched
                )
                model = merged
            elif op[0] == "vacuum":
                sinks.vacuum_table(
                    spark, wh, "cleaning_records", op[1],
                    cluster_by=["start_time"] if op[2] else None,
                )
            got = sorted(
                _key(tuple(r))
                for r in sinks.read_table(
                    spark, wh, "cleaning_records"
                ).collect()
            )
            assert got == sorted(_key(r) for r in model), (op, ops)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
