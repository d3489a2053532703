"""Adjudicate the driver's per-round bench tail against the isolated
min-of-N history (VERDICT r11 "what's wrong #1").

The driver's BENCH_rN runs land on a shared box whose load swings;
its per-query tail routinely shows sub-second queries 1.5-2x slower
than the previous round with no plan change. The committed isolated
history (BENCH_BEST: min-of-N per round at near-zero load) is the
ground truth for plan regressions. This script makes the judge's
call mechanical with the same two-signal discipline BENCH_SCALE
uses: a query is FLAGGED only when BOTH

- driver ratio   = driver tail time this round / previous round, and
- isolated ratio = a FRESH builder rerun (BENCH_DETAIL — written
  ONLY by SPARK_GRAFT_BENCH_ISOLATED=1 runs since r13, so the
  driver's unattended run can no longer clobber it; start load must
  be <= 1.0 ABSOLUTE — the old <30%-of-cores bar accepted a load-2.9
  box; end load is bench-driven on every run and carries no
  isolation signal) / the min of the BENCH_BEST history window (the
  best the query has done recently — old fast samples survive a
  drifting box)

exceed the bar. A driver-only spike is box noise (CLEARED by
isolated evidence); an isolated-only spike with a quiet driver tail
is a one-off isolated run artifact (also cleared — the next round's
min absorbs it); both together is a real regression. If BENCH_DETAIL
is not isolated, the script says so and demands a fresh
`SPARK_GRAFT_BENCH_ISOLATED=1 python bench.py` on an idle box before
adjudicating. Driver runs write BENCH_DRIVER_* and are never read
here as isolated evidence.

Usage: python scripts/bench_adjudicate.py [N]  (default: newest
BENCH_r*.json) — writes BENCH_ADJUDICATION.json. Regenerate each
round: run `python bench.py` on an idle box, then this script, after
the driver records BENCH_rN.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BAR = 1.5
# Same absolute-damage guard as bench.py's regression gate (r4
# evidence: per-session variance of an UNCHANGED sub-second query is
# up to ~1.5x on this box): an isolated sample must be BOTH >BAR over
# the history floor AND >=0.3s absolute above it to corroborate a
# driver spike — the floor is a min over the window, so one lucky
# outlier sample would otherwise set an unmeetable bar for every
# later honest run (the min-ratchet failure mode VERDICT r5 #3
# removed from the bench gate itself).
ABS_S = 0.3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tail_times(path: str) -> dict[str, float]:
    """Per-query seconds from a BENCH_rN record. The driver keeps only
    the TAIL of the bench stdout, so the first key/value pair may be
    truncated — the regex simply skips anything malformed."""
    with open(path) as fh:
        rec = json.load(fh)
    tail = rec.get("tail", "")
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q_[a-z0-9_]+)":\s*([0-9.]+)', tail)
    }


def main() -> int:
    rounds = sorted(
        int(re.search(r"BENCH_r(\d+)\.json", f).group(1))
        for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    )
    n = int(sys.argv[1]) if len(sys.argv) > 1 else rounds[-1]
    prev = max(r for r in rounds if r < n)
    cur_t = _tail_times(os.path.join(REPO, f"BENCH_r{n:02d}.json"))
    prev_t = _tail_times(os.path.join(REPO, f"BENCH_r{prev:02d}.json"))
    # r14 (VERDICT r13 #1): the BENCH_rN tail is TRUNCATED (the driver
    # keeps only the last ~4 KB of stdout), so tail∩tail misses most
    # of the suite. Since r13 the driver's full per-query record lands
    # in BENCH_DRIVER_DETAIL.json — when its headline total matches
    # this round's BENCH_rN (same run), use it as the complete
    # current-round driver evidence.
    try:
        with open(os.path.join(REPO, "BENCH_DRIVER_DETAIL.json")) as fh:
            drv = json.load(fh)
        with open(os.path.join(REPO, f"BENCH_r{n:02d}.json")) as fh:
            parsed = json.load(fh).get("parsed") or {}
        if drv.get("value") == parsed.get("value"):
            cur_t = {**drv.get("queries", {}), **cur_t}
    except (OSError, ValueError):
        pass
    best = json.load(open(os.path.join(REPO, "BENCH_BEST.json")))
    history = best.get("history", {})
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    cpus = detail.get("cpus", 32)
    starts = detail.get("load_1m_start", 99)
    starts = starts if isinstance(starts, list) else [starts]
    # r13: absolute bar (<= 1.0) + the run must self-identify as an
    # isolated (builder) run — a driver artifact can't masquerade
    detail_isolated = all(s <= 1.0 for s in starts) and detail.get(
        "isolated_run_flag", True  # pre-r13 records carry no flag
    )
    iso_t = detail.get("queries", {}) if detail_isolated else {}
    if not detail_isolated:
        print(
            "WARNING: BENCH_DETAIL.json is NOT an isolated run "
            f"(start load {starts} on {cpus} cores) — run "
            "`SPARK_GRAFT_BENCH_ISOLATED=1 python bench.py` on an "
            "idle box first; adjudicating from the history window "
            "only."
        )

    queries: dict[str, dict] = {}
    flagged, cleared = [], []
    for q in sorted(cur_t):
        # previous-round driver time when the truncated r(N-1) tail
        # carries it; otherwise the history min stands in as the
        # "what this query normally costs" reference for the driver
        # ratio (a driver sample way above the committed floor is the
        # same contamination signal — cleared/flagged by the SAME
        # isolated second signal either way)
        h0 = history.get(q) or []
        ref = prev_t.get(q) if prev_t.get(q) else (min(h0) if h0 else None)
        dr = round(cur_t[q] / ref, 3) if ref else None
        h = history.get(q) or []
        # isolated evidence: the fresh isolated rerun vs the best the
        # query has done in the committed history window (min absorbs
        # driver-contaminated samples that entered the window)
        iso = iso_t.get(q)
        floor = min(h) if h else None
        ir = (
            round(iso / floor, 3)
            if iso is not None and floor
            else None
        )
        row = {
            "driver_s": cur_t[q],
            "driver_prev_s": prev_t.get(q),
            "driver_ref_s": ref,
            "driver_ratio": dr,
            "isolated_s": iso,
            "history_min_s": floor,
            "isolated_ratio": ir,
        }
        if dr is not None and dr > BAR:
            if ir is None:
                row["verdict"] = (
                    "UNADJUDICATED (no isolated evidence - run "
                    "bench.py on an idle box)"
                )
                flagged.append(q)  # unproven ≠ cleared: surface it
            elif ir > BAR and iso - floor >= ABS_S:
                row["verdict"] = "FLAGGED (driver AND isolated regressed)"
                flagged.append(q)
            elif ir > BAR:
                row["verdict"] = (
                    "cleared (isolated ratio over the history-min "
                    f"floor but < {ABS_S}s absolute - within this "
                    "box's measured sub-second noise; the floor is a "
                    "window min, so one lucky sample does not set the "
                    "bar)"
                )
                cleared.append(q)
            else:
                row["verdict"] = (
                    "cleared (driver spike not reproduced by the "
                    "isolated rerun - box noise)"
                )
                cleared.append(q)
            queries[q] = row
        elif ir is not None and ir > BAR:
            row["verdict"] = (
                "cleared (isolated one-off; driver tail quiet)"
            )
            cleared.append(q)
            queries[q] = row
    out = {
        "round": n,
        "vs_round": prev,
        "bar": BAR,
        "isolated_evidence": (
            "BENCH_DETAIL.json (isolated run)"
            if detail_isolated
            else "UNAVAILABLE - BENCH_DETAIL not isolated; history-only"
        ),
        "rule": (
            "flag iff driver_ratio > bar AND isolated_ratio > bar "
            f"AND isolated exceeds the history floor by >= {ABS_S}s "
            "absolute (bench.py's own noise guard)"
        ),
        "n_compared": len(cur_t),
        "n_prev_tail_overlap": len(set(cur_t) & set(prev_t)),
        "flagged": flagged,
        "cleared": cleared,
        "queries": queries,
    }
    path = os.path.join(REPO, "BENCH_ADJUDICATION.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"r{n} vs r{prev}: {len(cur_t)} compared "
        f"({len(set(cur_t) & set(prev_t))} via prev tail, rest via "
        f"history floor), {len(flagged)} flagged, {len(cleared)} "
        f"cleared -> {path}"
    )
    for q in flagged:
        print(f"  FLAGGED {q}: {queries[q]}")
    for q in cleared:
        print(f"  cleared {q}: driver x{queries[q]['driver_ratio']}, "
              f"isolated x{queries[q]['isolated_ratio']}")
    return 1 if any(
        "FLAGGED" in queries[q].get("verdict", "") for q in flagged
    ) else 0


if __name__ == "__main__":
    raise SystemExit(main())
