"""Versioned-directory publish: whole-surface swaps through the
commit-provider seam (VERDICT r12 missing-#1).

Three surfaces used to publish a complete new directory by a
TWO-rename swap (move the live dir aside, move the staged dir in):
the IVF-PQ index rebuild, the semantic index's frozen centroids, and
the JSONL training-shard export (the incremental gold snapshot used
the same pattern). A kill between the two renames leaves NOTHING
visible until manual recovery, and on an object store each rename is
a non-atomic mass copy. This module replaces the pattern with the
same pointer-manifest discipline the warehouse batch log and the
index segment layer adopted:

- new content stages under ``root/.staging-<hex>`` (invisible),
- a millisecond naming section (``commit_provider.naming_lock``)
  renames it to ``root/v-{gen}`` — still invisible, pure naming —
- THE commit is one ``commit_provider.commit_pointer`` swap of
  ``root/_current.json`` naming the live version dir (verified
  read-back: an ACKed-but-lost PUT fails the publish whole),
- superseded version dirs are GC'd with one publish of grace (the
  previous live version survives until the NEXT publish commits, so
  a reader mid-scan on the old version keeps its files).

A crash anywhere leaves the OLD version live: before the pointer
swap the new ``v-{gen}`` dir is an invisible orphan (clobbered by the
next publish's naming section); after the swap the publish is
complete and only GC remains (re-run by the next publish).

Legacy layout: a root whose data sits directly in ``root`` (written
by the pre-seam code) stays readable — ``resolve`` returns ``root``
itself when no pointer exists. The first versioned publish leaves the
legacy files in place (they ARE the previous live version, so they
get the same one-publish grace); the second publish removes them.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from roborock_data_pipeline_spark.sources import commit_provider

CURRENT_POINTER = "_current.json"

# naming section is [orphan clobber + one rename + one pointer swap]
_LOCK_TTL_S = 60.0

# staging dirs are cleaned by their writer's `finally`; a kill -9
# orphan is swept by any later publish once it is unambiguously dead
_STALE_STAGING_S = 3600.0


def _lock(root: str):
    return commit_provider.naming_lock(
        os.path.join(root, ".lock-version"),
        f"versioned dir {root!r}",
        _LOCK_TTL_S,
    )


def _pointer(root: str) -> dict | None:
    """The committed version pointer, or None (legacy / fresh root).
    Present-but-corrupt raises loudly: falling back to the legacy
    listing would serve a superseded (possibly GC'd) version."""
    raw = commit_provider.read_pointer(os.path.join(root, CURRENT_POINTER))
    if raw is None:
        return None
    try:
        m = json.loads(raw)
        return {"generation": int(m["generation"]), "dir": str(m["dir"])}
    except (ValueError, KeyError, TypeError) as exc:
        raise ValueError(
            f"corrupt version pointer in {root!r}: {exc} — restore "
            "_current.json from the previous generation"
        ) from exc


def staging_dir(root: str) -> str:
    """A fresh invisible staging dir under ``root`` for the writer to
    fill (Spark writes land here). The caller's ``finally`` should
    remove it; publish() sweeps dead orphans past the staleness bar."""
    os.makedirs(root, exist_ok=True)
    staged = os.path.join(root, f".staging-{uuid.uuid4().hex[:8]}")
    os.makedirs(staged)
    return staged


def resolve(root: str) -> str | None:
    """The live data directory: pointer-named version dir when
    committed, else the legacy root itself (pre-seam layout), else
    None for an empty/absent root."""
    m = _pointer(root)
    if m is not None:
        live = os.path.join(root, m["dir"])
        if not os.path.isdir(live):
            raise ValueError(
                f"version pointer in {root!r} names {m['dir']!r} but the "
                "directory is missing — the live version was deleted out "
                "from under the committed pointer"
            )
        return live
    if not os.path.isdir(root):
        return None
    legacy = [
        d for d in os.listdir(root) if not d.startswith((".", "_", "v-"))
    ]
    return root if legacy else None


def generation(root: str) -> int | None:
    """Live generation number (None = legacy or fresh)."""
    m = _pointer(root)
    return m["generation"] if m is not None else None


def publish(root: str, staged: str) -> str:
    """Commit ``staged`` as the new live version of ``root`` and
    return the live path. One pointer swap is the commit; superseded
    versions get one publish of grace (module docstring).

    The naming lock's contract is a MILLISECOND hold, but a version
    dir can be arbitrarily large — so nothing slow runs inside it:
    doomed dirs (a crashed attempt's orphan, grace-expired versions,
    graced-out legacy dirs) are RENAMED to invisible ``.trash-*``
    names under the lock (pure metadata) and bulk-deleted after
    release. Deleting outside the lock is safe precisely BECAUSE of
    the rename: a concurrent publish can never be touching a dir that
    has already left the version namespace — deleting in place out
    there would race the next publisher's freshly-named (not yet
    committed) version dir. A kill between trash-rename and delete
    leaves ``.trash-*`` orphans, swept by the next publish."""
    trash: list[str] = []

    def _to_trash(p: str) -> None:
        t = os.path.join(root, f".trash-{uuid.uuid4().hex[:8]}")
        try:
            os.replace(p, t)
            trash.append(t)
        except OSError:
            pass

    with _lock(root):
        m = _pointer(root)
        gen = (m["generation"] + 1) if m is not None else 1
        dname = f"v-{gen:06d}"
        dest = os.path.join(root, dname)
        if os.path.isdir(dest):
            # a crashed publish's invisible orphan (named, never
            # committed — the pointer cannot name gen+1 yet)
            _to_trash(dest)
        os.replace(staged, dest)  # pure naming: invisible until the swap
        commit_provider.commit_pointer(
            os.path.join(root, CURRENT_POINTER),
            json.dumps({"generation": gen, "dir": dname}).encode(),
        )
        prev = m["dir"] if m is not None else None
        _gc_mark(
            root,
            keep={dname, prev},
            legacy_had_grace=prev is not None,
            to_trash=_to_trash,
            trash=trash,
        )
    for t in trash:
        if os.path.isdir(t):
            shutil.rmtree(t, ignore_errors=True)
        else:
            try:
                os.unlink(t)
            except OSError:
                pass
    return dest


def _gc_mark(root: str, keep: set, legacy_had_grace: bool,
             to_trash, trash: list[str]) -> None:
    """Mark for removal (rename-to-trash, metadata-only): superseded
    versions, dead staging orphans, a previous publish's undeleted
    trash, and — once a prior VERSIONED publish was the grace holder
    (the legacy files' own grace window has passed) — the legacy
    root-level data files."""
    now = time.time()
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith("v-"):
            if d not in keep:
                to_trash(p)
        elif d.startswith(".trash-"):
            trash.append(p)  # a killed publish's undeleted trash
        elif d.startswith(".staging-"):
            try:
                dead = now - os.stat(p).st_mtime > _STALE_STAGING_S
            except OSError:
                dead = False
            if dead:
                to_trash(p)
        elif d == CURRENT_POINTER or d.startswith("."):
            continue
        elif legacy_had_grace:
            # pre-seam layout's data files, superseded for a full
            # publish cycle by now (files unlink after the lock too —
            # one syscall each, but a legacy PARQUET DIR can be big)
            to_trash(p)
