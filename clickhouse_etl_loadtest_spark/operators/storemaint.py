"""Crash-safe commit protocol for store compaction (shared by
``wetstream.compact_wet_store`` and ``packstream.compact_pack_state``).

A compaction folds N partition directories into one consolidated
directory and deletes the originals — several filesystem steps that a
crash can interrupt anywhere. The marker file is the COMMIT POINT:

``_compaction_floor.json`` = ``{"floor": F, "pending_delete": [...]}``
written atomically (tempfile + ``os.replace``).

Crash matrix, all recoverable by :func:`recover` (run at the START of
every compaction AND every ingest-path floor check, so the store
self-heals at the next operation):

- crash before any rename: only ``_compacting_*`` temp dirs exist —
  deleted by recovery, nothing changed;
- crash after some renames, before the marker: consolidated dirs exist
  with ids ABOVE the committed floor — uncommitted, deleted by recovery
  (every original partition still exists, so the re-run refolds from
  scratch);
- crash after the marker, during the deletes: the marker's
  ``pending_delete`` list says exactly what must go — recovery finishes
  the deletes idempotently (the fold is already committed).

Reader caveat (documented, not hidden): between the marker write and the
delete completion a RAW reader sees folded and original partitions at
once. The operators' contract is single-writer (foreachBatch bodies are
serialized; compaction runs from the same maintenance slot), and the
ingest-path recovery closes the window at the next wave. On object
storage swap ``os.rename``/``shutil.rmtree`` for the store's atomic
metadata commit — the protocol shape is unchanged: single-object PUTs
(the marker) stay atomic, and the one state a copy-then-delete "rename"
adds that POSIX cannot — a PARTIAL consolidated dir from a mid-copy
crash — is absorbed because recovery deletes ANY above-floor ``c``
partition, complete or not (exercised against a rename-less double in
``tests/test_storemaint_object_store.py``).
"""

from __future__ import annotations

import json
import os
import re
import shutil

MARKER = "_compaction_floor.json"


def read_marker(root: str) -> dict:
    p = os.path.join(root, MARKER)
    if not os.path.exists(p):
        return {"floor": None, "pending_delete": []}
    with open(p) as f:
        m = json.load(f)
    m.setdefault("pending_delete", [])
    return m


def read_floor(root: str) -> int | None:
    f = read_marker(root)["floor"]
    return None if f is None else int(f)


def write_marker(root: str, floor: int, pending: list[str]) -> None:
    """Atomic marker replace — the commit point of a compaction."""
    p = os.path.join(root, MARKER)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"floor": int(floor), "pending_delete": list(pending)}, f)
    os.replace(tmp, p)


def part_id(dirname: str) -> int:
    return int(re.sub(r"\D", "", dirname))


def list_parts(subdir: str, upto: int | None = None) -> list[str]:
    """``batch=b<id>`` / ``batch=c<id>`` dirnames under ``subdir``,
    optionally capped at ``upto``."""
    if not os.path.isdir(subdir):
        return []
    out = [d for d in os.listdir(subdir) if re.fullmatch(r"batch=[bc]\d+", d)]
    if upto is not None:
        out = [d for d in out if part_id(d) <= upto]
    return sorted(out, key=part_id)


def recover(root: str, subdirs: list[str]) -> None:
    """Repair any interrupted compaction under ``root`` (idempotent):
    finish committed-but-pending deletes, then remove uncommitted
    consolidated dirs (``batch=c<id>`` with id above the committed floor)
    and stale ``_compacting_*`` temps."""
    m = read_marker(root)
    if m["pending_delete"]:
        for rel in m["pending_delete"]:
            p = os.path.join(root, rel)
            if os.path.exists(p):
                shutil.rmtree(p)
        write_marker(root, int(m["floor"]), [])
    floor = m["floor"]
    for sub in subdirs:
        base = os.path.join(root, sub) if sub else root
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if d.startswith("_compacting_"):
                shutil.rmtree(os.path.join(base, d))
            elif re.fullmatch(r"batch=c\d+", d) and (
                floor is None or part_id(d) > int(floor)
            ):
                shutil.rmtree(os.path.join(base, d))


def commit_fold(root: str, upto: int, renamed: dict[str, list[str]]) -> None:
    """Commit point + cleanup: ``renamed`` maps subdir (``""`` for root)
    to the partition dirnames its fold REPLACED. Writes the marker with
    the full pending-delete list, then deletes and clears."""
    pending = []
    for sub, parts in renamed.items():
        for d in parts:
            if part_id(d) != upto or not d.startswith("batch=c"):
                pending.append(os.path.join(sub, d) if sub else d)
    write_marker(root, upto, pending)
    for rel in pending:
        p = os.path.join(root, rel)
        if os.path.exists(p):
            shutil.rmtree(p)
    write_marker(root, upto, [])
