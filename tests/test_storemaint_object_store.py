"""The storemaint docstring promises the commit protocol SHAPE survives
object storage (operators/storemaint.py: "On object storage swap
``os.rename``/``shutil.rmtree`` for the store's atomic metadata commit —
the protocol shape is unchanged"). This exercises that claim against a
rename-less store double with S3-like semantics:

- single-object writes are atomic (a PUT never leaves a partial object),
  so the MARKER write (tempfile + ``os.replace`` of one small file) keeps
  its commit-point role unchanged;
- directory "rename" is NOT atomic — it is copy-object-by-object then
  delete, and a crash mid-copy leaves a PARTIAL consolidated partition.

The partial-c-dir crash state is the one POSIX rename can never produce;
the protocol absorbs it because recovery deletes ANY above-floor ``c``
partition — complete or partial — before a reader or re-run touches it.
The pack store is the subject (two subdirs fold under ONE marker, the
strictest shape)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from clickhouse_etl_loadtest_spark.operators import storemaint
from clickhouse_etl_loadtest_spark.operators.packstream import (
    compact_pack_state,
    cursor,
    pack_lengths_batch,
    read_manifest,
)


def _drive(spark, state: str, n_waves: int = 3) -> None:
    for bid in range(n_waves):
        df = spark.createDataFrame(
            [(bid * 10 + i, 5 + bid + i) for i in range(3)],
            "doc_id long, len_tokens long",
        )
        pack_lengths_batch(spark, df, state, bid)


def _canon(spark, state: str):
    return (
        sorted(tuple(r) for r in read_manifest(spark, state).collect()),
        cursor(spark, state),
    )


class _ObjectStoreRename:
    """``os.rename`` double: copy file-by-file, then delete the source —
    the object-store emulation. ``crash_after_files=n`` raises after
    copying n files of the FIRST rename (a mid-copy crash leaving a
    partial destination tree and the intact source temp)."""

    def __init__(self, crash_after_files: int | None = None):
        self.crash_after_files = crash_after_files
        self.calls = 0
        self._real = os.rename

    def __call__(self, src: str, dst: str):
        if not os.path.isdir(src):  # single object: atomic PUT semantics
            return self._real(src, dst)
        self.calls += 1
        copied = 0
        os.makedirs(dst, exist_ok=True)
        for root, dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            for d in dirs:
                os.makedirs(os.path.join(dst, rel, d), exist_ok=True)
            for fn in files:
                if (
                    self.calls == 1
                    and self.crash_after_files is not None
                    and copied >= self.crash_after_files
                ):
                    raise RuntimeError("injected object-store crash mid-copy")
                shutil.copy2(
                    os.path.join(root, fn), os.path.join(dst, rel, fn)
                )
                copied += 1
        shutil.rmtree(src)


def test_protocol_survives_rename_less_store(spark, tmp_path, monkeypatch):
    clean = str(tmp_path / "pack_clean")
    _drive(spark, clean)
    compact_pack_state(spark, clean, upto_batch_id=1)

    # --- crash mid-copy of the first fold: partial c-dir, intact temp ---
    crash = str(tmp_path / "pack_crash")
    _drive(spark, crash)
    with monkeypatch.context() as m:
        m.setattr(os, "rename", _ObjectStoreRename(crash_after_files=1))
        with pytest.raises(RuntimeError, match="mid-copy"):
            compact_pack_state(spark, crash, upto_batch_id=1)
    # the state POSIX rename can never produce: a PARTIAL consolidated dir
    assert os.path.isdir(f"{crash}/manifest/batch=c1")
    assert os.path.isdir(f"{crash}/manifest/_compacting_c1")
    assert storemaint.read_floor(crash) is None  # marker never written

    # the next ingest wave's unconditional recovery heals it (partial c-dir
    # and temp both removed, originals intact), and the stream continues
    df = spark.createDataFrame([(900, 7)], "doc_id long, len_tokens long")
    pack_lengths_batch(spark, df, crash, 3)
    assert not os.path.exists(f"{crash}/manifest/batch=c1")
    assert not os.path.exists(f"{crash}/manifest/_compacting_c1")

    # --- the clean re-run under the SAME rename-less double commits ---
    with monkeypatch.context() as m:
        m.setattr(os, "rename", _ObjectStoreRename())
        info = compact_pack_state(spark, crash, upto_batch_id=1)
    assert info["floor"] == 1
    # the extra wave rode along; compare against the clean twin + same wave
    pack_lengths_batch(spark, df, clean, 3)
    got_manifest, got_cursor = _canon(spark, crash)
    want_manifest, want_cursor = _canon(spark, clean)
    assert got_manifest == want_manifest
    assert got_cursor == want_cursor
    assert storemaint.read_marker(crash)["pending_delete"] == []
