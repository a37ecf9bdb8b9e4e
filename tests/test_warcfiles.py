"""Distributed WARC file reader (sources/warcfiles.py): real files on disk
through Spark's binaryFile source — both framings, multi-document shards,
glob pruning, and loud failure with the offending path."""

from __future__ import annotations

import gzip as _stdlib_gzip

import pytest

from clickhouse_etl_loadtest_spark.operators.warc import gzip_member
from clickhouse_etl_loadtest_spark.sources.warcfiles import read_warc_documents


def _record(rec_type: str, payload: bytes, uri: str | None = None) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    if uri is not None:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _shard(doc_ids: list[int]) -> bytes:
    """A multi-document shard: warcinfo + request/response pair per doc."""
    recs = [_record("warcinfo", b"software: test")]
    for i in doc_ids:
        uri = f"http://h{i % 3}.example.com/doc/{i}"
        recs.append(_record("request", b"GET / HTTP/1.1\r\n\r\n", uri))
        recs.append(
            _record(
                "response",
                f"HTTP/1.1 200 OK\r\n\r\n<p>doc {i} body</p>".encode(),
                uri,
            )
        )
    return b"".join(recs)


def _gz(data: bytes) -> bytes:
    """Member-per-record .warc.gz framing of an already-framed shard."""
    from clickhouse_etl_loadtest_spark.operators.warc import iter_warc_records

    out = b""
    for rec in iter_warc_records(data):
        head = [b"WARC/1.0"]
        for k, v in rec["headers"].items():
            head.append(f"{k}: {v}".encode())
        body = b"\r\n".join(head) + b"\r\n\r\n" + rec["payload"] + b"\r\n\r\n"
        out += gzip_member(body)
    return out


def test_reads_plain_and_gz_shards_all_responses(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "shard-00.warc").write_bytes(_shard([0, 1, 2]))
    (d / "shard-01.warc.gz").write_bytes(_gz(_shard([3, 4])))
    (d / "shard-02.warc.gz").write_bytes(_stdlib_gzip.compress(_shard([5])))
    (d / "notes.txt").write_text("not an archive")  # pruned by the glob
    df = read_warc_documents(spark, str(d))
    rows = sorted(
        (r["target_uri"], r["html"], r["record_index"]) for r in df.collect()
    )
    assert len(rows) == 6  # every response across every shard, none dropped
    assert rows[0][0] == "http://h0.example.com/doc/0"
    assert rows[0][1] == "<p>doc 0 body</p>"
    # record_index counts responses within each shard
    by_shard = {}
    for r in df.collect():
        by_shard.setdefault(r["archive_path"], []).append(r["record_index"])
    assert sorted(len(v) for v in by_shard.values()) == [1, 2, 3]
    for v in by_shard.values():
        assert sorted(v) == list(range(len(v)))


def test_malformed_shard_fails_loud_with_path(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "bad.warc").write_bytes(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")
    df = read_warc_documents(spark, str(d))
    with pytest.raises(Exception, match="bad.warc"):
        df.collect()


def test_reader_is_arrow_batched_one_python_stage(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "s.warc.gz").write_bytes(_gz(_shard([7])))
    df = read_warc_documents(spark, str(d))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_member_index_matches_writer_extents(spark, tmp_path):
    """warc_member_index must report byte-exact spans for every member of
    every shard (computable here because the writer's member lengths are
    known), with the listing pruned by the glob."""
    from clickhouse_etl_loadtest_spark.sources.warcfiles import warc_member_index

    d = tmp_path / "crawl"
    d.mkdir()
    shards = {}
    for s, ids in enumerate(([0, 1], [2, 3, 4])):
        blob = _gz(_shard(ids))
        (d / f"s{s}.warc.gz").write_bytes(blob)
        shards[f"s{s}.warc.gz"] = blob
    (d / "notes.txt").write_text("not an archive")
    idx = warc_member_index(spark, str(d)).collect()
    got = {}
    for r in idx:
        name = r["archive_path"].rsplit("/", 1)[-1]
        got.setdefault(name, []).append(
            (r["member_index"], r["offset"], r["length"])
        )
    for name, blob in shards.items():
        rows = sorted(got[name])
        # spans tile the shard exactly: start at 0, contiguous, end at EOF
        assert rows[0][1] == 0
        for (i0, o0, l0), (i1, o1, _) in zip(rows, rows[1:]):
            assert i1 == i0 + 1 and o1 == o0 + l0
        assert rows[-1][1] + rows[-1][2] == len(blob)
        # every span is an independently parseable member
        from clickhouse_etl_loadtest_spark.operators.warc import iter_gzip_members

        for _, o, ln in rows:
            assert len(list(iter_gzip_members(blob[o : o + ln]))) == 1


def test_chunked_reader_equals_whole_shard_reader(spark, tmp_path):
    """read_warc_documents_chunked must emit exactly the whole-shard
    reader's (target_uri, html) rows at ANY chunk size — including
    target_chunk_bytes=1 (every member its own range task) — and accept a
    pre-built (persisted) index, the cdx pattern."""
    from clickhouse_etl_loadtest_spark.sources.warcfiles import (
        read_warc_documents,
        read_warc_documents_chunked,
        warc_member_index,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "s0.warc.gz").write_bytes(_gz(_shard([0, 1, 2, 3])))
    (d / "s1.warc.gz").write_bytes(_gz(_shard([4, 5])))
    want = sorted(
        (r["target_uri"], r["html"])
        for r in read_warc_documents(spark, str(d)).collect()
    )
    assert len(want) == 6
    for chunk in (1, 200, 1 << 30):
        got = sorted(
            (r["target_uri"], r["html"])
            for r in read_warc_documents_chunked(
                spark, str(d), target_chunk_bytes=chunk
            ).collect()
        )
        assert got == want, f"chunk={chunk}"
    # pre-built index path + member-ordinal identity is monotone per shard
    idx = warc_member_index(spark, str(d))
    rows = read_warc_documents_chunked(
        spark, str(d), target_chunk_bytes=150, index=idx
    ).collect()
    assert sorted((r["target_uri"], r["html"]) for r in rows) == want
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["archive_path"], []).append(r["record_index"])
    for ords in per_shard.values():
        assert len(set(ords)) == len(ords)  # distinct member ordinals
