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
