"""doc_corpus_release (queries/release.py): the disk-shard ingestion path
must produce the identical dataset card to the in-query packed-archive walk,
and the staged accounting must be non-vacuous on the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()


def test_release_card_from_disk_shards_equals_query(spark, sf_dir, tmp_path):
    """Write the SAME derived crawl as real multi-document .warc.gz shard
    FILES (4 shards, gzip member-per-record), ingest them through the
    production mouth (sources/warcfiles.py::read_warc_documents), run every
    post-walk stage via release_card, and require the byte-identical card
    the registry query computes from its packed archives — the 'disk shards
    → training set' claim, literally from disk."""
    from clickhouse_etl_loadtest_spark.operators.warc import gzip_member
    from clickhouse_etl_loadtest_spark.queries.release import (
        crawl_frame,
        pack_page_records,
        release_card,
        warcinfo_record,
    )
    from clickhouse_etl_loadtest_spark.sources.warcfiles import read_warc_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = crawl_frame(docs).collect()
    crawl_dir = tmp_path / "crawl"
    crawl_dir.mkdir()
    n_shards = 4
    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(int(r["doc_id"]) % n_shards, []).append(
            (r["uri"], r["html"])
        )
    for s, pages in shards.items():
        members = [gzip_member(warcinfo_record())]
        for uri, html in sorted(pages):
            members.extend(gzip_member(rec) for rec in pack_page_records(uri, html))
        (crawl_dir / f"s{s}.warc.gz").write_bytes(b"".join(members))

    walked = read_warc_documents(spark, str(crawl_dir)).select("target_uri", "html")
    got = sorted(
        tuple(r)
        for r in release_card(walked, docs.select("source").distinct()).collect()
    )
    want = sorted(
        tuple(r) for r in REG["doc_corpus_release"].fn(spark, sf_dir).collect()
    )
    assert got == want


def test_release_stages_all_fire(spark, sf_dir):
    """Every stage of the release must actually drop documents on the
    fixture (a vacuous stage would make the oracle check of that stage
    meaningless): robots denials, blocklisted sources, quality failures,
    duplicate pairs, and releases all present; page accounting adds up."""
    card = REG["doc_corpus_release"].fn(spark, sf_dir)
    tot = card.agg(
        *[
            F.sum(c).alias(c)
            for c in (
                "n_pages",
                "n_robots_denied",
                "n_blocked",
                "n_gopher_fail",
                "n_dup",
                "n_released",
            )
        ]
    ).first()
    assert tot["n_robots_denied"] > 0
    assert tot["n_blocked"] > 0
    assert tot["n_gopher_fail"] > 0
    assert tot["n_dup"] > 0
    assert tot["n_released"] > 0
    # mirrors exist: more pages than documents
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert tot["n_pages"] > n_docs
    # blocked sources release nothing and carry an empty language mix
    blocked_rows = card.where(F.col("n_blocked") > 0).collect()
    assert blocked_rows and all(
        r["n_released"] == 0 and r["lang_mix"] == "" and r["fp_checksum"] == 0
        for r in blocked_rows
    )
