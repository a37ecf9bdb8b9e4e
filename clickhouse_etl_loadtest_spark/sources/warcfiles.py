"""Distributed reader for WARC archive FILES on disk (.warc and .warc.gz)
— the ingestion mouth of the web-curation wave: point it at a directory of
Common-Crawl-style shards and get one row per response document.

Reference scope: the reference repo has no web stage (its sources are
Kafka/ClickHouse, ``src/utils/kafka.py`` / ``src/utils/clickhouse.py``);
this is part of the LLM-pipeline extension, composing Spark's ``binaryFile``
source with the from-scratch container walkers in ``operators/warc.py``
(record parse + RFC 1952 gzip member walk).

Scale (100 TB of crawl shards):

- ``binaryFile`` lists files distributedly and assigns ONE TASK PER FILE —
  exactly how Common Crawl is processed in practice (shards are ~1 GiB;
  parallelism = shard count, which at CC scale is tens of thousands). The
  walk is embarrassingly parallel per shard; no state spans files.
- The one Python stage is Arrow-batched ``mapInPandas`` over
  (path, content); everything downstream (extraction, scoring, dedup) is
  JVM column work on the emitted rows.
- Files larger than Spark's 2 GiB byte-array ceiling would need member-
  offset chunking (gzip members are independently seekable — that is WHY
  the .warc.gz framing exists); real CC shards sit well under it.
- ``pathGlobFilter``/``recursiveFileLookup`` push file pruning into the
  listing, so a lake of mixed artifacts only materializes the archives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "archive_path string, record_index long, target_uri string, html string"
)


def read_warc_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    recursive: bool = False,
) -> DataFrame:
    """One row per ``response`` record across every archive under ``path``:
    ``(archive_path, record_index, target_uri, html)``. Both framings are
    accepted transparently (``iter_warc_records`` sniffs gzip magic), every
    response is emitted (multi-document shards are the normal shape), and a
    malformed archive fails the task loudly with the file's path in the
    error — never a silent skip."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )

    def walk(it):
        import pandas as pd

        from clickhouse_etl_loadtest_spark.operators.warc import response_documents

        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    for i, (uri, body) in enumerate(
                        response_documents(bytes(content))
                    ):
                        rows.append((p, i, uri, body.decode("utf-8", "replace")))
                except ValueError as exc:
                    raise ValueError(f"malformed WARC archive {p}: {exc}") from exc
            yield pd.DataFrame(
                rows,
                columns=["archive_path", "record_index", "target_uri", "html"],
            )

    return bin_df.select("path", "content").mapInPandas(walk, WARC_SCHEMA)
