"""Multi-format table I/O: the landing formats a real ingestion edge speaks
(ORC, JSON-lines, CSV) beside the analytical format (parquet), with
schema-preserving round-trips.

Format roles at 100 TB (the part people get wrong):
- **parquet / ORC** are the ANALYTICAL formats: columnar, typed, splittable,
  with statistics — predicate pushdown and column pruning reach the scan
  (``PushedFilters`` / ``ReadSchema``; plan-asserted in
  tests/test_formats.py).
- **JSON / CSV** are LANDING formats only: row-oriented, no statistics, no
  vectorized scan (``Batched: false``) — Spark can push filters into the
  parser, but every byte still gets read and parsed row-at-a-time. The
  pipeline pattern is land -> compact to parquet
  (``streaming/sink.py::compact_sink``) -> analyze; never point the query
  layer at raw JSON/CSV.
- Readers here take an EXPLICIT schema for JSON/CSV: schema inference scans
  the whole dataset before the first real job (a full extra pass at
  corpus scale) and silently widens types on dirty rows. Landing zones
  declare their schema.

Type-fidelity traps each wrapper handles (and the tests pin):
- CSV has no types: everything needs the declared schema on read, and
  embedded delimiters/quotes/newlines in text columns need
  quote-escape + ``multiLine`` on the way back in.
- CSV cannot represent NULL-vs-empty-string distinctly by default: the
  writer emits a sentinel (``nullValue``) so NULLs survive.
- JSON-lines drops columns that are null for a whole row and serializes
  timestamps as ISO strings; the declared schema restores both.
- Arrays (the embedding column) survive JSON natively; CSV refuses nested
  types — callers get an explicit error, not silent stringification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

ANALYTICAL_FORMATS = ("parquet", "orc")
LANDING_FORMATS = ("json", "csv")
SUPPORTED_FORMATS = ANALYTICAL_FORMATS + LANDING_FORMATS

_CSV_NULL = "\\N"  # MySQL-style sentinel: distinguishes NULL from ""

# default timestampFormat truncates to milliseconds — these keep the full
# microsecond precision through text formats (NTZ variant for TIMESTAMP_NTZ
# columns, e.g. the events fixture)
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}
# Spark's CSV writer/reader TRIM leading/trailing whitespace by default —
# silently lossy for text columns
_CSV_WS_OPTS = {
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def _check_fmt(fmt: str) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` at ``path`` in ``fmt`` with settings that make the
    round-trip lossless (see module docstring)."""
    _check_fmt(fmt)
    w = df.write.mode(mode)
    if fmt in LANDING_FORMATS:
        w = w.options(**_TS_OPTS)
    if fmt == "csv":
        nested = [f.name for f in df.schema.fields if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if nested:
            raise ValueError(
                f"CSV cannot represent nested columns {nested}; "
                "use parquet/orc/json or project them out"
            )
        w = (
            w.option("header", "true")
            .option("nullValue", _CSV_NULL)
            .option("escape", '"')
            .options(**_CSV_WS_OPTS)
        )
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
    multiline_csv: bool = True,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Landing formats REQUIRE the declared
    ``schema`` (inference is a full extra scan and type-unsafe).

    ``multiline_csv`` (default on, matching the lossless writer) makes CSV
    files NON-SPLITTABLE — one task parses each whole file, however large.
    That is the price of embedded newlines; pass ``False`` for landing
    zones that guarantee newline-free fields so big CSV files split
    normally across the cluster."""
    _check_fmt(fmt)
    r = spark.read
    if fmt in LANDING_FORMATS:
        if schema is None:
            raise ValueError(f"{fmt} reads require an explicit schema (no inference at scale)")
        r = r.schema(schema).options(**_TS_OPTS)
    elif schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = (
            r.option("header", "true")
            .option("nullValue", _CSV_NULL)
            .option("escape", '"')
            .option("multiLine", str(multiline_csv).lower())
            .options(**_CSV_WS_OPTS)
        )
    return r.format(fmt).load(path)
