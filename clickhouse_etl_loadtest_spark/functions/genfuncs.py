"""Generator column functions — the glassgen template-function vocabulary.

The reference's event template (/root/reference/config/glassgen/user_event.json:1-7)
uses ``$uuid4``, ``$name``, ``$email``, ``$datetime(%Y-%m-%d %H:%M:%S)``,
rendered by the external glassgen package (F1-F3 in SURVEY.md §2.7). We
re-express each as a *deterministic, seeded* Spark column expression over a
row-id column so that (a) runs are reproducible and (b) a SQL oracle can
regenerate byte-identical data. All expressions are builtin functions —
JVM-side, whole-stage-codegen, no Python UDFs (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed vocabularies keep $name/$email deterministic AND reproducible in
# ANSI SQL (arrays indexed by a hash of the row id).
FIRST_NAMES = [
    "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
    "ivan", "judy", "mallory", "niaj", "olivia", "peggy", "rupert", "sybil",
]
LAST_NAMES = [
    "smith", "jones", "brown", "wilson", "taylor", "lee", "walker", "hall",
    "young", "king", "wright", "scott", "green", "baker", "adams", "nelson",
]
EMAIL_DOMAINS = ["example.com", "test.org", "mail.net", "corp.io"]


def _h_mod(id_col: Column, salt: str, mod: int) -> Column:
    """Deterministic bucket in [0, mod) from (salt, id) via md5 — identical in
    DuckDB as (('0x' || substr(md5(salt||id),1,15))::UBIGINT % mod)."""
    hx = F.conv(F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15), 16, 10)
    return (hx.cast("long") % F.lit(mod)).cast("int")


def gen_uuid(id_col: Column, salt: str = "uuid") -> Column:
    """$uuid4 equivalent: md5(salt||id) formatted 8-4-4-4-12. Deterministic
    stand-in for a random v4 uuid (same shape, same entropy source)."""
    hx = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )


def gen_name(id_col: Column) -> Column:
    """$name equivalent: '<first> <last>' from the fixed vocabularies."""
    first = F.array(*[F.lit(n) for n in FIRST_NAMES])
    last = F.array(*[F.lit(n) for n in LAST_NAMES])
    return F.concat_ws(
        " ",
        F.element_at(first, _h_mod(id_col, "first", len(FIRST_NAMES)) + 1),
        F.element_at(last, _h_mod(id_col, "last", len(LAST_NAMES)) + 1),
    )


def gen_email(id_col: Column) -> Column:
    """$email equivalent: 'user<id>@<domain>' — unique per id, valid shape."""
    dom = F.array(*[F.lit(d) for d in EMAIL_DOMAINS])
    return F.concat(
        F.lit("user"),
        id_col.cast("string"),
        F.lit("@"),
        F.element_at(dom, _h_mod(id_col, "dom", len(EMAIL_DOMAINS)) + 1),
    )


def gen_datetime(id_col: Column, base: str = "2024-01-01 00:00:00", step_seconds: int = 1) -> Column:
    """$datetime(%Y-%m-%d %H:%M:%S) equivalent, advanced ``step_seconds`` per
    row id instead of wall clock so runs are reproducible."""
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(base)) + id_col.cast("long") * step_seconds)
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


# --- SQL-string twins ---------------------------------------------------------
# Same expressions as the Column builders above, emitted as Spark SQL strings
# so the generator can build its whole projection in ONE selectExpr call.
# Motivation (optimization round 13, guide §5 "the driver"): the Column forms
# cost ~1,300 py4j round-trips per plan construction — 0.37 s of the
# dedup_pipeline_e2e headline wall was the driver CHATTING with the JVM, not
# computing. A SQL string parses JVM-side to the identical analyzed plan.


def _sql_str(v: str) -> str:
    """Single-quoted SQL literal with ' and \\ escaped — the salts/vocab are
    safe constants today, but a future entry containing either character
    would otherwise parse wrong silently (round-13 ADVICE)."""
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _h_mod_sql(id_expr: str, salt: str, mod: int) -> str:
    hx = f"md5(concat({_sql_str(salt)}, cast({id_expr} as string)))"
    return f"cast(cast(conv(substring({hx}, 1, 15), 16, 10) as bigint) % {mod} as int)"


def gen_uuid_sql(id_expr: str, salt: str = "uuid") -> str:
    hx = f"md5(concat({_sql_str(salt)}, cast({id_expr} as string)))"
    return (
        f"concat_ws('-', substring({hx}, 1, 8), substring({hx}, 9, 4), "
        f"substring({hx}, 13, 4), substring({hx}, 17, 4), substring({hx}, 21, 12))"
    )


def _vocab_sql(values: list[str]) -> str:
    return "array(" + ", ".join(_sql_str(v) for v in values) + ")"


def gen_name_sql(id_expr: str) -> str:
    first = f"element_at({_vocab_sql(FIRST_NAMES)}, {_h_mod_sql(id_expr, 'first', len(FIRST_NAMES))} + 1)"
    last = f"element_at({_vocab_sql(LAST_NAMES)}, {_h_mod_sql(id_expr, 'last', len(LAST_NAMES))} + 1)"
    return f"concat_ws(' ', {first}, {last})"


def gen_email_sql(id_expr: str) -> str:
    dom = f"element_at({_vocab_sql(EMAIL_DOMAINS)}, {_h_mod_sql(id_expr, 'dom', len(EMAIL_DOMAINS))} + 1)"
    return f"concat('user', cast({id_expr} as string), '@', {dom})"


def gen_datetime_sql(
    id_expr: str, base: str = "2024-01-01 00:00:00", step_seconds: int = 1
) -> str:
    ts = f"timestamp_seconds(unix_timestamp('{base}') + cast({id_expr} as long) * {step_seconds})"
    return f"date_format({ts}, 'yyyy-MM-dd HH:mm:ss')"
