"""Cross-engine deterministic 60-bit hashing.

Spark's builtin ``hash``/``xxhash64`` don't match DuckDB's ``hash``, so every
operator whose correctness is oracle-checked (MinHash, SimHash, fingerprints)
hashes through md5 instead: both engines produce identical hex, and the first
15 hex digits (60 bits) fit a signed int64 in both.

Spark:  conv(substring(md5(s), 1, 15), 16, 10)  cast long
DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT)::BIGINT

md5 stays JVM-side (whole-stage codegen) in Spark — this is NOT a Python UDF.
At 100 TB scale md5 costs ~2x xxhash64 per call; swap :func:`h60_fast` in when
oracle parity isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash permutation parameters: h_i(x) = (a_i * x + b_i) mod P, a classic
# universal-hash family (Broder 1997, "On the resemblance and containment of
# documents"). P = 2^61 - 1 (Mersenne prime) > any h60 value.
MERSENNE_P = (1 << 61) - 1


def h60(col: Column | str) -> Column:
    """60-bit md5-derived hash of a string column; matches h60_sql_duckdb."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def h60_sql_duckdb(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`h60`."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT"


def h60_fast(col: Column | str) -> Column:
    """xxhash64-based variant for production paths without oracle parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family. Python's
    ``random`` with a fixed seed keeps this reproducible in both the Spark
    operator and any oracle that re-derives the constants."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_hashes)]


def perm_hash(col: Column, a: int, b: int) -> Column:
    """(a*x + b) mod P on a long column.

    Computed in DECIMAL(38,0) because a*x overflows int64; DECIMAL keeps the
    arithmetic exact (and identical to DuckDB HUGEINT) while remaining
    JVM-side / codegen-able.
    """
    x = col.cast("decimal(38,0)")
    return ((F.lit(a).cast("decimal(38,0)") * x + F.lit(b)) % F.lit(MERSENNE_P)).cast("long")


def perm_hash_sql_duckdb(expr: str, a: int, b: int) -> str:
    """DuckDB fragment matching :func:`perm_hash` (HUGEINT is exact)."""
    return f"CAST((({a}::HUGEINT * ({expr})::HUGEINT + {b}::HUGEINT) % {MERSENNE_P}::HUGEINT) AS BIGINT)"


# --- fast 32-bit variant (pure int64 arithmetic, no DECIMAL) -----------------
# h32 < 2^32, a < 2^30, b < 2^31  =>  a*h32 + b < 2^62: no int64 overflow, so
# both engines evaluate in plain BIGINT ops — ~10x faster than the DECIMAL(38)
# path above and still an exact cross-engine match. P = 2^31-1 (Mersenne).
MERSENNE_P31 = (1 << 31) - 1


def h32(col: Column | str) -> Column:
    """32-bit md5-derived hash (first 8 hex digits) of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def h32_sql_duckdb(expr: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS UBIGINT)::BIGINT"


def minhash_params32(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, MERSENNE_P31)) for _ in range(num_hashes)]


def perm_hash32(col: Column, a: int, b: int) -> Column:
    return (F.lit(a) * col + F.lit(b)) % F.lit(MERSENNE_P31)


def perm_hash32_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * ({expr}) + {b}) % {MERSENNE_P31})"
