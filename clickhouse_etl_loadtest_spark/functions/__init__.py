from .genfuncs import gen_datetime, gen_email, gen_name, gen_uuid
from .hashing import h60, h60_sql_duckdb

__all__ = ["gen_datetime", "gen_email", "gen_name", "gen_uuid", "h60", "h60_sql_duckdb"]
