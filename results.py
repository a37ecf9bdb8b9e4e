"""Repo-root shim for the reference's ``python results.py ...`` surface.

The real analyzer lives in :mod:`clickhouse_etl_loadtest_spark.results` so
an installed distribution never gains a collision-prone top-level
``results`` module (this file is NOT packaged — no ``py-modules`` in
pyproject.toml).
"""

from clickhouse_etl_loadtest_spark.results import main, parse_args  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
