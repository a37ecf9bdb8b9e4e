"""Repo-root shim for the reference's ``python main.py ...`` surface.

The real CLI lives in :mod:`clickhouse_etl_loadtest_spark.main` so an
installed distribution never gains a collision-prone top-level ``main``
module (this file is NOT packaged — no ``py-modules`` in pyproject.toml);
the installed entry point is the ``clickhouse-etl-loadtest-spark`` script.
"""

from clickhouse_etl_loadtest_spark.main import main, parse_args, serve  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
