"""Regenerate the COVERAGE.md driver-rotation appendix from the live registry.

Run after flipping any ``extra=`` flag in ``queries/*.py``:

    python scripts/gen_rotation_appendix.py [--round N]

Rewrites everything from the appendix header line to EOF; the appendix is the
canonical statement of which queries hold the 50 driver slots, enforced by
``tests/test_docs.py::test_coverage_rotation_appendix_matches_registry``.
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from clickhouse_etl_loadtest_spark.queries import load_all  # noqa: E402

HEADER_RE = re.compile(r"^## Appendix: driver slot assignment .*$", re.MULTILINE)


def _cols(names: list[str], width: int = 3) -> str:
    return "\n".join(
        "`" + "`, `".join(names[i : i + width]) + "`" for i in range(0, len(names), width)
    )


def render(round_no: int) -> str:
    reg = load_all()
    driver = sorted(n for n, q in reg.items() if not q.extra)
    extras = sorted(n for n, q in reg.items() if q.extra)
    return f"""## Appendix: driver slot assignment (round {round_no}) — canonical

Auto-checked against `queries/__init__.py` by
`tests/test_docs.py::test_coverage_rotation_appendix_matches_registry`;
regenerate with `python scripts/gen_rotation_appendix.py` after any
`extra=` flip.

### Driver-visible ({len(driver)}/50 slots)

{_cols(driver)}

### Extra tier ({len(extras)}; pytest-oracle-verified every run)

{_cols(extras)}
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    args = ap.parse_args()
    path = pathlib.Path(__file__).resolve().parent.parent / "COVERAGE.md"
    text = path.read_text()
    m = HEADER_RE.search(text)
    if m:
        text = text[: m.start()]
    path.write_text(text.rstrip() + "\n\n" + render(args.round))
    print(f"rewrote appendix in {path}")


if __name__ == "__main__":
    main()
