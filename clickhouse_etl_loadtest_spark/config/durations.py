"""Duration-string parsing.

The reference passes opaque duration strings like ``"8h"``, ``"1h"``, ``"10s"``
through its configs (/root/reference/src/models.py:33-50,
config/glassflow/deduplication_pipeline.json:48,66). Spark needs real
numbers/intervals for watermarks and triggers, so we parse them.
"""

from __future__ import annotations

import re

_UNIT_SECONDS = {
    "ms": 0.001,
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
}

_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|d)\s*$", re.IGNORECASE)


def parse_duration(text: str | int | float) -> float:
    """``"8h"`` -> 28800.0 seconds. Bare numbers are taken as seconds."""
    if isinstance(text, (int, float)):
        return float(text)
    m = _DURATION_RE.match(text)
    if not m:
        raise ValueError(f"unparseable duration: {text!r}")
    value, unit = m.groups()
    return float(value) * _UNIT_SECONDS[unit.lower()]


def duration_to_interval(text: str | int | float) -> str:
    """Duration string -> Spark SQL interval literal body, e.g. ``"8h"`` ->
    ``"28800 seconds"`` (valid in ``withWatermark`` and ``window()``)."""
    secs = parse_duration(text)
    if secs == int(secs):
        return f"{int(secs)} seconds"
    return f"{int(secs * 1000)} milliseconds"
