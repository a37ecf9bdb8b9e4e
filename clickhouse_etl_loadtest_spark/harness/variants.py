"""Deterministic variant identity (F6 in SURVEY.md §2.7).

Parity with /root/reference/src/test_executor.py:28-33: the variant id is
``"load_" + uuid5(NAMESPACE_DNS, canonical-json(config))[:8]``. Determinism
matters — resume compares these ids against the results CSV.
"""

from __future__ import annotations

import json
import uuid
from typing import Any


def _normalize(value: Any) -> Any:
    """Integral floats hash as ints: a grid range emitting 5000 and a JSON
    config saying 5000.0 are the SAME variant (json.dumps would serialize
    them differently and silently break resume identity)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, float) and value.is_integer():
        return int(value)
    if isinstance(value, dict):
        return {k: _normalize(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_normalize(v) for v in value]
    return value


def variant_id(config: dict[str, Any], prefix: str = "load_") -> str:
    canonical = json.dumps(_normalize(dict(config)), sort_keys=True)
    return prefix + str(uuid.uuid5(uuid.NAMESPACE_DNS, canonical))[:8]
