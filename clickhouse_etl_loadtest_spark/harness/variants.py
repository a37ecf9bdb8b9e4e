"""Deterministic variant identity (F6 in SURVEY.md §2.7).

Parity with /root/reference/src/test_executor.py:28-33: the variant id is
``"load_" + uuid5(NAMESPACE_DNS, canonical-json(config))[:8]``. Determinism
matters — resume compares these ids against the results CSV.
"""

from __future__ import annotations

import json
import uuid
from typing import Any


def variant_id(config: dict[str, Any], prefix: str = "load_") -> str:
    canonical = json.dumps(config, sort_keys=True)
    return prefix + str(uuid.uuid5(uuid.NAMESPACE_DNS, canonical))[:8]
