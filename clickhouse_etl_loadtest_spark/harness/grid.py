"""Grid-search combination generator (O2-O4 in SURVEY.md §2.6).

Behavioral parity with the reference's generator
(/root/reference/src/load_test_generator.py:13-57):
- ``{min, max, step}`` ranges expand inclusively with float rounding
- the cartesian product runs over every parameter's value list
- ``max_combinations`` caps by even sampling (every ⌊len/max⌋-th combination)

Driver-side pure Python — no Spark involvement (SURVEY.md §1.1 last row).
"""

from __future__ import annotations

import itertools
from typing import Any

from pydantic import BaseModel, Field


class ParameterRange(BaseModel):
    min: float
    max: float
    step: float = Field(gt=0)  # step <= 0 would walk forever


class ParameterValues(BaseModel):
    values: list[Any]


def expand_range(r: ParameterRange) -> list[float | int]:
    """Inclusive min..max walk by step, rounding floats to 10 decimal places
    (the reference rounds to dodge fp drift in e.g. 0.1 steps)."""
    out: list[float | int] = []
    v = r.min
    while v <= r.max + 1e-12:
        v = round(v, 10)
        # integral values emit as int so variant_id hashing cannot split on
        # 5000 vs 5000.0 (json.dumps distinguishes them; resume identity
        # must not) — variants.variant_id applies the same normalization
        out.append(int(v) if float(v).is_integer() else v)
        v += r.step
    return out


class LoadTestGrid(BaseModel):
    """The load-test parameter file shape
    (/root/reference/load_test_params.json, models at
    /root/reference/src/models.py:4-23,60-62)."""

    parameters: dict[str, ParameterRange | ParameterValues | list[Any]]
    max_combinations: int | None = Field(default=None, ge=1)

    def generate_combinations(self) -> list[dict[str, Any]]:
        names: list[str] = []
        value_lists: list[list[Any]] = []
        for name, spec in self.parameters.items():
            names.append(name)
            if isinstance(spec, ParameterRange):
                value_lists.append(expand_range(spec))
            elif isinstance(spec, ParameterValues):
                value_lists.append(list(spec.values))
            else:
                value_lists.append(list(spec))
        combos = [dict(zip(names, values)) for values in itertools.product(*value_lists)]
        if self.max_combinations and len(combos) > self.max_combinations:
            stride = len(combos) // self.max_combinations
            combos = combos[::stride][: self.max_combinations]
        return combos
