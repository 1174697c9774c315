"""Exact integer largest-remainder (Hamilton) apportionment.

The rounding discipline shared by the mixture stages
(``curation_pipeline_e2e``; ``negative_sampling_table`` implements the
same rule distributed over the vocab relation): given non-negative
integer weights and an integer budget, every party gets
``floor(budget * w / sum_w)`` and the shortfall tops up the largest
remainders, ties broken by key — all integer arithmetic, so any
engine (Python, Spark decimal, DuckDB HUGEINT) reproduces it bit-for-
bit. ``sum(result) == budget`` EXACTLY whenever ``sum_w > 0``.
"""

from __future__ import annotations


def hamilton_apportion(weights: dict, budget: int) -> dict:
    """Apportion ``budget`` integer units over ``weights`` (key ->
    non-negative int). Returns key -> quota with quotas summing to
    ``budget`` exactly; each quota is floor or ceil of the exact share
    ``budget * w / sum_w``. Deterministic: the +1 top-up goes to the
    ``budget - sum(floors)`` largest remainders under the total order
    (remainder DESC, key ASC)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    sw = sum(weights.values())
    if sw == 0:
        if budget and weights:
            raise ValueError("cannot apportion a positive budget over zero weight")
        return {k: 0 for k in weights}
    base = {k: (budget * w) // sw for k, w in weights.items()}
    rem = {k: (budget * w) % sw for k, w in weights.items()}
    k_extra = budget - sum(base.values())
    order = sorted(weights, key=lambda k: (-rem[k], k))
    out = dict(base)
    for k in order[: max(0, k_extra)]:
        out[k] += 1
    return out
