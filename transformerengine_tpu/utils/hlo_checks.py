"""HLO collective-counting test utilities.

TPU counterpart of the reference's distributed-test methodology
(reference: tests/jax/distributed_test_base.py:79
assert_equal_collectives / :117 count_collectives — sharding
correctness asserted by counting collectives in the compiled HLO).
"""
from __future__ import annotations

import re
from collections import Counter
from typing import Dict

import jax

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")


def compiled_hlo_text(fn, *args, **kwargs) -> str:
    return jax.jit(fn).lower(*args, **kwargs).compile().as_text()


def count_collectives(hlo_text: str) -> Dict[str, int]:
    """Occurrences of each collective op in optimized HLO."""
    counts = Counter()
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # count op definitions, e.g. `%x = ... all-gather(...)`, skipping
        # -start/-done pairs double counting (count only -start or plain)
        for c in _COLLECTIVES:
            if re.search(rf"= \S* ?{c}(-start)?\(", stripped):
                counts[c] += 1
    return dict(counts)


def assert_collective_counts(fn, expected: Dict[str, int], *args, **kwargs):
    hlo = compiled_hlo_text(fn, *args, **kwargs)
    got = count_collectives(hlo)
    for name, n in expected.items():
        assert got.get(name, 0) == n, (
            f"expected {n} x {name}, got {got.get(name, 0)}; all: {got}")
    return got
