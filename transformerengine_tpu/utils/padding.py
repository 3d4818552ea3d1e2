"""Row-padding helpers for quantization alignment.

TPU counterpart of the reference's Fp8Padding/Fp8Unpadding modules
(reference: pytorch/module/fp8_padding.py, common/util/padding.cu
nvte_multi_padding) — MoE expert segments padded up to the alignment
the quantize kernels / block layouts want.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def pad_rows_to_multiple(x: jax.Array, multiple: int = 128) -> Tuple[jax.Array, int]:
    """Zero-pad dim 0 up to a multiple; returns (padded, original_rows)."""
    rows = x.shape[0]
    target = -(-rows // multiple) * multiple
    if target == rows:
        return x, rows
    pad = [(0, target - rows)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), rows


def unpad_rows(x: jax.Array, original_rows: int) -> jax.Array:
    return x[:original_rows]


def multi_pad_group_sizes(group_sizes: jax.Array, multiple: int = 128
                          ) -> jax.Array:
    """Per-expert padded sizes (reference: nvte_multi_padding semantics)."""
    return (-(-group_sizes // multiple)) * multiple
