"""Tensor statistics for the numerics-debug toolkit.

TPU counterpart of the reference stats computation (reference:
debug/features/utils/stats_computation.py:18 — dynamic range,
underflow%, overflow%, blockwise dynamic range — with distributed
reduction). Stats are computed on-device as a small dict of scalars;
collection across steps happens host-side via jax.debug.callback.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..quantize.dtypes import DTYPE_TINY, dtype_max, float8_e4m3


def compute_tensor_stats(x: jax.Array, q_dtype=float8_e4m3) -> Dict[str, jax.Array]:
    """Per-tensor numerics stats (all f32 scalars)."""
    xf = jnp.abs(x.astype(jnp.float32))
    nonzero = xf > 0
    amax = jnp.max(xf)
    amin_nz = jnp.min(jnp.where(nonzero, xf, jnp.inf))
    amin_nz = jnp.where(jnp.isfinite(amin_nz), amin_nz, 0.0)
    tiny = DTYPE_TINY.get(jnp.dtype(q_dtype), 0.0)
    qmax = dtype_max(q_dtype)
    n = x.size
    return dict(
        amax=amax,
        amin_nonzero=amin_nz,
        mean=jnp.mean(x.astype(jnp.float32)),
        std=jnp.std(x.astype(jnp.float32)),
        l2norm=jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)))),
        dynamic_range=jnp.where(
            amin_nz > 0, jnp.log2(jnp.maximum(amax, 1e-38)) -
            jnp.log2(jnp.maximum(amin_nz, 1e-38)), 0.0),
        underflow_pct=jnp.sum(nonzero & (xf < tiny)) / n * 100.0,
        overflow_pct=jnp.sum(xf > qmax) / n * 100.0,
        zero_pct=jnp.sum(~nonzero) / n * 100.0,
    )


def compute_blockwise_dynamic_range(x: jax.Array, block: int = 32) -> jax.Array:
    """Mean log2(block_amax / block_amin_nonzero) over (1, block) blocks
    (reference: stats_computation.py blockwise dynamic range) — measures
    suitability for block-scaled formats."""
    x2 = jnp.abs(x.astype(jnp.float32)).reshape(-1, block)
    bmax = x2.max(axis=1)
    bmin = jnp.min(jnp.where(x2 > 0, x2, jnp.inf), axis=1)
    ok = jnp.isfinite(bmin) & (bmax > 0)
    dr = jnp.where(ok, jnp.log2(jnp.maximum(bmax, 1e-38)) -
                   jnp.log2(jnp.where(ok, bmin, 1.0)), 0.0)
    return jnp.sum(dr) / jnp.maximum(jnp.sum(ok), 1)


def compute_nvfp4_stats(x: jax.Array,
                        block_shape=(1, 16)) -> Dict[str, jax.Array]:
    """NVFP4-specific numerics stats (reference:
    debug/features/log_nvfp4_tensor_stats.py — underflows% and mse):
    quantize through the qmath NVFP4 ground truth, dequantize, and
    measure what the format did to the tensor."""
    from ..quantize import qmath
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    data, s_e4m3, tensor_scale, _ = qmath.nvfp4_quantize(
        xf, block_shape=block_shape)
    eff = s_e4m3.astype(jnp.float32) * tensor_scale
    dq = data.astype(jnp.float32) * qmath._expand_scales(
        eff, block_shape[0], block_shape[1], *xf.shape)
    nonzero = jnp.abs(xf) > 0
    n = xf.size
    return dict(
        underflows_pct=jnp.sum(nonzero & (data.astype(jnp.float32) == 0))
        / n * 100.0,
        mse=jnp.mean(jnp.square(dq - xf)),
    )


class StatsBuffer:
    """Host-side accumulation of per-layer stats across steps
    (reference: debug/features/utils/stats_buffer.py)."""

    def __init__(self):
        self._log = []

    def record(self, layer: str, tensor: str, stats: Dict[str, float]):
        self._log.append((layer, tensor,
                          {k: float(v) for k, v in stats.items()}))

    def entries(self, layer: Optional[str] = None):
        return [e for e in self._log if layer is None or e[0] == layer]

    def clear(self):
        self._log.clear()
