"""Explicit sequence-parallel dense layers with quantized-payload comm.

TPU counterpart of the reference's Megatron-SP execution (reference:
pytorch/module/linear.py:301-371 — column-parallel: AG input fwd /
RS dgrad bwd; row-parallel: RS output fwd / AG grad bwd — with
*quantized* all-gather payloads, distributed.py:982-1640). Under plain
pjit, logical axes give the same schedule with bf16 payloads; these
shard_map layers halve the AG bytes by gathering fp8 + scales. XLA's
latency-hiding scheduler overlaps the collectives with the GEMMs (the
Userbuffers role).

Layout contract (inside shard_map over ``axis_name``):
  column: x (S/p, K) seq-sharded, kernel (K, N/p) col-sharded
          -> out (S, N/p)
  row:    x (S, K/p) col-sharded, kernel (K/p, N)
          -> out (S/p, N) seq-sharded (reduce-scattered)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..dense import _amax_of, _update_set
from ..ops.gemm import tn_dot
from ..quantize.quantizer import QuantizerSet, noop_quantizer_set
from ..quantize.tensor import get_colwise, get_rowwise
from ..utils.pytree import Static
from .collectives import (
    all_gather_scaled, reduce_scatter_along_first_dim,
    sequence_parallel_gather_quantize)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sp_dense_column(axis_name, x, kernel, quantizer_set):
    out, _ = _sp_col_fwd(axis_name, x, kernel, quantizer_set)
    return out


def _sp_col_fwd(axis_name, x, kernel, quantizer_set):
    sl, k = x.shape
    n = kernel.shape[1]
    if quantizer_set.x is None:
        x_full = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
        out = tn_dot(x_full, kernel.T)
        res = (x_full, kernel, None)
    else:
        # Quantize the local shard with a globally reduced amax, then
        # all-gather fp8 payload + scales (half the ICI bytes of bf16).
        t_full = sequence_parallel_gather_quantize(
            x, quantizer_set.x, axis_name)
        qk = quantizer_set.kernel.quantize(kernel)
        out = tn_dot(t_full, get_colwise(qk))
        res = (t_full, get_rowwise(qk), _amax_of(t_full), _amax_of(qk))
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype))
    return out.astype(x.dtype), (res, meta, quantizer_set)


def _sp_col_bwd(axis_name, residuals, g):
    res, meta, quantizer_set = residuals
    x_shape, k_shape, x_dtype, k_dtype = meta.value
    if quantizer_set.x is None:
        x_full, kernel, _ = res
        dx_full = tn_dot(g, kernel)
        dw = tn_dot(x_full.T, g.T)
        d_qset = quantizer_set
    else:
        t_full, qk_row, amax_x, amax_k = res
        qg = quantizer_set.dgrad.quantize(g)
        dx_full = tn_dot(get_rowwise(qg), qk_row)
        # wgrad: colwise(x_full) x colwise(g) — colwise of a tensor-scaled
        # payload is its transpose.
        import dataclasses
        x_col = dataclasses.replace(
            t_full, data=t_full.data.T, layout="T")
        dw = tn_dot(x_col, get_colwise(qg))
        d_qset = _update_set(quantizer_set, amax_x, amax_k, _amax_of(qg))
    # dgrad of the all-gather = reduce-scatter back to the seq shard.
    dx = reduce_scatter_along_first_dim(dx_full, axis_name)
    return (dx.reshape(x_shape).astype(x_dtype),
            dw.reshape(k_shape).astype(k_dtype), d_qset)


_sp_dense_column.defvjp(_sp_col_fwd, _sp_col_bwd)


def sp_dense_column(x, kernel, *, axis_name: str,
                    quantizer_set: QuantizerSet = noop_quantizer_set):
    """Column-parallel + SP dense (AG fwd / RS bwd), quantized payloads."""
    return _sp_dense_column(axis_name, x, kernel, quantizer_set)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sp_dense_row(axis_name, x, kernel, quantizer_set):
    out, _ = _sp_row_fwd(axis_name, x, kernel, quantizer_set)
    return out


def _sp_row_fwd(axis_name, x, kernel, quantizer_set):
    if quantizer_set.x is None:
        partial_out = tn_dot(x, kernel.T)
        res = (x, kernel, None, None)
    else:
        qx = quantizer_set.x.quantize(x)
        qk = quantizer_set.kernel.quantize(kernel)
        partial_out = tn_dot(get_rowwise(qx), get_colwise(qk))
        res = (get_colwise(qx), get_rowwise(qk), _amax_of(qx), _amax_of(qk))
    out = reduce_scatter_along_first_dim(
        partial_out.astype(x.dtype), axis_name)
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype))
    return out, (res, meta, quantizer_set)


def _sp_row_bwd(axis_name, residuals, g):
    res, meta, quantizer_set = residuals
    x_shape, k_shape, x_dtype, k_dtype = meta.value
    # bwd of reduce-scatter = all-gather of the seq-sharded cotangent.
    g_full = jax.lax.all_gather(g, axis_name, axis=0, tiled=True)
    if quantizer_set.x is None:
        x2d, kernel = res[0], res[1]
        dx = tn_dot(g_full, kernel)
        dw = tn_dot(x2d.T, g_full.T)
        d_qset = quantizer_set
    else:
        qx_col, qk_row, amax_x, amax_k = res
        qg = quantizer_set.dgrad.quantize(g_full)
        dx = tn_dot(get_rowwise(qg), qk_row)
        dw = tn_dot(qx_col, get_colwise(qg))
        d_qset = _update_set(quantizer_set, amax_x, amax_k, _amax_of(qg))
    return (dx.reshape(x_shape).astype(x_dtype),
            dw.reshape(k_shape).astype(k_dtype), d_qset)


_sp_dense_row.defvjp(_sp_row_fwd, _sp_row_bwd)


def sp_dense_row(x, kernel, *, axis_name: str,
                 quantizer_set: QuantizerSet = noop_quantizer_set):
    """Row-parallel + SP dense (RS fwd / AG bwd)."""
    return _sp_dense_row(axis_name, x, kernel, quantizer_set)
