"""Quantized-payload collectives and amax reduction.

TPU counterpart of the reference's format-aware distributed helpers
(reference: pytorch/distributed.py — gather_along_first_dim :1640 with
FP8 :982 / blockwise :1076 / NVFP4 :1324 / MXFP8 :1509 variants,
reduce_scatter_along_first_dim :928). Under plain pjit/GSPMD these are
unnecessary — XLA moves the quantized pytree leaves and the scale
arrays follow automatically. These helpers serve explicit ``shard_map``
regions (sequence-parallel layers, EP blocks), where gathering the fp8
payload instead of the bf16 activation halves ICI bytes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..quantize.scaling_modes import ScalingMode
from ..quantize.tensor import ScaledTensor1x


def all_gather_scaled(
    t: Union[jax.Array, ScaledTensor1x],
    axis_name: str,
    axis: int = 0,
) -> Union[jax.Array, ScaledTensor1x]:
    """All-gather a (possibly quantized) tensor along its first dim.

    * plain array      -> lax.all_gather(tiled)
    * tensor scaling   -> payload AG; the single scale must already be
      identical on every rank (delayed scaling state is replicated;
      current-scaling callers quantize with an amax reduced via
      :func:`allreduce_amax` first — same contract as the reference's
      FP8 gather, distributed.py:982)
    * block scaling    -> payload AG + scale-grid AG (scales are local
      per row-block, so gathering both is exact; reference MXFP8 :1509)
    * NVFP4 two-level  -> ranks quantized against LOCAL amaxes, so their
      ``tensor_scale_inv`` differ; each rank folds the ratio
      local/global into its e4m3 block scales before the gather and the
      result carries the global (pmax) tensor scale — the reference's
      post-gather global-scale fixup (distributed.py:1324).
    """
    if isinstance(t, jax.Array):
        return jax.lax.all_gather(t, axis_name, axis=axis, tiled=True)
    assert isinstance(t, ScaledTensor1x)
    if t.scaling_mode.is_tensor_scaling:
        data = jax.lax.all_gather(t.data, axis_name, axis=axis, tiled=True)
        return dataclasses.replace(t, data=data)
    scale_inv, tsi = t.scale_inv, t.tensor_scale_inv
    if tsi is not None:
        from ..quantize.dtypes import float8_e4m3
        from ..quantize.qmath import saturate_cast
        tsi_local = tsi.astype(jnp.float32).reshape(())
        tsi_global = jax.lax.pmax(tsi_local, axis_name)
        # ratio <= 1 (global is the max), so the refit e4m3 scales stay
        # in range; the refit rounding loss matches the reference's.
        scale_inv = saturate_cast(
            scale_inv.astype(jnp.float32) * (tsi_local / tsi_global),
            float8_e4m3)
        tsi = tsi_global.reshape(tsi.shape).astype(t.tensor_scale_inv.dtype)
    data = jax.lax.all_gather(t.data, axis_name, axis=axis, tiled=True)
    scale = jax.lax.all_gather(scale_inv, axis_name, axis=axis, tiled=True)
    return dataclasses.replace(t, data=data, scale_inv=scale,
                               tensor_scale_inv=tsi)


def reduce_scatter_along_first_dim(
    x: jax.Array, axis_name: str) -> jax.Array:
    """Sum-reduce-scatter along dim 0 (reference: distributed.py:928).
    Partial sums stay in the accumulation dtype — the reference likewise
    never reduce-scatters fp8 payloads (additive error)."""
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=0,
                                tiled=True)


def allreduce_amax(amax: jax.Array, axis_names) -> jax.Array:
    """Max-allreduce an amax over the given mesh axes (reference:
    quantization.py:646 reduce_and_update_fp8_tensors /
    jax/sharding.py:444). Use inside shard_map; under pjit the amax of a
    sharded tensor is already global."""
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    for a in axis_names:
        amax = jax.lax.pmax(amax, a)
    return amax


def sequence_parallel_gather_quantize(
    x: jax.Array,        # (L, ...) local sequence shard, high precision
    quantizer,
    axis_name: str,
):
    """SP forward all-gather with a quantized payload: quantize the local
    shard with a *globally reduced* amax, then AG fp8 bytes + scales —
    the reference's quantized SP gather (distributed.py:982-1640) in one
    helper. Falls back to bf16 gather when no quantizer is given."""
    if quantizer is None:
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    from ..quantize import qmath
    from ..quantize.quantizer import CurrentScaleQuantizer, DelayedScaleQuantizer
    if isinstance(quantizer, CurrentScaleQuantizer):
        amax = allreduce_amax(qmath.compute_amax(x), axis_name)
        scale = qmath.compute_scale_from_amax(amax, quantizer.q_dtype)
        data, s_inv, _ = qmath.tensor_scale_quantize(x, quantizer.q_dtype,
                                                     scale)
        from ..quantize.tensor import make_scaled_tensor
        t = make_scaled_tensor(
            data, s_inv, scaling_mode=quantizer.scaling_mode,
            dq_dtype=x.dtype, amax=amax)
        return all_gather_scaled(t, axis_name)
    t = quantizer.quantize(x)
    from ..quantize.tensor import get_rowwise
    return all_gather_scaled(get_rowwise(t), axis_name)
