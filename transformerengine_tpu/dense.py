"""Functional quantized dense layer (custom VJP).

The TPU counterpart of the reference's fused Linear path (reference:
jax/dense.py:57 dense(); pytorch/module/linear.py:252 fwd / :727 bwd).
The fwd rule quantizes input + weight and runs the fwd GEMM; the bwd
rule quantizes the incoming gradient and runs dgrad/wgrad GEMMs. All
three GEMMs contract along the stored last axis of both operands, so
block-scale metadata always lines up with the contraction.

Quantizer state (delayed-scaling scale/amax history) is threaded
functionally: the cotangent returned for ``quantizer_set`` is the
*updated* quantizer state ("overwrite-with-gradient" convention, as used
by Flax's fp8_ops). Stateless recipes return the set unchanged.
"""
from __future__ import annotations

from functools import partial, reduce
import operator
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.gemm import prequant_dot, q_dot, resident_dot, tn_dot
from .parallel.sharding import with_sharding_constraint_by_logical_axes
from .quantize.quantizer import (QuantizeLayout, QuantizerSet,
                                 noop_quantizer_set)
from .quantize.tensor import get_colwise, get_rowwise
from .quantize.prequant import PrequantizedKernel
from .quantize.microbatch import KernelCache, zero_cotangent
from .utils.pytree import Static


def _prod(xs):
    return reduce(operator.mul, xs, 1)


def prequant_x_quantize() -> bool:
    """Quantize activations when the kernel is FP8-resident?

    On TPU generations without an FP8 MXU the activation quantize buys
    no compute (the GEMM upcasts to bf16 either way) and costs an extra
    pass over the activations per GEMM — bf16 activations against the
    raw fp8 weight payload are both faster AND more accurate there.
    (Reference analog: fp8 weights + fp8 activations is only a win when
    the MMA unit takes fp8 operands.) TE_TPU_PREQUANT_X_QUANT=0|1."""
    import os
    return os.environ.get("TE_TPU_PREQUANT_X_QUANT", "1") == "1"


def _amax_of(t):
    rw = get_rowwise(t)
    a = getattr(rw, "amax", None)
    return a if a is not None else jnp.float32(0.0)


def _update_set(qset: QuantizerSet, amax_x, amax_k, amax_g,
                cache: Optional[KernelCache] = None) -> QuantizerSet:
    # With a microbatch cache the kernel was quantized once per step
    # outside the layer; its cache-time amax (riding the cache) is the
    # observation fed to the update, so every microbatch's cotangent
    # carries the same once-per-step roll (idempotent under last-wins
    # overwrite-with-gradient; reference: weight amax only on
    # is_first_microbatch).
    if cache is not None:
        amax_k = cache.amax
    if qset.kernel is None or amax_k is None:
        kernel = qset.kernel
    else:
        kernel = qset.kernel.update(amax_k)
    return QuantizerSet(
        x=qset.x.update(amax_x) if qset.x is not None else None,
        kernel=kernel,
        dgrad=qset.dgrad.update(amax_g) if qset.dgrad is not None else None,
    )


def all_tensor_scaling(qset: QuantizerSet) -> bool:
    """True when every quantizer in the set uses per-tensor scaling, i.e.
    a single quantized orientation suffices for fwd+bwd (scales are
    scalars, so dgrad/wgrad may contract the stored payload along any
    axis — see ops/gemm.q_dot). Saves the entire colwise quantize +
    transpose-copy traffic per GEMM (profiled ~5 ms/layer-step on v5e)."""
    return all(
        q is not None and getattr(q, "scaling_mode", None) is not None
        and q.scaling_mode.is_tensor_scaling
        for q in (qset.x, qset.kernel, qset.dgrad))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense(cfg, x, kernel, bias, quantizer_set, kernel_cache):
    # Primal (not being differentiated): quantize ONLY the orientations
    # the fwd GEMM consumes. The 2x fused quantize kernel's colwise half
    # is not DCE-able once emitted, and a fwd-only MXFP8 layer was
    # profiled at 0.43x bf16 largely because of it.
    out, _ = _dense_fwd(cfg, x, kernel, bias, quantizer_set, kernel_cache,
                        inference=True)
    return out


def _dense_fwd(cfg, x, kernel, bias, quantizer_set, kernel_cache,
               inference=False):
    n_cdims, input_axes, kernel_axes = cfg
    x = with_sharding_constraint_by_logical_axes(x, input_axes)
    prequant = isinstance(kernel, PrequantizedKernel)
    if not prequant:
        kernel = with_sharding_constraint_by_logical_axes(kernel, kernel_axes)

    batch_shape = x.shape[: x.ndim - n_cdims]
    k_shape = kernel.shape[:n_cdims]
    out_shape = kernel.shape[n_cdims:]
    m, k, n = _prod(batch_shape), _prod(k_shape), _prod(out_shape)
    x2d = x.reshape(m, k)

    if prequant:
        # FP8-resident weight (quantize/prequant.py): fwd-only fast path.
        xq = (quantizer_set.x if quantizer_set.x is not None
              and prequant_x_quantize() else None)
        out2d = prequant_dot(x2d, kernel.colwise, xq)
        res = (Static("prequant"), None, None, None, None, None)
    elif quantizer_set.x is None:
        k2d = kernel.reshape(k, n)
        # NN contraction — NO k2d.T: the transpose is NOT hoisted out of
        # decode scan loops by XLA and was profiled at ~860 us/layer/step
        # of pure copy (13.8 ms/step on the 16L bf16 decode rung).
        out2d = q_dot(x2d, k2d, 1, 0)
        res = (x2d, k2d, None, None, None, None)
    elif all_tensor_scaling(quantizer_set):
        # Per-tensor scaling: quantize ONE orientation of each operand;
        # bwd contracts these same payloads along the needed axes.
        qx = quantizer_set.x.quantize(x2d, layout=QuantizeLayout.ROWWISE)
        if kernel_cache is not None:
            qk = get_rowwise(kernel_cache.q)
        else:
            qk = quantizer_set.kernel.quantize(
                kernel.reshape(k, n), layout=QuantizeLayout.ROWWISE)
        out2d = q_dot(qx, qk, 1, 0)          # (M,K) x (K,N) -> (M,N)
        res = (qx, qk, _amax_of(qx), _amax_of(qk), Static("1x"),
               Static(kernel_cache is not None))
    elif inference:
        # Block-scaled, fwd-only: single-orientation quantizes.
        qx = quantizer_set.x.quantize(x2d, layout=QuantizeLayout.ROWWISE)
        if kernel_cache is not None:
            qk = get_colwise(kernel_cache.q)
        else:
            qk = quantizer_set.kernel.quantize(
                kernel.reshape(k, n), layout=QuantizeLayout.COLWISE)
        out2d = tn_dot(get_rowwise(qx), get_colwise(qk))
        res = (None, None, None, None, None, None)
    else:
        qx = quantizer_set.x.quantize(x2d)
        qk = (kernel_cache.q if kernel_cache is not None
              else quantizer_set.kernel.quantize(kernel.reshape(k, n)))
        # fwd GEMM: rowwise(x) (M,K) x colwise(kernel) (N,K) -> (M,N)
        out2d = tn_dot(get_rowwise(qx), get_colwise(qk))
        res = (get_colwise(qx), get_rowwise(qk), _amax_of(qx), _amax_of(qk),
               None, Static(kernel_cache is not None))

    if bias is not None:
        out2d = out2d + bias.reshape(1, n).astype(jnp.float32)
    out = out2d.reshape(*batch_shape, *out_shape).astype(x.dtype)
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype,
                   bias is not None, bias.dtype if bias is not None else None))
    return out, (res, meta, quantizer_set, kernel_cache)


def _dense_bwd(cfg, residuals, g):
    n_cdims, input_axes, kernel_axes = cfg
    res, meta, quantizer_set, kernel_cache = residuals
    if isinstance(res[0], Static) and res[0].value == "prequant":
        raise NotImplementedError(
            "backward through a PrequantizedKernel (inference-only weights); "
            "use plain kernels for training")
    x_shape, kernel_shape, x_dtype, k_dtype, has_bias, b_dtype = meta.value
    batch_shape = x_shape[: len(x_shape) - n_cdims]
    k_shape = kernel_shape[:n_cdims]
    out_shape = kernel_shape[n_cdims:]
    m, k, n = _prod(batch_shape), _prod(k_shape), _prod(out_shape)
    g2d = g.reshape(m, n)

    if quantizer_set.x is None:
        x2d, k2d = res[0], res[1]
        dx2d = tn_dot(g2d, k2d)              # (M,N) x (K,N) -> (M,K)
        dw2d = q_dot(x2d, g2d, 0, 0)         # contract M -> (K,N), no .T
        d_qset = quantizer_set
    elif isinstance(res[4], Static) and res[4].value == "1x":
        # Tensor-scaling 1x residuals: qx (M,K), qk (K,N) rowwise-only.
        qx, qk, amax_x, amax_k = res[0], res[1], res[2], res[3]
        qg = quantizer_set.dgrad.quantize(g2d, layout=QuantizeLayout.ROWWISE)
        dx2d = q_dot(qg, qk, 1, 1)           # (M,N) x (K,N) -> (M,K)
        dw2d = q_dot(qx, qg, 0, 0)           # contract M -> (K,N)
        d_qset = _update_set(quantizer_set, amax_x, amax_k, _amax_of(qg),
                             cache=kernel_cache)
    else:
        qx_col, qk_row, amax_x, amax_k = res[0], res[1], res[2], res[3]
        qg = quantizer_set.dgrad.quantize(g2d)
        dx2d = tn_dot(get_rowwise(qg), qk_row)      # (M,N) x (K,N) -> (M,K)
        dw2d = tn_dot(qx_col, get_colwise(qg))      # (K,M) x (N,M) -> (K,N)
        d_qset = _update_set(quantizer_set, amax_x, amax_k, _amax_of(qg),
                             cache=kernel_cache)

    dx = dx2d.reshape(x_shape).astype(x_dtype)
    dx = with_sharding_constraint_by_logical_axes(dx, input_axes)
    dw = dw2d.reshape(kernel_shape).astype(k_dtype)
    dbias = g2d.sum(axis=0).reshape(out_shape).astype(b_dtype) if has_bias else None
    return dx, dw, dbias, d_qset, zero_cotangent(kernel_cache)


_dense.defvjp(_dense_fwd, _dense_bwd)


def dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    contracting_dims: Tuple[Tuple[int, ...], Tuple[int, ...]] = ((-1,), (0,)),
    input_axes=None,
    kernel_axes=None,
    quantizer_set: QuantizerSet = noop_quantizer_set,
    kernel_cache: Optional[KernelCache] = None,
) -> jax.Array:
    """Quantized GEMM layer: ``out = x . kernel + bias``.

    ``contracting_dims`` must name the trailing dims of ``x`` and the
    leading dims of ``kernel`` (the natural layout for all framework
    modules; reference: jax/dense.py:57).

    ``kernel_cache``: quantized kernel usages produced once per
    optimizer step by :func:`~transformerengine_tpu.quantize.microbatch.
    quantize_kernel`; when given, the per-call kernel quantize is
    skipped and bwd observes the cache-time weight amax into the kernel
    quantizer's cotangent (same value every microbatch — one roll per
    step under last-wins; reference: pytorch/module/base.py
    is_first_microbatch weight workspace). Gradients still flow to
    ``kernel``. IMPORTANT: the cache holds the weights quantized at
    build time — rebuild it after every optimizer step (Flax: re-apply
    with ``mutable=["kernel_cache"]``) or the layer silently computes
    with stale weights.
    """
    x_cdims, k_cdims = contracting_dims
    n_cdims = len(x_cdims)
    assert tuple(d % x.ndim for d in x_cdims) == tuple(
        range(x.ndim - n_cdims, x.ndim)), "x contracting dims must be trailing"
    assert tuple(d % kernel.ndim for d in k_cdims) == tuple(
        range(n_cdims)), "kernel contracting dims must be leading"
    cfg = (n_cdims,
           tuple(input_axes) if input_axes else None,
           tuple(kernel_axes) if kernel_axes else None)
    return _dense(cfg, x, kernel, bias, quantizer_set, kernel_cache)


def dense_and_state(x, kernel, bias=None, **kwargs):
    """Like :func:`dense`, but also returns the updated quantizer set by
    differentiating through the overwrite-with-gradient slot. Useful for
    explicit training loops that keep quantizer state outside Flax."""
    qset = kwargs.pop("quantizer_set", noop_quantizer_set)

    def f(qs):
        return dense(x, kernel, bias, quantizer_set=qs, **kwargs)

    out, vjp = jax.vjp(f, qset)
    new_qset = vjp(jnp.ones_like(out))[0]
    return out, new_qset
