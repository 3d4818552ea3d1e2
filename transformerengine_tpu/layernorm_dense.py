"""Fused LayerNorm + Dense functional layer (custom VJP).

TPU counterpart of the reference's LayerNormLinear path (reference:
pytorch/module/layernorm_linear.py; jax/layernorm_dense.py). The fwd
rule runs norm -> quantize -> GEMM in one fused region (XLA fuses the
norm epilogue into the quantize); the bwd rule runs dgrad/wgrad GEMMs
then the norm backward, saving (mu, rsigma) instead of the normalized
activation.
"""
from __future__ import annotations

from functools import partial, reduce
import operator
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .dense import all_tensor_scaling
from .ops.gemm import q_dot, resident_dot, tn_dot
from .ops.normalization import (
    layernorm_bwd, layernorm_fwd, rmsnorm_bwd, rmsnorm_fwd)
from .parallel.sharding import with_sharding_constraint_by_logical_axes
from .quantize.quantizer import (QuantizeLayout, QuantizerSet,
                                 noop_quantizer_set)
from .quantize.prequant import PrequantizedKernel
from .quantize.tensor import get_colwise, get_rowwise
from .utils.pytree import Static


def _prod(xs):
    return reduce(operator.mul, xs, 1)


def _amax_of(t):
    rw = get_rowwise(t)
    a = getattr(rw, "amax", None)
    return a if a is not None else jnp.float32(0.0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _layernorm_dense(cfg, x, kernel, gamma, beta, bias, quantizer_set,
                     kernel_cache):
    # Primal (no grad): single-orientation quantizes only (see dense.py).
    out, _ = _ln_dense_fwd(cfg, x, kernel, gamma, beta, bias, quantizer_set,
                           kernel_cache, inference=True)
    return out


def _ln_dense_fwd(cfg, x, kernel, gamma, beta, bias, quantizer_set,
                  kernel_cache, inference=False):
    (norm_type, zero_centered_gamma, epsilon, input_axes, kernel_axes) = cfg
    x = with_sharding_constraint_by_logical_axes(x, input_axes)
    if not isinstance(kernel, PrequantizedKernel):
        kernel = with_sharding_constraint_by_logical_axes(kernel, kernel_axes)

    m = _prod(x.shape[:-1])
    k = x.shape[-1]
    n = _prod(kernel.shape[1:])

    # Fused norm + dual-orientation quantize (see layernorm_mlp).
    fused_norm_q = None
    if (not isinstance(kernel, PrequantizedKernel)
            and quantizer_set.x is not None
            and not all_tensor_scaling(quantizer_set) and not inference):
        qn = getattr(quantizer_set.x, "quantize_normed", None)
        if qn is not None:
            fused_norm_q = qn(
                x.reshape(m, k), gamma,
                beta if norm_type == "layernorm" else None,
                norm=norm_type, zero_centered_gamma=zero_centered_gamma,
                epsilon=epsilon,
                layout=(QuantizeLayout.ROWWISE if inference else None))
    if fused_norm_q is not None:
        qx_fused, mu, rsigma = fused_norm_q
        rsigma = rsigma.reshape(x.shape[:-1])
        if mu is not None:
            mu = mu.reshape(x.shape[:-1])
        ln_out = ln2d = None
    else:
        qx_fused = None
        if norm_type == "layernorm":
            ln_out, mu, rsigma = layernorm_fwd(
                x, gamma, beta, zero_centered_gamma=zero_centered_gamma,
                epsilon=epsilon)
        else:
            ln_out, rsigma = rmsnorm_fwd(
                x, gamma, zero_centered_gamma=zero_centered_gamma,
                epsilon=epsilon)
            mu = None
        ln2d = ln_out.reshape(m, k)

    if isinstance(kernel, PrequantizedKernel):
        from .dense import prequant_x_quantize
        from .ops.gemm import prequant_dot
        xq = (quantizer_set.x if quantizer_set.x is not None
              and prequant_x_quantize() else None)
        out2d = prequant_dot(ln2d, kernel.colwise, xq)
        res_q = (Static("prequant"), None, None, None)
    elif quantizer_set.x is None:
        k2d = kernel.reshape(k, n)
        # NN contraction, no .T: the kernel transpose is not hoisted out
        # of decode scans (profiled ~860 us/layer/step of copy — dense.py).
        out2d = q_dot(ln2d, k2d, 1, 0)
        res_q = (ln2d, k2d, None, None)
    elif all_tensor_scaling(quantizer_set):
        # Per-tensor scaling: single-orientation quantize (ops/gemm.q_dot).
        qx = quantizer_set.x.quantize(ln2d, layout=QuantizeLayout.ROWWISE)
        if kernel_cache is not None:
            qk = get_rowwise(kernel_cache.q)
        else:
            qk = quantizer_set.kernel.quantize(
                kernel.reshape(k, n), layout=QuantizeLayout.ROWWISE)
        out2d = q_dot(qx, qk, 1, 0)
        res_q = (qx, qk, _amax_of(qx), _amax_of(qk), Static("1x"))
    elif inference:
        qx = (qx_fused if qx_fused is not None
              else quantizer_set.x.quantize(ln2d,
                                            layout=QuantizeLayout.ROWWISE))
        if kernel_cache is not None:
            qk = get_colwise(kernel_cache.q)
        else:
            qk = quantizer_set.kernel.quantize(
                kernel.reshape(k, n), layout=QuantizeLayout.COLWISE)
        out2d = tn_dot(get_rowwise(qx), get_colwise(qk))
        res_q = (None, None, None, None)
    else:
        qx = (qx_fused if qx_fused is not None
              else quantizer_set.x.quantize(ln2d))
        qk = (kernel_cache.q if kernel_cache is not None
              else quantizer_set.kernel.quantize(kernel.reshape(k, n)))
        out2d = tn_dot(get_rowwise(qx), get_colwise(qk))
        res_q = (get_colwise(qx), get_rowwise(qk), _amax_of(qx), _amax_of(qk))

    if bias is not None:
        out2d = out2d + bias.reshape(1, n).astype(jnp.float32)
    out = out2d.reshape(*x.shape[:-1], *kernel.shape[1:]).astype(x.dtype)
    meta = Static((x.shape, kernel.shape, x.dtype, kernel.dtype,
                   bias is not None, bias.dtype if bias is not None else None))
    return out, (res_q, x, mu, rsigma, gamma, meta, quantizer_set,
                 kernel_cache)


def _ln_dense_bwd(cfg, residuals, g):
    (norm_type, zero_centered_gamma, epsilon, input_axes, kernel_axes) = cfg
    res_q, x, mu, rsigma, gamma, meta, quantizer_set, kernel_cache = residuals
    # Cache-time weight amax rides the cache; feeding it to the update
    # makes every microbatch's cotangent carry the same once-per-step
    # roll (see dense._update_set).
    def _upd_kernel(amax_k):
        if kernel_cache is not None:
            amax_k = kernel_cache.amax
        if amax_k is None or quantizer_set.kernel is None:
            return quantizer_set.kernel
        return quantizer_set.kernel.update(amax_k)

    if isinstance(res_q[0], Static) and res_q[0].value == "prequant":
        raise NotImplementedError(
            "backward through a PrequantizedKernel (inference-only weights)")
    x_shape, kernel_shape, x_dtype, k_dtype, has_bias, b_dtype = meta.value
    m = _prod(x_shape[:-1])
    k = x_shape[-1]
    n = _prod(kernel_shape[1:])
    g2d = g.reshape(m, n)

    if quantizer_set.x is None:
        ln2d, k2d = res_q[0], res_q[1]
        dln2d = tn_dot(g2d, k2d)
        dw2d = q_dot(ln2d, g2d, 0, 0)        # contract M -> (K,N), no .T
        d_qset = quantizer_set
    elif len(res_q) == 5 and isinstance(res_q[4], Static):
        qx, qk, amax_x, amax_k = res_q[:4]     # rowwise (M,K) and (K,N)
        qg = quantizer_set.dgrad.quantize(g2d, layout=QuantizeLayout.ROWWISE)
        dln2d = q_dot(qg, qk, 1, 1)            # (M,N) x (K,N) -> (M,K)
        dw2d = q_dot(qx, qg, 0, 0)             # contract M -> (K,N)
        d_qset = QuantizerSet(
            x=quantizer_set.x.update(amax_x),
            kernel=_upd_kernel(amax_k),
            dgrad=quantizer_set.dgrad.update(_amax_of(qg)),
        )
    else:
        qx_col, qk_row, amax_x, amax_k = res_q
        qg = quantizer_set.dgrad.quantize(g2d)
        dln2d = tn_dot(get_rowwise(qg), qk_row)
        dw2d = tn_dot(qx_col, get_colwise(qg))
        d_qset = QuantizerSet(
            x=quantizer_set.x.update(amax_x),
            kernel=_upd_kernel(amax_k),
            dgrad=quantizer_set.dgrad.update(_amax_of(qg)),
        )

    dln = dln2d.reshape(x_shape).astype(x_dtype)
    if norm_type == "layernorm":
        dx, dgamma, dbeta = layernorm_bwd(
            dln, x, mu, rsigma, gamma, zero_centered_gamma=zero_centered_gamma)
    else:
        dx, dgamma = rmsnorm_bwd(
            dln, x, rsigma, gamma, zero_centered_gamma=zero_centered_gamma)
        dbeta = None
    dx = with_sharding_constraint_by_logical_axes(dx, input_axes)
    dw = dw2d.reshape(kernel_shape).astype(k_dtype)
    dbias = g2d.sum(axis=0).reshape(kernel_shape[1:]).astype(b_dtype) if has_bias else None
    from .quantize.microbatch import zero_cotangent
    return dx, dw, dgamma, dbeta, dbias, d_qset, zero_cotangent(kernel_cache)


_layernorm_dense.defvjp(_ln_dense_fwd, _ln_dense_bwd)


def layernorm_dense(
    x: jax.Array,
    kernel: jax.Array,
    gamma: jax.Array,
    beta: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    norm_type: str = "layernorm",
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
    input_axes=None,
    kernel_axes=None,
    quantizer_set: QuantizerSet = noop_quantizer_set,
    kernel_cache=None,
) -> jax.Array:
    """``out = norm(x) . kernel + bias`` with the norm output never
    materialized in high precision when quantizing (reference:
    pytorch/module/layernorm_linear.py fwd). ``kernel_cache``: see
    :func:`transformerengine_tpu.dense`."""
    assert norm_type in ("layernorm", "rmsnorm"), norm_type
    assert kernel.ndim >= 2 and kernel.shape[0] == x.shape[-1], (
        f"kernel leading dim {kernel.shape} must match x hidden dim "
        f"{x.shape[-1]}")
    cfg = (norm_type, zero_centered_gamma, float(epsilon),
           tuple(input_axes) if input_axes else None,
           tuple(kernel_axes) if kernel_axes else None)
    return _layernorm_dense(cfg, x, kernel, gamma, beta, bias, quantizer_set,
                            kernel_cache)
