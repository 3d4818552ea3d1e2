"""Fused LayerNorm + MLP functional layer (custom VJP).

TPU counterpart of the reference's LayerNormMLP (reference:
pytorch/module/layernorm_mlp.py; jax/layernorm_mlp.py:35). One fused
region covers: norm -> quantize -> GEMM1 -> gated activation ->
quantize -> GEMM2. The bwd rule runs the mirrored chain with fused
dact+quantize. Sharding is expressed through logical-axis constraints;
with TP the first GEMM is column-parallel and the second row-parallel,
and XLA inserts the AG/RS (or defers them, with sequence-parallel
logical axes).
"""
from __future__ import annotations

from functools import partial, reduce
import operator
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .dense import all_tensor_scaling
from .ops.activation import act_lu, dact_lu, normalize_activation_type
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


def _update(qset, amax_x, amax_k, amax_g, cache=None):
    # With a microbatch cache the cache-time weight amax is the
    # observation (same once-per-step roll in every microbatch's
    # cotangent; see dense._update_set).
    if qset.x is None:
        return qset
    if cache is not None:
        amax_k = cache.amax
    return QuantizerSet(
        x=qset.x.update(amax_x),
        kernel=(qset.kernel if amax_k is None
                else qset.kernel.update(amax_k)),
        dgrad=qset.dgrad.update(amax_g),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _layernorm_mlp(cfg, x, gamma, beta, kernel1, kernel2, bias1, bias2,
                   qsets, kernel_caches):
    # Primal (no grad): single-orientation quantizes only (see dense.py).
    out, _ = _ln_mlp_fwd(cfg, x, gamma, beta, kernel1, kernel2, bias1, bias2,
                         qsets, kernel_caches, inference=True)
    return out


def _ln_mlp_fwd(cfg, x, gamma, beta, kernel1, kernel2, bias1, bias2, qsets,
                kernel_caches, inference=False):
    kc1, kc2 = kernel_caches if kernel_caches is not None else (None, None)
    (norm_type, zcg, eps, acts, axes) = cfg
    input_axes, dot1_kernel_axes, dot2_kernel_axes, intermediate_axes = axes
    qset1, qset2 = qsets
    x = with_sharding_constraint_by_logical_axes(x, input_axes)
    if not isinstance(kernel1, PrequantizedKernel):
        kernel1 = with_sharding_constraint_by_logical_axes(kernel1, dot1_kernel_axes)
    if not isinstance(kernel2, PrequantizedKernel):
        kernel2 = with_sharding_constraint_by_logical_axes(kernel2, dot2_kernel_axes)

    m = _prod(x.shape[:-1])
    hidden = x.shape[-1]
    n_act = kernel1.shape[-2] if kernel1.ndim == 3 else 1
    ffn = kernel1.shape[-1]

    # Fused norm + dual-orientation quantize (one VMEM pass; reference:
    # nvte_layernorm_fwd FP8 epilogue) — applies exactly when GEMM1
    # takes the 2x-quantize branch below and the quantizer provides a
    # fused kernel (MXFP8 / delayed scaling).
    fused_norm_q = None
    if (not isinstance(kernel1, PrequantizedKernel)
            and qset1.x is not None and not all_tensor_scaling(qset1)):
        # Training: fused 2x; inference primal: fused ROWWISE-only
        # (single-orientation quantize, r2 convention).
        qn = getattr(qset1.x, "quantize_normed", None)
        if qn is not None:
            fused_norm_q = qn(
                x.reshape(m, hidden), gamma,
                beta if norm_type == "layernorm" else None,
                norm=norm_type, zero_centered_gamma=zcg, epsilon=eps,
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
                x, gamma, beta, zero_centered_gamma=zcg, epsilon=eps)
        else:
            ln_out, rsigma = rmsnorm_fwd(
                x, gamma, zero_centered_gamma=zcg, epsilon=eps)
            mu = None
        ln2d = ln_out.reshape(m, hidden)

    # --- GEMM1 ---
    if isinstance(kernel1, PrequantizedKernel):
        from .dense import prequant_x_quantize
        from .ops.gemm import prequant_dot
        xq1 = (qset1.x if qset1.x is not None
               and prequant_x_quantize() else None)
        z2d = prequant_dot(ln2d, kernel1.colwise, xq1)
        res1 = (Static("prequant"), None, None, None)
    elif qset1.x is None:
        k1 = kernel1.reshape(hidden, n_act * ffn)
        # NN contraction, no .T (see dense.py — transposes are not
        # hoisted out of decode scans).
        z2d = q_dot(ln2d, k1, 1, 0)
        res1 = (ln2d, k1, None, None)
    elif all_tensor_scaling(qset1):
        # Per-tensor scaling: single-orientation quantize (ops/gemm.q_dot).
        qx = qset1.x.quantize(ln2d, layout=QuantizeLayout.ROWWISE)
        qk1 = (get_rowwise(kc1.q) if kc1 is not None
               else qset1.kernel.quantize(
                   kernel1.reshape(hidden, n_act * ffn),
                   layout=QuantizeLayout.ROWWISE))
        z2d = q_dot(qx, qk1, 1, 0)
        res1 = (qx, qk1, _amax_of(qx), _amax_of(qk1), Static("1x"))
    elif inference:
        qx = (qx_fused if qx_fused is not None
              else qset1.x.quantize(ln2d, layout=QuantizeLayout.ROWWISE))
        qk1 = (get_colwise(kc1.q) if kc1 is not None
               else qset1.kernel.quantize(
                   kernel1.reshape(hidden, n_act * ffn),
                   layout=QuantizeLayout.COLWISE))
        z2d = tn_dot(get_rowwise(qx), get_colwise(qk1))
        res1 = (None, None, None, None)
    else:
        qx = qx_fused if qx_fused is not None else qset1.x.quantize(ln2d)
        qk1 = (kc1.q if kc1 is not None
               else qset1.kernel.quantize(
                   kernel1.reshape(hidden, n_act * ffn)))
        z2d = tn_dot(get_rowwise(qx), get_colwise(qk1))
        res1 = (get_colwise(qx), get_rowwise(qk1), _amax_of(qx), _amax_of(qk1))
    if bias1 is not None:
        z2d = z2d + bias1.reshape(1, n_act * ffn).astype(jnp.float32)
    from .ops.activation import _ACT
    plain_acts = (not isinstance(acts, str)
                  and all(a in _ACT for a in acts))
    if inference and plain_acts:
        # 2D activation fast path: the (..., n_act, ffn) reshape splits
        # an axis XLA then re-tiles — two ~235 MB relayout copies per
        # layer on the MXFP8 rung. Slicing the flat GEMM output at the
        # ffn boundary stays in the native layout. (z is a bwd residual
        # only, so the training branch keeps the 4D form; special
        # activations like clamped_swiglu also take the 4D path.)
        z2d = z2d.astype(x.dtype)
        if n_act == 2:
            a2d = (_ACT[acts[0]](z2d[:, :ffn]) * _ACT[acts[1]](z2d[:, ffn:])
                   ).astype(x.dtype)
        else:
            a2d = _ACT[acts[0]](z2d).astype(x.dtype)
        z = None
    else:
        z = z2d.reshape(*x.shape[:-1], n_act, ffn).astype(x.dtype)
        z = with_sharding_constraint_by_logical_axes(z, intermediate_axes)

        # --- activation ---
        a = act_lu(z if n_act == 2 else z[..., 0, :], acts)
        a2d = a.reshape(m, ffn)

    # --- GEMM2 ---
    if isinstance(kernel2, PrequantizedKernel):
        from .ops.gemm import prequant_dot
        xq2 = (qset2.x if qset2.x is not None
               and prequant_x_quantize() else None)
        out2d = prequant_dot(a2d, kernel2.colwise, xq2)
        res2 = (Static("prequant"), None, None, None)
    elif qset2.x is None:
        k2 = kernel2.reshape(ffn, hidden)
        out2d = q_dot(a2d, k2, 1, 0)
        res2 = (a2d, k2, None, None)
    elif all_tensor_scaling(qset2):
        qa = qset2.x.quantize(a2d, layout=QuantizeLayout.ROWWISE)
        qk2 = (get_rowwise(kc2.q) if kc2 is not None
               else qset2.kernel.quantize(kernel2.reshape(ffn, hidden),
                                          layout=QuantizeLayout.ROWWISE))
        out2d = q_dot(qa, qk2, 1, 0)
        res2 = (qa, qk2, _amax_of(qa), _amax_of(qk2), Static("1x"))
    elif inference:
        qa = qset2.x.quantize(a2d, layout=QuantizeLayout.ROWWISE)
        qk2 = (get_colwise(kc2.q) if kc2 is not None
               else qset2.kernel.quantize(kernel2.reshape(ffn, hidden),
                                          layout=QuantizeLayout.COLWISE))
        out2d = tn_dot(get_rowwise(qa), get_colwise(qk2))
        res2 = (None, None, None, None)
    else:
        qa = qset2.x.quantize(a2d)
        qk2 = (kc2.q if kc2 is not None
               else qset2.kernel.quantize(kernel2.reshape(ffn, hidden)))
        out2d = tn_dot(get_rowwise(qa), get_colwise(qk2))
        res2 = (get_colwise(qa), get_rowwise(qk2), _amax_of(qa), _amax_of(qk2))
    if bias2 is not None:
        out2d = out2d + bias2.reshape(1, hidden).astype(jnp.float32)
    out = out2d.reshape(x.shape).astype(x.dtype)

    meta = Static((x.shape, kernel1.shape, kernel2.shape, x.dtype,
                   kernel1.dtype, kernel2.dtype,
                   bias1 is not None, bias2 is not None,
                   bias1.dtype if bias1 is not None else None,
                   bias2.dtype if bias2 is not None else None,
                   n_act, ffn))
    return out, (res1, res2, z, x, mu, rsigma, gamma, meta, qsets,
                 kernel_caches)


def _ln_mlp_bwd(cfg, residuals, g):
    (norm_type, zcg, eps, acts, axes) = cfg
    input_axes, dot1_kernel_axes, dot2_kernel_axes, intermediate_axes = axes
    (res1, res2, z, x, mu, rsigma, gamma, meta, qsets,
     kernel_caches) = residuals
    kc1, kc2 = kernel_caches if kernel_caches is not None else (None, None)
    if any(isinstance(r[0], Static) and r[0].value == "prequant"
           for r in (res1, res2)):
        raise NotImplementedError(
            "backward through a PrequantizedKernel (inference-only weights)")
    qset1, qset2 = qsets
    (x_shape, k1_shape, k2_shape, x_dtype, k1_dtype, k2_dtype,
     has_b1, has_b2, b1_dtype, b2_dtype, n_act, ffn) = meta.value
    m = _prod(x_shape[:-1])
    hidden = x_shape[-1]
    g2d = g.reshape(m, hidden)

    # --- GEMM2 bwd ---
    if qset2.x is None:
        a2d, k2 = res2[0], res2[1]
        da2d = tn_dot(g2d, k2)
        dw2 = q_dot(a2d, g2d, 0, 0)          # contract M, no .T
        d_qset2 = qset2
    elif len(res2) == 5 and isinstance(res2[4], Static):
        qa, qk2, amax_a, amax_k2 = res2[:4]    # rowwise (M,F) and (F,H)
        qg = qset2.dgrad.quantize(g2d, layout=QuantizeLayout.ROWWISE)
        da2d = q_dot(qg, qk2, 1, 1)            # (M,H) x (F,H) -> (M,F)
        dw2 = q_dot(qa, qg, 0, 0)              # contract M -> (F,H)
        d_qset2 = _update(qset2, amax_a, amax_k2, _amax_of(qg),
                          cache=kc2)
    else:
        qa_col, qk2_row, amax_a, amax_k2 = res2
        qg = qset2.dgrad.quantize(g2d)
        da2d = tn_dot(get_rowwise(qg), qk2_row)
        dw2 = tn_dot(qa_col, get_colwise(qg))
        d_qset2 = _update(qset2, amax_a, amax_k2, _amax_of(qg),
                          cache=kc2)

    # --- dact ---
    da = da2d.reshape(*x_shape[:-1], ffn).astype(x_dtype)
    if n_act == 2:
        dz = dact_lu(da, z, acts)
    else:
        dz = dact_lu(da, z[..., 0, :], acts)[..., None, :]
        dz = jnp.moveaxis(dz, -2, -2)  # shape [..., 1, ffn]
    dz2d = dz.reshape(m, n_act * ffn)

    # --- GEMM1 bwd ---
    if qset1.x is None:
        ln2d, k1 = res1[0], res1[1]
        dln2d = tn_dot(dz2d, k1)
        dw1 = q_dot(ln2d, dz2d, 0, 0)        # contract M, no .T
        d_qset1 = qset1
    elif len(res1) == 5 and isinstance(res1[4], Static):
        qx, qk1, amax_x, amax_k1 = res1[:4]    # rowwise (M,H) and (H,NF)
        qdz = qset1.dgrad.quantize(dz2d, layout=QuantizeLayout.ROWWISE)
        dln2d = q_dot(qdz, qk1, 1, 1)          # (M,NF) x (H,NF) -> (M,H)
        dw1 = q_dot(qx, qdz, 0, 0)             # contract M -> (H,NF)
        d_qset1 = _update(qset1, amax_x, amax_k1, _amax_of(qdz),
                          cache=kc1)
    else:
        qx_col, qk1_row, amax_x, amax_k1 = res1
        qdz = qset1.dgrad.quantize(dz2d)
        dln2d = tn_dot(get_rowwise(qdz), qk1_row)
        dw1 = tn_dot(qx_col, get_colwise(qdz))
        d_qset1 = _update(qset1, amax_x, amax_k1, _amax_of(qdz),
                          cache=kc1)

    # --- norm bwd ---
    dln = dln2d.reshape(x_shape).astype(x_dtype)
    if norm_type == "layernorm":
        dx, dgamma, dbeta = layernorm_bwd(
            dln, x, mu, rsigma, gamma, zero_centered_gamma=zcg)
    else:
        dx, dgamma = rmsnorm_bwd(dln, x, rsigma, gamma, zero_centered_gamma=zcg)
        dbeta = None
    dx = with_sharding_constraint_by_logical_axes(dx, input_axes)

    dk1 = dw1.reshape(k1_shape).astype(k1_dtype)
    dk2 = dw2.reshape(k2_shape).astype(k2_dtype)
    db1 = dz2d.sum(axis=0).reshape(k1_shape[1:]).astype(b1_dtype) if has_b1 else None
    db2 = g2d.sum(axis=0).reshape(k2_shape[1:]).astype(b2_dtype) if has_b2 else None
    from .quantize.microbatch import zero_cotangent
    return (dx, dgamma, dbeta, dk1, dk2, db1, db2, (d_qset1, d_qset2),
            zero_cotangent(kernel_caches))


_layernorm_mlp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


def layernorm_mlp(
    x: jax.Array,
    gamma: jax.Array,
    beta: Optional[jax.Array],
    kernel1: jax.Array,
    kernel2: jax.Array,
    bias1: Optional[jax.Array] = None,
    bias2: Optional[jax.Array] = None,
    *,
    norm_type: str = "layernorm",
    zero_centered_gamma: bool = False,
    epsilon: float = 1e-6,
    activation_type: Union[str, Sequence[str]] = ("gelu",),
    input_axes=None,
    dot1_kernel_axes=None,
    dot2_kernel_axes=None,
    intermediate_axes=None,
    quantizer_sets: Tuple[QuantizerSet, QuantizerSet] = (
        noop_quantizer_set, noop_quantizer_set),
    kernel_caches=None,
) -> jax.Array:
    """Full MLP block: ``dense(act(dense(norm(x))))``.

    ``kernel1`` has shape ``(hidden, n_act, ffn)`` where ``n_act`` is 2
    for gated activations (reference kernel layout:
    jax/layernorm_mlp.py), ``kernel2`` has shape ``(ffn, hidden)``.
    ``kernel_caches``: optional pair of per-step quantized kernels
    (microbatch cache — see :func:`transformerengine_tpu.dense`).
    """
    if activation_type == "clamped_swiglu":
        acts = "clamped_swiglu"
        n_act_expected = 2
    else:
        acts = normalize_activation_type(activation_type)
        n_act_expected = len(acts)
    if kernel1.ndim == 2:
        kernel1 = kernel1[:, None, :]
    assert kernel1.shape[-2] == n_act_expected, (
        f"kernel1 n_act dim {kernel1.shape[-2]} != {n_act_expected} activations")
    cfg = (norm_type, zero_centered_gamma, float(epsilon), acts,
           (tuple(input_axes) if input_axes else None,
            tuple(dot1_kernel_axes) if dot1_kernel_axes else None,
            tuple(dot2_kernel_axes) if dot2_kernel_axes else None,
            tuple(intermediate_axes) if intermediate_axes else None))
    return _layernorm_mlp(cfg, x, gamma, beta, kernel1, kernel2, bias1, bias2,
                          tuple(quantizer_sets),
                          tuple(kernel_caches) if kernel_caches else None)
