"""Fused optimizers: Adam(W), SGD, and Newton-Schulz (Muon) orthogonalization.

TPU counterpart of the reference fused optimizer kernels (reference:
common/multi_tensor/adam.cu, sgd.cu; pytorch/optimizers/fused_adam.py:36,
fused_sgd.py; common/newton_schulz/). On TPU a "multi-tensor apply" is
one jitted tree_map — XLA fuses the elementwise chains across the whole
pytree — so the API is an optax-style GradientTransformation. The
master-weight feature (reference FusedAdam master_weights=True) keeps
f32 masters in optimizer state while params stay bf16.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array
    mu: any
    nu: any
    master: any            # f32 masters, int16 remainders, or None leaves


class ScaledState(NamedTuple):
    """A low-precision optimizer-state leaf: per-tensor scaled payload
    (reference: FusedAdam fp8 exp_avg with per-state ``_scale`` buffers,
    pytorch/optimizers/fused_adam.py:36 + multi_tensor/adam.cu scaled
    state loads)."""
    payload: jax.Array
    scale_inv: jax.Array


# --- exact bf16 + int16-remainder master split ------------------------------
# The reference's store_param_remainders trick (fused_adam.py:36,
# multi_tensor/adam.cu ADAM_CAPTURABLE_MASTER): an f32 master is exactly
# the concatenation of its truncated-bf16 high half (the model param)
# and the low 16 mantissa bits (kept in optimizer state). Masters cost
# 2 bytes/param instead of 4 and the f32 trajectory is bit-exact.

def _split_master(master_f32):
    bits = jax.lax.bitcast_convert_type(master_f32, jnp.uint32)
    p = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16)
    rem = jax.lax.bitcast_convert_type(
        (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.int16)
    return p, rem


def _combine_master(p_bf16, rem_i16):
    hi = jax.lax.bitcast_convert_type(p_bf16, jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(rem_i16, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _is_quantized_param(p):
    from ..quantize.tensor import is_scaled
    return is_scaled(p)


def _param_value_f32(p):
    """f32 view of a param leaf (plain array or fp8 ScaledTensor1x)."""
    if _is_quantized_param(p):
        return p.dequantize().astype(jnp.float32)
    return p.astype(jnp.float32)


def _requantize_param(p_old, master_f32):
    """Write the new master back into the param leaf's storage format:
    fp8 leaves get a fresh current-scaling quantize (reference: FP8
    params re-cast from masters each step), plain leaves a cast."""
    if _is_quantized_param(p_old):
        import dataclasses as _dc
        from ..quantize import qmath
        data, scale_inv, amax = qmath.current_scale_quantize(
            master_f32, p_old.data.dtype)
        return _dc.replace(
            p_old, data=data,
            scale_inv=scale_inv.astype(p_old.scale_inv.dtype),
            amax=amax.reshape(1) if p_old.amax is not None else None)
    return master_f32.astype(p_old.dtype)


def _enc_state(x_f32, dtype):
    if dtype == jnp.float32:
        return x_f32
    if jnp.dtype(dtype).itemsize == 2:
        return x_f32.astype(dtype)
    from ..quantize import qmath
    data, scale_inv, _ = qmath.current_scale_quantize(x_f32, dtype)
    return ScaledState(data, scale_inv)


def _dec_state(x, dtype):
    if dtype == jnp.float32:
        return x
    if isinstance(x, ScaledState):
        return (x.payload.astype(jnp.float32)
                * x.scale_inv.astype(jnp.float32).reshape(()))
    return x.astype(jnp.float32)


class FusedAdamTransformation(NamedTuple):
    """optax GradientTransformation plus a ``step`` closure.

    ``step(grads, state, params) -> (new_params, new_state)`` applies the
    update itself — required for bit-exact remainder masters and for fp8
    param leaves (the optax ``p + updates`` contract cannot express
    either: a bf16 RNE add can land 1 ulp off the truncated master
    split, and quantized leaves are pytrees, not addable arrays)."""
    init: any
    update: any
    step: any


def fused_adam(
    learning_rate: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    *,
    use_master_weights: bool = False,
    adam_w_mode: bool = True,
    store_param_remainders: bool = False,
    exp_avg_dtype=jnp.float32,
    exp_avg_sq_dtype=jnp.float32,
):
    """Optax-compatible fused Adam/AdamW (reference: FusedAdam,
    pytorch/optimizers/fused_adam.py:36 + common/multi_tensor/adam.cu).

    Low-precision extensions (all functional, orbax-checkpointable):

    * ``store_param_remainders``: bf16 param leaves keep an *int16
      remainder* instead of an f32 master — ``(param, remainder)`` is the
      exact bit-split of the f32 master, so the f32 Adam trajectory is
      bit-exact at 2 master bytes/param (reference
      store_param_remainders). Non-bf16 / quantized leaves fall back to
      f32 masters.
    * fp8 params: leaves may be per-tensor-scaled ``ScaledTensor1x`` —
      each step re-quantizes the new master into the leaf's storage
      (reference: FP8 model params re-cast from masters).
    * ``exp_avg_dtype`` / ``exp_avg_sq_dtype``: bf16/f16 states stored as
      plain casts; fp8 states as :class:`ScaledState` per-tensor scaled
      payloads (reference scaled-state FusedAdam).

    Exact-apply paths (remainders, fp8 params) go through ``.step``; the
    optax ``update`` contract stays available for the plain/f32-master
    configurations.
    """
    from ..quantize.tensor import is_scaled

    def _p_leaf(x):
        return x is None or is_scaled(x)

    def _flat(tree):
        return jax.tree.flatten(tree, is_leaf=_p_leaf)

    def _state_leaf(x):
        return x is None or isinstance(x, ScaledState)

    def _master_for(p):
        if store_param_remainders and not is_scaled(p) \
                and p.dtype == jnp.bfloat16:
            # f32(bf16 param) has zero low mantissa bits -> remainder 0.
            return jnp.zeros(p.shape, jnp.int16)
        if use_master_weights or store_param_remainders:
            return _param_value_f32(p)
        return None

    def _shape_of(p):
        return p.data.shape if is_scaled(p) else p.shape

    def init(params):
        pl, treedef = _flat(params)
        mu = [_enc_state(jnp.zeros(_shape_of(p), jnp.float32),
                         exp_avg_dtype) for p in pl]
        nu = [_enc_state(jnp.zeros(_shape_of(p), jnp.float32),
                         exp_avg_sq_dtype) for p in pl]
        master = [_master_for(p) for p in pl]
        return AdamState(step=jnp.zeros((), jnp.int32),
                         mu=jax.tree.unflatten(treedef, mu),
                         nu=jax.tree.unflatten(treedef, nu),
                         master=jax.tree.unflatten(treedef, master))

    def _adam_math(step, g, m, v, ref):
        gf = g.astype(jnp.float32)
        b1c = 1.0 - beta1 ** step.astype(jnp.float32)
        b2c = 1.0 - beta2 ** step.astype(jnp.float32)
        if weight_decay and not adam_w_mode:   # classic L2
            gf = gf + weight_decay * ref
        m2 = beta1 * m + (1 - beta1) * gf
        v2 = beta2 * v + (1 - beta2) * gf * gf
        u = (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
        if weight_decay and adam_w_mode:
            u = u + weight_decay * ref
        return m2, v2, ref - learning_rate * u

    def _run(grads, state, params):
        """Shared core: returns (new_params_flat, new_state) on the
        flattened leaves."""
        assert params is not None, "fused_adam needs params"
        pl, treedef = _flat(params)
        gl = jax.tree.leaves(grads, is_leaf=_p_leaf)
        ml = jax.tree.leaves(state.mu, is_leaf=_state_leaf)
        vl = jax.tree.leaves(state.nu, is_leaf=_state_leaf)
        wl = jax.tree.leaves(state.master, is_leaf=_state_leaf)
        assert len(pl) == len(gl) == len(ml) == len(vl) == len(wl), (
            "grads/state trees do not match the params tree "
            f"({len(pl)} params vs {len(gl)} grads, {len(ml)}/{len(vl)}/"
            f"{len(wl)} state leaves)")
        step = state.step + 1
        new_p, new_m, new_v, new_w = [], [], [], []
        for p, g, m, v, w in zip(pl, gl, ml, vl, wl):
            if isinstance(w, jax.Array) and w.dtype == jnp.int16:
                ref = _combine_master(p, w)
            elif w is not None:
                ref = w
            else:
                ref = _param_value_f32(p)
            m2, v2, master2 = _adam_math(
                step, g, _dec_state(m, exp_avg_dtype),
                _dec_state(v, exp_avg_sq_dtype), ref)
            new_m.append(_enc_state(m2, exp_avg_dtype))
            new_v.append(_enc_state(v2, exp_avg_sq_dtype))
            if isinstance(w, jax.Array) and w.dtype == jnp.int16:
                p2, rem2 = _split_master(master2)
                new_p.append(p2)
                new_w.append(rem2)
            elif w is not None:
                new_p.append(_requantize_param(p, master2))
                new_w.append(master2)
            else:
                new_p.append(_requantize_param(p, master2))
                new_w.append(None)
        st = AdamState(step=step,
                       mu=jax.tree.unflatten(treedef, new_m),
                       nu=jax.tree.unflatten(treedef, new_v),
                       master=jax.tree.unflatten(treedef, new_w))
        return jax.tree.unflatten(treedef, new_p), st

    def adam_step(grads, state, params):
        return _run(grads, state, params)

    def update(grads, state, params=None):
        if store_param_remainders:
            raise ValueError(
                "store_param_remainders needs the exact-apply path: use "
                ".step(grads, state, params) -> (new_params, new_state)")
        pl, _ = _flat(params if params is not None
                      else jax.tree.map(lambda m: None, state.mu,
                                        is_leaf=_state_leaf))
        if any(is_scaled(p) for p in pl):
            raise ValueError(
                "quantized param leaves need .step(grads, state, params)")
        if params is None:
            # Stateless path (no masters, no weight-decay ref): emit the
            # raw Adam delta in the grad dtype.
            assert not use_master_weights and not weight_decay
            step = state.step + 1
            gl, treedef = _flat(grads)
            ml = jax.tree.leaves(state.mu, is_leaf=_state_leaf)
            vl = jax.tree.leaves(state.nu, is_leaf=_state_leaf)
            out_u, out_m, out_v = [], [], []
            for g, m, v in zip(gl, ml, vl):
                m2, v2, master2 = _adam_math(
                    step, g, _dec_state(m, exp_avg_dtype),
                    _dec_state(v, exp_avg_sq_dtype), jnp.zeros((), jnp.float32))
                out_u.append(master2.astype(g.dtype))
                out_m.append(_enc_state(m2, exp_avg_dtype))
                out_v.append(_enc_state(v2, exp_avg_sq_dtype))
            st = AdamState(step=step,
                           mu=jax.tree.unflatten(treedef, out_m),
                           nu=jax.tree.unflatten(treedef, out_v),
                           master=state.master)
            return jax.tree.unflatten(treedef, out_u), st
        new_params, st = _run(grads, state, params)
        updates = jax.tree.map(lambda pn, p: pn - p, new_params, params)
        return updates, st

    return FusedAdamTransformation(init, update, adam_step)


def fused_sgd(learning_rate: float = 1e-3, momentum: float = 0.0,
              weight_decay: float = 0.0, nesterov: bool = False):
    """(reference: FusedSGD / multi_tensor/sgd.cu)"""
    import optax
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    chain.append(optax.scale(-learning_rate))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Newton-Schulz orthogonalization (Muon)
# ---------------------------------------------------------------------------

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz(g: jax.Array, steps: int = 5,
                  coeffs: Tuple[float, float, float] = _NS_COEFFS,
                  eps: float = 1e-7) -> jax.Array:
    """Quintic Newton-Schulz iteration orthogonalizing ``g``
    (reference: common/newton_schulz/ nvte_newton_schulz; Muon). Pure
    MXU matmuls in bf16 with an f32 norm, exactly the published recipe."""
    a, b, c = coeffs
    transpose = g.shape[-2] > g.shape[-1]
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    x = x / (jnp.linalg.norm(x.astype(jnp.float32),
                             axis=(-2, -1), keepdims=True) + eps).astype(
        jnp.bfloat16)

    def body(x, _):
        xxt = jnp.matmul(x, jnp.swapaxes(x, -1, -2))
        bxx = b * xxt + c * jnp.matmul(xxt, xxt)
        return a * x + jnp.matmul(bxx, x), ()

    x, _ = jax.lax.scan(body, x, None, length=steps)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(g.dtype)


def muon(learning_rate: float = 0.02, momentum: float = 0.95,
         ns_steps: int = 5, nesterov: bool = True):
    """Muon optimizer: momentum + Newton-Schulz orthogonalized update for
    2D params; Adam-style fallback handled by the caller masking."""
    import optax

    def init(params):
        return jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)

    def update(grads, state, params=None):
        new_state = jax.tree.map(
            lambda g, m: momentum * m + g.astype(jnp.float32), grads, state)
        eff = (jax.tree.map(lambda g, m: g.astype(jnp.float32) + momentum * m,
                            grads, new_state)
               if nesterov else new_state)

        def orth(u):
            if u.ndim == 2:
                o = newton_schulz(u, ns_steps)
                return o * jnp.sqrt(jnp.maximum(1.0, u.shape[-2] / u.shape[-1]))
            return u
        updates = jax.tree.map(
            lambda u: (-learning_rate * orth(u)), eff)
        return updates, new_state

    return optax.GradientTransformation(init, update)
