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
    master: any            # f32 master weights (or None-leaf pytree)


def fused_adam(
    learning_rate: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    *,
    use_master_weights: bool = False,
    adam_w_mode: bool = True,
):
    """Optax-compatible fused Adam/AdamW (reference: FusedAdam)."""

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        master = (jax.tree.map(lambda p: p.astype(jnp.float32), params)
                  if use_master_weights else None)
        return AdamState(step=jnp.zeros((), jnp.int32),
                         mu=zeros, nu=jax.tree.map(jnp.copy, zeros),
                         master=master)

    def update(grads, state, params=None):
        step = state.step + 1
        b1c = 1.0 - beta1 ** step.astype(jnp.float32)
        b2c = 1.0 - beta2 ** step.astype(jnp.float32)

        def upd(g, m, v, p, w):
            gf = g.astype(jnp.float32)
            ref = w if w is not None else p.astype(jnp.float32)
            if weight_decay and not adam_w_mode:   # classic L2
                gf = gf + weight_decay * ref
            m2 = beta1 * m + (1 - beta1) * gf
            v2 = beta2 * v + (1 - beta2) * gf * gf
            upd = (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
            if weight_decay and adam_w_mode:
                upd = upd + weight_decay * ref
            return m2, v2, -learning_rate * upd

        flat_p = params if params is not None else jax.tree.map(
            lambda m: None, state.mu)
        masters = state.master if state.master is not None else jax.tree.map(
            lambda m: None, state.mu)
        out = jax.tree.map(upd, grads, state.mu, state.nu, flat_p, masters,
                           is_leaf=lambda x: x is None)
        mu = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        updates_f32 = jax.tree.map(lambda o: o[2], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
        if use_master_weights:
            new_master = jax.tree.map(lambda w, u: w + u, state.master,
                                      updates_f32)
            updates = jax.tree.map(
                lambda w_new, p: w_new.astype(p.dtype) - p,
                new_master, params)
        else:
            new_master = None
            updates = jax.tree.map(
                lambda u, g: u.astype(g.dtype), updates_f32, grads)
        return updates, AdamState(step=step, mu=mu, nu=nu, master=new_master)

    import optax
    return optax.GradientTransformation(init, update)


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
