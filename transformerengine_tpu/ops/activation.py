"""Activation functions with quantize fusion.

TPU counterpart of the reference activation kernel family (reference:
common/activation/ — nvte_gelu ... nvte_clamped_dswiglu_v2, activation.h;
jax/cpp_extensions/activation.py act_lu). On TPU these are VPU
elementwise ops that XLA fuses into neighbouring matmuls, so "fused
activation+quantize" falls out of writing them as one jitted function;
the Pallas quantize kernels consume the result in VMEM.

Gated activations take input shaped ``[..., 2, H]`` (the two halves of
the up-projection, matching the reference's GeGLU/SwiGLU convention) and
return ``[..., H]``.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


# ---------------------------------------------------------------------------
# Scalar activations (fwd). Computed in f32 for numerical parity with the
# reference kernels, cast back by callers.
# ---------------------------------------------------------------------------

def gelu(x):
    """tanh-approximated GELU (the reference's default, activation/gelu.cu)."""
    x = x.astype(jnp.float32)
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x**3)))


def qgelu(x):
    """Sigmoid-approximated ("quick") GELU."""
    x = x.astype(jnp.float32)
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x):
    x = x.astype(jnp.float32)
    return x * jax.nn.sigmoid(x)


def relu(x):
    return jnp.maximum(x.astype(jnp.float32), 0.0)


def srelu(x):
    """Squared ReLU (reference: activation/srelu)."""
    x = x.astype(jnp.float32)
    return jnp.where(x > 0, x * x, 0.0)


def clamped_silu(x, limit: float = 7.0, alpha: float = 1.702):
    """GPT-OSS-style clamped SiLU: v*sigmoid(alpha*v), v = min(x, limit)
    (reference: util/math.h clamped_silu / ClampedSwiGLUParam)."""
    v = jnp.minimum(x.astype(jnp.float32), limit)
    return v * jax.nn.sigmoid(alpha * v)


def clamped_swiglu(x, limit: float = 7.0, alpha: float = 1.702,
                   linear_offset: float = 1.0):
    """Gated clamped swiglu on [..., 2, H] input (reference:
    nvte_clamped_swiglu, vectorized_pointwise.h gate clamp+offset)."""
    act = clamped_silu(x[..., 0, :], limit, alpha)
    gate = jnp.clip(x[..., 1, :].astype(jnp.float32), -limit, limit)         + linear_offset
    return (act * gate).astype(x.dtype)


_ACT = {
    "gelu": gelu,
    "qgelu": qgelu,
    "silu": silu,
    "swish": silu,
    "relu": relu,
    "srelu": srelu,
    "linear": lambda x: x.astype(jnp.float32),
    "quick_gelu": qgelu,
}

# Gated spellings accepted for convenience (reference activation.h names).
GATED_ALIASES = {
    "geglu": ("gelu", "linear"),
    "swiglu": ("silu", "linear"),
    "reglu": ("relu", "linear"),
    "qgeglu": ("qgelu", "linear"),
    "sreglu": ("srelu", "linear"),
}


def normalize_activation_type(
    activation_type: Union[str, Sequence[str]]) -> Tuple[str, ...]:
    # clamped_swiglu is gated but not an act(x0)*x1 pair (the gate is
    # clipped and offset) — it stays a sentinel handled where applied.
    if activation_type in ("clamped_swiglu", ("clamped_swiglu",)):
        return ("clamped_swiglu",)
    if isinstance(activation_type, str):
        acts = GATED_ALIASES.get(activation_type, (activation_type,))
    else:
        acts = tuple(activation_type)
    for a in acts:
        if a not in _ACT:
            raise ValueError(
                f"unknown activation {a!r}; one of {sorted(_ACT)} or gated "
                f"aliases {sorted(GATED_ALIASES)}")
    return acts


def is_gated(activation_type: Union[str, Sequence[str]]) -> bool:
    acts = normalize_activation_type(activation_type)
    return len(acts) == 2 or acts == ("clamped_swiglu",)


def act_lu(
    x: jax.Array,
    activation_type: Union[str, Sequence[str]] = ("gelu",),
    quantizer=None,
):
    """Apply an (optionally gated) activation, optionally quantizing the
    result (reference: jax/cpp_extensions/activation.py act_lu and the
    nvte_*_quantize fused kernels).

    For gated activations ``x`` has shape ``[..., 2, H]``:
    ``out = act(x[..., 0, :]) * x[..., 1, :]``.
    """
    if activation_type == "clamped_swiglu":
        out = clamped_swiglu(x)
        return quantizer.quantize(out) if quantizer is not None else out
    acts = normalize_activation_type(activation_type)
    if len(acts) == 2:
        assert x.shape[-2] == 2, f"gated activation needs [..., 2, H], got {x.shape}"
        a = _ACT[acts[0]](x[..., 0, :])
        g = _ACT[acts[1]](x[..., 1, :])
        out = a * g
    else:
        out = _ACT[acts[0]](x)
    out = out.astype(x.dtype)
    if quantizer is not None:
        return quantizer.quantize(out)
    return out


def dact_lu(
    dz: jax.Array,
    x: jax.Array,
    activation_type: Union[str, Sequence[str]] = ("gelu",),
    quantizer=None,
):
    """VJP of :func:`act_lu` w.r.t. ``x``, optionally quantized — the
    reference's fused dact(+quantize) backward kernels
    (common/cast/dispatch/gated.cuh). Shapes mirror act_lu.
    """
    if activation_type == "clamped_swiglu":
        _, vjp = jax.vjp(lambda xin: clamped_swiglu(xin).astype(dz.dtype), x)
        (dx,) = vjp(dz)
        dx = dx.astype(x.dtype)
        return quantizer.quantize(dx) if quantizer is not None else dx
    acts = normalize_activation_type(activation_type)

    if len(acts) == 2:
        def f(xin):
            a = _ACT[acts[0]](xin[..., 0, :])
            g = _ACT[acts[1]](xin[..., 1, :])
            return (a * g).astype(dz.dtype)
    else:
        def f(xin):
            return _ACT[acts[0]](xin).astype(dz.dtype)

    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(dz)
    dx = dx.astype(x.dtype)
    if quantizer is not None:
        return quantizer.quantize(dx)
    return dx
