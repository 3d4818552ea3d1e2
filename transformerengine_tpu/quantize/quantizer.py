"""Quantizer hierarchy — the functional quantization state machine.

TPU re-design of the reference's quantizer stack (reference:
jax/quantize/quantizer.py:76-1059, pytorch/quantized_tensor.py:205).
Quantizers are frozen pytree dataclasses: any state they carry (delayed
scaling's scale + amax history) is explicit data threaded through the
step function, so everything works under jit/scan/shard_map with no
global mutable state.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import qmath
from .dtypes import float4_e2m1, float8_e4m3
from .hadamard import apply_rht
from .scaling_modes import ScalingMode
from .tensor import ScaledTensor1x, ScaledTensor2x, make_scaled_tensor


class QuantizeLayout(enum.Enum):
    ROWWISE = enum.auto()
    COLWISE = enum.auto()
    ROWWISE_COLWISE = enum.auto()

    @property
    def is_2x(self) -> bool:
        return self is QuantizeLayout.ROWWISE_COLWISE


def _2d_views(x: jax.Array, flatten_axis: int):
    """Return (rowwise 2D view, colwise 2D view, colwise ND shape)."""
    fa = flatten_axis % max(x.ndim, 1)
    rows = 1
    for d in x.shape[:fa]:
        rows *= d
    cols = 1
    for d in x.shape[fa:]:
        cols *= d
    x2d = x.reshape(rows, cols)
    t_shape = x.shape[fa:] + x.shape[:fa]
    return x2d, x2d.T, t_shape


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Quantizer:
    """Base quantizer. Subclasses implement `_quantize_2d`."""

    q_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True))
    scaling_mode: ScalingMode = dataclasses.field(metadata=dict(static=True))
    q_layout: QuantizeLayout = dataclasses.field(metadata=dict(static=True))

    # ---- subclass hooks --------------------------------------------------
    def _quantize_2d(self, x2d, key, is_colwise=False):
        """Quantize a 2D array along its last axis.

        Returns (data2d, scale_inv, tensor_scale_inv|None, amax|None).
        """
        raise NotImplementedError

    def _fused_2x(self, x2d, key):
        """Optional single-pass rowwise+colwise kernel. Returns
        (row_data, row_scale_inv, col_data, col_scale_inv, ts_inv, amax)
        or None to use the generic two-pass path. Must be bit-identical
        to `_quantize_2d` (tests enforce this)."""
        return None

    def _fused_1x(self, x2d, key, is_colwise):
        """Optional single-orientation kernel taking the UNTRANSPOSED 2D
        view (colwise variants transpose in VMEM). Returns
        (data_in_stored_layout, scale_inv, ts_inv, amax) or None. Must be
        bit-identical to `_quantize_2d` (tests enforce this)."""
        return None

    # ---- public API -------------------------------------------------------
    def quantize(
        self,
        x: jax.Array,
        *,
        dq_dtype=None,
        flatten_axis: int = -1,
        key: Optional[jax.Array] = None,
        layout: Optional[QuantizeLayout] = None,
    ):
        """Quantize ``x``. ``layout`` overrides the quantizer's configured
        ``q_layout`` for this call — layers use it to skip the colwise
        usage when the recipe's scaling is per-tensor (the payload would
        be an exact transpose; dgrad/wgrad contract the rowwise payload
        along whatever axis is needed instead — see ops/gemm.q_dot)."""
        q_layout = layout if layout is not None else self.q_layout
        dq_dtype = jnp.dtype(dq_dtype or x.dtype)
        fa = flatten_axis % max(x.ndim, 1)
        x2d, x2d_t, t_shape = _2d_views(x, fa)

        def build(v2d, nd_shape, layout, this_fa, key):
            data, s_inv, ts_inv, amax = self._quantize_2d(
                v2d, key, is_colwise=(layout == "T"))
            return make_scaled_tensor(
                data.reshape(nd_shape), s_inv, scaling_mode=self.scaling_mode,
                dq_dtype=dq_dtype, amax=amax, tensor_scale_inv=ts_inv,
                layout=layout, flatten_axis=this_fa)

        kr, kc = (jax.random.split(key) if key is not None else (None, None))
        if q_layout is QuantizeLayout.ROWWISE:
            f = self._fused_1x(x2d, kr, False)
            if f is not None:
                data, s_inv, ts_inv, amax = f
                return make_scaled_tensor(
                    data.reshape(x.shape), s_inv,
                    scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
                    amax=amax, tensor_scale_inv=ts_inv, layout="N",
                    flatten_axis=fa)
            return build(x2d, x.shape, "N", fa, kr)
        if q_layout is QuantizeLayout.COLWISE:
            f = self._fused_1x(x2d, kc, True)
            if f is not None:
                data, s_inv, ts_inv, amax = f
                return make_scaled_tensor(
                    data.reshape(t_shape), s_inv,
                    scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
                    amax=amax, tensor_scale_inv=ts_inv, layout="T",
                    flatten_axis=x.ndim - fa)
            return build(x2d_t, t_shape, "T", x.ndim - fa, kc)
        fused = self._fused_2x(x2d, key)
        if fused is not None:
            rdat, rs, cdat, cs, ts_inv, amax = fused
            # NVFP4 with RHT has per-orientation tensor scales / amaxes
            # (the colwise usage is rotated); tuples carry both.
            ts_r, ts_c = ts_inv if isinstance(ts_inv, tuple) else (ts_inv,) * 2
            am_r, am_c = amax if isinstance(amax, tuple) else (amax,) * 2
            rw = make_scaled_tensor(
                rdat.reshape(x.shape), rs, scaling_mode=self.scaling_mode,
                dq_dtype=dq_dtype, amax=am_r, tensor_scale_inv=ts_r,
                layout="N", flatten_axis=fa)
            cw = make_scaled_tensor(
                cdat.reshape(t_shape), cs, scaling_mode=self.scaling_mode,
                dq_dtype=dq_dtype, amax=am_c, tensor_scale_inv=ts_c,
                layout="T", flatten_axis=x.ndim - fa)
            return ScaledTensor2x(rowwise=rw, colwise=cw)
        rw = build(x2d, x.shape, "N", fa, kr)
        if self.scaling_mode.is_tensor_scaling:
            # Same scale both ways -> colwise payload is an exact transpose.
            cw = make_scaled_tensor(
                rw.data.reshape(x2d.shape).T.reshape(t_shape), rw.scale_inv,
                scaling_mode=self.scaling_mode, dq_dtype=dq_dtype, amax=rw.amax,
                tensor_scale_inv=rw.tensor_scale_inv, layout="T",
                flatten_axis=x.ndim - fa)
        else:
            cw = build(x2d_t, t_shape, "T", x.ndim - fa, kc)
        return ScaledTensor2x(rowwise=rw, colwise=cw)

    def update(self, amax: jax.Array) -> "Quantizer":
        """End-of-step state update (no-op for stateless quantizers)."""
        return self


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CurrentScaleQuantizer(Quantizer):
    """Per-tensor scaling from the current amax
    (reference: jax/quantize/quantizer.py:218)."""

    def _quantize_2d(self, x2d, key, is_colwise=False):
        data, s_inv, amax = qmath.current_scale_quantize(x2d, self.q_dtype, key)
        return data, s_inv, None, amax

    def _fused_2x(self, x2d, key):
        from ..ops.quantize_kernels import (
            _fused_enabled, cast_transpose, pick_tile)
        m, n = x2d.shape
        tm, tn = pick_tile(m), pick_tile(n, align=128)
        if key is not None or not _fused_enabled() or tm is None or tn is None:
            return None
        amax = qmath.compute_amax(x2d)
        scale = qmath.compute_scale_from_amax(amax, self.q_dtype)
        row, col, _ = cast_transpose(x2d, scale.reshape(1), self.q_dtype,
                                     tile=(tm, tn))
        s_inv = (1.0 / scale).reshape(1)
        return row, s_inv, col, s_inv, None, amax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DelayedScaleQuantizer(Quantizer):
    """Per-tensor scaling from an amax *history* carried across steps
    (reference: jax/quantize/quantizer.py:321, recipe DelayedScaling).

    ``scale`` and ``amax_history`` are pytree data: the training loop (or
    the Flax module's mutable collection) threads the updated quantizer
    returned by :meth:`update` into the next step.
    """

    scale: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.ones((1,), jnp.float32))
    amax_history: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1024,), jnp.float32))
    margin: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    amax_compute_algo: str = dataclasses.field(default="max", metadata=dict(static=True))

    def _quantize_2d(self, x2d, key, is_colwise=False):
        data, s_inv, amax = qmath.tensor_scale_quantize(
            x2d, self.q_dtype, self.scale.reshape(()), key)
        return data, s_inv, None, amax

    def _fused_2x(self, x2d, key):
        from ..ops.quantize_kernels import (
            _fused_enabled, cast_transpose, pick_tile)
        m, n = x2d.shape
        tm, tn = pick_tile(m), pick_tile(n, align=128)
        if key is not None or not _fused_enabled() or tm is None or tn is None:
            return None
        row, col, amax = cast_transpose(
            x2d, self.scale.reshape(1), self.q_dtype, tile=(tm, tn))
        s_inv = (1.0 / self.scale).reshape(1)
        return row, s_inv, col, s_inv, None, amax[0]

    def quantize_normed(self, x2d, gamma, beta, *, norm: str,
                        zero_centered_gamma: bool, epsilon: float,
                        dq_dtype=None, layout=None):
        """Fused normalization + dual-orientation quantize
        (ops/quantize_kernels.norm_cast_transpose): returns
        (ScaledTensor2x, mu | None, rsigma) without materializing the
        normalized bf16 intermediate, bit-identical to
        normalization.*_fwd -> quantize (reference:
        common/normalization/ FP8-output fusion). Returns None when the
        fused kernel does not apply (off-TPU auto, unaligned shapes)."""
        import os
        from ..ops.quantize_kernels import (_fused_enabled,
                                            norm_cast_transpose)
        env = os.environ.get("TE_TPU_FUSED_LN_QUANTIZE", "auto")
        if env == "0":
            return None
        if env != "1" and (not _fused_enabled()
                           or jax.default_backend() != "tpu"):
            return None
        m, h = x2d.shape
        if m % 8 or h % 128 or m < 256:
            return None
        outs = norm_cast_transpose(
            x2d, gamma, beta, self.scale.reshape(1), self.q_dtype,
            norm=norm, zero_centered_gamma=zero_centered_gamma,
            epsilon=epsilon)
        row, col, amax = outs[0], outs[1], outs[2]
        rsigma = outs[3].reshape(m)
        mu = outs[4].reshape(m) if norm == "layernorm" else None
        dq_dtype = jnp.dtype(dq_dtype or x2d.dtype)
        s_inv = (1.0 / self.scale).reshape(1)
        rw = make_scaled_tensor(
            row, s_inv, scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
            amax=amax[0], layout="N", flatten_axis=1)
        if layout is QuantizeLayout.ROWWISE:
            return rw, mu, rsigma
        cw = make_scaled_tensor(
            col, s_inv, scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
            amax=amax[0], layout="T", flatten_axis=1)
        return ScaledTensor2x(rowwise=rw, colwise=cw), mu, rsigma

    def update(self, amax: jax.Array) -> "DelayedScaleQuantizer":
        """Record this step's (possibly all-reduced) amax, roll the history,
        and recompute the scale — the reference's
        amax_and_scale_update kernel (common/recipe/delayed_scaling.cu)."""
        hist = self.amax_history.at[0].set(jnp.asarray(amax, jnp.float32).reshape(()))
        if self.amax_compute_algo == "max":
            amax_red = jnp.max(hist)
        else:  # most_recent
            amax_red = hist[0]
        new_scale = qmath.compute_scale_from_amax(amax_red, self.q_dtype, self.margin)
        new_hist = jnp.roll(hist, -1).at[0].set(0.0)
        return dataclasses.replace(
            self, scale=new_scale.reshape(1), amax_history=new_hist)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockScaleQuantizer(Quantizer):
    """MXFP8 (E8M0 32-block) and FP8-blockwise (fp32 128 / 128x128 block)
    quantization (reference: jax/quantize/quantizer.py:474)."""

    pow2_scales: bool = dataclasses.field(default=True, metadata=dict(static=True))

    def _quantize_2d(self, x2d, key, is_colwise=False):
        if self.scaling_mode is ScalingMode.MXFP8_1D_SCALING:
            data, scale = qmath.mxfp8_quantize(x2d, self.q_dtype, key)
            return data, scale, None, None
        br, bc = self.scaling_mode.block_shape
        data, s_inv = qmath.block_quantize(
            x2d, self.q_dtype, br, bc, self.pow2_scales, key)
        return data, s_inv, None, None

    def _fused_2x(self, x2d, key):
        if self.scaling_mode is not ScalingMode.MXFP8_1D_SCALING:
            return None
        from ..ops.quantize_kernels import (
            _fused_enabled, mxfp8_quantize_2x, pick_tile)
        m, n = x2d.shape
        if key is not None or not _fused_enabled() or m % 32 or n % 32:
            return None
        tm, tn = pick_tile(m, align=32), pick_tile(n, align=128)
        if tm is None or tn is None or tm % 32 or tn % 32:
            return None
        row, col, srow, scol = mxfp8_quantize_2x(
            x2d, self.q_dtype, tile=(tm, tn))
        return row, srow, col, scol, None, None

    def quantize_normed(self, x2d, gamma, beta, *, norm: str,
                        zero_centered_gamma: bool, epsilon: float,
                        dq_dtype=None, layout=None):
        """Fused normalization + MXFP8 quantize
        (ops/quantize_kernels.mxfp8_norm_quantize_2x); returns
        (ScaledTensor2x | rowwise ScaledTensor1x, mu | None, rsigma) or
        None when not applicable. Bit-identical to
        normalization.*_fwd -> quantize."""
        import os
        from ..ops.quantize_kernels import (_fused_enabled,
                                            mxfp8_norm_quantize_2x)
        if self.scaling_mode is not ScalingMode.MXFP8_1D_SCALING:
            return None
        env = os.environ.get("TE_TPU_FUSED_LN_QUANTIZE", "auto")
        if env == "0":
            return None
        if env != "1" and (not _fused_enabled()
                           or jax.default_backend() != "tpu"):
            return None
        m, h = x2d.shape
        if m % 256 or h % 128:
            return None
        rowwise_only = layout is QuantizeLayout.ROWWISE
        outs = mxfp8_norm_quantize_2x(
            x2d, gamma, beta, self.q_dtype, norm=norm,
            zero_centered_gamma=zero_centered_gamma, epsilon=epsilon,
            rowwise_only=rowwise_only)
        row, col, srow, scol = outs[:4]
        rsigma = outs[4].reshape(m)
        mu = outs[5].reshape(m) if norm == "layernorm" else None
        dq_dtype = jnp.dtype(dq_dtype or x2d.dtype)
        rw = make_scaled_tensor(
            row, srow, scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
            layout="N", flatten_axis=1)
        if rowwise_only:
            return rw, mu, rsigma
        cw = make_scaled_tensor(
            col, scol, scaling_mode=self.scaling_mode, dq_dtype=dq_dtype,
            layout="T", flatten_axis=1)
        return ScaledTensor2x(rowwise=rw, colwise=cw), mu, rsigma

    def _fused_1x(self, x2d, key, is_colwise):
        if self.scaling_mode is not ScalingMode.MXFP8_1D_SCALING:
            return None
        from ..ops.quantize_kernels import (
            _fused_enabled, mxfp8_quantize_1x, pick_tile)
        m, n = x2d.shape
        if key is not None or not _fused_enabled() or m % 32 or n % 32:
            return None
        tm, tn = pick_tile(m, align=32), pick_tile(n, align=128)
        if tm is None or tn is None or tm % 32 or tn % 32:
            return None
        data, scale = mxfp8_quantize_1x(
            x2d, self.q_dtype, colwise=is_colwise, tile=(tm, tn))
        return data, scale, None, None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NVFP4Quantizer(Quantizer):
    """NVFP4 two-level quantizer with optional random Hadamard transform
    and stochastic rounding (reference: jax/quantize/quantizer.py:586,
    pytorch/tensor/nvfp4_tensor.py:113)."""

    with_rht: bool = dataclasses.field(default=False, metadata=dict(static=True))
    rht_sign_mask: int = dataclasses.field(default=0, metadata=dict(static=True))
    stochastic_rounding: bool = dataclasses.field(default=False, metadata=dict(static=True))
    four_over_six: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def _quantize_2d(self, x2d, key, is_colwise=False):
        # RHT is applied only to the colwise usage: the two colwise
        # operands meet in the wgrad GEMM contracting over tokens, where
        # the rotations cancel (H H^T = I). Rowwise usages feed fwd/dgrad
        # GEMMs whose partners are unrotated
        # (reference: jax/quantize/quantizer.py:711,730-733).
        if self.with_rht and is_colwise:
            x2d = apply_rht(x2d, self.rht_sign_mask)
        if not self.stochastic_rounding:
            key = None
        data, block_scale, ts_inv, amax = qmath.nvfp4_quantize(
            x2d, key, block_shape=self.scaling_mode.block_shape,
            four_over_six=self.four_over_six)
        return data, block_scale, ts_inv, amax

    def _fused_2x(self, x2d, key):
        """Single-pass Pallas RHT + two-level cast for the (1,16) 1D mode
        (reference: common/hadamard_transform/ fused cast family)."""
        from ..ops.quantize_kernels import (
            _fused_enabled, nvfp4_amax_2x, nvfp4_quantize_2x, pick_tile)
        from .hadamard import rht_matrix_np
        if not _fused_enabled() or self.four_over_six:
            return None
        if self.scaling_mode.block_shape != (1, 16):
            return None
        stochastic = self.stochastic_rounding and key is not None
        if stochastic and jax.default_backend() != "tpu":
            return None  # in-kernel PRNG has no interpret-mode lowering
        m, n = x2d.shape
        tm, tn = pick_tile(m, align=16), pick_tile(n, align=128)
        if tm is None or tn is None or tm % 16 or tn % 16:
            return None
        rht = rht_matrix_np(self.rht_sign_mask) if self.with_rht else None
        arow, acol = nvfp4_amax_2x(x2d, rht, (tm, tn))
        denom = qmath.dtype_max(float4_e2m1) * qmath.dtype_max(float8_e4m3)
        ts_row = jnp.where(arow > 0, arow / denom, jnp.float32(1.0))
        ts_col = jnp.where(acol > 0, acol / denom, jnp.float32(1.0))
        seed = jax.random.bits(key, (), jnp.uint32) if stochastic else None
        row, srow, col, scol = nvfp4_quantize_2x(
            x2d, ts_row, ts_col, rht, seed=seed, tile=(tm, tn))
        return (row, srow, col, scol,
                (ts_row.reshape(1), ts_col.reshape(1)), (arow, acol))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoopQuantizer(Quantizer):
    """Pass-through 'quantizer' used when quantization is disabled for a
    tensor role (reference: higher-precision fallback paths)."""

    def quantize(self, x, *, dq_dtype=None, flatten_axis=-1, key=None,
                 layout=None):
        return x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizerSet:
    """The per-GEMM trio of quantizers: activation input, weight, and
    incoming gradient (reference: jax/quantize/quantizer.py QuantizerSet)."""

    x: Optional[Quantizer]
    kernel: Optional[Quantizer]
    dgrad: Optional[Quantizer]

    def update(self, amaxes: "QuantizerSet") -> "QuantizerSet":
        return QuantizerSet(
            x=self.x.update(amaxes.x) if self.x is not None else None,
            kernel=self.kernel.update(amaxes.kernel) if self.kernel is not None else None,
            dgrad=self.dgrad.update(amaxes.dgrad) if self.dgrad is not None else None,
        )


noop_quantizer_set = QuantizerSet(x=None, kernel=None, dgrad=None)
