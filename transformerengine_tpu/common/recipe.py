"""Quantization recipes.

Re-design of the reference recipe dataclasses (reference:
transformer_engine/common/recipe/__init__.py:107-619) as plain frozen
dataclasses. A recipe is pure configuration; the QuantizerFactory turns
it into concrete quantizer pytrees.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ..quantize.dtypes import float4_e2m1, float8_e4m3, float8_e5m2


@dataclasses.dataclass(frozen=True)
class Format:
    """FP8 format pair: dtype used for fwd (activations/weights) and bwd
    (gradients) (reference: recipe/__init__.py:29-50)."""

    name: str
    fwd_dtype: jnp.dtype
    bwd_dtype: jnp.dtype


E4M3 = Format("E4M3", jnp.dtype(float8_e4m3), jnp.dtype(float8_e4m3))
E5M2 = Format("E5M2", jnp.dtype(float8_e5m2), jnp.dtype(float8_e5m2))
HYBRID = Format("HYBRID", jnp.dtype(float8_e4m3), jnp.dtype(float8_e5m2))
E2M1 = Format("E2M1", jnp.dtype(float4_e2m1), jnp.dtype(float4_e2m1))


@dataclasses.dataclass(frozen=True)
class QParams:
    """Per-tensor quantization knobs (reference: recipe/__init__.py:77)."""

    power_2_scale: bool = False
    amax_epsilon: float = 0.0
    random_hadamard_transform: bool = False
    stochastic_rounding: bool = False
    fp4_2d_quantization: bool = False


@dataclasses.dataclass(frozen=True)
class MMParams:
    """Per-GEMM knobs (reference: recipe/__init__.py:53)."""

    use_split_accumulator: bool = True


@dataclasses.dataclass(frozen=True)
class Recipe:
    """Base class for all recipes."""

    def mxfp8(self) -> bool:
        return isinstance(self, MXFP8BlockScaling)

    def delayed(self) -> bool:
        return isinstance(self, DelayedScaling)

    def float8_current_scaling(self) -> bool:
        return isinstance(self, Float8CurrentScaling)

    def float8_block_scaling(self) -> bool:
        return isinstance(self, Float8BlockScaling)

    def nvfp4(self) -> bool:
        return isinstance(self, NVFP4BlockScaling)

    def custom(self) -> bool:
        return isinstance(self, CustomRecipe)


@dataclasses.dataclass(frozen=True)
class DelayedScaling(Recipe):
    """Per-tensor scaling with amax history
    (reference: recipe/__init__.py:172)."""

    margin: float = 0.0
    fp8_format: Format = HYBRID
    amax_history_len: int = 1024
    amax_compute_algo: str = "max"  # or "most_recent"
    reduce_amax: bool = True
    fp8_dpa: bool = False
    fp8_mha: bool = False


@dataclasses.dataclass(frozen=True)
class Float8CurrentScaling(Recipe):
    """Per-tensor scaling from the current amax
    (reference: recipe/__init__.py:285)."""

    fp8_format: Format = HYBRID
    fp8_quant_fwd_inp: QParams = QParams()
    fp8_quant_fwd_weight: QParams = QParams()
    fp8_quant_bwd_grad: QParams = QParams()
    fp8_dpa: bool = False
    fp8_mha: bool = False


@dataclasses.dataclass(frozen=True)
class MXFP8BlockScaling(Recipe):
    """OCP MX FP8: E8M0 scale per 32 elements
    (reference: recipe/__init__.py:336)."""

    margin: float = 0.0
    fp8_format: Format = E4M3
    fp8_dpa: bool = False
    fp8_mha: bool = False


@dataclasses.dataclass(frozen=True)
class Float8BlockScaling(Recipe):
    """FP8 with fp32 scales per 128-block (activations/grads) and
    128x128 tile (weights) (reference: recipe/__init__.py:387)."""

    fp8_format: Format = E4M3
    force_pow_2_scales: bool = True
    x_block_scaling_dim: int = 1
    w_block_scaling_dim: int = 2
    grad_block_scaling_dim: int = 1
    fp8_dpa: bool = False
    fp8_mha: bool = False


@dataclasses.dataclass(frozen=True)
class NVFP4BlockScaling(Recipe):
    """NVFP4: FP4E2M1 data, E4M3 scale per 16 elements + per-tensor fp32
    second level; RHT + stochastic rounding on gradients
    (reference: recipe/__init__.py:478)."""

    fp4_format: Format = E2M1
    # Defaults mirror the reference (recipe/__init__.py:586-596): RHT on
    # input + grad (their colwise usages pair up in the wgrad GEMM),
    # never on the weight; stochastic rounding on the gradient.
    fp4_quant_fwd_inp: QParams = QParams(random_hadamard_transform=True)
    fp4_quant_fwd_weight: QParams = QParams(fp4_2d_quantization=False)
    fp4_quant_bwd_grad: QParams = QParams(
        random_hadamard_transform=True, stochastic_rounding=True)
    # 4over6 adaptive block scaling per tensor class
    # (reference: recipe/__init__.py:527 nvfp4_4over6)
    nvfp4_4over6: str = "none"   # none | weights | activations | all


@dataclasses.dataclass(frozen=True)
class CustomRecipe(Recipe):
    """Bring-your-own quantizer factory (reference: recipe/__init__.py:619).

    ``qfactory`` is called with the tensor role ("x" | "kernel" | "dgrad")
    and must return a Quantizer instance or None.
    """

    qfactory: Optional[Callable] = None
