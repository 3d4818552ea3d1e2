"""Global quantize configuration, ``autocast`` context, QuantizerFactory.

TPU re-design of the reference's quantization state layer (reference:
jax/quantize/helper.py:304-751, pytorch/quantization.py:405-962). The
only global state is the *configuration* (which recipe is active);
all numeric state (scales, amax histories) lives in quantizer pytrees
owned by the caller / Flax collections.
"""
from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional

import jax.numpy as jnp

from ..common import recipe as recipe_mod
from ..common.recipe import (
    DelayedScaling, Float8BlockScaling, Float8CurrentScaling,
    MXFP8BlockScaling, NVFP4BlockScaling, CustomRecipe, Recipe,
)
from .quantizer import (
    BlockScaleQuantizer, CurrentScaleQuantizer, DelayedScaleQuantizer,
    NVFP4Quantizer, Quantizer, QuantizeLayout, QuantizerSet,
    noop_quantizer_set,
)
from .scaling_modes import ScalingMode


@dataclasses.dataclass
class QuantizeConfig:
    """The active quantization configuration (reference:
    jax/quantize/helper.py QuantizeConfig classes)."""

    enabled: bool = False
    recipe: Optional[Recipe] = None
    # Collection name used by Flax modules for quantizer state.
    collection: str = "quantize_meta"

    @property
    def fwd_dtype(self):
        fmt = getattr(self.recipe, "fp8_format", None) or getattr(
            self.recipe, "fp4_format", None)
        return fmt.fwd_dtype

    @property
    def bwd_dtype(self):
        fmt = getattr(self.recipe, "fp8_format", None) or getattr(
            self.recipe, "fp4_format", None)
        return fmt.bwd_dtype


class _State(threading.local):
    def __init__(self):
        self.stack = [QuantizeConfig()]


_state = _State()


def get_quantize_config() -> QuantizeConfig:
    return _state.stack[-1]


def is_quantize_enabled() -> bool:
    return get_quantize_config().enabled


@contextlib.contextmanager
def autocast(enabled: bool = True, recipe: Optional[Recipe] = None,
             mesh_resource=None):
    """Enable low-precision execution for all framework modules in scope
    (reference: jax/quantize/helper.py:751 autocast / pytorch fp8_autocast).

    ``mesh_resource`` additionally installs a global
    :class:`~transformerengine_tpu.parallel.sharding.MeshResource`.
    """
    if enabled and recipe is None:
        recipe = DelayedScaling()
    cfg = QuantizeConfig(enabled=enabled, recipe=recipe)
    _state.stack.append(cfg)
    try:
        if mesh_resource is not None:
            from ..parallel.sharding import global_shard_guard
            with global_shard_guard(mesh_resource):
                yield cfg
        else:
            yield cfg
    finally:
        _state.stack.pop()


# Backwards-compatible alias mirroring the reference's older name.
fp8_autocast = autocast


class QuantizerFactory:
    """Build quantizer (sets) from a recipe (reference:
    jax/quantize/quantizer.py:1059 QuantizerFactory)."""

    @staticmethod
    def create(recipe: Recipe, role: str,
               q_layout: QuantizeLayout = QuantizeLayout.ROWWISE_COLWISE,
               ) -> Optional[Quantizer]:
        assert role in ("x", "kernel", "dgrad"), role
        if recipe is None:
            return None
        if isinstance(recipe, CustomRecipe):
            return recipe.qfactory(role) if recipe.qfactory else None
        is_bwd = role == "dgrad"
        if isinstance(recipe, NVFP4BlockScaling):
            qp = {"x": recipe.fp4_quant_fwd_inp,
                  "kernel": recipe.fp4_quant_fwd_weight,
                  "dgrad": recipe.fp4_quant_bwd_grad}[role]
            mode = (ScalingMode.NVFP4_2D_SCALING if qp.fp4_2d_quantization
                    else ScalingMode.NVFP4_1D_SCALING)
            fos = getattr(recipe, "nvfp4_4over6", "none")
            fos_on = (fos == "all"
                      or (fos == "weights" and role == "kernel")
                      or (fos == "activations" and role == "x"))
            return NVFP4Quantizer(
                q_dtype=recipe.fp4_format.bwd_dtype if is_bwd else recipe.fp4_format.fwd_dtype,
                scaling_mode=mode,
                q_layout=q_layout,
                with_rht=qp.random_hadamard_transform,
                stochastic_rounding=qp.stochastic_rounding,
                four_over_six=fos_on,
            )
        dtype = recipe.fp8_format.bwd_dtype if is_bwd else recipe.fp8_format.fwd_dtype
        if isinstance(recipe, DelayedScaling):
            return DelayedScaleQuantizer(
                q_dtype=dtype,
                scaling_mode=ScalingMode.DELAYED_TENSOR_SCALING,
                q_layout=q_layout,
                amax_history=jnp.zeros((recipe.amax_history_len,), jnp.float32),
                margin=recipe.margin,
                amax_compute_algo=recipe.amax_compute_algo,
            )
        if isinstance(recipe, Float8CurrentScaling):
            return CurrentScaleQuantizer(
                q_dtype=dtype,
                scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
                q_layout=q_layout,
            )
        if isinstance(recipe, MXFP8BlockScaling):
            return BlockScaleQuantizer(
                q_dtype=dtype,
                scaling_mode=ScalingMode.MXFP8_1D_SCALING,
                q_layout=q_layout,
            )
        if isinstance(recipe, Float8BlockScaling):
            dim = {"x": recipe.x_block_scaling_dim,
                   "kernel": recipe.w_block_scaling_dim,
                   "dgrad": recipe.grad_block_scaling_dim}[role]
            mode = (ScalingMode.BLOCK_SCALING_2D if dim == 2
                    else ScalingMode.BLOCK_SCALING_1D)
            return BlockScaleQuantizer(
                q_dtype=dtype, scaling_mode=mode, q_layout=q_layout,
                pow2_scales=recipe.force_pow_2_scales,
            )
        raise NotImplementedError(f"recipe {type(recipe).__name__}")

    @staticmethod
    def create_set(recipe: Optional[Recipe] = None,
                   fwd_layout: QuantizeLayout = QuantizeLayout.ROWWISE_COLWISE,
                   bwd_layout: QuantizeLayout = QuantizeLayout.ROWWISE_COLWISE,
                   ) -> QuantizerSet:
        """One QuantizerSet (x, kernel, dgrad) for one GEMM."""
        if recipe is None:
            cfg = get_quantize_config()
            if not cfg.enabled:
                return noop_quantizer_set
            recipe = cfg.recipe
        return QuantizerSet(
            x=QuantizerFactory.create(recipe, "x", fwd_layout),
            kernel=QuantizerFactory.create(recipe, "kernel", fwd_layout),
            dgrad=QuantizerFactory.create(recipe, "dgrad", bwd_layout),
        )
