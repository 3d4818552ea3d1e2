"""TPU Transformer Engine — a TPU-native low-precision training and
inference framework for Transformers (JAX / XLA / Pallas / pjit).

Built from scratch with the capability surface of NVIDIA
TransformerEngine (see SURVEY.md), designed idiomatically for the TPU:
quantized tensors are pytrees, parallelism is mesh sharding, kernels are
Pallas, and everything composes with jit/grad/scan/shard_map.
"""
from .common import recipe
from .common.recipe import (
    DelayedScaling, Float8CurrentScaling, MXFP8BlockScaling,
    Float8BlockScaling, NVFP4BlockScaling, CustomRecipe, Recipe,
    Format, E4M3, E5M2, HYBRID, QParams, MMParams,
)
from .quantize.helper import (
    autocast, fp8_autocast, get_quantize_config, is_quantize_enabled,
    QuantizeConfig, QuantizerFactory,
)
from .quantize.quantizer import (
    Quantizer, QuantizerSet, QuantizeLayout, CurrentScaleQuantizer,
    DelayedScaleQuantizer, BlockScaleQuantizer, NVFP4Quantizer,
    noop_quantizer_set,
)
from .quantize.scaling_modes import ScalingMode
from .quantize.tensor import ScaledTensor1x, ScaledTensor2x
from .parallel.sharding import MeshResource, global_shard_guard, global_mesh_resource
from .dense import dense, dense_and_state
from .layernorm import layernorm, rmsnorm
from .layernorm_dense import layernorm_dense
from .layernorm_mlp import layernorm_mlp
from .attention import (
    AttnBiasType, AttnMaskType, QKVLayout, SequenceDescriptor, fused_attn,
)
from .softmax import SoftmaxType, softmax
from .grouped_dense import grouped_dense, grouped_dense_gq
from .moe import moe
from .permutation import (
    moe_permute, moe_unpermute, token_combine, token_dispatch)
from .flex_attention import flex_attention
from .graph import make_graphed_callables
from .quantize.prequant import PrequantizedKernel, prequantize_kernels
from .quantize.microbatch import KernelCache, quantize_kernel
from . import checkpoint_policies

# Subpackages surfaced the way the reference surfaces them
# (reference: jax/__init__.py exports `flax`, `quantize`; pytorch
# exports `ops`, `optimizers`). Imported last to avoid cycles.
from . import flax          # noqa: E402  (te.flax.DenseGeneral, ...)
from . import quantize      # noqa: E402
from . import ops           # noqa: E402  (te.ops.Sequential fuser API)
from . import optimizers    # noqa: E402
from . import inference     # noqa: E402
from . import models        # noqa: E402
from .flax.module import (  # noqa: E402
    QUANTIZE_META as NVTE_FP8_COLLECTION_NAME,
    update_quantize_meta,
    update_quantize_meta as update_collections,  # reference name
)

__version__ = "0.1.0"

__all__ = [
    # recipes
    "recipe", "Recipe", "DelayedScaling", "Float8CurrentScaling",
    "MXFP8BlockScaling", "Float8BlockScaling", "NVFP4BlockScaling",
    "CustomRecipe", "Format", "E4M3", "E5M2", "HYBRID", "QParams",
    "MMParams",
    # quantization state
    "autocast", "fp8_autocast", "get_quantize_config",
    "is_quantize_enabled", "QuantizeConfig", "QuantizerFactory",
    "Quantizer", "QuantizerSet", "QuantizeLayout",
    "CurrentScaleQuantizer", "DelayedScaleQuantizer",
    "BlockScaleQuantizer", "NVFP4Quantizer", "noop_quantizer_set",
    "ScalingMode", "ScaledTensor1x", "ScaledTensor2x",
    "NVTE_FP8_COLLECTION_NAME", "update_collections",
    "update_quantize_meta", "PrequantizedKernel", "prequantize_kernels",
    "KernelCache", "quantize_kernel",
    # sharding
    "MeshResource", "global_shard_guard", "global_mesh_resource",
    # functional layers
    "dense", "dense_and_state", "layernorm", "rmsnorm",
    "layernorm_dense", "layernorm_mlp", "grouped_dense",
    "grouped_dense_gq", "moe", "softmax", "SoftmaxType",
    "fused_attn", "flex_attention", "AttnBiasType", "AttnMaskType",
    "QKVLayout", "SequenceDescriptor",
    "moe_permute", "moe_unpermute", "token_combine", "token_dispatch",
    "make_graphed_callables", "checkpoint_policies",
    # subpackages
    "flax", "quantize", "ops", "optimizers", "inference", "models",
]
