"""Quantization package: tensors, quantizers, scaling modes, recipes
state (reference: transformer_engine/jax/quantize/__init__.py, which
star-exports the same families).

The autocast/factory/prequant names resolve lazily (PEP 562):
``common.recipe`` imports ``quantize.dtypes`` — which initializes this
package — while ``helper``/``prequant`` import ``common.recipe`` back.
"""
from .dtypes import (
    DTYPE_MAX, dtype_max, float4_e2m1, float8_e4m3, float8_e5m2,
    float8_e8m0, is_fp4_dtype, is_fp8_dtype)
from .scaling_modes import ScalingMode
from .tensor import (
    ScaledTensor, ScaledTensor1x, ScaledTensor2x, get_colwise,
    get_rowwise, is_scaled, make_scaled_tensor)
from .quantizer import (
    BlockScaleQuantizer, CurrentScaleQuantizer, DelayedScaleQuantizer,
    NVFP4Quantizer, QuantizeLayout, Quantizer, QuantizerSet,
    noop_quantizer_set)
from .grouped import GroupedQuantizer, GroupedScaledTensor
from .hadamard import apply_rht, apply_rht_inverse, hadamard_matrix, rht_matrix
from . import qmath

_LAZY = {
    "QuantizeConfig": "helper", "QuantizerFactory": "helper",
    "autocast": "helper", "fp8_autocast": "helper",
    "get_quantize_config": "helper", "is_quantize_enabled": "helper",
    "update_collections": "helper",
    "KernelCache": "microbatch",
    "quantize_kernel": "microbatch",
    "PrequantizedKernel": "prequant",
    "prequantize_kernel_array": "prequant",
    "prequantize_kernels": "prequant",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        if name == "update_collections":      # reference alias
            from ..flax.module import update_quantize_meta
            return update_quantize_meta
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
