"""Model export utilities.

TPU counterpart of the reference's ONNX export surface (reference:
pytorch/onnx_extensions.py, pytorch/export.py — quantize/dequant
symbolics for TensorRT). TensorRT is not a TPU target; the equivalent
deliverables here are (a) dequantized high-precision weight export for
interchange and (b) jax.export serialization of a jitted inference
function (StableHLO), which is the portable compiled-artifact format in
the JAX ecosystem.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quantize.tensor import is_scaled


def dequantize_pytree(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Replace any ScaledTensor leaves with dequantized arrays."""
    def fix(leaf):
        if is_scaled(leaf):
            return leaf.dequantize().astype(dtype)
        return leaf
    return jax.tree.map(fix, tree, is_leaf=is_scaled)


def export_stablehlo(fn, *example_args):
    """Serialize a jitted function to StableHLO bytes via jax.export."""
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def import_stablehlo(blob: bytes):
    from jax import export as jexport
    return jexport.deserialize(blob).call
