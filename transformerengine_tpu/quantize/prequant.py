"""Pre-quantized (FP8-resident) weights for inference.

TPU counterpart of the reference's quantized_model_init (reference:
pytorch/quantization.py:868 — keep weights FP8-only so decode never
re-quantizes or stores the bf16 copy). ``prequantize_kernels`` rewrites
a Flax params tree, replacing projection kernels with
:class:`PrequantizedKernel` pytrees holding the colwise (fwd-GEMM)
quantized payload; the functional dense layers detect them and skip the
per-step quantize. HBM weight traffic halves (fp8 bytes), and the
dequant happens in-register inside the matmul.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..common.recipe import Recipe
from .helper import QuantizerFactory
from .quantizer import QuantizeLayout
from .tensor import ScaledTensor1x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PrequantizedKernel:
    """A kernel stored only as its colwise (N, K) fwd-GEMM usage.

    ``colwise`` is a ScaledTensor1x (quantized recipes) or a plain
    (N, K) array (``recipe=None`` — high-precision resident layout: the
    decode GEMM wants the contraction axis as the stored minor axis, and
    XLA relayouts a (K, N) weight with a full copy INSIDE the decode
    scan body otherwise — profiled at ~860 us/layer/step on the bf16
    16L decode rung)."""

    colwise: Any
    logical_shape: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))

    @property
    def shape(self):
        return self.logical_shape

    @property
    def ndim(self):
        return len(self.logical_shape)

    @property
    def dtype(self):
        return getattr(self.colwise, "dq_dtype", None) or self.colwise.dtype


def prequantize_kernel_array(kernel: jax.Array, recipe: Optional[Recipe],
                             n_cdims: int = 1) -> PrequantizedKernel:
    """Quantize one kernel (contracting dims leading) to its colwise
    usage. ``recipe=None`` keeps the original dtype and only fixes the
    layout (stored transposed (N, K) once at load)."""
    k = 1
    for d in kernel.shape[:n_cdims]:
        k *= d
    n = kernel.size // k
    if recipe is None:
        t = jnp.asarray(kernel.reshape(k, n).T)
        return PrequantizedKernel(colwise=t,
                                  logical_shape=tuple(kernel.shape))
    import dataclasses as _dc
    q = QuantizerFactory.create(recipe, "kernel", QuantizeLayout.COLWISE)
    t = q.quantize(kernel.reshape(k, n), dq_dtype=kernel.dtype)
    t = _dc.replace(t, resident=True)
    from .dtypes import float8_e4m3, is_fp4_dtype
    if is_fp4_dtype(t.data.dtype):
        # fp4 is BYTE-backed in XLA (no packing), so re-encoding the
        # e2m1 grid points in e4m3 costs zero bytes and is EXACT —
        # while the decode-path convert becomes the hardware-fast
        # e4m3->bf16 instead of a software fp4 expansion.
        t = _dc.replace(t, data=t.data.astype(jnp.dtype(float8_e4m3)))
    return PrequantizedKernel(colwise=t, logical_shape=tuple(kernel.shape))


_KERNEL_NAMES = ("kernel", "wi_kernel", "wo_kernel")


def prequantize_kernels(variables: Any, recipe: Optional[Recipe]) -> Any:
    """Convert a Flax variables dict for FP8-resident inference: every
    projection kernel moves from ``params`` into a ``prequant``
    collection as a :class:`PrequantizedKernel`; the modules
    (TransformerEngineBase.kernel_param) read that collection first.

    Embedding and norm parameters stay high-precision (matching the
    reference, which only converts Linear-family weights)."""
    import flax.linen as nn
    params = nn.meta.unbox(variables["params"])

    def split(tree):
        kept, quant = {}, {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                k, q = split(sub)
                kept[name] = k
                if q:
                    quant[name] = q
            elif name in _KERNEL_NAMES and getattr(sub, "ndim", 0) >= 2:
                quant[name] = prequantize_kernel_array(sub, recipe)
            else:
                kept[name] = sub
        return kept, quant

    kept, quant = split(params)
    out = {k: v for k, v in variables.items() if k != "params"}
    out["params"] = kept
    out["prequant"] = quant
    return out
