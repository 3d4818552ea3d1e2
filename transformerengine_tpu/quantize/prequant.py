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


def _e4m3_bits_to_e2m1_code(byte_u8):
    """Inverse of ops.decode_matmul._e2m1_code_to_e4m3_bits: e4m3 bytes
    holding exact e2m1 grid values -> 4-bit codes (int32)."""
    b = byte_u8.astype(jnp.int32)
    m7 = b & 0x7F
    mag = jnp.where(m7 == 0, 0,
                    jnp.where(m7 == 48, 1, (m7 - 48) >> 2))
    return ((b >> 7) << 3) | mag


def _pack4_default() -> bool:
    import os
    return os.environ.get("TE_TPU_PREQUANT_PACK4", "1") == "1"


def _build_kn_kernel(t, kernel_dtype) -> BlockResidentKernel:
    """Colwise block-scaled ScaledTensor1x (stored (N, K), scales along
    K) -> the contraction-major decode representation."""
    from .dtypes import float8_e4m3, is_fp4_dtype
    n, k = t._2d_shape()
    bc = t.scaling_mode.block_shape[1]
    s = t.scaling_mode.decode_scale_inv(t.scale_inv)[:n, : k // bc]
    scale_kn = jnp.asarray(s.T, jnp.bfloat16)          # (K/bc, N)
    data = t.data.reshape(n, k)
    if is_fp4_dtype(data.dtype):
        data = data.astype(jnp.dtype(float8_e4m3))     # exact re-encode
    if t.scaling_mode.is_nvfp4:
        # e2m1-grid values (stored as e4m3 bytes, FP4_STORAGE_DTYPE):
        # packable to 2 codes/byte — the actual 4-bit byte diet.
        if _pack4_default() and k % (2 * bc) == 0:
            codes = _e4m3_bits_to_e2m1_code(
                jax.lax.bitcast_convert_type(data, jnp.uint8)).T  # (K, N)
            packed = (codes[: k // 2] | (codes[k // 2:] << 4)).astype(
                jnp.uint8)
            return BlockResidentKernel(
                payload=packed, scale=scale_kn,
                out_scale=t.tensor_scale_inv, block=bc, packed=True,
                dq_dtype=jnp.dtype(kernel_dtype))
    return BlockResidentKernel(
        payload=jnp.asarray(data.T), scale=scale_kn,
        out_scale=t.tensor_scale_inv, block=bc, packed=False,
        dq_dtype=jnp.dtype(kernel_dtype))


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
    br, bc = t.scaling_mode.block_shape
    if t.scaling_mode.is_block_scaling and t.data.ndim == 2:
        import os
        mode = os.environ.get("TE_TPU_BLOCK_DECODE", "bf16")
        if mode == "bf16":
            # SPEED default: dequantize the recipe-snapped values ONCE
            # at load into the bf16 (N, K) resident layout. Measured r5
            # (v5e, 16L 8B-geometry decode): every in-graph touch of a
            # quantized block-scaled payload loses — the r5 KN Pallas
            # kernel's explicit e4m3->bf16 convert runs at 80 GB/s
            # payload rate vs 750 for the fp8-direct TN dot
            # (scripts/micro_kn_dequant.py: noscale 1467 us vs tn_fp8
            # 157 us on the wi GEMM; even scale-free), and XLA's fused
            # dequant chain costs ~12.7 ms/step of materialization.
            # Block scales only pay on the wire/at rest; at decode the
            # exact bf16 values are the fast representation.
            return PrequantizedKernel(
                colwise=jnp.asarray(t.dequantize().astype(jnp.bfloat16)),
                logical_shape=tuple(kernel.shape))
        if br == 1 and k % bc == 0:
            # CAPACITY option (TE_TPU_BLOCK_DECODE=quantized): keep the
            # 1-byte (or nibble-packed 0.5-byte) payload resident and
            # dequantize in VMEM per step (decode_kn_matvec) — 2-4x
            # weight-HBM capacity at lower tok/s.
            return PrequantizedKernel(
                colwise=_build_kn_kernel(t, kernel.dtype),
                logical_shape=tuple(kernel.shape))
    if is_fp4_dtype(t.data.dtype):
        # fp4 is BYTE-backed in XLA (no packing), so re-encoding the
        # e2m1 grid points in e4m3 costs zero bytes and is EXACT —
        # while the decode-path convert becomes the hardware-fast
        # e4m3->bf16 instead of a software fp4 expansion.
        t = _dc.replace(t, data=t.data.astype(jnp.dtype(float8_e4m3)))
    return PrequantizedKernel(colwise=t, logical_shape=tuple(kernel.shape))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockResidentKernel:
    """A block-scaled resident weight stored CONTRACTION-MAJOR (K, N)
    for the decode path.

    The r4 NVFP4 decode profile showed the (N, K) ScaledTensor layout
    costs ~12.7 ms/step of per-step dequant materialization inside the
    decode scan (16x multiply_convert_fusion ~470 us + 16x broadcast
    ~322 us — XLA materializes the full bf16 weight and the expanded
    scales every step). Stored (K, N), the in-kernel scale expansion
    of ops/decode_matmul.decode_kn_matvec splits the sublane axis (a
    free view), so dequant runs in VMEM with zero HBM round-trips.

    ``payload``: (K, N) fp8-byte codes, or (K/2, N) uint8 split-plane
    packed e2m1 nibbles (``packed=True``: byte row r = code row r low,
    code row r+K/2 high — the reference NVFP4 byte diet,
    common/cast/nvfp4/, realized TPU-side as 2 codes/byte).
    ``scale``: (K/block, N) bf16 pre-decoded block scales (exact: MXFP8
    e8m0 and NVFP4 e4m3 scales are bf16-representable).
    ``out_scale``: optional scalar second-level scale (NVFP4)."""

    payload: Any
    scale: Any
    out_scale: Any
    block: int = dataclasses.field(metadata=dict(static=True))
    packed: bool = dataclasses.field(metadata=dict(static=True))
    dq_dtype: Any = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self):
        return self.payload.shape[0] * (2 if self.packed else 1)

    @property
    def n(self):
        return self.payload.shape[1]

    def dequantize_kn(self) -> jax.Array:
        """(K, N) bf16 with block scales applied — the XLA-fallback
        operand (prefill / off-TPU); numerics identical to the Pallas
        kernel's in-VMEM dequant (bf16 multiplies are exact for <=4-bit
        significand payloads x pow2/e4m3 scales). ``out_scale`` is NOT
        folded in — both paths apply it to the f32 dot output."""
        k, n = self.k, self.n
        if self.packed:
            from ..ops.decode_matmul import _unpack_nibbles_to_bf16
            lo, hi = _unpack_nibbles_to_bf16(self.payload)
            w = jnp.concatenate([lo, hi], axis=0)
        else:
            w = self.payload.astype(jnp.bfloat16)
        gk = k // self.block
        return (w.reshape(gk, self.block, n)
                * self.scale.astype(jnp.bfloat16)[:, None, :]).reshape(k, n)


_KERNEL_NAMES = ("kernel", "wi_kernel", "wo_kernel")


def prequantize_kernels(variables: Any, recipe: Optional[Recipe],
                        donate: bool = False) -> Any:
    """Convert a Flax variables dict for FP8-resident inference: every
    projection kernel moves from ``params`` into a ``prequant``
    collection as a :class:`PrequantizedKernel`; the modules
    (TransformerEngineBase.kernel_param) read that collection first.

    Embedding and norm parameters stay high-precision (matching the
    reference, which only converts Linear-family weights).

    ``donate=True`` frees each source kernel's device buffer as soon as
    its resident form is built, capping peak HBM at ~one weight copy
    plus per-kernel temporaries instead of two full copies (an 8B-class
    model on a 16 GB chip OOMs otherwise). The input ``variables`` tree
    must not be used afterwards."""
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
                pk = prequantize_kernel_array(sub, recipe)
                if donate and isinstance(sub, jax.Array):
                    jax.block_until_ready(pk)
                    sub.delete()
                quant[name] = pk
            else:
                kept[name] = sub
        return kept, quant

    kept, quant = split(params)
    out = {k: v for k, v in variables.items() if k != "params"}
    out["params"] = kept
    out["prequant"] = quant
    return out
