"""Random Hadamard transform (RHT) for the NVFP4 recipe.

The reference applies a 16x16 randomized-sign Hadamard rotation before
FP4 quantization to flatten outliers (reference:
common/hadamard_transform/ and pytorch/tensor/nvfp4_tensor.py:61-110).
On TPU the transform is a tiny matmul that XLA fuses into the quantize;
no dedicated kernel family is needed.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

RHT_DIM = 16


def hadamard_matrix(dim: int = RHT_DIM) -> np.ndarray:
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < dim:
        h = np.block([[h, h], [h, -h]])
    return h


def rht_matrix_np(sign_mask: int = 0, dim: int = RHT_DIM) -> np.ndarray:
    """Normalized Hadamard matrix with random sign flips, as a host
    constant (Pallas kernels inline it; sign_mask is always static).

    ``sign_mask`` packs one sign bit per row (bit i == 1 -> flip row i),
    matching the reference's deterministic random-sign parameterization so
    forward/backward use the same rotation.
    """
    h = hadamard_matrix(dim)
    signs = np.array([1.0 if not (sign_mask >> i) & 1 else -1.0 for i in range(dim)],
                     dtype=np.float32)
    return ((signs[:, None] * h) / np.sqrt(dim)).astype(np.float32)


def rht_matrix(sign_mask: int = 0, dim: int = RHT_DIM) -> jnp.ndarray:
    return jnp.asarray(rht_matrix_np(sign_mask, dim))


def apply_rht(x: jax.Array, sign_mask: int = 0, dim: int = RHT_DIM) -> jax.Array:
    """Apply the RHT along the last axis (must be divisible by ``dim``)."""
    assert x.shape[-1] % dim == 0, f"last dim {x.shape[-1]} % {dim} != 0"
    m = rht_matrix(sign_mask, dim).astype(jnp.float32)
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], x.shape[-1] // dim, dim)
    # precision=highest: keep full f32 on the MXU so the Pallas fused
    # kernel (ops/quantize_kernels.nvfp4_quantize_2x) matches bit-exactly.
    return jnp.matmul(xr, m, precision="highest").reshape(x.shape)


def apply_rht_inverse(x: jax.Array, sign_mask: int = 0, dim: int = RHT_DIM) -> jax.Array:
    """Inverse = transpose (the normalized RHT is orthogonal)."""
    m = rht_matrix(sign_mask, dim).astype(jnp.float32).T
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], x.shape[-1] // dim, dim)
    return jnp.matmul(xr, m, precision="highest").reshape(x.shape)
