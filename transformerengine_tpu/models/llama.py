"""Llama-class causal LM — the framework's flagship model.

Plays the role of the reference's te_llama tutorial model (reference:
docs/examples/te_llama/te_llama.py — HF Llama with TE TransformerLayer
substituted), built natively from this framework's Flax modules:
RMSNorm + SwiGLU LayerNormMLP + GQA flash attention + RoPE.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attention import AttnMaskType, SequenceDescriptor
from ..flax.module import LayerNorm, _maybe_partition
from ..flax.transformer import TransformerLayer
from ..parallel import sharding as sh


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_attention_heads: int = 32
    num_kv_heads: int = 8
    head_dim: Optional[int] = None
    max_seq_len: int = 8192
    rope_base: float = 500000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Remat ("gradient/activation checkpointing") per layer; the TPU analog
    # of the reference's te.distributed.checkpoint (distributed.py:657).
    remat: bool = False
    # Remat policy name: "nothing_saveable" (recompute all), "dots"
    # (save matmul outputs), or "offload_dots" (save matmul outputs to
    # HOST memory — the TPU analog of the reference's CPU activation
    # offload, pytorch/cpu_offload.py; XLA overlaps the d2h/h2d DMAs).
    remat_policy: str = "nothing_saveable"
    scan_layers: bool = False
    context_parallel_axis: str = ""


LLAMA_TINY = LlamaConfig(vocab_size=256, hidden_size=128,
                         intermediate_size=256, num_layers=2,
                         num_attention_heads=4, num_kv_heads=2,
                         max_seq_len=512, rope_base=10000.0)
LLAMA_1B = LlamaConfig(vocab_size=32000, hidden_size=2048,
                       intermediate_size=5632, num_layers=22,
                       num_attention_heads=32, num_kv_heads=4)
LLAMA_8B = LlamaConfig(vocab_size=128256, hidden_size=4096,
                       intermediate_size=14336, num_layers=32,
                       num_attention_heads=32, num_kv_heads=8)


def _remat_policy(name: str):
    from .. import checkpoint_policies as cp
    if name == "nothing_saveable":
        return cp.nothing_saveable
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if name == "offload_dots":
        return cp.offload_dot_with_no_batch_dims()
    raise ValueError(f"unknown remat_policy {name!r}")


class _ScanBlock(TransformerLayer):
    """TransformerLayer with the (carry, out) calling convention nn.scan
    expects; encoded is fixed to None (decoder-only)."""

    @nn.compact
    def __call__(self, x, sequence_descriptor=None, positions=None,
                 deterministic=True, inference_params=None):
        y = TransformerLayer.__call__(
            self, x, None, sequence_descriptor, positions, deterministic,
            inference_params)
        return y, None


class LlamaModel(nn.Module):
    """Decoder-only transformer LM."""

    config: LlamaConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,                   # (B, S) int32
        sequence_descriptor: Optional[SequenceDescriptor] = None,
        positions: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        inference_params=None,
    ) -> jax.Array:                          # (B, S, vocab)
        cfg = self.config
        embed = self.param(
            "embedding",
            _maybe_partition(nn.initializers.normal(stddev=1.0),
                             (sh.W_JOINED_AXES, sh.W_TP_AXES)),
            (cfg.vocab_size, cfg.hidden_size), cfg.dtype)
        x = embed[tokens]
        x = nn.with_logical_constraint(
            x, (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HIDDEN_AXES))

        layer_kwargs = dict(
            hidden_size=cfg.hidden_size,
            mlp_hidden_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            num_gqa_groups=cfg.num_kv_heads,
            layernorm_epsilon=cfg.norm_eps,
            norm_type="rmsnorm",
            mlp_activations="swiglu",
            use_bias=False,
            self_attn_mask_type=(
                AttnMaskType.PADDING_CAUSAL
                if sequence_descriptor is not None else
                AttnMaskType.CAUSAL),
            enable_rotary_pos_emb=True,
            rotary_pos_emb_base=cfg.rope_base,
            max_seq_len=cfg.max_seq_len,
            context_parallel_axis=cfg.context_parallel_axis,
            dtype=cfg.dtype)

        if cfg.scan_layers:
            # One traced layer scanned num_layers times: compile time is
            # O(1) in depth; params/cache/quantize_meta gain a leading
            # layer axis (the reference relies on Megatron for this).
            block = _ScanBlock
            if cfg.remat:
                block = nn.remat(
                    _ScanBlock, static_argnums=(4, 5),
                    policy=_remat_policy(cfg.remat_policy))
            scanned = nn.scan(
                block,
                variable_axes={"params": 0, "quantize_meta": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4,
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**layer_kwargs, name="layers")
            x, _ = scanned(x, sequence_descriptor, positions,
                           deterministic, inference_params)
        else:
            layer_cls = TransformerLayer
            if cfg.remat:
                # args (excluding self): x, encoded, sequence_descriptor,
                # positions, deterministic(4), inference_params(5) — the
                # last two are static Python values.
                layer_cls = nn.remat(
                    TransformerLayer,
                    static_argnums=(4, 5),
                    policy=_remat_policy(cfg.remat_policy))
            for i in range(cfg.num_layers):
                x = layer_cls(**layer_kwargs, name=f"layer_{i}")(
                    x, None, sequence_descriptor, positions,
                    deterministic, inference_params)

        x = LayerNorm(epsilon=cfg.norm_eps, norm_type="rmsnorm",
                      name="final_norm")(x)
        # bf16 operands + f32 accumulation: an astype(f32) here doubles
        # the embedding-read bytes every decode step (the converted copy
        # is NOT hoisted out of the decode scan).
        logits = jnp.einsum("bsh,vh->bsv", x, embed,
                            preferred_element_type=jnp.float32)
        return logits


def cross_entropy_loss(logits: jax.Array, targets: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """Token-level CE with optional validity mask (reference analog:
    pytorch parallel_cross_entropy; the TP-parallel fused version lives in
    ops/cross_entropy.py)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1)
    return -ll.mean()
