"""The BASELINE.md measurement ladder, one function per rung.

Ladder (BASELINE.md "Measurement ladder"):
  1. single Linear 768->3072, FP8 delayed-scaling fwd
  2. LayerNormMLP FP8 HYBRID block, fwd+bwd
  3. full-stack FP8 decode tokens/s (north star; lives in bench.py)
  4. MXFP8 block-scaled TransformerLayer prefill step
  5. NVFP4 sharded decode (multi-host; not measurable on one chip —
     the NVFP4 numerics run in the same harness via --recipe nvfp4)
plus the north-star p50 TTFT and a flash-attention prefill microbench
(the reference's benchmarks/attention/benchmark_attention.py analog).

All timing uses benchmarks.timing (chained-scan marginal pattern);
fp8-vs-bf16 pairs are measured back-to-back in one window because the
tunnel's absolute throughput drifts ~2.5x over tens of minutes (memory
note axon-tunnel-throughput-drift) — ratios survive, absolutes may not.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from .timing import chain_carry, marginal_seconds_per_step

__all__ = ["bench_linear", "bench_ln_mlp", "bench_flash_prefill",
           "bench_mxfp8_layer"]


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def bench_linear(M=16384, K=768, N=3072):
    """Ladder #1: Linear K->N forward, FP8 delayed scaling vs BF16.
    Returns TFLOP/s for each and the ratio."""
    w = _normal(7, (K, N), scale=0.02)
    flops = 2.0 * M * K * N

    def run(qset):
        def step(c):
            y = te.dense(c, w, quantizer_set=qset)
            return chain_carry(c, y)
        return marginal_seconds_per_step(
            step, lambda s: _normal(s, (M, K)), n_short=2, n_long=12)

    t_fp8 = run(te.QuantizerFactory.create_set(
        te.DelayedScaling(amax_history_len=16)))
    t_bf16 = run(te.QuantizerFactory.create_set(None))
    return {"fp8_tflops": round(flops / t_fp8 / 1e12, 1),
            "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
            "fp8_vs_bf16": round(t_bf16 / t_fp8, 3)}


def bench_ln_mlp(B=2, S=2048, H=4096, FFN=14336):
    """Ladder #2: LayerNormMLP (RMSNorm + gated-SiLU MLP) fwd+bwd,
    FP8 HYBRID (E4M3 fwd / E5M2 bwd via DelayedScaling) vs BF16."""
    gamma = jnp.ones((H,), jnp.float32)
    k1 = _normal(3, (H, 2, FFN), scale=0.02)
    k2 = _normal(4, (FFN, H), scale=0.02)
    # fwd: gated up-proj (H -> 2*FFN) + down-proj (FFN -> H); bwd adds
    # dgrad + wgrad per GEMM => 3x the forward GEMM FLOPs.
    flops = 3 * (2.0 * B * S * H * 2 * FFN + 2.0 * B * S * FFN * H)

    def run(qsets):
        def step(c):
            def loss(x, kk1, kk2, g):
                y = te.layernorm_mlp(
                    x, g, None, kk1, kk2, norm_type="rmsnorm",
                    activation_type="swiglu", quantizer_sets=qsets)
                return jnp.sum(y.astype(jnp.float32))
            grads = jax.grad(loss, argnums=(0, 1, 2, 3))(c, k1, k2, gamma)
            return chain_carry(c, grads)
        return marginal_seconds_per_step(
            step, lambda s: _normal(s, (B, S, H)), n_short=2, n_long=8)

    mk = te.QuantizerFactory.create_set
    recipe = te.DelayedScaling(amax_history_len=16)
    t_fp8 = run((mk(recipe), mk(recipe)))
    t_bf16 = run((mk(None), mk(None)))
    return {"fp8_step_ms": round(t_fp8 * 1e3, 3),
            "bf16_step_ms": round(t_bf16 * 1e3, 3),
            "fp8_tflops": round(flops / t_fp8 / 1e12, 1),
            "fp8_vs_bf16": round(t_bf16 / t_fp8, 3)}


def bench_flash_prefill(B=4, S=2048, Hq=32, Hkv=8, D=128):
    """Flash-attention forward microbench (prefill shape, causal GQA).
    The TFLOP/s here gates TTFT; reference analog:
    benchmarks/attention/benchmark_attention.py."""
    from transformerengine_tpu.attention import AttnMaskType, fused_attn
    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    # causal: ~half the S^2 pairs
    flops = 2 * 2.0 * B * Hq * S * S * D / 2

    def step(q):
        o = fused_attn([q, k, v], attn_mask_type=AttnMaskType.CAUSAL,
                       is_training=False)
        return chain_carry(q, o)

    t = marginal_seconds_per_step(
        step, lambda s: _normal(s, (B, S, Hq, D)), n_short=2, n_long=8)
    return {"tflops": round(flops / t / 1e12, 1),
            "ms": round(t * 1e3, 3)}


def bench_mxfp8_layer(B=4, S=2048, H=4096, FFN=14336, heads=32, kv=8):
    """Ladder #4: TransformerLayer forward (prefill shape) under MXFP8
    block scaling vs BF16."""
    from transformerengine_tpu.flax import TransformerLayer

    layer = TransformerLayer(
        hidden_size=H, mlp_hidden_size=FFN, num_attention_heads=heads,
        num_gqa_groups=kv, norm_type="rmsnorm", mlp_activations="swiglu",
        use_bias=False, enable_rotary_pos_emb=True, max_seq_len=S)
    x0 = _normal(21, (B, S, H))

    def run(recipe):
        with te.autocast(enabled=recipe is not None, recipe=recipe):
            variables = jax.jit(layer.init)(jax.random.PRNGKey(1), x0)

            def step(c):
                y = layer.apply(variables, c)
                return chain_carry(c, y)
            return marginal_seconds_per_step(
                step, lambda s: _normal(s, (B, S, H)), n_short=2, n_long=6)

    t_mx = run(te.MXFP8BlockScaling())
    t_bf16 = run(None)
    return {"mxfp8_ms": round(t_mx * 1e3, 3),
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "mxfp8_vs_bf16": round(t_bf16 / t_mx, 3)}
