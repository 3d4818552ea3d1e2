"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current config (BASELINE.json measurement ladder): fused TransformerLayer
forward+backward with the FP8 DelayedScaling recipe vs the plain-BF16 XLA
layer — the analog of the reference's te_llama speedup claims
(BASELINE.md: TE FP8 vs BF16 HF baseline). As more of the ladder lands
(KV-cache decode, MXFP8/NVFP4), this graduates to tokens/sec/chip decode.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _time_it(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    return (time.perf_counter() - t0) / iters


def main():
    import transformerengine_tpu as te
    from transformerengine_tpu.flax.transformer import TransformerLayer
    from transformerengine_tpu.models.llama import cross_entropy_loss

    on_tpu = jax.default_backend() == "tpu"
    # Llama-8B-shaped single layer; smaller on CPU hosts.
    if on_tpu:
        B, S, H, F, NH, KV = 4, 4096, 4096, 14336, 32, 8
    else:
        B, S, H, F, NH, KV = 2, 512, 512, 1024, 8, 4

    def make_layer():
        return TransformerLayer(
            hidden_size=H, mlp_hidden_size=F, num_attention_heads=NH,
            num_gqa_groups=KV, norm_type="rmsnorm",
            mlp_activations="swiglu", use_bias=False,
            enable_rotary_pos_emb=True, max_seq_len=S)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, H), jnp.bfloat16)

    def build_step(make_ctx):
        layer = make_layer()
        with make_ctx():
            variables = layer.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def step(variables, x):
            def loss_fn(v):
                with make_ctx():
                    out = layer.apply(v, x)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(variables)
            return loss, grads
        return step, variables

    import contextlib
    fp8_step, fp8_vars = build_step(
        lambda: te.autocast(enabled=True,
                            recipe=te.DelayedScaling(amax_history_len=16)))
    bf16_step, bf16_vars = build_step(contextlib.nullcontext)

    t_fp8 = _time_it(fp8_step, fp8_vars, x)
    t_bf16 = _time_it(bf16_step, bf16_vars, x)

    tokens_per_s = B * S / t_fp8
    print(json.dumps({
        "metric": "transformer_layer_fp8_train_tokens_per_sec_per_chip",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(t_bf16 / t_fp8, 3),
    }))


if __name__ == "__main__":
    main()
