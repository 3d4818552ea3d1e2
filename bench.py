"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (the axon TPU tunnel caches repeated identical calls and
block_until_ready does not wait for execution): every timed call chains
n dependent steps inside one jitted lax.scan, inputs are derived from a
fresh RNG key per call, the scalar loss is fetched to the host, and the
per-step time is the *marginal* cost between a long and a short scan —
validated at ~94% of v5e bf16 roofline on a plain matmul.

Current config (BASELINE.json ladder): fused TransformerLayer
forward+backward, FP8 DelayedScaling vs plain BF16 (the analog of the
reference's te_llama FP8-vs-BF16 speedups, BASELINE.md).
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def _median_time(fn, *args, reps=5):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(100 + i), *args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def main():
    import transformerengine_tpu as te
    from transformerengine_tpu.flax.transformer import TransformerLayer

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        B, S, H, F, NH, KV = 2, 2048, 4096, 14336, 32, 8
        N_SHORT, N_LONG = 2, 10
    else:
        B, S, H, F, NH, KV = 2, 256, 512, 1024, 8, 4
        N_SHORT, N_LONG = 1, 3

    layer = TransformerLayer(
        hidden_size=H, mlp_hidden_size=F, num_attention_heads=NH,
        num_gqa_groups=KV, norm_type="rmsnorm", mlp_activations="swiglu",
        use_bias=False, enable_rotary_pos_emb=True, max_seq_len=S)

    def make_ctx(fp8):
        if fp8:
            return te.autocast(enabled=True,
                               recipe=te.DelayedScaling(amax_history_len=16))
        import contextlib
        return contextlib.nullcontext()

    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, S, H), jnp.bfloat16)

    def build(fp8):
        with make_ctx(fp8):
            variables = layer.init(jax.random.PRNGKey(1), x0)

        @partial(jax.jit, static_argnums=(2,))
        def run(key, variables, n):
            x_init = jax.random.normal(key, (B, S, H), jnp.bfloat16)

            def step(x, _):
                def loss_fn(v):
                    with make_ctx(fp8):
                        out = layer.apply(v, x)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                loss, grads = jax.value_and_grad(loss_fn)(variables)
                # Chain: next input depends on this step's gradients so the
                # tunnel can't cache or reorder steps.
                dx = jax.tree.leaves(grads)[0]
                bump = jnp.sum(dx.astype(jnp.float32)) * 1e-12 + loss * 1e-12
                return x + bump.astype(x.dtype), loss
            _, losses = jax.lax.scan(step, x_init, None, length=n)
            return losses[-1]
        return run, variables

    results = {}
    for name, fp8 in (("fp8", True), ("bf16", False)):
        run, variables = build(fp8)
        float(run(jax.random.PRNGKey(0), variables, N_SHORT))   # compile
        float(run(jax.random.PRNGKey(0), variables, N_LONG))    # compile
        t_short = _median_time(run, variables, N_SHORT)
        t_long = _median_time(run, variables, N_LONG)
        results[name] = (t_long - t_short) / (N_LONG - N_SHORT)

    tokens_per_s = B * S / results["fp8"]
    print(json.dumps({
        "metric": "transformer_layer_fp8_train_tokens_per_sec_per_chip",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(results["bf16"] / results["fp8"], 3),
    }))


if __name__ == "__main__":
    main()
