"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (BASELINE.json ladder #3 / north star): autoregressive DECODE
tokens/sec/chip on an 8B-geometry Llama stack with FP8-resident weights
and FP8 KV cache, vs the same stack in BF16 (the reference's te_gemma
KV-cache + CUDA-graph + FP8-weights decode, BASELINE.md 3.8x/9.3x rows).
Decode steps are inherently chained through the cache, which also
defeats the axon tunnel's result caching; the scalar token fetch forces
materialization, and per-step time is the marginal cost between a short
and a long jitted scan (see memory note axon-tpu-bench-quirks).
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def _run(model, variables, tokens, lengths, ip, steps):
    from transformerengine_tpu.inference import decode_steps, prefill
    first, cache = prefill(model, variables, tokens, ip, lengths, 0.0)
    toks, _ = decode_steps(model, variables, cache, first, ip, steps, 0.0)
    return int(toks[0, -1])  # host fetch -> forces execution


def main():
    import transformerengine_tpu as te
    from transformerengine_tpu.inference import InferenceParams
    from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaConfig, LlamaModel
    from transformerengine_tpu.quantize.dtypes import float8_e4m3
    from transformerengine_tpu.quantize.prequant import prequantize_kernels

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig(vocab_size=8192, hidden_size=4096,
                          intermediate_size=14336, num_layers=16,
                          num_attention_heads=32, num_kv_heads=8,
                          max_seq_len=1024, rope_base=500000.0)
        B, PROMPT, N_SHORT, N_LONG = 8, 512, 4, 24
    else:
        cfg = dataclasses.replace(LLAMA_TINY)
        B, PROMPT, N_SHORT, N_LONG = 2, 32, 2, 6

    model = LlamaModel(config=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                cfg.vocab_size)
    lengths = jnp.full((B,), PROMPT, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)

    def bench_variant(variables, kv_dtype):
        ip = InferenceParams(max_batch_size=B,
                             max_sequence_length=PROMPT + N_LONG + 8,
                             kv_cache_dtype=jnp.dtype(kv_dtype))
        # compile both scan lengths
        _run(model, variables, tokens, lengths, ip, N_SHORT)
        _run(model, variables, tokens, lengths, ip, N_LONG)
        times = {}
        for n in (N_SHORT, N_LONG):
            ts = []
            for i in range(3):
                # Distinct prompt per rep so the tunnel cannot serve the
                # whole chain from its result cache.
                tk = tokens.at[:, 0].set((tokens[:, 0] + 17 * i + n)
                                         % cfg.vocab_size)
                t0 = time.perf_counter()
                _run(model, variables, tk, lengths, ip, n)
                ts.append(time.perf_counter() - t0)
            times[n] = sorted(ts)[1]
        return (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)

    fp8_vars = prequantize_kernels(variables, te.Float8CurrentScaling())
    t_fp8 = bench_variant(fp8_vars, float8_e4m3)
    t_bf16 = bench_variant(variables, jnp.bfloat16)

    tokens_per_s = B / t_fp8
    print(json.dumps({
        "metric": "fp8_decode_tokens_per_sec_per_chip_8b_geometry_16L",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(t_bf16 / t_fp8, 3),
    }))


if __name__ == "__main__":
    main()
