"""XProf the decode step kernel-by-kernel for bf16 / fp8 / nvfp4.

Usage: python scripts/profile_decode.py [bf16|fp8|nvfp4 ...]

For each variant: compiles the N_SHORT and N_LONG decode scans, traces
both, and prints the per-op DEVICE-lane marginal time (long - short) /
(N_LONG - N_SHORT) — i.e. the per-decode-step time attributable to each
kernel. This is the breakdown VERDICT r3 asked for (decode is ~58% of
the HBM roofline and the bf16 baseline looked 2x off).
"""
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    variants = sys.argv[1:] or ["bf16", "fp8"]
    import transformerengine_tpu as te
    from transformerengine_tpu.inference import InferenceParams
    from transformerengine_tpu.models.llama import LlamaConfig, LlamaModel
    from transformerengine_tpu.quantize.dtypes import float8_e4m3
    from transformerengine_tpu.quantize.prequant import prequantize_kernels
    from benchmarks.xprof import profile
    from bench import _run

    cfg = LlamaConfig(vocab_size=8192, hidden_size=4096,
                      intermediate_size=14336, num_layers=16,
                      num_attention_heads=32, num_kv_heads=8,
                      max_seq_len=1024, rope_base=500000.0)
    B, PROMPT, N_SHORT, N_LONG = 8, 512, 4, 24

    model = LlamaModel(config=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                cfg.vocab_size)
    lengths = jnp.full((B,), PROMPT, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)

    for name in variants:
        last = name == variants[-1]
        if name == "fp8":
            vv = prequantize_kernels(variables, te.Float8CurrentScaling())
            kv = float8_e4m3
        elif name == "nvfp4":
            # bf16-resident block-decode doubles the copy; donate the
            # source kernels when this is the final variant (16 GB HBM).
            vv = prequantize_kernels(variables, te.NVFP4BlockScaling(),
                                     donate=last)
            kv = float8_e4m3
        elif name == "bf16_raw":
            vv, kv = variables, jnp.bfloat16
        else:
            vv, kv = prequantize_kernels(variables, None), jnp.bfloat16
        ip = InferenceParams(max_batch_size=B,
                             max_sequence_length=PROMPT + N_LONG + 8,
                             kv_cache_dtype=jnp.dtype(kv))
        # compile both scan lengths
        _run(model, vv, tokens, lengths, ip, N_SHORT)
        _run(model, vv, tokens, lengths, ip, N_LONG)
        ops = {}
        busy = {}
        for n in (N_SHORT, N_LONG):
            tk = tokens.at[:, 0].set((tokens[:, 0] + n) % cfg.vocab_size)
            per_op, b = profile(
                lambda tk=tk, n=n: _run(model, vv, tk, lengths, ip, n),
                logdir=f"/tmp/te_xprof_dec_{name}_{n}")
            ops[n] = per_op
            busy[n] = b
        per_step_us = (busy[N_LONG] - busy[N_SHORT]) / (N_LONG - N_SHORT)
        print(f"\n===== {name}: per-step {per_step_us/1e3:.3f} ms "
              f"({B/(per_step_us/1e6):.0f} tok/s) =====")
        # marginal per-op
        allk = set(ops[N_SHORT]) | set(ops[N_LONG])
        marg = {k: (ops[N_LONG].get(k, 0.0) - ops[N_SHORT].get(k, 0.0))
                / (N_LONG - N_SHORT) for k in allk}
        for k, us in sorted(marg.items(), key=lambda kv: -kv[1])[:30]:
            if abs(us) < 0.5:
                continue
            print(f"  {us:9.1f} us/step  {k[:120]}")
        del vv
    print("\nDONE")


if __name__ == "__main__":
    main()
