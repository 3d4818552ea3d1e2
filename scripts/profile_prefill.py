"""XProf the fp8 prefill (TTFT path): B8 x 512-token prompt through the
16L 8B-geometry stack with fp8-resident weights.

TTFT p50 is ~220 ms; the compute floor is ~175-190 ms (28.7 TFLOP of
GEMMs at the in-situ rate + flash prefill) — this prints the per-op
family breakdown of one prefill to find the rest.
"""
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from transformerengine_tpu.inference import InferenceParams, prefill
from transformerengine_tpu.models.llama import LlamaConfig, LlamaModel
from transformerengine_tpu.quantize.dtypes import float8_e4m3
from transformerengine_tpu.quantize.prequant import prequantize_kernels
from benchmarks.xprof import profile


def main():
    cfg = LlamaConfig(vocab_size=8192, hidden_size=4096,
                      intermediate_size=14336, num_layers=16,
                      num_attention_heads=32, num_kv_heads=8,
                      max_seq_len=1024, rope_base=500000.0)
    B, PROMPT = 8, 512
    model = LlamaModel(config=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                cfg.vocab_size)
    lengths = jnp.full((B,), PROMPT, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    fv = prequantize_kernels(variables, te.Float8CurrentScaling())
    del variables
    ip = InferenceParams(max_batch_size=B, max_sequence_length=PROMPT + 32,
                         kv_cache_dtype=jnp.dtype(float8_e4m3))

    def run(i):
        tk = tokens.at[:, 1].set((tokens[:, 1] + i) % cfg.vocab_size)
        first, _ = prefill(model, fv, tk, ip, lengths, 0.0)
        return int(first[0])

    run(0)
    per_op, busy = profile(lambda: run(7), logdir="/tmp/te_xprof_prefill")
    print(f"prefill device busy: {busy/1e3:.1f} ms")
    fam = defaultdict(float)
    for k, v in per_op.items():
        if k.startswith(("jit_", "while")):
            continue
        fam[re.sub(r"[.\d]+$", "", k)] += v
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:18]:
        if v > 200:
            print(f"  {v/1e3:9.3f} ms  {k}")
    print("  -- top ops --")
    ops = {k: v for k, v in per_op.items()
           if not k.startswith(("jit_", "while"))}
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v/1e3:9.3f} ms  {k[:90]}")


if __name__ == "__main__":
    main()
