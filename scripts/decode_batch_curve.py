"""fp8 decode throughput vs batch size (8B-geometry 16L, 512-tok
prompts) — the serving-scaling evidence behind the README table.
At small B the step is weight-bandwidth-bound (tok/s ~ linear in B);
the MXU-occupancy term grows with B until compute dominates.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from transformerengine_tpu.inference import InferenceParams
from transformerengine_tpu.models.llama import LlamaConfig, LlamaModel
from transformerengine_tpu.quantize.dtypes import float8_e4m3
from transformerengine_tpu.quantize.prequant import prequantize_kernels
from benchmarks.xprof import profile
from bench import _run


def main():
    cfg = LlamaConfig(vocab_size=8192, hidden_size=4096,
                      intermediate_size=14336, num_layers=16,
                      num_attention_heads=32, num_kv_heads=8,
                      max_seq_len=1024, rope_base=500000.0)
    PROMPT, NS, NL = 512, 4, 24
    model = LlamaModel(config=cfg)
    import os
    bs = os.environ.get("TE_TPU_CURVE_BATCHES", "1,4,8,16,32")
    for B in (int(x) for x in bs.split(",")):
        tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                    cfg.vocab_size)
        lengths = jnp.full((B,), PROMPT, jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
        fv = prequantize_kernels(variables, te.Float8CurrentScaling())
        del variables
        ip = InferenceParams(max_batch_size=B,
                             max_sequence_length=PROMPT + NL + 8,
                             kv_cache_dtype=jnp.dtype(float8_e4m3))
        _run(model, fv, tokens, lengths, ip, NS)
        _run(model, fv, tokens, lengths, ip, NL)
        busy = {}
        for n in (NS, NL):
            tk = tokens.at[:, 0].set((tokens[:, 0] + n) % cfg.vocab_size)
            _, busy[n] = profile(
                lambda tk=tk, n=n: _run(model, fv, tk, lengths, ip, n),
                logdir=f"/tmp/te_xprof_curve_{B}_{n}")
        per = (busy[NL] - busy[NS]) / 20 / 1e6
        print(f"B={B:3d}: {per*1e3:7.3f} ms/step  {B/per:8.0f} tok/s",
              flush=True)
        del fv
    print("DONE")


if __name__ == "__main__":
    main()
