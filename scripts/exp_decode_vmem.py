"""Experiment: does a larger scoped-VMEM budget let XLA double-buffer
the decode GEMMs' weight staging (the ~0.8 ms/step of non-overlapped
MSA slice-copies in the fp8 decode profile)?

Run as:  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
             python scripts/exp_decode_vmem.py
and compare against a run without the flag. The flag rides the local
client's compile options to the remote compiler; if the variant
compiler rejects it the failure is immediate and harmless.
"""
import os
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
    B, PROMPT, NS, NL = 8, 512, 4, 24
    model = LlamaModel(config=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                cfg.vocab_size)
    lengths = jnp.full((B,), PROMPT, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
    fv = prequantize_kernels(variables, te.Float8CurrentScaling())
    del variables
    ip = InferenceParams(max_batch_size=B, max_sequence_length=PROMPT+NL+8,
                         kv_cache_dtype=jnp.dtype(float8_e4m3))
    _run(model, fv, tokens, lengths, ip, NS)
    _run(model, fv, tokens, lengths, ip, NL)
    busy = {}
    for n in (NS, NL):
        tk = tokens.at[:, 0].set((tokens[:, 0] + n) % cfg.vocab_size)
        _, busy[n] = profile(
            lambda tk=tk, n=n: _run(model, fv, tk, lengths, ip, n),
            logdir=f"/tmp/te_xprof_vmem_{n}")
    per = (busy[NL]-busy[NS])/20/1e3
    print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS','')!r} "
          f"fp8 decode per-step {per:.3f} ms ({8/(per/1e3):.0f} tok/s)",
          flush=True)


if __name__ == "__main__":
    main()
