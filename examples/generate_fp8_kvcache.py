"""Generation example: FP8 KV cache + jitted decode loop.

TPU counterpart of the reference's te_gemma generation tutorial
(reference: docs/examples/te_gemma — KV cache, CUDA-graphed decode,
FP8 weights). Here the decode loop is one jitted lax.scan.

    python examples/generate_fp8_kvcache.py --new-tokens 16 --fp8-cache
"""
from __future__ import annotations

import argparse
import os
import time

import jax

# CPU by default; opt into an attached accelerator explicitly (the
# ambient environment may preset an unavailable remote platform).
if os.environ.get("TE_EXAMPLE_ACCEL") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from transformerengine_tpu.inference import generate
from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
from transformerengine_tpu.quantize.dtypes import float8_e4m3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-tokens", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--fp8-cache", action="store_true")
    args = ap.parse_args()

    model = LlamaModel(config=LLAMA_TINY)
    tokens = jax.random.randint(
        jax.random.PRNGKey(0), (args.batch, args.prompt_len), 1, 256)
    lengths = jnp.full((args.batch,), args.prompt_len, jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), tokens)

    dtype = float8_e4m3 if args.fp8_cache else jnp.bfloat16
    t0 = time.perf_counter()
    out = generate(model, variables, tokens, lengths, args.new_tokens,
                   kv_cache_dtype=dtype)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"cache dtype: {jnp.dtype(dtype).name}")
    print(f"generated {out.shape} in {dt*1e3:.1f} ms "
          f"({args.batch * args.new_tokens / dt:.1f} tok/s incl. compile)")
    print(out)


if __name__ == "__main__":
    main()
