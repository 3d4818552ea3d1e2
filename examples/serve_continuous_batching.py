"""Continuous-batching serving demo: more requests than slots.

Runs the GPT-OSS-class tiny model (attention sinks + banded attention +
clamped-SwiGLU MoE) behind the slot-admission scheduler: requests queue,
admit into free KV-cache slots via a batch-1 prefill scattered into the
batch cache, and share one jitted decode step per tick. (Reference
analog: te_gemma generation tutorial + InferenceParams slot reuse.)

Works on CPU (Pallas kernels interpret off-TPU):
    python examples/serve_continuous_batching.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # repo root, like the docs say:
# run from the repo root (python examples/serve_continuous_batching.py)

import jax
import jax.numpy as jnp

# Don't probe jax.default_backend() here — that would INITIALIZE the
# ambient platform (and hang if a remote TPU plugin is unreachable).
# CPU by default; opt into an attached accelerator explicitly.
if os.environ.get("TE_EXAMPLE_ACCEL") != "1":
    jax.config.update("jax_platforms", "cpu")

from transformerengine_tpu.inference import ContinuousBatchingEngine
from transformerengine_tpu.models.gptoss import GPTOSS_TINY, GptOssModel


def main():
    import dataclasses
    # 1 layer off-TPU: the Pallas kernels run in (slow) interpret mode.
    on_accel = os.environ.get("TE_EXAMPLE_ACCEL") == "1"
    cfg = (GPTOSS_TINY if on_accel
           else dataclasses.replace(GPTOSS_TINY, num_layers=1))
    model = GptOssModel(config=cfg)
    prompt_len, max_new, slots = 16, 4, 2
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, prompt_len), jnp.int32))

    # --fp8-kv: e4m3 KV cache with PER-SLOT scales — each admission
    # calibrates its own prefill amax into its slot lane, so live
    # neighbors are never rescaled (reference: inference.py:403
    # per-cache-manager recalibration). No offline calibration needed.
    fp8_kv = "--fp8-kv" in sys.argv
    if fp8_kv:
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
    eng = ContinuousBatchingEngine(
        model, variables, max_batch_size=slots,
        max_sequence_length=prompt_len + max_new + 8,
        prompt_len=prompt_len, max_new_tokens=max_new,
        kv_cache_dtype=(jnp.dtype(float8_e4m3) if fp8_kv
                        else jnp.bfloat16))

    rng = jax.random.PRNGKey(7)
    rids = []
    for i in range(4):                      # 4 requests, 2 slots
        rng, k = jax.random.split(rng)
        n = int(jax.random.randint(k, (), 6, prompt_len))
        prompt = list(range(3 + i, 3 + i + n))
        rids.append(eng.submit(prompt))
        print(f"submitted request {rids[-1]} ({n} prompt tokens)",
              flush=True)

    t0 = time.perf_counter()
    outputs = eng.run()
    dt = time.perf_counter() - t0
    for rid in rids:
        print(f"request {rid}: {outputs[rid]}")
    total = sum(len(v) for v in outputs.values())
    print(f"{total} tokens across {len(rids)} requests on {slots} slots "
          f"in {dt:.2f}s")


if __name__ == "__main__":
    main()
