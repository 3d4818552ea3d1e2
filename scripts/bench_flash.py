"""Flash-attention prefill microbench on the real TPU (axon tunnel).

Methodology (see memory note axon-tpu-bench-quirks / CLAUDE.md): chain
steps through a lax.scan carry so the tunnel can't memoize, fetch a
scalar to force execution, and report the marginal time between two
scan lengths. Sanity ceiling: v5e ~197 TFLOP/s bf16.

Usage: python scripts/bench_flash.py [block_q block_k ...]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from transformerengine_tpu.attention import AttnMaskType
from transformerengine_tpu.ops.flash_attention import flash_attention

B, S, HQ, HKV, D = 4, 2048, 32, 8, 128
CAUSAL = os.environ.get("CAUSAL", "1") == "1"


def bench(block_q, block_k, bwd=False):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, HQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.bfloat16)

    attn = functools.partial(
        flash_attention, attn_mask_type=AttnMaskType.CAUSAL if CAUSAL
        else AttnMaskType.NO_MASK, block_q=block_q, block_k=block_k)

    if bwd:
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

        def step(carry, _):
            q_ = carry
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_, k, v)
            # chain: next q depends on grads
            return (q_ + 1e-6 * dq).astype(jnp.bfloat16), ()
    else:
        def step(carry, _):
            o = attn(carry, k, v)
            return o.astype(jnp.bfloat16), ()

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(q, n):
        out, _ = jax.lax.scan(step, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    n_short, n_long = (2, 6) if bwd else (4, 12)
    float(run(q, n_short))
    float(run(q, n_long))
    times = {}
    for n in (n_short, n_long):
        ts = []
        for i in range(7):
            qq = q + jnp.bfloat16(0.01 * (i + 1))
            t0 = time.perf_counter()
            float(run(qq, n))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)   # min marginal: least tunnel noise
    dt = (times[n_long] - times[n_short]) / (n_long - n_short)
    flops = 4 * B * HQ * S * S * D * (0.5 if CAUSAL else 1.0)
    if bwd:
        flops *= 3.5  # fwd (1) + bwd dq/dkv (2.5)
    tf = flops / dt / 1e12
    tag = "bwd" if bwd else "fwd"
    print(f"{tag} block_q={block_q:4d} block_k={block_k:4d}: "
          f"{dt*1e3:7.2f} ms/step  {tf:6.1f} TFLOP/s")
    return tf


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    args = [int(a) for a in sys.argv[1:]]
    pairs = list(zip(args[::2], args[1::2])) or [
        (512, 1024), (1024, 512), (512, 512), (1024, 1024), (256, 1024),
        (2048, 512), (512, 2048)]
    for bq, bk in pairs:
        try:
            bench(bq, bk)
        except Exception as e:
            print(f"block_q={bq} block_k={bk}: FAILED {type(e).__name__}: {e}")
