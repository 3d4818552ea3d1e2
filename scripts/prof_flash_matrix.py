"""Precise flash-fwd variant matrix via XProf device-lane times.

Host wall-clock through the axon tunnel is +-25% noisy even interleaved;
device-lane op durations are stable. Each variant traces a chained scan
and reports the flash kernel's device time per call.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from functools import partial

from benchmarks.xprof import profile

B, S, Hq, Hkv, D = 4, 2048, 32, 8, 128
N = 8


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def main():
    import transformerengine_tpu.ops.flash_attention as fa
    from transformerengine_tpu.attention import AttnMaskType
    from benchmarks.timing import chain_carry

    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    flops = 2 * 2.0 * B * Hq * S * S * D / 2

    results = {}
    for name, kmaj, mform, bk in [
        ("s_bcast_1024", "s", "bcast", 1024),
        ("d_bcast_1024", "d", "bcast", 1024),
        ("s_fpen_1024", "s", "fpen", 1024),
        ("d_fpen_1024", "d", "fpen", 1024),
        ("s_grid_1024", "s", "grid", 1024),
        ("s_bcast_2048", "s", "bcast", 2048),
        ("s_bcast_512", "s", "bcast", 512),
    ]:
        def step(q, _):
            # K_MAJOR / MASK_FORM knobs were removed after the r3
            # sweep (neutral / worse); only bk varies now.
            o = fa.flash_attention(q, k, v,
                                   attn_mask_type=AttnMaskType.CAUSAL,
                                   block_k=bk)
            return chain_carry(q, o), None

        @jax.jit
        def run(q0):
            return jax.lax.scan(step, q0, None, length=N)[0]

        q0 = _normal(3, (B, S, Hq, D))
        jnp.sum(run(q0)).block_until_ready()   # compile outside trace
        per_op, busy = profile(lambda: float(jnp.sum(run(q0))))
        flash_us = sum(us for op, us in per_op.items()
                       if "closed_call" in op or "fwd_kernel" in op
                       or "flash" in op.lower())
        per_call = flash_us / N
        results[name] = {
            "flash_us_per_call": round(per_call, 1),
            "tflops": round(flops / (per_call * 1e-6) / 1e12, 1),
            "device_busy_ms": round(busy / 1e3, 3),
            "top_ops": sorted(per_op.items(), key=lambda kv: -kv[1])[:3],
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps({n: {k2: v2 for k2, v2 in r.items() if k2 != "top_ops"}
                      for n, r in results.items()}, indent=1))


if __name__ == "__main__":
    main()
