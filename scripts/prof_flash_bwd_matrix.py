"""XProf device-lane matrix for flash BWD (dq + dkv kernels)."""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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
    # fwd 2 matmuls + bwd 5 matmuls, causal half
    flops = 7 * 2.0 * B * Hq * S * S * D / 2

    results = {}
    for name, bk, inner in [
        ("bk2048", 2048, 10 ** 6),
        ("bk1024", 1024, 10 ** 6),
        ("bk1024_i512", 1024, 512),
        ("bk512", 512, 10 ** 6),
    ]:
        def loss(q):
            fa.INNER_K = inner   # trace-time
            o = fa.flash_attention(q, k, v,
                                   attn_mask_type=AttnMaskType.CAUSAL,
                                   block_k=bk)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def step(q, _):
            return chain_carry(q, jax.grad(loss)(q)), None

        @jax.jit
        def run(q0):
            return jax.lax.scan(step, q0, None, length=N)[0]

        q0 = _normal(3, (B, S, Hq, D))
        jnp.sum(run(q0)).block_until_ready()
        per_op, busy = profile(lambda: float(jnp.sum(run(q0))))
        tot_us = sum(us for op, us in per_op.items() if "closed_call" in op)
        if tot_us == 0:
            print("NO closed_call; top ops:",
                  sorted(per_op.items(), key=lambda kv: -kv[1])[:12])
            tot_us = float("nan")
        results[name] = {
            "kernels_us_per_call": round(tot_us / N, 1),
            "tflops": round(flops / (tot_us / N * 1e-6) / 1e12, 1),
            "device_busy_ms_per_call": round(busy / 1e3 / N, 3),
        }
        print(name, json.dumps(results[name]), flush=True)
    fa.INNER_K = 10 ** 6
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
