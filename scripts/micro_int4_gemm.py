"""Microbench: 4-bit weight-resident decode GEMM formats on v5e.

fp4 (float4_e2m1fn) is byte-backed in XLA — NO byte advantage over fp8.
int4 is natively packed 2-per-byte on TPU; if a dot with an int4
operand streams at ~2x the fp8 rate, INT4 block scaling is the
TPU-native 4-bit weight format (ladder #5's performance path).

Times an (8, K) x (K, N) decode-shaped GEMM inside a scan for:
  bf16 / fp8-direct / int4-direct / int4->bf16-convert / fp4-direct.
"""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from functools import partial

from benchmarks.xprof import profile

M, K, N = 8, 4096, 28672


def bench(mode):
    if mode == "bf16":
        w = jnp.ones((K, N), jnp.bfloat16)
    elif mode == "fp8":
        w = jnp.ones((K, N), jnp.float8_e4m3fn)
    elif mode.startswith("int4"):
        w = jnp.ones((K, N), jnp.int4)
    else:
        w = jnp.ones((K, N), jnp.float4_e2m1fn)

    @partial(jax.jit, static_argnums=(2,))
    def run(x, w, n):
        def step(c, _):
            if mode == "int4_convert":
                wv = w.astype(jnp.bfloat16)
            else:
                wv = w
            y = jax.lax.dot_general(c, wv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            c2 = (y[:, :K] * 1e-6 + c.astype(jnp.float32)).astype(c.dtype)
            return c2, ()

        out, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    x = jnp.ones((M, K), jnp.bfloat16)
    for n in (2, 10):
        float(run(x, w, n))
    busy = {}
    for n in (2, 10):
        _, busy[n] = profile(lambda n=n: float(run(x + n, w, n)),
                             logdir=f"/tmp/te_xprof_int4_{mode}_{n}")
    us = (busy[10] - busy[2]) / 8
    gbs = K * N * {"bf16": 2, "fp8": 1, "fp4": 1}.get(
        mode, 0.5) / (us * 1e-6) / 1e9
    print(f"{mode:13s}: {us:8.1f} us/step  ({gbs:6.0f} GB/s effective)",
          flush=True)


if __name__ == "__main__":
    for m in sys.argv[1:] or ["bf16", "fp8", "int4", "int4_convert", "fp4"]:
        try:
            bench(m)
        except Exception as e:
            print(f"{m}: FAILED {str(e)[:160]}", flush=True)
    print("DONE")
