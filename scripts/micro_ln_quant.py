"""Microbench: fused RMSNorm+cast_transpose vs the unfused chain.

VERDICT r4 weak #5 / SURVEY 7.1.6: build the one-VMEM-pass LN->fp8
kernel and XProf it against XLA's chain (rmsnorm_fwd + Pallas
cast_transpose — the LN output round-trips HBM between the two).

Shapes = the ln_mlp rung's GEMM1 activation quantize (B2 S2048 H4096).

Usage: python scripts/micro_ln_quant.py
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from benchmarks.xprof import profile

M, H = 4096, 4096


def bench(variant):
    from transformerengine_tpu.ops.normalization import rmsnorm_fwd
    from transformerengine_tpu.ops.quantize_kernels import (
        cast_transpose, norm_cast_transpose)
    from transformerengine_tpu.quantize.dtypes import float8_e4m3

    gamma = jax.random.normal(jax.random.PRNGKey(1), (H,), jnp.bfloat16)
    scale = jnp.asarray([1.3], jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (M, H), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def step(c, _):
            if variant == "fused":
                row, col, amax, rsig = norm_cast_transpose(
                    c, gamma, None, scale, float8_e4m3)
            else:
                ln, rsig = rmsnorm_fwd(c, gamma)
                row, col, amax = cast_transpose(
                    ln, scale, float8_e4m3, tile=(256, 256))
            c2 = (c.astype(jnp.float32)
                  + row.astype(jnp.float32) * 1e-6
                  + col.T.astype(jnp.float32) * 1e-6
                  + amax[0] * 1e-8 + rsig.reshape(M, 1) * 1e-8
                  ).astype(c.dtype)
            return c2, ()
        out, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    for n in (2, 10):
        float(run(x, n))
    busy = {}
    for n in (2, 10):
        _, busy[n] = profile(lambda n=n: float(run(x + n, n)),
                             logdir=f"/tmp/te_lnq_{variant}_{n}")
    us = (busy[10] - busy[2]) / 8
    gbs = M * H * 2 / (us * 1e-6) / 1e9
    print(f"{variant:7s}: {us:8.1f} us/call ({gbs:6.0f} GB/s input rate)",
          flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["chain", "fused"]:
        try:
            bench(v)
        except Exception as e:
            print(f"{v}: FAILED {str(e)[:200]}", flush=True)
    print("DONE")
