"""Microbench: mxfp8_qdq_2x_grouped tile sweep on the Mixtral wi shape.

The r5 MoE profile put the fused QDQ+transpose kernel at ~10.8 ms for
the (8, 4096, 14336) expert stack (2.8 GB traffic -> ~260 GB/s, the
quantize-kernel VPU ceiling zone). Sweep tiles for headroom.
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from benchmarks.xprof import profile

E, K, M = 8, 4096, 14336


def bench(tile):
    if ":" in tile:
        tile, var = tile.split(":")
        os.environ["TE_TPU_QDQ_VARIANT"] = var
    os.environ["TE_TPU_QDQ_TILE"] = tile
    import importlib
    import transformerengine_tpu.ops.quantize_kernels as qk
    w = (jax.random.normal(jax.random.PRNGKey(0), (E, K, M))
         * 0.02).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(w, n):
        def step(c, _):
            nn, tn = qk.mxfp8_qdq_2x_grouped(c)
            # Tiny consumption only: the first micro's full-array carry
            # (f32 converts + a transpose of tn) cost more than the
            # kernel itself and drowned the comparison.
            c2 = c.at[0, 0, 0].add(
                nn[0, :1, :8].sum().astype(c.dtype) * 1e-6
                + tn[0, :1, :8].sum().astype(c.dtype) * 1e-6)
            return c2, ()
        out, _ = jax.lax.scan(step, w, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    for n in (1, 4):
        float(run(w, n))
    busy = {}
    for n in (1, 4):
        _, busy[n] = profile(lambda n=n: float(run(w + n, n)),
                             logdir=f"/tmp/te_qdq_{tile.replace(',', 'x')}_{n}")
    us = (busy[4] - busy[1]) / 3
    gbs = E * K * M * 6 / (us * 1e-6) / 1e9   # 2B read + 4B write
    print(f"tile {tile:9s}: {us/1e3:8.2f} ms/call ({gbs:6.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["256,512", "256,256", "512,512"]
    for t in variants:
        try:
            bench(t)
        except Exception as e:
            print(f"{t}: FAILED {str(e)[:160]}", flush=True)
    print("DONE")
