"""Microbench: in-VMEM block-dequant formulations for the KN decode GEMM.

The first decode_kn_matvec cut (sublane-broadcast scale expansion)
measured 1639 us/step on the wi GEMM vs ~190 us for the fp8 TN kernel —
the dequant chain, not bytes, dominates. Variants:

  bcast   : (rows/bs, bs, bn) view * s[:, None, :]  (r5 first cut)
  mxu     : expanded = E(0/1) @ s via MXU, then one flat VPU multiply
            (the r2 quantize-kernel winner for lane-wise expansion)
  repeat  : pltpu.repeat(s, bs, axis=0)
  noscale : payload convert + dot only (floor: what fp8 tensor-scaling
            pays); block scales skipped — WRONG numerics, timing only
  xla     : the block_resident_dot XLA fallback (materialized dequant)
  tn_fp8  : the r4 fp8 TN kernel on the same bytes (reference point)

Usage: python scripts/micro_kn_dequant.py [variants...]
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.xprof import profile

M, K, N, BS = 8, 4096, 28672, 16
BN = 512


def _kernel(x_ref, w_ref, s_ref, o_ref, *, variant, chunk_rows):
    x = x_ref[...]
    s = s_ref[...]
    bn = o_ref.shape[1]
    acc = jnp.zeros((M, bn), jnp.float32)
    gc = chunk_rows // BS
    for i in range(K // chunk_rows):
        rows = slice(i * chunk_rows, (i + 1) * chunk_rows)
        if variant == "direct":
            # fp8 operand straight into the dot (NO scale — wrong
            # numerics, isolates the mixed NN dot speed).
            acc = acc + jax.lax.dot_general(
                x[:, rows], w_ref[rows, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue
        w = w_ref[rows, :].astype(jnp.bfloat16)
        sl = s[i * gc:(i + 1) * gc]
        if variant == "bcast":
            wb = (w.reshape(gc, BS, bn) * sl[:, None, :]).reshape(
                chunk_rows, bn)
        elif variant == "mxu":
            expander = (jax.lax.broadcasted_iota(
                jnp.int32, (chunk_rows, gc), 0) // BS
                == jax.lax.broadcasted_iota(
                    jnp.int32, (chunk_rows, gc), 1)).astype(jnp.bfloat16)
            expanded = jax.lax.dot_general(
                expander, sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
            wb = w * expanded
        elif variant == "repeat":
            wb = w * pltpu.repeat(sl, BS, 0)
        else:                       # noscale
            wb = w
        acc = acc + jax.lax.dot_general(
            x[:, rows], wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def kn_call(x, w, s, variant, chunk_rows=1024, bn=BN):
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, chunk_rows=chunk_rows),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // BS, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=K * N + M * K * 2,
            transcendentals=0),
    )(x, w, s)


def bench(variant):
    from transformerengine_tpu.quantize.dtypes import float8_e4m3
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32).astype(
        jnp.dtype(float8_e4m3))
    s = (jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (K // BS, N)))
         + 0.5).astype(jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(x, w, s, n):
        def step(c, _):
            if variant == "xla":
                wb = (w.astype(jnp.bfloat16).reshape(K // BS, BS, N)
                      * s[:, None, :]).reshape(K, N)
                y = jax.lax.dot_general(
                    c, wb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                y = kn_call(c, w, s, variant)
            c2 = (y[:, :K] * 1e-6 + c.astype(jnp.float32)).astype(c.dtype)
            return c2, ()
        out, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    if variant == "tn_fp8":
        from transformerengine_tpu.ops.decode_matmul import decode_tn_matvec
        wt = jnp.asarray(jnp.transpose(w))   # (N, K)

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(x, n, wt=wt):
            def step(c, _):
                y = decode_tn_matvec(c, wt, jnp.float32(1.0))
                c2 = (y[:, :K] * 1e-6 + c.astype(jnp.float32)).astype(c.dtype)
                return c2, ()
            out, _ = jax.lax.scan(step, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        for n in (2, 10):
            float(run(x, n))
        busy = {}
        for n in (2, 10):
            _, busy[n] = profile(lambda n=n: float(run(x + n, n)),
                                 logdir=f"/tmp/te_kn_{variant}_{n}")
    else:
        for n in (2, 10):
            float(run(x, w, s, n))
        busy = {}
        for n in (2, 10):
            _, busy[n] = profile(lambda n=n: float(run(x + n, w, s, n)),
                                 logdir=f"/tmp/te_kn_{variant}_{n}")
    us = (busy[10] - busy[2]) / 8
    gbs = K * N / (us * 1e-6) / 1e9
    print(f"{variant:8s}: {us:8.1f} us/call  ({gbs:6.0f} GB/s payload rate)",
          flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["noscale", "bcast", "mxu", "repeat", "xla",
                              "tn_fp8"]:
        try:
            bench(v)
        except Exception as e:
            print(f"{v}: FAILED {str(e)[:200]}", flush=True)
    print("DONE")
