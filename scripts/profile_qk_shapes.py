"""Why is the flash QK^T matmul slow? Isolate the (rows,128)@(128,bk)
shallow-contraction matmul in a minimal Pallas kernel and sweep layout/
output-dtype variants, interleaved with a deep GEMM calibrator.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import chain_carry, marginal_seconds_interleaved

ROWS, D, BK, NBLK = 1024, 128, 2048, 32   # 32 QK blocks per step


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def qk_kernel(q_ref, k_ref, o_ref, *, nt, sdtype):
    q = q_ref[0]
    k = k_ref[0]
    # MXU accumulates f32 (bf16 acc is rejected); sdtype converts the
    # materialized score values afterwards.
    if nt:   # k is (BK, D): contract lanes with lanes
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:    # k is (D, BK): standard NN
        s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s.astype(sdtype)
    # consume s cheaply -> (ROWS, 128) partial sums so s can't be DCE'd
    o_ref[0] = s[:, :128].astype(jnp.float32) + jnp.sum(
        s[:, 128:].astype(jnp.float32).reshape(ROWS, -1, 128), axis=1)


def qk_softmax_kernel(q_ref, k_ref, o_ref, *, nt, sdtype):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(sdtype)
    m = jnp.max(s.astype(jnp.float32), axis=1, keepdims=True)
    p = jnp.exp2(s.astype(jnp.float32) - m)
    o_ref[0] = p[:, :128] + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), (ROWS, 128))


def make_qk(nt=True, sdtype=jnp.float32, softmax=False):
    kern = functools.partial(qk_softmax_kernel if softmax else qk_kernel,
                             nt=nt, sdtype=sdtype)
    kshape = (NBLK, BK, D) if nt else (NBLK, D, BK)
    kspec = (pl.BlockSpec((1, BK, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if nt
             else pl.BlockSpec((1, D, BK), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM))

    def run(q2d, k):
        return pl.pallas_call(
            kern,
            grid=(NBLK,),
            in_specs=[pl.BlockSpec((1, ROWS, D), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM), kspec],
            out_specs=pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NBLK, ROWS, 128), jnp.float32),
        )(q2d.reshape(1, ROWS, D), k)
    return run, kshape


def main():
    flops_qk = 2.0 * NBLK * ROWS * D * BK

    variants = {}
    for name, nt, sdt, sm in [
        ("nt_f32", True, jnp.float32, False),
        ("nt_bf16", True, jnp.bfloat16, False),
        ("nn_f32", False, jnp.float32, False),
        ("nt_f32_softmax", True, jnp.float32, True),
        ("nt_bf16_softmax", True, jnp.bfloat16, True),
    ]:
        run, kshape = make_qk(nt, sdt, sm)
        kmat = _normal(5, kshape)

        def step(c, kk, _run=run):
            y = _run(c.reshape(ROWS, D), kk)
            return chain_carry(c, y)
        variants[name] = (step, kmat)

    GM, GK, GN = 8192, 4096, 4096
    gw = _normal(13, (GK, GN), scale=0.02)
    gemm_flops = 2.0 * GM * GK * GN

    def gemm_step(c, w):
        x = jnp.tile(c.reshape(ROWS, D), (GM // ROWS, GK // D))
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return chain_carry(c, y.astype(jnp.bfloat16))

    variants["gemm"] = (gemm_step, gw)
    t = marginal_seconds_interleaved(
        variants, lambda s: _normal(s, (ROWS, D)), n_short=2, n_long=8)
    out = {"gemm_tflops": round(gemm_flops / t["gemm"] / 1e12, 1)}
    for name in variants:
        if name == "gemm":
            continue
        out[name] = {"ms": round(t[name] * 1e3, 3),
                     "tflops": round(flops_qk / t[name] / 1e12, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
