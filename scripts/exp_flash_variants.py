"""Diagnose causal-path overhead in the flash fwd kernel (scratch).

Variants (causal S=2048, B4/H32/GQA8/D128):
  cond    — lax.cond interior-skip + iota mask (current prod kernel logic)
  always  — unconditional iota mask on every run block
  rowcmp  — single-compare mask (row thresholds vs col iota), cond-gated
  nomask  — block skip only, NO masking (wrong numerics; timing floor)
  priority— mask only diag blocks statically?? (n/a, dynamic qoff)
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, HQ, HKV, D = 4, 2048, 32, 8, 128
NEG_INF = -1e30
MASKED = -2e30


def make_kernel(variant, block_q, block_k, nk):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        iq, ik = pl.program_id(2), pl.program_id(3)

        @pl.when(ik == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        q_start = iq * block_q
        k_start = ik * block_k
        run = k_start <= q_start + block_q - 1

        @pl.when(run)
        def _body():
            s = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            interior = k_start + block_k - 1 <= q_start

            def apply_iota(sv):
                qpos = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                kpos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                return jnp.where(kpos <= qpos, sv, MASKED)

            def apply_rowcmp(sv):
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                thresh = (q_start - k_start) + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                return jnp.where(col <= thresh, sv, MASKED)

            if variant == "cond":
                s = jax.lax.cond(interior, lambda sv: sv, apply_iota, s)
            elif variant == "always":
                s = apply_iota(s)
            elif variant == "rowcmp":
                s = jax.lax.cond(interior, lambda sv: sv, apply_rowcmp, s)
            elif variant == "whenbuf":
                # write-through scratch + pl.when instead of lax.cond
                s = apply_rowcmp(s)
            elif variant == "nomask":
                pass

            m_prev = m_ref[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, :1])
            l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            m_ref[...] = m_new
            v = v_ref[0, 0]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

        @pl.when(ik == nk - 1)
        def _epilogue():
            l = l_ref[..., :1]
            l_safe = jnp.where(l > 0, l, 1.0)
            o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)

    return kernel


def flash(q, k, v, variant, block_q, block_k):
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    nq, nk = sq // block_q, skv // block_k
    return pl.pallas_call(
        make_kernel(variant, block_q, block_k, nk),
        grid=(b, hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, iq, ik: (bi, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, iq, ik: (bi, h // group, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, iq, ik: (bi, h // group, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, h, iq, ik: (bi, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)


def bench(variant, block_q, block_k):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)

    def step(carry, _):
        o = flash(carry, k, v, variant, block_q, block_k)
        return (o * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(q, n):
        out, _ = jax.lax.scan(step, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(run(q, 4)); float(run(q, 12))
    times = {}
    for n in (4, 12):
        ts = []
        for i in range(3):
            qq = q + jnp.bfloat16(0.01 * (i + 1))
            t0 = time.perf_counter()
            float(run(qq, n))
            ts.append(time.perf_counter() - t0)
        times[n] = sorted(ts)[1]
    dt = (times[12] - times[4]) / 8
    flops = 4 * B * HQ * S * S * D * 0.5
    print(f"{variant:8s} bq={block_q:4d} bk={block_k:4d}: "
          f"{dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s(causal)")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for variant in sys.argv[1:] or ["nomask", "cond", "always", "rowcmp"]:
        for bq, bk in ((1024, 1024), (1024, 512)):
            try:
                bench(variant, bq, bk)
            except Exception as e:
                print(f"{variant} {bq}x{bk}: FAILED {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# GQA group-packed fwd: grid over KV heads; Q heads sharing a KV head are
# stacked into one tall (group*block_q, d) block. 4x fewer grid steps and
# 4x less K/V traffic at GQA=4.
# ---------------------------------------------------------------------------

def make_gqa_kernel(block_q, block_k, nk, group, causal=True):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        iq, ik = pl.program_id(2), pl.program_id(3)

        @pl.when(ik == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        q_start = iq * block_q
        k_start = ik * block_k
        rows = group * block_q
        run = k_start <= q_start + block_q - 1 if causal else True

        @pl.when(run)
        def _body():
            q = q_ref[0].reshape(rows, q_ref.shape[-1])
            s = jax.lax.dot_general(
                q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0)
                qpos = q_start + (row & (block_q - 1))
                kpos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, block_k), 1)
                s = jnp.where(kpos <= qpos, s, MASKED)
            m_prev = m_ref[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new[:, :1])
            l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            m_ref[...] = m_new
            v = v_ref[0, 0]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

        @pl.when(ik == nk - 1)
        def _epilogue():
            l = l_ref[..., :1]
            l_safe = jnp.where(l > 0, l, 1.0)
            o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype).reshape(
                o_ref.shape[1:])

    return kernel


def flash_gqa(q, k, v, block_q, block_k, causal=True):
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    nq, nk = sq // block_q, skv // block_k
    rows = group * block_q
    return pl.pallas_call(
        make_gqa_kernel(block_q, block_k, nk, group, causal),
        grid=(b, hkv, nq, nk),
        in_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, block_q, d),
                               lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)
