"""Experiment: dual-accumulator flash fwd — each grid step processes
TWO k-halves with fully independent (m, l, acc) chains, merged once at
the epilogue. If Mosaic can overlap chain B's QK^T (MXU) with chain A's
softmax (VPU), this beats the production kernel; if it serializes (as
it did for INNER_K sub-tiling and the ALLSPLIT two-pass), it won't.

Standalone causal-only kernel (no segments/bias/sinks) vs the
production flash at the bench shape, same trace window.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.xprof import profile
import transformerengine_tpu.ops.flash_attention as fa
from transformerengine_tpu.attention import AttnMaskType

NEG_INF = -1e30
MASKED = -2e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _chain_update(s, m_ref, l_ref, acc_ref, v, rows, fp8=False):
    m_prev = m_ref[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, :1])
    l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
    m_ref[...] = m_new
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv


def _mask(s, q_start, k_start, block_q, block_k, group):
    rows = group * block_q
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    if group > 1:
        row = jax.lax.rem(row, block_q)
    qpos = q_start + row
    kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    return jnp.where(kpos <= qpos, s, MASKED)


def _dual_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                 acc0, m0, l0, acc1, m1, l1, *,
                 group, block_q, block_k, num_k_steps):
    ik = pl.program_id(3)
    rows = group * block_q
    d = q_ref.shape[-1]

    @pl.when(ik == 0)
    def _init():
        for a, m, l in ((acc0, m0, l0), (acc1, m1, l1)):
            a[...] = jnp.zeros_like(a)
            m[...] = jnp.full_like(m, NEG_INF)
            l[...] = jnp.zeros_like(l)

    q = q_ref[0].reshape(rows, d)
    kf = k_ref[0, 0]            # (2*block_k, d)
    vf = v_ref[0, 0]
    q_start = pl.program_id(2) * block_q
    k_start = ik * 2 * block_k

    run0 = k_start <= q_start + block_q - 1
    run1 = k_start + block_k <= q_start + block_q - 1

    @pl.when(run0)
    def _c0():
        s0 = jax.lax.dot_general(q, kf[:block_k], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s0 = _mask(s0, q_start, k_start, block_q, block_k, group)
        _chain_update(s0, m0, l0, acc0, vf[:block_k], rows)

    @pl.when(run1)
    def _c1():
        s1 = jax.lax.dot_general(q, kf[block_k:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s1 = _mask(s1, q_start, k_start + block_k, block_q, block_k, group)
        _chain_update(s1, m1, l1, acc1, vf[block_k:], rows)

    @pl.when(ik == num_k_steps - 1)
    def _epi():
        ma, mb = m0[..., :1], m1[..., :1]
        m = jnp.maximum(ma, mb)
        a0 = jnp.exp2(ma - m)
        a1 = jnp.exp2(mb - m)
        l = l0[..., :1] * a0 + l1[..., :1] * a1
        l_safe = jnp.where(l > 0, l, 1.0)
        o = (acc0[...] * a0[:, :1] + acc1[...] * a1[:, :1]) / l_safe
        o_ref[0] = o.astype(o_ref.dtype).reshape(group, block_q, d)
        lse = jnp.where(l > 0, m * LN2 + jnp.log(l_safe), NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, (rows, 8)).reshape(
            group, block_q, 8)


def dual_flash(q, k, v, *, block_q=256, block_k=512):
    # q pre-scaled by scale*LOG2E like the production kernel.
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = (1.0 / d ** 0.5) * LOG2E
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    nq = sq // block_q
    nk2 = skv // (2 * block_k)
    rows = group * block_q
    kernel = functools.partial(_dual_kernel, group=group, block_q=block_q,
                               block_k=block_k, num_k_steps=nk2)
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hkv, nq, nk2),
        in_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * block_k, d),
                         lambda bi, hk, iq, ik: (bi, hk, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, block_q, 8),
                         lambda bi, hk, iq, ik: (bi, hk, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, sq, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)
    return o


def main():
    B, S, HQ, HKV, D = 4, 2048, 32, 8, 128
    N = 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.bfloat16)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    # numerics check vs production
    ref = fa.flash_attention(q, k, v, attn_mask_type=AttnMaskType.CAUSAL)
    out = dual_flash(qt, kt, vt).transpose(0, 2, 1, 3)
    d_ = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                               - ref.astype(jnp.float32))))
    print(f"maxdiff vs production: {d_:.5f}", flush=True)

    def bench(fn, tag):
        def step(c, _):
            o = fn(c)
            return (o * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()

        @jax.jit
        def run(x):
            out, _ = jax.lax.scan(step, x, None, length=N)
            return jnp.sum(out.astype(jnp.float32))

        float(run(qt if tag.startswith("dual") else q))
        _, busy = profile(lambda: float(run(
            (qt if tag.startswith("dual") else q) + jnp.bfloat16(0.25))))
        flops = 4 * B * HQ * S * S * D * 0.5 * N
        print(f"{tag}: {busy/1e3:.2f} ms ({busy/1e3/N:.3f}/call) -> "
              f"{flops/(busy*1e-6)/1e12:.1f} TF/s", flush=True)

    bench(lambda c: fa.flash_attention(
        c.transpose(0, 2, 1, 3), k, v,
        attn_mask_type=AttnMaskType.CAUSAL).transpose(0, 2, 1, 3)
        if False else fa.flash_attention(
            c, k, v, attn_mask_type=AttnMaskType.CAUSAL), "prod")
    bench(lambda c: dual_flash(c, kt, vt), "dual(bq256,bk512)")
    bench(lambda c: dual_flash(c, kt, vt, block_q=512, block_k=512),
          "dual(bq512,bk512)")
    bench(lambda c: fa.flash_attention(
        c, k, v, attn_mask_type=AttnMaskType.CAUSAL), "prod-again")
    print("DONE")


if __name__ == "__main__":
    main()
