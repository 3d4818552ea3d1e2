"""Microbench: decode attention einsum forms vs KV-cache layouts.

The full-decode HLO shows 4 layout-change copies of the fp8 cache per
layer per step: the in-place scatter append and the two attention
einsums disagree about the (B,H,S,D) physical layout. Variants:

A) K,V (B,H,S,D); s="bhgd,bhsd->bhgs", o="bhgs,bhsd->bhgd"  (current)
B) K (B,H,S,D), V (B,H,D,S): o="bhgs,bhds->bhgd" (V scatter on lanes)
C) K,V (B,H,S,D); o via explicit dot_general contracting S of p with
   S of v as BATCHED TN (p (B,H,G,S) x v (B,H,S,D) -> contract s dim).
"""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from functools import partial

from benchmarks.xprof import profile

B, HKV, G, S, D = 8, 8, 4, 640, 128
DT = jnp.float8_e4m3fn


def attn(q, ck, cv, lengths, mode):
    op = jnp.bfloat16
    s = jnp.einsum("bhgd,bhsd->bhgs", q.astype(op), ck,
                   preferred_element_type=jnp.float32)
    kpos = jnp.arange(S)[None, None, None, :]
    s = jnp.where(kpos < lengths[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(op)
    if mode == "B":
        o = jnp.einsum("bhgs,bhds->bhgd", p, cv,
                       preferred_element_type=jnp.float32)
    else:
        o = jnp.einsum("bhgs,bhsd->bhgd", p, cv,
                       preferred_element_type=jnp.float32)
    return o


def attn_bshd(q, ck, cv, lengths):
    """Cache stored (B, S, H, D): einsums consume the layout the scatter
    writes ((H, D) = (8,128) native tiles at sublane row s)."""
    op = jnp.bfloat16
    s = jnp.einsum("bhgd,bshd->bhgs", q.astype(op), ck,
                   preferred_element_type=jnp.float32)
    kpos = jnp.arange(S)[None, None, None, :]
    s = jnp.where(kpos < lengths[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(op)
    o = jnp.einsum("bhgs,bshd->bhgd", p, cv,
                   preferred_element_type=jnp.float32)
    return o


def make(mode):
    @partial(jax.jit, static_argnums=(3,))
    def run(ck, cv, lengths, n):
        q0 = jnp.ones((B, HKV, G, D), jnp.bfloat16)

        def step(carry, _):
            ck, cv, lengths, q = carry
            new = (q[:, :, :1, :] * 0.01).astype(DT)          # (B,H,1,D)
            b = jnp.arange(B)
            if mode == "D":
                ck = ck.at[b, lengths].set(new[:, :, 0, :])
                cv = cv.at[b, lengths].set(new[:, :, 0, :])
                o = attn_bshd(q, ck, cv, lengths)
            else:
                ck = ck.at[b, :, lengths, :].set(new[:, :, 0, :])
                if mode == "B":
                    cv = cv.at[b, :, :, lengths].set(new[:, :, 0, :])
                else:
                    cv = cv.at[b, :, lengths, :].set(new[:, :, 0, :])
                o = attn(q, ck, cv, lengths, mode)
            q2 = (o * 1e-3 + q.astype(jnp.float32)).astype(jnp.bfloat16)
            return (ck, cv, lengths + 1, q2), o.sum()

        (ck, cv, _, _), outs = jax.lax.scan(
            step, (ck, cv, lengths, q0), None, length=n)
        return outs.sum()

    return run


def bench(mode):
    run = make(mode)
    shape = ((B, S, HKV, D) if mode == "D"
             else (B, HKV, D, S) if mode == "B" else (B, HKV, S, D))
    ck = jnp.zeros(shape, DT)
    cv = jnp.zeros(shape, DT)
    lengths = jnp.full((B,), 512, jnp.int32)
    for n in (4, 24):
        float(run(ck, cv, lengths, n))
    busy = {}
    for n in (4, 24):
        _, busy[n] = profile(lambda n=n: float(run(ck, cv, lengths, n)),
                             logdir=f"/tmp/te_xprof_dattn_{mode}_{n}")
    us = (busy[24] - busy[4]) / 20
    print(f"mode {mode}: {us:8.1f} us/step")


if __name__ == "__main__":
    for m in sys.argv[1:] or ["A", "B"]:
        bench(m)
    print("DONE")
