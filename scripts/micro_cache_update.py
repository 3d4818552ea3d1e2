"""Microbench: KV-cache update strategies inside a decode-like scan.

(a) vmapped per-row dynamic_update_slice at per-row starts (current
    cache_append_bhsd form)
(b) one dynamic_update_slice at a uniform scalar position (MaxText-style
    uniform write cursor)
(c) scatter via .at[arange(B), :, pos, :].set

Each runs as the carry of a lax.scan; per-step DEVICE time is the
marginal between a 4-step and a 24-step scan (tunnel-safe timing).
"""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from functools import partial

from benchmarks.xprof import profile

B, H, S, D = 8, 8, 640, 128
DT = jnp.float8_e4m3fn


def make(mode):
    @partial(jax.jit, static_argnums=(2,))
    def run(ck, cv, n, lengths):
        def step(carry, _):
            ck, cv, lengths = carry
            new = (ck[:, :, :1, :].astype(jnp.float32) + 1.0).astype(DT)
            nv = (cv[:, :, :1, :].astype(jnp.float32) + 1.0).astype(DT)
            if mode == "a":
                def put(c, x, s):
                    return jax.lax.dynamic_update_slice(c, x, (0, s, 0))
                ck2 = jax.vmap(put)(ck, new, lengths)
                cv2 = jax.vmap(put)(cv, nv, lengths)
            elif mode == "b":
                pos = lengths[0]
                ck2 = jax.lax.dynamic_update_slice(ck, new, (0, 0, pos, 0))
                cv2 = jax.lax.dynamic_update_slice(cv, nv, (0, 0, pos, 0))
            else:
                ck2 = ck.at[jnp.arange(B), :, lengths, :].set(new[:, :, 0, :])
                cv2 = cv.at[jnp.arange(B), :, lengths, :].set(nv[:, :, 0, :])
            # read something so the cache is consumed (like attention)
            out = ck2[:, :, ::128, :].astype(jnp.float32).sum()
            return (ck2, cv2, lengths + 1), out

        (ck, cv, _), outs = jax.lax.scan(step, (ck, cv, lengths), None,
                                         length=n)
        return outs.sum()

    return run


def bench(mode):
    run = make(mode)
    ck = jnp.zeros((B, H, S, D), DT)
    cv = jnp.zeros((B, H, S, D), DT)
    lengths = jnp.full((B,), 512, jnp.int32)
    for n in (4, 24):
        float(run(ck, cv, n, lengths))
    busy = {}
    for n in (4, 24):
        _, busy[n] = profile(lambda n=n: float(run(ck, cv, n, lengths)),
                             logdir=f"/tmp/te_xprof_cache_{mode}_{n}")
    us = (busy[24] - busy[4]) / 20
    print(f"mode {mode}: {us:8.1f} us/step")


if __name__ == "__main__":
    for m in sys.argv[1:] or ["a", "b", "c"]:
        bench(m)
    print("DONE")
