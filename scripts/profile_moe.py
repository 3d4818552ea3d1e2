"""XProf the MoE rung kernel-by-kernel (mxfp8 / mxfp8_mb / bf16).

VERDICT r3 weak #3: MoE MXFP8 at 0.65x bf16 with no profile. Prints the
per-step per-op-family device-time marginal between a short and a long
chained scan for each variant.
"""
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from benchmarks.xprof import profile
from benchmarks.ladder import _normal, chain_carry


def main():
    B, S, H, F, E, topk = 2, 2048, 4096, 7168, 8, 2
    from transformerengine_tpu.moe import moe
    from transformerengine_tpu.quantize.microbatch import (
        quantize_grouped_kernel)

    router = _normal(31, (H, E), jnp.float32, scale=0.02)
    w_up = _normal(32, (E, H, 2 * F), scale=0.02)
    w_down = _normal(33, (E, F, H), scale=0.02)
    T = B * S
    mk = te.QuantizerFactory.create_set
    variants = sys.argv[1:] or ["mxfp8", "bf16"]

    for name in variants:
        if name == "bf16":
            qsets, caches = (mk(None), mk(None)), None
        else:
            qsets = (mk(te.MXFP8BlockScaling()), mk(te.MXFP8BlockScaling()))
            caches = None
            if name == "mxfp8_mb":
                caches = (quantize_grouped_kernel(w_up, qsets[0])[0],
                          quantize_grouped_kernel(w_down, qsets[1])[0])

        # Weights MUST be jit ARGUMENTS: closed-over arrays embed as
        # HLO constants and blow the remote-compile request body
        # (timing.py:128 — observed HTTP 413 / broken pipe at ~350 MB).
        def step(c, params):
            wu, wd, cc = params

            def loss(x, wu, wd):
                y, aux = moe(x, router, wu, wd, topk=topk,
                             activation_type="swiglu",
                             quantizer_sets=qsets, kernel_caches=cc)
                return jnp.sum(y.astype(jnp.float32)) + aux
            grads = jax.grad(loss, argnums=(0, 1, 2))(c, wu, wd)
            return chain_carry(c, grads), ()

        import functools

        @functools.partial(jax.jit, static_argnums=(2,))
        def run(x, params, n):
            out, _ = jax.lax.scan(lambda c, _: step(c, params), x, None,
                                  length=n)
            return jnp.sum(out.astype(jnp.float32))

        params = (w_up, w_down, caches)
        x = _normal(7, (T, H))
        for n in (2, 4):
            float(run(x, params, n))
        ops, busy = {}, {}
        for n in (2, 4):
            ops[n], busy[n] = profile(
                lambda n=n: float(run(x + jnp.bfloat16(n), params, n)),
                logdir=f"/tmp/te_xprof_moe_{name}_{n}")
        per = (busy[4] - busy[2]) / 2 / 1e3
        print(f"\n===== {name}: {per:.3f} ms/step =====")
        fam = defaultdict(float)
        for k in set(ops[2]) | set(ops[4]):
            if k.startswith(("jit_", "while")):
                continue
            fam[re.sub(r"[.\d]+$", "", k)] += (
                ops[4].get(k, 0.0) - ops[2].get(k, 0.0)) / 2
        for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
            if abs(v) > 20:
                print(f"  {v/1e3:9.3f} ms  {k}")
        # top individual ops
        marg = {k: (ops[4].get(k, 0.0) - ops[2].get(k, 0.0)) / 2
                for k in set(ops[2]) | set(ops[4])
                if not k.startswith(("jit_", "while"))}
        print("  -- top ops --")
        for k, v in sorted(marg.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {v/1e3:9.3f} ms  {k[:90]}")
    print("\nDONE")


if __name__ == "__main__":
    main()
