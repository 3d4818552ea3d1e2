"""A/B the ALLSPLIT fwd knob (full blocks through the two-pass split
body) against the monolithic body, back-to-back in one trace window."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.xprof import profile
import transformerengine_tpu.ops.flash_attention as fa
from transformerengine_tpu.attention import AttnMaskType

B, S, HQ, HKV, D = 4, 2048, 32, 8, 128
N = 8


def bench(allsplit, sub, bq, bk):
    fa.ALLSPLIT = allsplit
    fa.SPLIT_SUB = sub
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.bfloat16)

    def step(carry, _):
        o = fa.flash_attention(carry, k, v,
                               attn_mask_type=AttnMaskType.CAUSAL,
                               block_q=bq, block_k=bk)
        return (o * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()

    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    float(run(q))
    per_op, busy = profile(lambda: float(run(q + jnp.bfloat16(0.25))))
    flops = 4 * B * HQ * S * S * D * 0.5 * N
    print(f"== allsplit={int(allsplit)} sub={sub} bq={bq} bk={bk}: "
          f"busy {busy/1e3:.2f} ms ({busy/1e3/N:.3f}/call) -> "
          f"{flops/(busy*1e-6)/1e12:.1f} TF/s", flush=True)
    return busy


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for allsplit, sub, bq, bk in [
        (False, 512, 512, 1024),    # r3 default (baseline)
        (True, 512, 512, 1024),
        (True, 256, 512, 1024),
        (True, 512, 512, 2048),
        (True, 1024, 512, 2048),
        (False, 512, 512, 1024),    # baseline again (drift check)
    ]:
        bench(allsplit, sub, bq, bk)
    print("DONE")
