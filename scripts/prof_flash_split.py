"""Sweep SPLIT_SUB (masked-edge sub-tile skipping) on flash fwd+bwd.

One process, back-to-back XProf traces: compares partial-block sub-tile
skipping (TE_TPU_FLASH_SPLIT_SUB) against the monolithic body on the
headline causal prefill config. Device-lane time only (tunnel wall-clock
drifts)."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.xprof import profile
import transformerengine_tpu.ops.flash_attention as fa
from transformerengine_tpu.attention import AttnMaskType

B, S, HQ, HKV, D = 4, 2048, 32, 8, 128
N = 8


def bench(sub, bq, bk, bwd=False):
    fa.SPLIT_SUB = sub
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.bfloat16)

    if bwd:
        def loss(q):
            o = fa.flash_attention(q, k, v,
                                   attn_mask_type=AttnMaskType.CAUSAL,
                                   block_q=bq, block_k=bk)
            return jnp.sum(o.astype(jnp.float32) * 0.01)

        gf = jax.grad(loss)

        def step(carry, _):
            g = gf(carry)
            return (carry + g * jnp.bfloat16(0.01)).astype(jnp.bfloat16), ()
    else:
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
    flops = 4 * B * HQ * S * S * D * 0.5 * N * (3.5 if bwd else 1.0)
    tag = "bwd" if bwd else "fwd"
    print(f"== {tag} sub={sub} bq={bq} bk={bk}: busy {busy/1e3:.2f} ms "
          f"({busy/1e3/N:.3f}/call) -> {flops/(busy*1e-6)/1e12:.1f} TF/s")
    return busy


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for bwd in (False, True):
        for sub, bq, bk in [(0, 512, 1024), (256, 512, 1024),
                            (512, 512, 1024), (256, 512, 2048),
                            (512, 512, 2048), (1024, 512, 2048)]:
            bench(sub, bq, bk, bwd=bwd)
