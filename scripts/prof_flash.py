"""Profile flash fwd variants with XProf device-lane timing."""
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from exp_flash_variants import B, D, HKV, HQ, S, flash
from benchmarks.xprof import profile, report

N = 8


def run_variant(variant, bq, bk):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)

    def step(carry, _):
        o = flash(carry, k, v, variant, bq, bk)
        return (o * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()

    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    float(run(q))  # compile outside the trace
    per_op, busy = profile(lambda: float(run(q + jnp.bfloat16(0.25))))
    flops = 4 * B * HQ * S * S * D * 0.5 * N
    print(f"== {variant} bq={bq} bk={bk}: busy {busy/1e3:.2f} ms "
          f"-> {flops/(busy*1e-6)/1e12:.1f} TF/s (causal)")
    report(per_op, busy, top=6)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    args = sys.argv[1:] or ["cond", "nomask"]
    for variant in args:
        run_variant(variant, 1024, 1024)
        run_variant(variant, 1024, 512)
