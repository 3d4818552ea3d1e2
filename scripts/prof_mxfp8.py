"""XProf the MXFP8 TransformerLayer fwd and the MoE grouped-MLP step to
find where the time over bf16 goes (run on TPU; one process at a time).

    python scripts/prof_mxfp8.py layer|moe|moe_bf16|layer_bf16
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")
from benchmarks.xprof import profile  # noqa: E402

import transformerengine_tpu as te  # noqa: E402


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def layer_step(recipe):
    from transformerengine_tpu.flax import TransformerLayer
    B, S, H, FFN, heads, kv = 4, 2048, 4096, 14336, 32, 8
    layer = TransformerLayer(
        hidden_size=H, mlp_hidden_size=FFN, num_attention_heads=heads,
        num_gqa_groups=kv, norm_type="rmsnorm", mlp_activations="swiglu",
        use_bias=False, enable_rotary_pos_emb=True, max_seq_len=S)
    x = _normal(21, (B, S, H))
    with te.autocast(enabled=recipe is not None, recipe=recipe):
        variables = jax.jit(layer.init)(jax.random.PRNGKey(1), x)

    @jax.jit
    def step(v, x):
        with te.autocast(enabled=recipe is not None, recipe=recipe):
            return layer.apply(v, x)

    step(variables, x).block_until_ready()          # compile
    return lambda: step(variables, x).block_until_ready()


def moe_step(recipe):
    from transformerengine_tpu.moe import moe
    B, S, H, F, E, topk = 2, 2048, 4096, 7168, 8, 2
    router = _normal(31, (H, E), jnp.float32, scale=0.02)
    w_up = _normal(32, (E, H, 2 * F), scale=0.02)
    w_down = _normal(33, (E, F, H), scale=0.02)
    x = _normal(34, (B * S, H))
    mk = te.QuantizerFactory.create_set
    qsets = (mk(recipe), mk(recipe))

    @jax.jit
    def step(x, w_up, w_down):
        def loss(x, wu, wd):
            y, aux = moe(x, router, wu, wd, topk=topk,
                         activation_type="swiglu", quantizer_sets=qsets)
            return jnp.sum(y.astype(jnp.float32)) + aux
        return jax.grad(loss, argnums=(0, 1, 2))(x, w_up, w_down)

    jax.block_until_ready(step(x, w_up, w_down))    # compile
    return lambda: jax.block_until_ready(step(x, w_up, w_down))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "layer"
    recipe = None if which.endswith("_bf16") else te.MXFP8BlockScaling()
    fn = (layer_step if which.startswith("layer") else moe_step)(recipe)
    fn()  # warm
    per_op, busy = profile(fn)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    print(f"== {which}: device busy {busy / 1e3:.2f} ms ==")
    for name, us in top:
        print(f"{us / 1e3:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
