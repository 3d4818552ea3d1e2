"""FP8 training example: Llama-style model on a (dp, tp) mesh.

TPU counterpart of the reference's multi-GPU encoder example
(reference: examples/jax/encoder/test_multigpu_encoder.py). Runs on any
device set — use XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a laptop dry run.

    python examples/train_llama_fp8.py --steps 20 --recipe delayed
"""
from __future__ import annotations

import argparse
import dataclasses

import os

import jax

# CPU by default; opt into an attached accelerator explicitly (the
# ambient environment may preset an unavailable remote platform).
if os.environ.get("TE_EXAMPLE_ACCEL") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import transformerengine_tpu as te
from transformerengine_tpu.flax.module import QUANTIZE_META
from transformerengine_tpu.models.llama import (
    LLAMA_TINY, LlamaModel, cross_entropy_loss)
from transformerengine_tpu.optimizers import fused_adam
from transformerengine_tpu.parallel.sharding import (
    MeshResource, generate_sharding_rules, global_shard_guard)

RECIPES = {
    "delayed": lambda: te.DelayedScaling(amax_history_len=16),
    "current": te.Float8CurrentScaling,
    "mxfp8": te.MXFP8BlockScaling,
    "fp8block": te.Float8BlockScaling,
    "nvfp4": te.NVFP4BlockScaling,
    "bf16": lambda: None,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--recipe", choices=RECIPES, default="delayed")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--low-precision-optimizer", action="store_true",
                    help="bf16 params + int16 remainder masters + bf16 "
                         "exp_avg (reference FusedAdam "
                         "store_param_remainders — half the master "
                         "bytes, bit-exact f32 trajectory)")
    args = ap.parse_args()

    recipe = RECIPES[args.recipe]()
    n = len(jax.devices())
    tp = 2 if n % 2 == 0 else 1
    dp = n // tp
    mesh = Mesh(mesh_utils.create_device_mesh((dp, tp)), ("dp", "tp"))
    resource = MeshResource(dp_resource="dp", tp_resource="tp")
    rules = generate_sharding_rules(resource)

    model = LlamaModel(config=LLAMA_TINY)
    tokens = jax.random.randint(
        jax.random.PRNGKey(0), (args.batch, args.seq), 0, 256)
    opt = (fused_adam(3e-4, store_param_remainders=True,
                      exp_avg_dtype=jnp.bfloat16)
           if args.low_precision_optimizer else fused_adam(3e-4))

    with mesh, nn.logical_axis_rules(rules), \
            te.autocast(enabled=recipe is not None, recipe=recipe), \
            global_shard_guard(resource):
        abstract = jax.eval_shape(model.init, jax.random.PRNGKey(1), tokens)
        specs = nn.get_partition_spec(abstract)
        shardings = nn.logical_to_mesh_sharding(specs, mesh, rules)
        variables = jax.jit(model.init, out_shardings=shardings)(
            jax.random.PRNGKey(1), tokens)
        tokens = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
        params = variables["params"]
        if args.low_precision_optimizer:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        qmeta = variables.get(QUANTIZE_META, {})
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, qmeta, opt_state, tokens):
            def loss_fn(params, qmeta):
                v = {"params": params}
                if qmeta:
                    v[QUANTIZE_META] = qmeta
                logits = model.apply(v, tokens)
                return cross_entropy_loss(logits[:, :-1], tokens[:, 1:])

            if qmeta:
                loss, (gp, gq) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, qmeta)
            else:
                loss, gp = jax.value_and_grad(loss_fn)(params, qmeta)
                gq = qmeta
            if args.low_precision_optimizer:
                new_params, opt_state = opt.step(gp, opt_state, params)
                return new_params, gq, opt_state, loss
            updates, opt_state = opt.update(gp, opt_state, params)
            return optax.apply_updates(params, updates), gq, opt_state, loss

        for step in range(args.steps):
            params, qmeta, opt_state, loss = train_step(
                params, qmeta, opt_state, tokens)
            print(f"step {step}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
