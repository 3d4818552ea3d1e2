"""MoE training example: Mixtral-style model under expert parallelism.

TPU counterpart of the reference's MoE training assembly (reference:
jax/moe.py fused EP block; pytorch router + permutation + GroupedLinear
driven by Megatron). Experts are sharded over the ``ep`` mesh axis;
tokens reach them through exact-size ragged all-to-alls (dropless).
Runs anywhere — use XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a laptop dry run.

    python examples/train_mixtral_moe.py --steps 10 --recipe mxfp8
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
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

import transformerengine_tpu as te
from transformerengine_tpu.models.mixtral import (
    MIXTRAL_TINY, MixtralModel, mixtral_loss)
from transformerengine_tpu.optimizers import fused_adam

# Stateless recipes only: this example keeps the train state to
# (params, opt_state); see train_llama_fp8.py for threading the
# quantize_meta collection that DelayedScaling needs.
RECIPES = {
    "current": te.Float8CurrentScaling,
    "mxfp8": te.MXFP8BlockScaling,
    "bf16": lambda: None,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--recipe", choices=RECIPES, default="bf16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    args = ap.parse_args()

    recipe = RECIPES[args.recipe]()
    ep = min(4, len(jax.devices()))
    mesh = Mesh(mesh_utils.create_device_mesh((ep,), jax.devices()[:ep]),
                ("ep",))
    cfg = dataclasses.replace(MIXTRAL_TINY, num_experts=ep * 2,
                              ep_axis="ep", dtype=jnp.float32)
    model = MixtralModel(config=cfg)
    # Same model without the EP axis for (replicated) initialization.
    init_model = MixtralModel(
        config=dataclasses.replace(cfg, ep_axis=""))
    tokens = jax.random.randint(
        jax.random.PRNGKey(0), (args.batch * ep, args.seq), 0,
        cfg.vocab_size)
    opt = fused_adam(3e-4)

    with te.autocast(enabled=recipe is not None, recipe=recipe):
        variables = init_model.init(jax.random.PRNGKey(1), tokens[:, :8])
        params = variables["params"]
        opt_state = opt.init(params)

        def pspec(path, _leaf):
            name = "/".join(str(p) for p in path)
            return (P("ep") if "wi_kernel" in name or "wo_kernel" in name
                    else P())

        param_specs = jax.tree_util.tree_map_with_path(pspec, params)
        # Adam moments mirror the param tree: shard them identically.
        from transformerengine_tpu.optimizers.fused_adam import AdamState
        # master leaves are None placeholders (no master weights) —
        # mirror the param-tree structure so the spec prefix matches.
        opt_specs = AdamState(step=P(), mu=param_specs, nu=param_specs,
                              master=jax.tree.map(lambda _: P(),
                                                  param_specs))

        def local_step(params, opt_state, tokens):
            def loss_fn(p):
                with te.autocast(enabled=recipe is not None, recipe=recipe):
                    return mixtral_loss(model, {"params": p},
                                        tokens[:, :-1], tokens[:, 1:])
            loss, gp = jax.value_and_grad(loss_fn)(params)
            # dp-style grad sync for the replicated (non-expert) params;
            # expert grads are already local to their shard.
            gp = jax.tree_util.tree_map_with_path(
                lambda path, g: g if "wi_kernel" in str(path)
                or "wo_kernel" in str(path)
                else jax.lax.pmean(g, "ep"), gp)
            updates, opt_state = opt.update(gp, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    jax.lax.pmean(loss, "ep"))

        step = jax.jit(jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(param_specs, opt_specs, P("ep")),
            out_specs=(param_specs, opt_specs, P()), check_vma=False))

        for i in range(args.steps):
            params, opt_state, loss = step(params, opt_state, tokens)
            print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
