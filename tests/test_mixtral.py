"""Flax MoE sublayer + Mixtral flagship model (reference analog: the
MXFP8 grouped-MLP Mixtral benchmark path; jax/moe.py fused EP block
driven through a full model)."""
import dataclasses

import jax
import jax.numpy as jnp
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

from flax.core import meta

import transformerengine_tpu as te
from transformerengine_tpu.flax.moe import MoELayerNormMLP
from transformerengine_tpu.models.mixtral import (
    MIXTRAL_TINY, MixtralModel, collect_aux_loss, mixtral_loss)


def _tokens(b=2, s=32, vocab=256):
    return jax.random.randint(jax.random.PRNGKey(0), (b, s), 1, vocab)


class TestMoELayer:
    def test_forward_and_aux_loss(self):
        layer = MoELayerNormMLP(num_experts=4, topk=2, intermediate_dim=64,
                                dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
        variables = layer.init(jax.random.PRNGKey(1), x)
        out, mut = layer.apply(variables, x, mutable=["intermediates"])
        assert out.shape == x.shape
        aux = collect_aux_loss(mut["intermediates"])
        assert jnp.isfinite(aux) and float(aux) > 0

    def test_topk_all_experts_matches_dense_mixture(self):
        """topk == num_experts: output must equal the prob-weighted sum
        of every expert MLP applied to the normed input."""
        e, h, f = 3, 16, 24
        layer = MoELayerNormMLP(num_experts=e, topk=e, intermediate_dim=f,
                                activations=("silu", "linear"),
                                dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, h))
        variables = layer.init(jax.random.PRNGKey(1), x)
        out = layer.apply(variables, x)

        p = meta.unbox(variables["params"])
        from transformerengine_tpu.ops.normalization import rmsnorm_fwd
        y, _ = rmsnorm_fwd(x, p["ln"]["scale"], epsilon=1e-6)
        logits = y.reshape(-1, h).astype(jnp.float32) @ p["router_kernel"]
        probs = jax.nn.softmax(logits, axis=-1)
        wi, wo = p["wi_kernel"], p["wo_kernel"]
        ref = jnp.zeros((8, h))
        for i in range(e):
            z = y.reshape(-1, h) @ wi[i]
            a = jax.nn.silu(z[:, :f]) * z[:, f:]
            ref = ref + probs[:, i:i + 1] * (a @ wo[i])
        assert jnp.max(jnp.abs(out.reshape(-1, h) - ref)) < 1e-4

    def test_grads_flow_to_router_and_experts(self):
        layer = MoELayerNormMLP(num_experts=4, topk=2, intermediate_dim=64,
                                dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
        variables = layer.init(jax.random.PRNGKey(1), x)

        def loss(params):
            out, mut = layer.apply({"params": params}, x,
                                   mutable=["intermediates"])
            return jnp.mean(out ** 2) + collect_aux_loss(
                mut["intermediates"])

        g = meta.unbox(jax.grad(loss)(variables["params"]))
        for name in ("router_kernel", "wi_kernel", "wo_kernel"):
            assert float(jnp.abs(g[name]).max()) > 0, name

    def test_fp8_recipe_passes_through(self):
        layer = MoELayerNormMLP(num_experts=4, topk=2, intermediate_dim=64)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32),
                              jnp.bfloat16)
        with te.autocast(enabled=True, recipe=te.MXFP8BlockScaling()):
            variables = layer.init(jax.random.PRNGKey(1), x)
            out = layer.apply(variables, x)
        assert out.shape == x.shape and bool(jnp.isfinite(
            out.astype(jnp.float32)).all())


class TestMixtralModel:
    def test_forward_shapes(self):
        model = MixtralModel(config=MIXTRAL_TINY)
        tokens = _tokens()
        variables = model.init(jax.random.PRNGKey(1), tokens)
        logits = model.apply(variables, tokens)
        assert logits.shape == (2, 32, MIXTRAL_TINY.vocab_size)

    def test_loss_and_grads(self):
        model = MixtralModel(config=dataclasses.replace(
            MIXTRAL_TINY, dtype=jnp.float32))
        tokens = _tokens()
        variables = model.init(jax.random.PRNGKey(1), tokens)

        @jax.jit
        def grad_fn(params):
            def loss(p):
                return mixtral_loss(model, {"params": p}, tokens[:, :-1],
                                    tokens[:, 1:])
            return jax.value_and_grad(loss)(params)

        loss, grads = grad_fn(variables["params"])
        assert jnp.isfinite(loss)
        assert all(bool(jnp.isfinite(l).all())
                   for l in jax.tree.leaves(grads))

    def test_scan_layers_matches_loop(self):
        cfg = dataclasses.replace(MIXTRAL_TINY, dtype=jnp.float32)
        tokens = _tokens()
        loop = MixtralModel(config=cfg)
        vloop = loop.init(jax.random.PRNGKey(1), tokens)
        scan = MixtralModel(config=dataclasses.replace(cfg,
                                                       scan_layers=True))
        vscan = scan.init(jax.random.PRNGKey(1), tokens)
        # Same param count either way.
        n = lambda v: sum(x.size for x in jax.tree.leaves(v["params"]))
        assert n(vloop) == n(vscan)
        out = scan.apply(vscan, tokens)
        assert out.shape == (2, 32, cfg.vocab_size)

    def test_ep_sharded_model_matches_single_device(self):
        """Full Mixtral under shard_map dp x ep: logits match the
        unsharded model (dropless EP is semantics-preserving)."""
        cfg = dataclasses.replace(MIXTRAL_TINY, dtype=jnp.float32,
                                  num_layers=1)
        tokens = _tokens(b=4, s=16)
        base = MixtralModel(config=cfg)
        variables = base.init(jax.random.PRNGKey(1), tokens)
        ref = base.apply(variables, tokens)

        ep = 4
        mesh = Mesh(mesh_utils.create_device_mesh((ep,), jax.devices()[:ep]),
                    ("ep",))
        ep_model = MixtralModel(config=dataclasses.replace(cfg,
                                                           ep_axis="ep"))

        def shard_experts(path, leaf):
            name = "/".join(str(p) for p in path)
            if "wi_kernel" in name or "wo_kernel" in name:
                return P("ep")        # experts split across devices
            return P()

        pspecs = jax.tree_util.tree_map_with_path(shard_experts, variables)

        def local_fn(v, tok):
            return ep_model.apply(v, tok)

        out = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(pspecs, P("ep")),    # batch-shard tokens over ep
            out_specs=P("ep"), check_vma=False)(variables, tokens)
        assert float(jnp.max(jnp.abs(out - ref))) < 2e-4


class TestMixtralGeneration:
    def test_cached_matches_uncached_greedy(self):
        """MoE serving path: KV-cached generation through the routed
        expert layers equals full-recompute greedy decoding (reference:
        Mixtral + te_gemma-style cached generation)."""
        import dataclasses
        from transformerengine_tpu.inference import generate
        cfg = dataclasses.replace(MIXTRAL_TINY, num_layers=2)
        model = MixtralModel(config=cfg)
        b, sp, n_new = 2, 12, 4
        tokens = jax.random.randint(jax.random.PRNGKey(0), (b, sp), 1, 200)
        lengths = jnp.array([sp, sp - 3], jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        got = generate(model, variables, tokens, lengths, n_new)
        for i in range(b):
            seq = tokens[i, : int(lengths[i])]
            for _ in range(n_new):
                logits = model.apply(variables, seq[None])
                seq = jnp.concatenate(
                    [seq, jnp.argmax(logits[0, -1]).astype(jnp.int32)[None]])
            ref = seq[int(lengths[i]):]
            assert jnp.array_equal(got[i], ref), (i, got[i], ref)
