"""MoE: router, permutation, grouped dense, full moe() block, EP path
(reference analog: tests/pytorch/test_permutation.py, test_router.py,
jax moe tests)."""
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

import transformerengine_tpu as te
from transformerengine_tpu.grouped_dense import grouped_dense
from transformerengine_tpu.moe import moe
from transformerengine_tpu.ops.router import (
    compute_routing, fused_moe_aux_loss, fused_topk_with_score_function)
from transformerengine_tpu.permutation import token_combine, token_dispatch
from transformerengine_tpu.quantize.helper import QuantizerFactory


class TestRouter:
    def test_topk_softmax_masked(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (10, 8))
        probs, rmap = fused_topk_with_score_function(logits, 2)
        assert rmap.sum(-1).tolist() == [2] * 10
        assert jnp.allclose(probs.sum(-1), 1.0, atol=1e-5)
        assert jnp.all((probs > 0) == rmap)

    def test_sigmoid_normalized(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (10, 8))
        probs, rmap = fused_topk_with_score_function(
            logits, 2, score_function="sigmoid")
        assert jnp.allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_group_limited(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (6, 8))
        probs, rmap = fused_topk_with_score_function(
            logits, 2, num_groups=4, group_topk=2)
        # selections confined to <=2 groups of 2 experts
        groups = rmap.reshape(6, 4, 2).any(-1)
        assert jnp.all(groups.sum(-1) <= 2)

    def test_aux_loss_uniform_is_one(self):
        # Perfectly uniform routing -> loss == coeff * E/(k*T^2) * k*T/E * T
        t, e, k = 64, 8, 2
        rmap = jnp.zeros((t, e), bool)
        for i in range(t):
            rmap = rmap.at[i, (2 * i) % e].set(True).at[i, (2 * i + 1) % e].set(True)
        probs = jnp.full((t, e), 1.0 / e)
        loss = fused_moe_aux_loss(probs, rmap, topk=k, coeff=1.0)
        assert abs(float(loss) - 1.0) < 1e-5


class TestPermutation:
    def test_dispatch_combine_identity(self):
        t, e, h, k = 16, 4, 8, 2
        x = jax.random.normal(jax.random.PRNGKey(0), (t, h))
        logits = jax.random.normal(jax.random.PRNGKey(1), (t, e))
        probs, rmap = fused_topk_with_score_function(logits, k)
        disp, aux = token_dispatch(x, rmap, num_out_tokens=t * k)
        # identity experts -> combine = x * sum(probs) = x
        out = token_combine(disp, probs, aux)
        assert jnp.max(jnp.abs(out - x)) < 1e-5

    def test_dispatch_group_sizes(self):
        t, e = 8, 4
        rmap = jnp.zeros((t, e), bool).at[:, 0].set(True)
        x = jnp.ones((t, 4))
        disp, aux = token_dispatch(x, rmap, num_out_tokens=t)
        assert aux["group_sizes"].tolist() == [8, 0, 0, 0]
        assert jnp.all(disp == 1)


class TestGroupedDense:
    def test_bf16_grads(self):
        e, k, m, n = 3, 16, 8, 24
        gs = jnp.array([8, 8, 8], jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, k))
        w = jax.random.normal(jax.random.PRNGKey(1), (e, k, m)) * 0.1

        def loss(x, w):
            return jnp.sum(grouped_dense(x, w, gs) ** 2)

        def ref_loss(x, w):
            parts = [x[8 * i:8 * (i + 1)] @ w[i] for i in range(e)]
            return jnp.sum(jnp.concatenate(parts) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(x, w)
        gr = jax.grad(ref_loss, argnums=(0, 1))(x, w)
        for a, b in zip(g, gr):
            assert jnp.max(jnp.abs(a - b)) < 1e-4

    def test_fp8(self):
        e, k, m, n = 2, 32, 16, 16
        gs = jnp.array([10, 6], jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, k))
        w = jax.random.normal(jax.random.PRNGKey(1), (e, k, m)) * 0.1
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        out = grouped_dense(x, w, gs, quantizer_set=qset)
        ref = grouped_dense(x, w, gs)
        denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-3)
        assert jnp.max(jnp.abs(out - ref)) / denom < 0.1

    def test_mxfp8(self):
        """Block-scaled grouped GEMM (MXFP8 recipe): fwd close to bf16
        reference and grads finite/close (reference:
        jax/quantize/quantizer.py:881 grouped MXFP8)."""
        e, k, m, n = 2, 64, 32, 16
        gs = jnp.array([10, 6], jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, k))
        w = jax.random.normal(jax.random.PRNGKey(1), (e, k, m)) * 0.1
        qset = QuantizerFactory.create_set(te.MXFP8BlockScaling())
        out = grouped_dense(x, w, gs, quantizer_set=qset)
        ref = grouped_dense(x, w, gs)
        denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-3)
        assert jnp.max(jnp.abs(out - ref)) / denom < 0.05

        def loss(x, w, qset):
            return jnp.sum(grouped_dense(x, w, gs, quantizer_set=qset) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(x, w, qset)
        gr = jax.grad(lambda x, w: jnp.sum(
            grouped_dense(x, w, gs) ** 2), argnums=(0, 1))(x, w)
        for a, b in zip(g, gr):
            denom = jnp.maximum(jnp.abs(b).max(), 1e-6)
            # both operands of the wgrad are quantized -> error compounds
            assert float(jnp.abs(a - b).max() / denom) < 0.15


class TestMoE:
    def _weights(self, h=32, f=64, e=4):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        rw = jax.random.normal(ks[0], (h, e)) * 0.1
        wu = jax.random.normal(ks[1], (e, h, 2 * f)) * 0.1
        wd = jax.random.normal(ks[2], (e, f, h)) * 0.1
        return rw, wu, wd

    def test_moe_fwd_bwd(self):
        rw, wu, wd = self._weights()
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32))

        def loss(x, rw, wu, wd):
            out, aux = moe(x, rw, wu, wd, topk=2)
            return jnp.sum(out ** 2) + aux

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            x, rw, wu, wd)
        assert jnp.isfinite(val)
        for g in grads:
            assert jnp.all(jnp.isfinite(g))

    def test_moe_matches_dense_reference(self):
        """topk=E (all experts) with softmax == dense mixture."""
        h, f, e = 16, 32, 2
        rw, wu, wd = self._weights(h, f, e)
        x = jax.random.normal(jax.random.PRNGKey(3), (6, h))
        out, _ = moe(x, rw, wu, wd, topk=e, activation_type="swiglu")
        # reference: softmax-weighted sum over all experts
        w8 = jax.nn.softmax(x @ rw, -1)
        ref = jnp.zeros_like(x)
        for i in range(e):
            z = x @ wu[i]
            a = jax.nn.silu(z[:, :f]) * z[:, f:]
            ref += w8[:, i:i + 1] * (a @ wd[i])
        assert jnp.max(jnp.abs(out - ref)) < 1e-3

    def test_moe_ep_shard_map(self):
        """EP path under shard_map matches single-device moe (capacity
        large enough that nothing drops)."""
        h, f, e = 16, 32, 4
        rw, wu, wd = self._weights(h, f, e)
        x = jax.random.normal(jax.random.PRNGKey(3), (16, h))
        ref, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu")

        ep = 4
        mesh = Mesh(mesh_utils.create_device_mesh((ep,), jax.devices()[:ep]),
                    ("ep",))

        def local_fn(x, rw, wu, wd):
            out, aux = moe(x, rw, wu, wd, topk=2, activation_type="swiglu",
                           ep_axis="ep", capacity_factor=8.0, dropless=False)
            return out

        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("ep"), P(), P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)
        out = fn(x, rw, wu, wd)
        assert jnp.max(jnp.abs(out - ref)) < 1e-3

    def test_moe_ep_dropless_exact(self):
        """Dropless EP matches the single-device path exactly — even
        under extreme routing imbalance where the capacity path at
        capacity_factor=1.0 would drop most tokens."""
        h, f, e = 16, 32, 4
        rw, wu, wd = self._weights(h, f, e)
        # Bias the router hard toward expert 0 -> worst-case imbalance.
        rw = rw.at[:, 0].add(3.0)
        x = jax.random.normal(jax.random.PRNGKey(3), (64, h))
        ref, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu")

        ep = 4
        mesh = Mesh(mesh_utils.create_device_mesh((ep,), jax.devices()[:ep]),
                    ("ep",))

        def local_fn(x, rw, wu, wd):
            out, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu",
                         ep_axis="ep", dropless=True)
            return out

        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("ep"), P(), P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)
        out = fn(x, rw, wu, wd)
        assert jnp.max(jnp.abs(out - ref)) < 1e-3
        # zero dropped tokens: a tight-capacity run on the same routing
        # disagrees with the reference, the dropless path doesn't
        def cap_fn(x, rw, wu, wd):
            out, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu",
                         ep_axis="ep", capacity_factor=0.01, dropless=False)
            return out
        out_cap = jax.shard_map(
            cap_fn, mesh=mesh,
            in_specs=(P("ep"), P(), P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)(x, rw, wu, wd)
        assert jnp.max(jnp.abs(out_cap - ref)) > 1e-3

    def test_moe_ep_dropless_grads(self):
        """Dropless EP gradients match the single-device reference."""
        h, f, e = 16, 32, 4
        rw, wu, wd = self._weights(h, f, e)
        rw = rw.at[:, 1].add(2.0)
        x = jax.random.normal(jax.random.PRNGKey(5), (16, h))

        ep = 4
        mesh = Mesh(mesh_utils.create_device_mesh((ep,), jax.devices()[:ep]),
                    ("ep",))

        def ref_loss(x, rw, wu, wd):
            out, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu")
            return jnp.sum(out ** 2)

        def ep_loss(x, rw, wu, wd):
            def local_fn(x, rw, wu, wd):
                out, _ = moe(x, rw, wu, wd, topk=2,
                             activation_type="swiglu",
                             ep_axis="ep", dropless=True)
                return out
            out = jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(P("ep"), P(), P("ep"), P("ep")),
                out_specs=P("ep"), check_vma=False)(x, rw, wu, wd)
            return jnp.sum(out ** 2)

        g_ref = jax.grad(ref_loss, argnums=(0, 2, 3))(x, rw, wu, wd)
        g_ep = jax.grad(ep_loss, argnums=(0, 2, 3))(x, rw, wu, wd)
        for a, b in zip(g_ep, g_ref):
            denom = jnp.maximum(jnp.abs(b).max(), 1e-6)
            assert float(jnp.abs(a - b).max() / denom) < 1e-3


class TestGroupedQuantizer:
    def test_per_expert_scales_fwd_bwd(self):
        from transformerengine_tpu.grouped_dense import grouped_dense_gq
        from transformerengine_tpu.quantize.grouped import GroupedQuantizer
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        e, k, m = 3, 32, 16
        gs = jnp.array([8, 0, 8], jnp.int32)
        n = 16
        # experts with wildly different magnitudes: per-expert scales keep
        # the small expert's rows accurate where a global scale would not
        x = jnp.concatenate([
            jax.random.normal(jax.random.PRNGKey(0), (8, k)) * 100.0,
            jax.random.normal(jax.random.PRNGKey(1), (8, k)) * 0.01])
        w = jax.random.normal(jax.random.PRNGKey(2), (e, k, m)) * 0.1
        gq = GroupedQuantizer(q_dtype=jnp.dtype(float8_e4m3), num_groups=e)

        out = grouped_dense_gq(x, w, gs, gq)
        ref = jnp.concatenate([x[:8] @ w[0], x[8:] @ w[2]])
        rel = jnp.abs(out - ref) / jnp.maximum(jnp.abs(ref).max(0), 1e-6)
        assert float(rel.max()) < 0.15  # two e4m3 quantizations compound

        g = jax.grad(lambda x, w: jnp.sum(
            grouped_dense_gq(x, w, gs, gq) ** 2), argnums=(0, 1))(x, w)
        gr = jax.grad(lambda x, w: jnp.sum(jnp.concatenate(
            [x[:8] @ w[0], x[8:] @ w[2]]) ** 2), argnums=(0, 1))(x, w)
        for a, b in zip(g, gr):
            denom = jnp.maximum(jnp.abs(b).max(), 1e-6)
            assert float(jnp.abs(a - b).max() / denom) < 0.1

    def test_quantize_rows_per_group_amax(self):
        from transformerengine_tpu.quantize.grouped import GroupedQuantizer
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        gq = GroupedQuantizer(q_dtype=jnp.dtype(float8_e4m3), num_groups=2)
        x = jnp.concatenate([jnp.full((4, 8), 100.0), jnp.full((4, 8), 0.5)])
        t = gq.quantize_rows(x, jnp.array([4, 4], jnp.int32))
        assert jnp.allclose(t.amax, jnp.array([100.0, 0.5]))
        assert jnp.max(jnp.abs(t.dequantize() - x)) / 100.0 < 0.01
