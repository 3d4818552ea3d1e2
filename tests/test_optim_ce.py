"""Fused optimizers + parallel cross entropy
(reference analog: tests/pytorch/test_fused_optimizer.py,
test_parallel_cross_entropy.py)."""
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

from transformerengine_tpu.ops.cross_entropy import (
    cross_entropy, parallel_cross_entropy)
from transformerengine_tpu.optimizers import (
    fused_adam, fused_sgd, muon, newton_schulz)


class TestFusedAdam:
    def _params(self):
        return {"w": jax.random.normal(jax.random.PRNGKey(0), (8, 8)),
                "b": jnp.zeros((8,))}

    def test_matches_optax_adamw(self):
        params = self._params()
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
        ours = fused_adam(1e-2, weight_decay=0.01)
        ref = optax.adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
        s1, s2 = ours.init(params), ref.init(params)
        p1, p2 = params, params
        for _ in range(3):
            u1, s1 = ours.update(jax.tree.map(jnp.copy, grads), s1, p1)
            u2, s2 = ref.update(jax.tree.map(jnp.copy, grads), s2, p2)
            p1 = optax.apply_updates(p1, u1)
            p2 = optax.apply_updates(p2, u2)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            assert jnp.max(jnp.abs(a - b)) < 1e-5

    def test_master_weights_bf16_params(self):
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), self._params())
        opt = fused_adam(1e-3, use_master_weights=True)
        state = opt.init(params)
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)
        # Tiny updates accumulate in the f32 master even when each single
        # update underflows bf16 resolution.
        p = params
        for _ in range(10):
            u, state = opt.update(grads, state, p)
            p = optax.apply_updates(p, u)
        assert jnp.all(jnp.isfinite(state.master["w"]))
        assert not jnp.allclose(state.master["w"],
                                params["w"].astype(jnp.float32))

    def test_param_remainders_bit_exact_f32_trajectory(self):
        """bf16 params + int16 remainders reconstruct the EXACT f32
        Adam trajectory (reference store_param_remainders,
        pytorch/optimizers/fused_adam.py:36)."""
        from transformerengine_tpu.optimizers.fused_adam import (
            _combine_master)
        p32 = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16).astype(jnp.float32),
            self._params())
        p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), p32)
        lp = fused_adam(1e-2, weight_decay=0.01,
                        store_param_remainders=True)
        ref = fused_adam(1e-2, weight_decay=0.01)
        s_lp, s_ref = lp.init(p16), ref.init(p32)
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape),
            p32)
        for _ in range(10):
            p16, s_lp = lp.step(g, s_lp, p16)
            p32, s_ref = ref.step(g, s_ref, p32)
        for pw, rem, pr in zip(jax.tree.leaves(p16),
                               jax.tree.leaves(s_lp.master),
                               jax.tree.leaves(p32)):
            assert rem.dtype == jnp.int16
            recon = _combine_master(pw, rem)
            assert jnp.array_equal(recon, pr), (recon, pr)

    def test_fp8_param_leaves_track_master(self):
        """fp8 ScaledTensor1x param leaves are re-quantized from the f32
        master each step (reference: FP8 model params + FusedAdam
        master_weights)."""
        from transformerengine_tpu.quantize import qmath
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        from transformerengine_tpu.quantize.scaling_modes import ScalingMode
        from transformerengine_tpu.quantize.tensor import make_scaled_tensor

        w32 = jax.random.normal(jax.random.PRNGKey(0), (16, 16))
        data, sinv, amax = qmath.current_scale_quantize(w32, float8_e4m3)
        p = {"w": make_scaled_tensor(
            data, sinv, scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            dq_dtype=jnp.bfloat16, amax=amax.reshape(1))}
        opt = fused_adam(1e-2, use_master_weights=True)
        ref = fused_adam(1e-2)
        s, s_ref = opt.init(p), ref.init({"w": w32})
        pr = {"w": p["w"].dequantize().astype(jnp.float32)}
        g = {"w": jnp.full((16, 16), 0.05)}
        for _ in range(5):
            p, s = opt.step(g, s, p)
            pr, s_ref = ref.step(g, s_ref, pr)
        # payload stays fp8, dequantizes to within e4m3 tolerance of the
        # f32 trajectory, and the master IS the f32 trajectory.
        assert p["w"].data.dtype == jnp.dtype(float8_e4m3)
        assert jnp.array_equal(s.master["w"],
                               s_ref.master["w"]
                               if s_ref.master["w"] is not None else pr["w"])
        dq = p["w"].dequantize().astype(jnp.float32)
        tol = jnp.max(jnp.abs(pr["w"])) / 16  # e4m3: 3 mantissa bits
        assert jnp.max(jnp.abs(dq - pr["w"])) < tol

    def test_low_precision_states(self):
        """bf16 exp_avg + fp8 scaled exp_avg_sq stay close to the f32
        state trajectory (reference: scaled fp8/f16 optimizer states)."""
        from transformerengine_tpu.optimizers.fused_adam import ScaledState
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        p32 = self._params()
        lp = fused_adam(1e-2, exp_avg_dtype=jnp.bfloat16,
                        exp_avg_sq_dtype=float8_e4m3)
        ref = fused_adam(1e-2)
        s_lp, s_ref = lp.init(p32), ref.init(p32)
        p_lp, p_ref = p32, p32
        key = jax.random.PRNGKey(7)
        for i in range(8):
            g = jax.tree.map(
                lambda p, k=jax.random.fold_in(key, i):
                jax.random.normal(k, p.shape) * 0.1, p32)
            p_lp, s_lp = lp.step(g, s_lp, p_lp)
            p_ref, s_ref = ref.step(g, s_ref, p_ref)
        assert isinstance(s_lp.nu["w"], ScaledState)
        assert s_lp.mu["w"].dtype == jnp.bfloat16
        err = jnp.max(jnp.abs(p_lp["w"] - p_ref["w"]))
        assert err < 3e-3, err

    def test_fused_sgd_momentum(self):
        params = self._params()
        opt = fused_sgd(0.1, momentum=0.9)
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        u, _ = opt.update(grads, state, params)
        assert jnp.allclose(u["w"], -0.1)


class TestNewtonSchulz:
    def test_orthogonalizes(self):
        g = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        o = newton_schulz(g, steps=10).astype(jnp.float32)
        gram = o.T @ o
        # singular values pushed toward 1 (bf16 iteration -> loose tol)
        sv = jnp.linalg.svd(o, compute_uv=False)
        assert jnp.all(sv > 0.6) and jnp.all(sv < 1.4)

    def test_muon_runs(self):
        params = {"w": jax.random.normal(jax.random.PRNGKey(0), (32, 16))}
        opt = muon(0.02)
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        u, state = opt.update(grads, state, params)
        assert u["w"].shape == (32, 16)
        assert jnp.all(jnp.isfinite(u["w"]))


class TestCrossEntropy:
    def test_matches_optax(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (6, 32))
        targets = jax.random.randint(jax.random.PRNGKey(1), (6,), 0, 32)
        ours = cross_entropy(logits, targets)
        ref = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets).mean()
        assert jnp.abs(ours - ref) < 1e-5

    def test_ignore_index(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        targets = jnp.array([1, -100, 3, -100])
        ours = cross_entropy(logits, targets)
        ref = optax.softmax_cross_entropy_with_integer_labels(
            logits[jnp.array([0, 2])], targets[jnp.array([0, 2])]).mean()
        assert jnp.abs(ours - ref) < 1e-5

    def test_vocab_parallel_matches_full(self):
        tp = 4
        mesh = Mesh(mesh_utils.create_device_mesh((tp,), jax.devices()[:tp]),
                    ("tp",))
        logits = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
        targets = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 64)

        def local_fn(logits, targets):
            return parallel_cross_entropy(logits, targets, tp_axis="tp")

        sharded = jax.shard_map(
            local_fn, mesh=mesh, in_specs=(P(None, "tp"), P()),
            out_specs=P(), check_vma=False)
        ours = sharded(logits, targets)
        ref = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets).mean()
        assert jnp.abs(ours - ref) < 1e-5

    def test_vocab_parallel_grads(self):
        tp = 2
        mesh = Mesh(mesh_utils.create_device_mesh((tp,), jax.devices()[:tp]),
                    ("tp",))
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        targets = jax.random.randint(jax.random.PRNGKey(1), (4,), 0, 16)

        sharded = jax.shard_map(
            lambda l, t: parallel_cross_entropy(l, t, tp_axis="tp"),
            mesh=mesh, in_specs=(P(None, "tp"), P()), out_specs=P(),
            check_vma=False)
        g = jax.grad(lambda l: sharded(l, targets))(logits)
        gr = jax.grad(lambda l: optax.softmax_cross_entropy_with_integer_labels(
            l, targets).mean())(logits)
        assert jnp.max(jnp.abs(g - gr)) < 1e-5


class TestMultiTensor:
    """reference: common/multi_tensor/{l2norm,scale,compute_scale}.cu"""

    def _tree(self):
        return {"a": jnp.asarray([3.0, 4.0], jnp.float32),
                "b": jnp.asarray([[12.0]], jnp.bfloat16)}

    def test_l2norm(self):
        from transformerengine_tpu.optimizers import multi_tensor_l2norm
        total, per = multi_tensor_l2norm(self._tree(), per_tensor=True)
        assert jnp.allclose(total, 13.0)
        assert jnp.allclose(per["a"], 5.0)
        assert jnp.allclose(per["b"], 12.0)

    def test_unscale_l2norm(self):
        from transformerengine_tpu.optimizers import (
            multi_tensor_unscale_l2norm)
        n = multi_tensor_unscale_l2norm(self._tree(), 0.5)
        assert jnp.allclose(n, 6.5)

    def test_scale_preserves_dtype(self):
        from transformerengine_tpu.optimizers import multi_tensor_scale
        out = multi_tensor_scale(self._tree(), 2.0)
        assert out["b"].dtype == jnp.bfloat16
        assert jnp.allclose(out["a"], jnp.asarray([6.0, 8.0]))

    def test_compute_scale_pow2(self):
        from transformerengine_tpu.optimizers import (
            multi_tensor_compute_scale_and_scale_inv)
        s, si = multi_tensor_compute_scale_and_scale_inv(
            {"w": jnp.float32(100.0)}, 448.0, pow_2_scales=True)
        assert float(s["w"]) == 4.0          # floor-pow2 of 4.48
        assert float(si["w"]) == 0.25
        # zero amax -> identity scale
        s0, _ = multi_tensor_compute_scale_and_scale_inv(
            {"w": jnp.float32(0.0)}, 448.0)
        assert float(s0["w"]) == 1.0

    def test_clip_by_global_norm(self):
        from transformerengine_tpu.optimizers import (clip_by_global_norm,
                                                      multi_tensor_l2norm)
        clipped, norm = clip_by_global_norm(self._tree(), 1.0)
        assert jnp.allclose(norm, 13.0)
        assert jnp.allclose(multi_tensor_l2norm(clipped), 1.0, atol=1e-2)
        not_clipped, _ = clip_by_global_norm(self._tree(), 100.0)
        assert jnp.allclose(not_clipped["a"], self._tree()["a"])


class TestLowPrecAdamSharded:
    def test_remainder_step_under_mesh(self):
        """The exact-apply remainder step composes with GSPMD: sharded
        bf16 params + int16 remainder masters produce the same bits as
        the single-device step (pure bitwise ops shard trivially)."""
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from transformerengine_tpu.optimizers import fused_adam

        p = {"w": jax.random.normal(jax.random.PRNGKey(0), (32, 64)
                                    ).astype(jnp.bfloat16)}
        g = {"w": jax.random.normal(jax.random.PRNGKey(1), (32, 64))}
        opt = fused_adam(1e-2, weight_decay=0.01,
                         store_param_remainders=True,
                         exp_avg_dtype=jnp.bfloat16)
        s = opt.init(p)
        p_ref, s_ref = p, s
        for _ in range(3):
            p_ref, s_ref = jax.jit(opt.step)(g, s_ref, p_ref)

        mesh = Mesh(mesh_utils.create_device_mesh(
            (4, 2), jax.devices()[:8]), ("dp", "tp"))
        sh = NamedSharding(mesh, P("dp", "tp"))
        ps = {"w": jax.device_put(p["w"], sh)}
        gs = {"w": jax.device_put(g["w"], sh)}
        ss = jax.tree.map(
            lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) == 2
            else x, s)
        for _ in range(3):
            ps, ss = jax.jit(opt.step)(gs, ss, ps)
        assert jnp.array_equal(ps["w"], p_ref["w"])
        assert jnp.array_equal(ss.master["w"], s_ref.master["w"])
        assert jnp.array_equal(ss.mu["w"], s_ref.mu["w"])
