"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding logic is exercised everywhere (the reference's multi-GPU tests
map to virtual-device meshes on TPU-less hosts; see SURVEY.md §4).

Note: the ambient environment pre-imports jax (axon sitecustomize) and
presets JAX_PLATFORMS=axon, so env vars are too late — use config.update.
"""
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


# Tests measured >=15 s on the 8-virtual-device CPU suite (r5
# --durations run; interpret-mode Pallas + shard_map dominate). The
# default run deselects them (pytest.ini addopts); `pytest -m ""` runs
# everything. test_context_parallel is slow wholesale except the two
# fast smokes kept for default coverage.
_SLOW_NAMES = {
    "test_moe_ep_kernel_caches", "test_moe_ep_dropless_grads",
    "test_moe_ep_dropless_exact", "test_moe_ep_shard_map",
    "test_ep_sharded_model_matches_single_device",
    "test_cached_matches_uncached_greedy", "test_generation_with_cache",
    "test_loss_and_grads_finite", "test_dryrun_multichip",
    "test_remat_model_matches_no_remat", "test_remat_grads_match_no_remat",
    "test_delayed_scaling_owg_state_update",
    "test_quantize_meta_roundtrip_bitwise", "test_layernorm_mlp_cached",
    "test_nvfp4_all_gather_global_scale_fixup", "test_scan_matches_loop",
    "test_fwd_bwd_bf16", "test_row_parallel_updates_quantizer_state",
    "test_column_parallel_grads",
    # second tier (r5 solo-timed >=12 s; each has a faster sibling or
    # is exercised by the slow suite / dryrun)
    "test_fp8_loss_trajectory_matches_bf16",
    "test_banded_layers_ignore_distant_context",
    "test_dots_policy_grads_match",
    "test_quantized_capacity_mode_generation",
    "test_continuous_batching_under_tp_mesh",
    "test_column_parallel_updates_quantizer_state",
    "test_fp8_resident_tp_generation_matches",
    "test_paged_matches_nonpaged_greedy",
    "test_moe_kernel_caches", "test_grads_finite",
    "test_host_offload_policy", "test_mha_module_fp8_mha_recipe",
    "test_pipeline_grads_match_sequential",
}
_CP_FAST_SMOKES = {
    "test_cp_matches_single_device[all_gather]",
    "test_striped_load_balance_flop_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if "test_context_parallel" in item.nodeid:
            if item.name not in _CP_FAST_SMOKES:
                item.add_marker(pytest.mark.slow)
        elif base in _SLOW_NAMES:
            item.add_marker(pytest.mark.slow)
        elif (base == "test_fwd_bwd_close_to_bf16"
              and "NVFP4" in item.name):
            item.add_marker(pytest.mark.slow)
