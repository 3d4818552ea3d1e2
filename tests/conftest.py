"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding logic is exercised everywhere (the reference's multi-GPU tests
map to virtual-device meshes on TPU-less hosts; see SURVEY.md §4).

Note: the ambient environment pre-imports jax (axon sitecustomize) and
presets JAX_PLATFORMS=axon, so env vars are too late — use config.update.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
