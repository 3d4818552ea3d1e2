"""Parallelism strategies: sharding rules, CP attention, SP layers,
quantized collectives, pipeline schedule (SURVEY.md §2.5)."""
from .sharding import (
    MeshResource, extend_logical_axis_rules, generate_sharding_rules,
    global_mesh_resource, global_shard_guard,
    with_sharding_constraint_by_logical_axes)
from .ring_attention import (
    all_gather_attn, hierarchical_attn, ring_attn,
    ring_attn_under_shard_map, ulysses_attn)
from .cp_utils import (
    inverse_reorder_causal_dual_chunk_swap, inverse_reorder_causal_striped,
    reorder_causal_dual_chunk_swap, reorder_causal_striped)
from .pipeline import pipeline_apply, pipeline_transformer
