"""Rematerialization (activation-checkpoint) policies.

TPU counterpart of the reference's recompute machinery (reference:
pytorch/distributed.py:657 checkpoint with FP8-aware amax copy/restore,
jax/checkpoint_policies.py). On TPU, recompute is ``jax.checkpoint``
with a policy; the FP8 subtleties the reference hand-manages (recompute
must reuse the forward's quantizer scales — quantization.py:775-836)
hold automatically here because quantizer state is functional input.
"""
from __future__ import annotations

import jax

# Re-exports of the standard policies the reference's tables map onto.
nothing_saveable = jax.checkpoint_policies.nothing_saveable
everything_saveable = jax.checkpoint_policies.everything_saveable
dots_saveable = jax.checkpoint_policies.dots_saveable
dots_with_no_batch_dims_saveable = (
    jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
checkpoint_dots = dots_saveable


def save_only_these_names(*names):
    """Save only activations tagged with jax.ad_checkpoint.checkpoint_name
    (the mechanism the layers use for 'save the quantized copy')."""
    return jax.checkpoint_policies.save_only_these_names(*names)


def offload_dot_with_no_batch_dims(offload_src="device",
                                   offload_dst="pinned_host"):
    """Save matmul activations to host memory — the TPU analog of the
    reference's CPU activation offload (reference:
    pytorch/cpu_offload.py:692 get_cpu_offload_context). XLA issues the
    device->host DMAs asynchronously alongside compute."""
    return jax.checkpoint_policies.offload_dot_with_no_batch_dims(
        offload_src, offload_dst)


def save_and_offload_only_these_names(*, names_which_can_be_saved=(),
                                      names_which_can_be_offloaded=(),
                                      offload_src="device",
                                      offload_dst="pinned_host"):
    return jax.checkpoint_policies.save_and_offload_only_these_names(
        names_which_can_be_saved=list(names_which_can_be_saved),
        names_which_can_be_offloaded=list(names_which_can_be_offloaded),
        offload_src=offload_src, offload_dst=offload_dst)
