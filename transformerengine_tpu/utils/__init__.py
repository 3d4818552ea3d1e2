"""Utilities: pytrees, profiling, checkpointing, export, padding."""
from .checkpoint import (
    restore_checkpoint, save_checkpoint, state_with_quantize_meta)
from .export import dequantize_pytree, export_stablehlo, import_stablehlo
from .padding import multi_pad_group_sizes, pad_rows_to_multiple, unpad_rows
from .profiler import nvtx_decorator, nvtx_range, start_trace, stop_trace, trace
from .pytree import Static
