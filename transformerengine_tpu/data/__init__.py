"""Native input pipeline: token-bin datasets, sequence packing,
prefetching loader (C++ runtime via ctypes; see csrc/packer.cpp)."""
from .loader import (PackedDataLoader, native_available, pack_sequences,
                     read_token_bin, write_token_bin)
