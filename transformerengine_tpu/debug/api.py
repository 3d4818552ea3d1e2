"""Numerics-debug feature framework.

TPU counterpart of the reference debug stack (reference:
debug/features/api.py TEConfigAPIMapper :21 / TransformerEngineAPI
:399; debug/pytorch/debug_quantization.py DebugQuantizer). A YAML
config selects features per layer (same schema spirit as
docs/debug/2_config_file_structure.rst):

```yaml
my_section:
  enabled: True
  layers:
    layer_name_regex_pattern: .*mlp.*
  transformer_engine:
    DisableFP8GEMM: {enabled: True, gemms: [wgrad]}
    FakeQuant:      {enabled: True, tensors: [x], quant_format: FP8E4M3}
    LogTensorStats: {enabled: True, tensors: [x, dgrad], freq: 1}
```

Quantizer-level hooks: the Flax modules ask ``wrap_quantizer_set`` to
decorate their quantizers; features then disable quantization, fake-
quantize, or log stats for the matched (layer, tensor role).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..quantize.quantizer import Quantizer, QuantizerSet
from .stats import StatsBuffer, compute_tensor_stats

# role names used in configs (reference gemms/tensors vocabulary)
_ROLES = ("x", "kernel", "dgrad")

_FEATURES = ("DisableFP8GEMM", "DisableFP8Layer", "DisableQuantizationGEMM",
             "DisableQuantizationLayer", "FakeQuant", "LogTensorStats",
             "LogFp8TensorStats", "LogNVFP4TensorStats", "DumpTensors",
             "PerTensorScaling")


@dataclasses.dataclass
class _Section:
    name: str
    layer_pattern: re.Pattern
    features: Dict[str, dict]


class DebugState:
    def __init__(self):
        self.enabled = False
        self.sections: List[_Section] = []
        self.stats = StatsBuffer()
        self.step = 0
        self.dumps: Dict[str, Any] = {}

    # -- config ------------------------------------------------------------
    def load_config(self, path_or_dict):
        import yaml
        cfg = (path_or_dict if isinstance(path_or_dict, dict)
               else yaml.safe_load(open(path_or_dict)))
        self.sections = []
        for name, sec in cfg.items():
            if not isinstance(sec, dict) or not sec.get("enabled", True):
                continue
            layers = sec.get("layers", {})
            pattern = layers.get("layer_name_regex_pattern", ".*")
            feats = {}
            for fname, fcfg in sec.get("transformer_engine", {}).items():
                if fname not in _FEATURES:
                    raise ValueError(
                        f"unknown debug feature {fname!r}; one of {_FEATURES}")
                if fcfg.get("enabled", True):
                    feats[fname] = fcfg
            self.sections.append(
                _Section(name, re.compile(pattern), feats))
        self.enabled = True

    def reset(self):
        self.__init__()

    # -- queries -----------------------------------------------------------
    def _features_for(self, layer: str):
        for sec in self.sections:
            if sec.layer_pattern.fullmatch(layer) or \
                    sec.layer_pattern.match(layer):
                yield from sec.features.items()

    def quantization_disabled(self, layer: str, role: str) -> bool:
        for fname, fcfg in self._features_for(layer):
            if fname in ("DisableFP8Layer", "DisableQuantizationLayer"):
                return True
            if fname in ("DisableFP8GEMM", "DisableQuantizationGEMM"):
                gemms = fcfg.get("gemms", list(_ROLES))
                # reference gemm names: fprop/dgrad/wgrad map onto roles
                role_map = {"fprop": ("x", "kernel"), "dgrad": ("dgrad",),
                            "wgrad": ("x", "kernel", "dgrad")}
                roles = set()
                for g in gemms:
                    roles.update(role_map.get(g, (g,)))
                if role in roles:
                    return True
        return False

    def fake_quant_cfg(self, layer: str, role: str) -> Optional[dict]:
        for fname, fcfg in self._features_for(layer):
            if fname == "FakeQuant" and role in fcfg.get("tensors", _ROLES):
                return fcfg
        return None

    def stats_cfg(self, layer: str, role: str) -> Optional[dict]:
        for fname, fcfg in self._features_for(layer):
            if fname in ("LogTensorStats", "LogFp8TensorStats",
                         "LogNVFP4TensorStats") and \
                    role in fcfg.get("tensors", _ROLES):
                return {"_feature": fname, **fcfg}
        return None

    def dump_cfg(self, layer: str, role: str) -> bool:
        return any(f == "DumpTensors" and role in c.get("tensors", _ROLES)
                   for f, c in self._features_for(layer))


_STATE = DebugState()


def initialize(config=None) -> DebugState:
    """Enable the debug toolkit (reference: nvdlfw_inspect initialize)."""
    if config is not None:
        _STATE.load_config(config)
    else:
        _STATE.enabled = True
    return _STATE


def get_state() -> DebugState:
    return _STATE


def step():
    """Advance the debug iteration counter (reference: debug_api.step)."""
    _STATE.step += 1


# ---------------------------------------------------------------------------
# DebugQuantizer
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DebugQuantizer(Quantizer):
    """Wraps a real quantizer with per-(layer, role) debug behavior
    (reference: debug/pytorch/debug_quantization.py DebugQuantizer)."""

    inner: Optional[Quantizer] = None
    layer_name: str = dataclasses.field(default="", metadata=dict(static=True))
    role: str = dataclasses.field(default="x", metadata=dict(static=True))

    def quantize(self, x, *, dq_dtype=None, flatten_axis=-1, key=None,
                 layout=None):
        st = get_state()

        if st.stats_cfg(self.layer_name, self.role) is not None:
            cfg = st.stats_cfg(self.layer_name, self.role)
            freq = cfg.get("freq", 1)
            if st.step % max(freq, 1) == 0:
                if cfg.get("_feature") == "LogNVFP4TensorStats":
                    from .stats import compute_nvfp4_stats
                    stats = compute_nvfp4_stats(x)
                else:
                    stats = compute_tensor_stats(x)
                layer, role = self.layer_name, self.role

                def record(**kw):
                    st.stats.record(layer, role, kw)
                jax.debug.callback(record, **stats)

        if st.dump_cfg(self.layer_name, self.role):
            layer, role, stepno = self.layer_name, self.role, st.step

            def dump(val):
                st.dumps[f"{layer}/{role}/step{stepno}"] = val
            jax.debug.callback(dump, x)

        if st.quantization_disabled(self.layer_name, self.role):
            return x

        fq = st.fake_quant_cfg(self.layer_name, self.role)
        if fq is not None and self.inner is not None:
            t = self.inner.quantize(x, dq_dtype=dq_dtype,
                                    flatten_axis=flatten_axis, key=key)
            from ..quantize.tensor import get_rowwise
            return get_rowwise(t).dequantize()

        if self.inner is None:
            return x
        return self.inner.quantize(x, dq_dtype=dq_dtype,
                                   flatten_axis=flatten_axis, key=key,
                                   layout=layout)

    def update(self, amax):
        if self.inner is None:
            return self
        return dataclasses.replace(self, inner=self.inner.update(amax))


def wrap_quantizer_set(qset: QuantizerSet, layer_name: str) -> QuantizerSet:
    """Decorate a quantizer set when debugging is active; no-op otherwise."""
    st = get_state()
    if not st.enabled:
        return qset

    def wrap(q, role):
        if q is None:     # unquantized role: nothing to disable/fake-quant
            return None
        return DebugQuantizer(
            q_dtype=q.q_dtype, scaling_mode=q.scaling_mode,
            q_layout=q.q_layout, inner=q, layer_name=layer_name, role=role)

    return QuantizerSet(x=wrap(qset.x, "x"),
                        kernel=wrap(qset.kernel, "kernel"),
                        dgrad=wrap(qset.dgrad, "dgrad"))
