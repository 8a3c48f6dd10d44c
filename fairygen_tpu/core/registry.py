"""Hash-keyed model registry: "throw checkpoint files at me" loading.

The reference auto-detects architectures by hashing the sorted
``key:shape`` set of a checkpoint and looking it up in a 74-entry table
(``animation/diffsynth/configs/model_configs.py``,
``models/model_loader.py:62-80``).  The table is pure data, extracted to
``configs/model_registry.json``; our registry maps each ``model_name`` to a
JAX builder ``(state_dict, extra_kwargs) -> (params, config)``.

Builders convert torch-layout state dicts into our parameter pytrees at
load time (replacing the reference's meta-init + DiskMap streaming with
host-side numpy views + sharded ``jax.device_put``).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, List, Optional

from .io import hash_model_file, hash_state_dict_keys, load_state_dict

_REGISTRY_JSON = os.path.join(
    os.path.dirname(__file__), "..", "configs", "model_registry.json"
)


@dataclasses.dataclass
class ModelSpec:
    model_hash: str
    model_name: str
    extra_kwargs: Dict[str, Any]
    # converter id from the reference table (informational; our builders
    # pick the right converter from the model_name + source layout)
    source_converter: Optional[str] = None


class ModelRegistry:
    def __init__(self, specs: Optional[List[ModelSpec]] = None):
        self._by_hash: Dict[str, List[ModelSpec]] = {}
        self._builders: Dict[str, Callable] = {}
        for s in specs or _load_specs():
            self._by_hash.setdefault(s.model_hash, []).append(s)

    def register_builder(self, model_name: str, fn: Callable):
        """fn(state_dict, extra_kwargs, dtype) -> (params, config)."""
        self._builders[model_name] = fn

    def lookup(self, model_hash: str) -> List[ModelSpec]:
        return self._by_hash.get(model_hash, [])

    def detect_file(self, path) -> List[ModelSpec]:
        return self.lookup(hash_model_file(path))

    def detect_state_dict(self, state_dict) -> List[ModelSpec]:
        return self.lookup(hash_state_dict_keys(state_dict))

    def load(self, path, dtype=None, model_name: Optional[str] = None):
        """Load + auto-detect + build every recognized model in a file.

        Returns list of (model_name, params, config).
        """
        specs = self.detect_file(path)
        if model_name is not None:
            specs = [s for s in specs if s.model_name == model_name]
        if not specs:
            return []
        state_dict = load_state_dict(path)
        out = []
        for spec in specs:
            builder = self._builders.get(spec.model_name)
            if builder is None:
                continue  # architecture known but not yet ported
            params, config = builder(state_dict, dict(spec.extra_kwargs), dtype)
            out.append((spec.model_name, params, config))
        return out

    @property
    def known_names(self):
        return sorted({s.model_name for ss in self._by_hash.values() for s in ss})


def _load_specs() -> List[ModelSpec]:
    with open(_REGISTRY_JSON) as f:
        raw = json.load(f)
    specs = []
    for e in raw:
        specs.append(
            ModelSpec(
                model_hash=e["model_hash"],
                model_name=e["model_name"],
                extra_kwargs=e.get("extra_kwargs", {}),
                source_converter=e.get("state_dict_converter"),
            )
        )
    return specs


MODEL_REGISTRY = ModelRegistry()
