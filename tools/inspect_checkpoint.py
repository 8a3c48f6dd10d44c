"""Inspect a checkpoint file against the hash registry.

Debugging aid for the "throw files at me" loading flow (reference
``models/model_loader.py:62-80`` auto-detection): prints the md5
key:shape hash, any matching registry entries, and a key/shape summary —
so "why wasn't my file detected?" is answerable without a debugger.

  python tools/inspect_checkpoint.py ckpt.safetensors [more.safetensors ...]
  python tools/inspect_checkpoint.py --keys ckpt.safetensors   # full key dump
"""
import argparse
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def inspect(path: str, show_keys: bool = False) -> bool:
    """Print a report for ``path``; returns True if a registry entry matched."""
    from fairygen_tpu.core.io import hash_state_dict_keys, load_state_dict
    from fairygen_tpu.core.registry import MODEL_REGISTRY

    sd = load_state_dict(path)
    h = hash_state_dict_keys(sd)
    h_noshape = hash_state_dict_keys(sd, with_shape=False)
    n_params = sum(int(np.prod(v.shape)) if hasattr(v, "shape") else 0
                   for v in sd.values())
    print(f"== {path}")
    print(f"   keys: {len(sd)}   params: {n_params / 1e9:.3f}B")
    print(f"   hash (key:shape): {h}")
    print(f"   hash (keys only): {h_noshape}")

    reg = MODEL_REGISTRY
    matches = reg.lookup(h) + [s for s in reg.lookup(h_noshape)
                               if s not in reg.lookup(h)]
    if matches:
        for spec in matches:
            print(f"   -> registry match: {spec.model_name} "
                  f"({getattr(spec, 'extra_kwargs', None) or {}})")
    else:
        print("   -> NO registry match; top-level key prefixes:")
        prefixes = Counter(k.split(".")[0] for k in sd)
        for pre, n in prefixes.most_common(12):
            print(f"        {pre}.* ({n} keys)")
        print("      (pass hints={path: (model_name, extra)} to "
              "ModelPool.load / from_pretrained to force a builder)")
    if show_keys:
        for k in sorted(sd):
            v = sd[k]
            shape = tuple(v.shape) if hasattr(v, "shape") else "?"
            dtype = getattr(v, "dtype", "?")
            print(f"      {k}  {shape}  {dtype}")
    return bool(matches)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    p.add_argument("--keys", action="store_true", help="dump every key")
    args = p.parse_args()
    any_unmatched = False
    for path in args.paths:
        any_unmatched |= not inspect(path, show_keys=args.keys)
    sys.exit(1 if any_unmatched else 0)


if __name__ == "__main__":
    main()
