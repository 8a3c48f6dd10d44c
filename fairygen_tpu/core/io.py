"""Checkpoint IO: safetensors / torch-pickle state dicts + architecture hashing.

Mirrors the behaviour of the reference loader
(``animation/diffsynth/core/loader/file.py:5-121``): state dicts are flat
``name -> tensor`` maps, and architectures are auto-detected from the md5
hash of the sorted ``key:shape`` strings.  The hash function is
bit-compatible with the reference so the reference's 74-entry registry
(``animation/diffsynth/configs/model_configs.py``) carries over as pure data.

Tensors are returned as numpy arrays (host) — device placement and sharding
happen later via ``jax.device_put`` with explicit shardings.
"""
from __future__ import annotations

import hashlib
import json
import os
import struct
from typing import Dict, Iterable, Optional

import numpy as np

__all__ = [
    "load_safetensors",
    "save_safetensors",
    "load_torch_pickle",
    "load_state_dict",
    "load_shapes",
    "hash_state_dict_keys",
    "hash_model_file",
]

# safetensors dtype tag -> numpy dtype. bfloat16 handled via ml_dtypes.
_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _st_dtype(tag: str):
    if tag == "BF16":
        return _bf16()
    if tag in _ST_DTYPES:
        return np.dtype(_ST_DTYPES[tag])
    raise ValueError(f"unsupported safetensors dtype {tag}")


def _read_st_header(f):
    (n,) = struct.unpack("<Q", f.read(8))
    header = json.loads(f.read(n))
    data_start = 8 + n
    return header, data_start


def load_safetensors(
    path: str,
    dtype: Optional[np.dtype] = None,
    keys: Optional[Iterable[str]] = None,
    native: bool = False,
    n_threads: int = 8,
) -> Dict[str, np.ndarray]:
    """Load a .safetensors file without torch.

    Optional fast path (native=True): the C++ multithreaded streamer
    (fairygen_tpu.native, parallel pread + in-flight bf16→f32 widening —
    the TPU-side DiskMap replacement; wins on NVMe-class storage).
    Default: numpy mmap views (optimal on page-cached / network storage).
    """
    with open(path, "rb") as f:
        header, data_start = _read_st_header(f)
    want = set(keys) if keys is not None else None
    items = [
        (name, info) for name, info in header.items()
        if name != "__metadata__" and (want is None or name in want)
    ]

    if native:
        try:
            from ..native import parallel_read

            out = {}
            extents = []
            for name, info in items:
                start, end = info["data_offsets"]
                src_dt = _st_dtype(info["dtype"])
                widen = (
                    info["dtype"] == "BF16"
                    and dtype is not None
                    and np.dtype(dtype) == np.float32
                )
                dst_dt = np.float32 if widen else src_dt
                arr = np.empty(info["shape"], dst_dt)
                out[name] = arr
                extents.append(
                    (data_start + start, end - start,
                     arr.view(np.uint8).reshape(-1), widen)
                )
            if extents and parallel_read(path, extents, n_threads=n_threads):
                if dtype is not None:
                    out = {
                        k: (v if v.dtype == np.dtype(dtype) else v.astype(dtype))
                        for k, v in out.items()
                    }
                return out
        except Exception:
            pass  # fall back to mmap

    out = {}
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    for name, info in items:
        start, end = info["data_offsets"]
        arr = (
            mm[data_start + start : data_start + end]
            .view(_st_dtype(info["dtype"]))
            .reshape(info["shape"])
        )
        if dtype is not None:
            arr = arr.astype(dtype)
        out[name] = arr
    return out


def save_safetensors(path: str, state_dict: Dict[str, np.ndarray], metadata=None):
    """Write a flat dict of numpy arrays as .safetensors (bf16 supported)."""
    import ml_dtypes

    def tag(a):
        if a.dtype == np.dtype(ml_dtypes.bfloat16):
            return "BF16"
        for t, d in _ST_DTYPES.items():
            if a.dtype == np.dtype(d):
                return t
        raise ValueError(f"unsupported dtype {a.dtype}")

    header = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    bufs = []
    for name, a in state_dict.items():
        a = np.ascontiguousarray(a)
        nbytes = a.nbytes
        header[name] = {
            "dtype": tag(a),
            "shape": list(a.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        bufs.append(a)
        offset += nbytes
    hj = json.dumps(header).encode()
    pad = (8 - len(hj) % 8) % 8
    hj += b" " * pad
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for a in bufs:
            f.write(a.tobytes())


def load_torch_pickle(path: str, dtype=None) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.bin checkpoint to numpy (requires torch, CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if len(sd) == 1:
        for wrap in ("state_dict", "module", "model_state"):
            if wrap in sd:
                sd = sd[wrap]
                break
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        a = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        if dtype is not None:
            a = a.astype(dtype)
        out[k] = a
    return out


def load_state_dict(path, dtype=None) -> Dict[str, np.ndarray]:
    if isinstance(path, (list, tuple)):
        out = {}
        for p in path:
            out.update(load_state_dict(p, dtype))
        return out
    if path.endswith(".safetensors"):
        return load_safetensors(path, dtype=dtype)
    return load_torch_pickle(path, dtype=dtype)


def load_shapes(path) -> Dict[str, list]:
    """Key -> shape map without reading tensor data (safetensors header only)."""
    if isinstance(path, (list, tuple)):
        out = {}
        for p in path:
            out.update(load_shapes(p))
        return out
    if path.endswith(".safetensors"):
        with open(path, "rb") as f:
            header, _ = _read_st_header(f)
        return {
            k: v["shape"] for k, v in header.items() if k != "__metadata__"
        }
    return {k: list(v.shape) for k, v in load_torch_pickle(path).items()}


def _keys_to_str(shapes: Dict, with_shape=True) -> str:
    # Bit-compatible with reference core/loader/file.py:43-56 — for tensor
    # values both "key:shape" and bare "key" strings enter the sorted join.
    keys = []
    for key, value in shapes.items():
        if not isinstance(key, str):
            continue
        if isinstance(value, dict):
            keys.append(key + "|" + _keys_to_str(value, with_shape))
        else:
            if with_shape:
                keys.append(key + ":" + "_".join(map(str, list(value))))
            keys.append(key)
    keys.sort()
    return ",".join(keys)


def hash_state_dict_keys(state_dict, with_shape=True) -> str:
    shapes = {
        k: (v if isinstance(v, dict) else list(np.shape(v)))
        for k, v in state_dict.items()
    }
    return hashlib.md5(_keys_to_str(shapes, with_shape).encode()).hexdigest()


def hash_model_file(path, with_shape=True) -> str:
    shapes = load_shapes(path)
    return hashlib.md5(_keys_to_str(shapes, with_shape).encode()).hexdigest()
