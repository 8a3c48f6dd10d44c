"""Camera control: plücker-embedding generation + SimpleAdapter.

Port of ``animation/diffsynth/models/wan_video_camera_controller.py``:
direction strings -> camera pose trajectory -> plücker ray embeddings
(pure numpy geometry, :80-206) -> SimpleAdapter (pixel-unshuffle(8) + conv
+ residual blocks, :8-77) whose per-frame features are added to the DiT's
patch embeddings (``add_control_adapter`` models, wan_video_dit.py:338-344).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DEFAULT_ORIGIN = (0, 0.532139961, 0.946026558, 0.5, 0.5, 0, 0, 1, 0, 0, 0, 0, 1,
                  0, 0, 0, 0, 1, 0)


# ------------------------------------------------------------------ geometry
def generate_camera_coordinates(direction: str, length: int, speed: float = 1 / 54,
                                origin=DEFAULT_ORIGIN) -> List[List[float]]:
    coordinates = [list(origin if origin is not None else DEFAULT_ORIGIN)]
    while len(coordinates) < length:
        coor = coordinates[-1].copy()
        if "Left" in direction:
            coor[9] += speed
        if "Right" in direction:
            coor[9] -= speed
        if "Up" in direction:
            coor[13] += speed
        if "Down" in direction:
            coor[13] -= speed
        if "In" in direction:
            coor[18] -= speed
        if "Out" in direction:
            coor[18] += speed
        coordinates.append(coor)
    return coordinates


def _relative_poses(w2cs: np.ndarray, c2ws: np.ndarray) -> np.ndarray:
    target = np.eye(4)
    abs2rel = target @ w2cs[0]
    return np.stack([target] + [abs2rel @ c for c in c2ws[1:]]).astype(np.float32)


def process_pose_file(cam_params: Sequence[Sequence[float]], width=672, height=384,
                      original_pose_width=1280, original_pose_height=720) -> np.ndarray:
    """Pose rows -> plücker embedding (V, H, W, 6) — camera_controller.py:152-180."""
    fx = np.array([e[1] for e in cam_params], np.float64)
    fy = np.array([e[2] for e in cam_params], np.float64)
    cx = np.array([e[3] for e in cam_params], np.float64)
    cy = np.array([e[4] for e in cam_params], np.float64)
    w2cs, c2ws = [], []
    for e in cam_params:
        m = np.eye(4)
        m[:3, :] = np.array(e[7:], np.float64).reshape(3, 4)
        w2cs.append(m)
        c2ws.append(np.linalg.inv(m))

    sample_ratio = width / height
    pose_ratio = original_pose_width / original_pose_height
    if pose_ratio > sample_ratio:
        fx = (height * pose_ratio) * fx / width
    else:
        fy = (width / pose_ratio) * fy / height

    K = np.stack([fx * width, fy * height, cx * width, cy * height], -1).astype(np.float32)
    c2w = _relative_poses(np.stack(w2cs), np.stack(c2ws))  # (V, 4, 4)

    V = len(cam_params)
    j, i = np.meshgrid(np.arange(height, dtype=np.float32),
                       np.arange(width, dtype=np.float32), indexing="ij")
    i = i.reshape(1, -1) + 0.5  # (1, HW)
    j = j.reshape(1, -1) + 0.5
    zs = np.ones_like(i)
    xs = (i - K[:, 2:3]) / K[:, 0:1] * zs
    ys = (j - K[:, 3:4]) / K[:, 1:2] * zs
    dirs = np.stack([np.broadcast_to(xs, (V, i.shape[1])),
                     np.broadcast_to(ys, (V, i.shape[1])),
                     np.broadcast_to(zs, (V, i.shape[1]))], -1)  # (V, HW, 3)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ np.swapaxes(c2w[:, :3, :3], -1, -2)  # (V, HW, 3)
    rays_o = np.broadcast_to(c2w[:, None, :3, 3], rays_d.shape)
    rays_dxo = np.cross(rays_o, rays_d)
    plucker = np.concatenate([rays_dxo, rays_d], -1).reshape(V, height, width, 6)
    return plucker.astype(np.float32)


# ----------------------------------------------------------------- adapter
@dataclasses.dataclass(frozen=True)
class SimpleAdapterConfig:
    in_dim: int = 24  # plücker 6 ch (in_dim_control_adapter=24 => 24·64 after unshuffle? reference passes in_dim=24)
    out_dim: int = 5120
    kernel_size: Sequence[int] = (2, 2)
    stride: Sequence[int] = (2, 2)
    num_residual_blocks: int = 1


def pixel_unshuffle(x, factor: int):
    """(BF, H, W, C) -> (BF, H/f, W/f, C·f²) with torch PixelUnshuffle
    channel order (C, fh, fw)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def simple_adapter_forward(params, cfg: SimpleAdapterConfig, x):
    """x (B, C, F, H, W) plücker video -> (B, out, F, H', W') — the per-frame
    control features added after the DiT patch embed."""
    B, C, F, H, W = x.shape
    y = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(B * F, H, W, C)
    y = pixel_unshuffle(y, 8)
    y = lax.conv_general_dilated(
        y, params["conv"]["w"].astype(y.dtype),
        window_strides=tuple(cfg.stride), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype) + params["conv"]["b"].astype(y.dtype)
    for blk in params["blocks"]:
        h = lax.conv_general_dilated(
            y, blk["conv1"]["w"].astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype) + blk["conv1"]["b"].astype(y.dtype)
        h = jnp.maximum(h, 0)
        h = lax.conv_general_dilated(
            h, blk["conv2"]["w"].astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype) + blk["conv2"]["b"].astype(y.dtype)
        y = y + h
    bf, hh, ww, c = y.shape
    y = y.reshape(B, F, hh, ww, c)
    return jnp.transpose(y, (0, 4, 1, 2, 3))  # B, out, F, H', W'


def convert_simple_adapter_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: SimpleAdapterConfig, dtype=None,
                                      prefix: str = ""):
    if prefix == "" and any(k.startswith("control_adapter.") for k in sd):
        prefix = "control_adapter."

    def cw(name):
        return {"w": np.asarray(sd[prefix + name + ".weight"]).transpose(2, 3, 1, 0),
                "b": np.asarray(sd[prefix + name + ".bias"])}

    blocks = []
    i = 0
    while f"{prefix}residual_blocks.{i}.conv1.weight" in sd:
        blocks.append({"conv1": cw(f"residual_blocks.{i}.conv1"),
                       "conv2": cw(f"residual_blocks.{i}.conv2")})
        i += 1
    params = {"conv": cw("conv"), "blocks": blocks}
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)
