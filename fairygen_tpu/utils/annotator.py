"""ControlNet condition annotators.

Port of the reference ``Annotator`` API
(``animation/diffsynth/utils/controlnet/annotator.py:1-62``): a
``processor_id`` in {canny, depth, softedge, lineart, lineart_anime,
openpose, normal, tile, none, inpaint} turned into a control image.

Native coverage:

  * ``canny`` — implemented here (pure numpy port of cv2.Canny: aperture-3
    Sobel, L1 magnitude with per-channel max selection, quantized
    non-maximum suppression, 8-connected double-threshold hysteresis),
    with a cv2 fast path when OpenCV is importable.  The reference's
    controlnet_aux CannyDetector resize protocol (min-side detect
    resolution rounded to /64) is reproduced.
  * ``tile`` / ``none`` / ``inpaint`` — passthrough (the reference runs no
    processor for these either).
  * ``depth`` — native Depth-Anything port (``models/depth_anything.py``,
    DINOv2 + DPT, golden-tested vs transformers): pass ``model_path`` to a
    local transformers-format checkpoint
    (e.g. depth-anything-small ``model.safetensors``) and depth maps are
    produced in-repo; without a checkpoint it falls back to the
    precomputed-input contract below.
  * remaining model-based detectors (``softedge``/``lineart``/
    ``lineart_anime``/``openpose``/``normal``) — external-model contract:
    like InfiniteYou's precomputed-arcface contract, these take a
    PREcomputed control image (pass it as ``ControlNetInput.image`` with
    ``processor_id=None`` or construct the ``Annotator`` with
    ``skip_processor=True``); instantiating them without a precomputed
    input raises with that instruction.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=1)
def _jitted_depth_forward():
    """One module-wide jitted Depth-Anything forward: the pipelines build
    an Annotator per prepare call, and a fresh ``jax.jit`` wrapper per
    call would retrace (and recompile) for every generated image."""
    import jax

    from ..models.depth_anything import depth_anything_forward

    return jax.jit(depth_anything_forward, static_argnums=(1,))


PROCESSOR_IDS = ("canny", "depth", "softedge", "lineart", "lineart_anime",
                 "openpose", "normal", "tile", "none", "inpaint")
_PASSTHROUGH = ("tile", "none", "inpaint")
_EXTERNAL = ("depth", "softedge", "lineart", "lineart_anime", "openpose",
             "normal")

_TG22 = 13573  # tan(22.5deg) * 2^15, cv2's NMS sector constant


def _sobel3_replicate(img: np.ndarray):
    """Aperture-3 Sobel dx/dy with replicate borders, int32 (cv2 semantics
    on uint8 input). img (H, W) int32."""
    p = np.pad(img, 1, mode="edge").astype(np.int32)
    # smooth [1,2,1] cross derivative [-1,0,1]
    sm_y = p[:-2] + 2 * p[1:-1] + p[2:]          # vertical smooth, (H, W+2)
    dx = sm_y[:, 2:] - sm_y[:, :-2]
    sm_x = p[:, :-2] + 2 * p[:, 1:-1] + p[:, 2:]  # horizontal smooth
    dy = sm_x[2:] - sm_x[:-2]
    return dx, dy


def canny_edges(image: np.ndarray, low_threshold: int = 100,
                high_threshold: int = 200) -> np.ndarray:
    """cv2.Canny(aperture 3, L1 gradient) in pure numpy.

    image: (H, W) or (H, W, C) uint8.  Returns (H, W) uint8 in {0, 255}.
    Multi-channel inputs follow cv2: gradients per channel, the channel
    with the largest L1 magnitude wins per pixel."""
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    dxs = np.empty((C, H, W), np.int32)
    dys = np.empty((C, H, W), np.int32)
    for c in range(C):
        dxs[c], dys[c] = _sobel3_replicate(img[..., c].astype(np.int32))
    mags = np.abs(dxs) + np.abs(dys)
    pick = mags.argmax(axis=0)
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dx, dy, mag = dxs[pick, ii, jj], dys[pick, ii, jj], mags[pick, ii, jj]

    # non-maximum suppression over a zero-padded magnitude field
    m = np.pad(mag, 1).astype(np.int64)
    center = m[1:-1, 1:-1]
    x = np.abs(dx).astype(np.int64)
    y = np.abs(dy).astype(np.int64) << 15
    tg22x = x * _TG22
    tg67x = tg22x + (x << 16)
    horiz = y < tg22x
    vert = y > tg67x
    diag = ~horiz & ~vert
    s = np.where((dx ^ dy) < 0, -1, 1)

    keep = np.zeros((H, W), bool)
    # horizontal sector: strictly greater than left, >= right
    keep |= horiz & (center > m[1:-1, :-2]) & (center >= m[1:-1, 2:])
    # vertical sector: strictly greater than up, >= down
    keep |= vert & (center > m[:-2, 1:-1]) & (center >= m[2:, 1:-1])
    # diagonal sectors: strictly greater than both (i-1, j-s) and (i+1, j+s)
    prev_pos = m[:-2, :]  # rows i-1 (padded cols)
    next_pos = m[2:, :]
    jidx = np.arange(W)
    prev_d = np.where(s == 1, prev_pos[:, jidx], prev_pos[:, jidx + 2])
    next_d = np.where(s == 1, next_pos[:, jidx + 2], next_pos[:, jidx])
    keep |= diag & (center > prev_d) & (center > next_d)

    strong = keep & (mag > high_threshold)
    cand = keep & (mag > low_threshold)

    # hysteresis: 8-connected flood from strong pixels through candidates
    edges = strong.copy()
    frontier = strong
    while frontier.any():
        grow = np.zeros((H + 2, W + 2), bool)
        f = np.pad(frontier, 1)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                grow[1 + di:H + 1 + di, 1 + dj:W + 1 + dj] |= f[1:-1, 1:-1]
        frontier = grow[1:-1, 1:-1] & cand & ~edges
        edges |= frontier
    return (edges * 255).astype(np.uint8)


def _round64_resize(arr: np.ndarray, resolution: int) -> np.ndarray:
    """controlnet_aux resize_image: scale min side to ``resolution``, round
    H/W to multiples of 64."""
    from PIL import Image

    H, W = arr.shape[:2]
    k = float(resolution) / min(H, W)
    H2 = max(64, int(np.round(H * k / 64.0)) * 64)
    W2 = max(64, int(np.round(W * k / 64.0)) * 64)
    if (H2, W2) == (H, W):
        return arr
    img = Image.fromarray(arr)
    resample = Image.LANCZOS if k > 1 else Image.BOX
    return np.asarray(img.resize((W2, H2), resample))


class Annotator:
    """Reference-compatible annotator front end (annotator.py:8-62)."""

    def __init__(self, processor_id: str, model_path: str = "",
                 detect_resolution: Optional[int] = None, device=None,
                 skip_processor: bool = False):
        if processor_id not in PROCESSOR_IDS:
            raise ValueError(f"Unsupported processor_id: {processor_id}")
        self._depth = None
        if processor_id == "depth" and model_path and not skip_processor:
            self._depth = self._load_depth(model_path)
        elif (processor_id in _EXTERNAL) and not skip_processor:
            raise NotImplementedError(
                f"'{processor_id}' needs an external detector model that is "
                "not bundled"
                + (" (for 'depth', pass model_path= to a local "
                   "Depth-Anything transformers checkpoint to run the "
                   "native port)" if processor_id == "depth" else "")
                + "; precompute the control image (e.g. with "
                "controlnet_aux on any host) and pass it directly as "
                "ControlNetInput.image, or construct "
                f"Annotator('{processor_id}', skip_processor=True) to treat "
                "inputs as already annotated.")
        self.processor_id = processor_id
        self.detect_resolution = detect_resolution
        self.skip_processor = skip_processor or processor_id in _PASSTHROUGH

    @staticmethod
    @functools.lru_cache(maxsize=2)
    def _load_depth(model_path):
        # lru_cache: the pipelines construct an Annotator per prepare call,
        # so without it every generated image would re-read the checkpoint.
        from ..core.io import load_state_dict
        from ..models.depth_anything import (
            DepthAnythingConfig, convert_depth_anything_state_dict,
        )

        sd = load_state_dict(model_path)
        hidden = sd["backbone.embeddings.cls_token"].shape[-1]
        n_layers = max(
            int(k.split(".")[3]) for k in sd
            if k.startswith("backbone.encoder.layer.")) + 1
        patch = sd["backbone.embeddings.patch_embeddings.projection.weight"].shape[-1]
        native = int(round((sd["backbone.embeddings.position_embeddings"].shape[1] - 1) ** 0.5))
        if hidden == 384 and n_layers == 12:
            cfg = DepthAnythingConfig.small()
        else:
            fusion = sd["head.conv1.weight"].shape[1]
            neck = tuple(
                sd[f"neck.reassemble_stage.layers.{i}.projection.weight"].shape[0]
                for i in range(4))
            cfg = DepthAnythingConfig(
                hidden_size=hidden, num_layers=n_layers,
                num_heads=max(1, hidden // 64),
                mlp_dim=sd["backbone.encoder.layer.0.mlp.fc1.weight"].shape[0],
                patch_size=patch, image_size=native * patch,
                neck_hidden_sizes=neck, fusion_hidden_size=fusion,
                head_hidden_size=sd["head.conv2.weight"].shape[0],
                out_indices=tuple(range(n_layers - 3, n_layers + 1)))
        return cfg, convert_depth_anything_state_dict(sd, cfg)

    def _depth_map(self, arr: np.ndarray, image_resolution: int) -> np.ndarray:
        import jax

        from ..models.depth_anything import (
            depth_anything_forward, depth_to_image, preprocess_depth_anything,
        )

        cfg, params = self._depth
        x = preprocess_depth_anything(arr, cfg, self.detect_resolution)
        depth = _jitted_depth_forward()(params, cfg, x)[0]
        return _round64_resize(depth_to_image(np.asarray(depth)),
                               image_resolution)

    def _canny(self, arr: np.ndarray, detect_resolution: int,
               image_resolution: int) -> np.ndarray:
        arr = _round64_resize(arr, detect_resolution)
        try:
            import cv2

            edges = cv2.Canny(arr, 100, 200)
        except Exception:
            edges = canny_edges(arr, 100, 200)
        edges = np.repeat(edges[..., None], 3, axis=2)
        return _round64_resize(edges, image_resolution)

    def __call__(self, image, mask=None):
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        width, height = image.size
        if self.skip_processor:
            return image.resize((width, height))
        arr = np.asarray(image.convert("RGB"))
        if self._depth is not None:
            out = self._depth_map(arr, min(width, height))
        else:
            detect = self.detect_resolution or min(width, height)
            out = self._canny(arr, detect, min(width, height))
        return Image.fromarray(out).resize((width, height))
