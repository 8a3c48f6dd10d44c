"""Wan causal 3D video VAE (Wan2.1 16-ch and Wan2.2 "VAE38" 48-ch).

Re-implements the reference ``wan_video_vae.py`` (VideoVAE38_:1269-1351,
Encoder3d_38:620, Decoder3d_38:842, WanVideoVAE38:1354-1382) as pure
channels-last JAX functions with TWO equivalent execution modes:

1. **full-sequence** — the reference's chunked ``feat_cache`` streaming is
   mathematically a causal convolution scheme; we run it as one big conv
   program. Derivation (validated bit-level by goldens):
     * CausalConv3d + CACHE_T=2 streaming ≡ conv with 2-frame front zero pad;
     * encoder ``downsample3d`` ≡ concat([spatial(x)[:1],
       stride-2 time conv over spatial(x) starting at frame 0])
       (first chunk bypasses the time conv — wan_video_vae.py:162-173);
     * decoder ``upsample3d`` ≡ concat([x[:1], frame-doubling causal time
       conv over x[1:]]) (the 'Rep' sentinel is exactly a zero cache —
       wan_video_vae.py:120-156);
     * AvgDown3D front-pads to the factor, aligning with chunk boundaries.

2. **streaming** — functional port of the feat_cache machinery: a chunk
   function with an explicit cache pytree carry (last-2-frame conv inputs),
   called per temporal chunk ([1, 4, 4, …] pixel frames on encode, one
   latent frame per step on decode). Memory stays O(chunk), enabling long
   videos on one chip; the python loop costs two compilations (first chunk
   + steady state).

Latent normalization: per-channel (z − mean)/std with the constants from
WanVideoVAE38 (wan_video_vae.py:1359-1377).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# --------------------------------------------------------------------- config

VAE38_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], dtype=np.float32)

VAE38_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], dtype=np.float32)


VAE16_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], dtype=np.float32)

VAE16_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 160
    z_dim: int = 48
    dec_dim: int = 256
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    patch_size: int = 2  # pixel-space patchify (VAE38); 1 for the 16-ch VAE
    in_channels: int = 3
    arch: str = "38"  # "38" (Wan2.2 z48) | "v1" (Wan2.1 z16, wan_video_vae.py:951)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))

    @property
    def enc_dims(self):
        return [self.dim * u for u in (1,) + tuple(self.dim_mult)]

    @property
    def dec_dims(self):
        return [self.dec_dim * u for u in (self.dim_mult[-1],) + tuple(reversed(self.dim_mult))]

    @property
    def upsampling_factor(self):
        return 8 * self.patch_size

    @property
    def conv_in_channels(self):
        return self.in_channels * self.patch_size**2

    @staticmethod
    def wan22_38() -> "WanVAEConfig":
        return WanVAEConfig()

    @staticmethod
    def wan21_16() -> "WanVAEConfig":
        """Wan2.1 causal VAE — WanVideoVAE (wan_video_vae.py:1058-1077)."""
        return WanVAEConfig(dim=96, z_dim=16, dec_dim=96, patch_size=1, arch="v1")

    @staticmethod
    def tiny(**over) -> "WanVAEConfig":
        base = dict(dim=8, z_dim=4, dec_dim=8, num_res_blocks=1)
        base.update(over)
        return WanVAEConfig(**base)

    @staticmethod
    def tiny_v1(**over) -> "WanVAEConfig":
        base = dict(dim=8, z_dim=4, dec_dim=8, num_res_blocks=1, patch_size=1,
                    arch="v1")
        base.update(over)
        return WanVAEConfig(**base)


# ------------------------------------------------------------------ streaming
class CacheBank:
    """Functional feat_cache: static traversal order, pytree-carried values.

    mode "full": no caching (causal zero padding everywhere).
    mode "init": first chunk — record newly created cache entries.
    mode "step": steady state — consume `entries` in traversal order.
    """

    def __init__(self, mode: str, entries: Optional[List] = None):
        assert mode in ("full", "init", "step")
        self.mode = mode
        self.entries = entries or []
        self.idx = 0
        self.out: List = []

    @property
    def streaming(self):
        return self.mode != "full"

    def pull(self):
        e = self.entries[self.idx]
        self.idx += 1
        return e

    def push(self, value):
        self.out.append(value)


# ------------------------------------------------------------------ primitives
def _conv3d(x, w, b=None, strides=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _conv2d(x, w, b=None, strides=(1, 1), padding=((0, 0), (0, 0))):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def causal_conv3d(p, x, cache: CacheBank, t_pad: int, spatial_pad: int = 0,
                  stride_t: int = 1):
    """CausalConv3d — reference wan_video_vae.py:33-52.

    x: (B, T, H, W, C). Time front-padded 2·t_pad; with streaming cache, the
    cache holds the last 2 frames of the zero-padded effective stream.
    """
    sp = ((spatial_pad, spatial_pad), (spatial_pad, spatial_pad))
    if t_pad == 0:
        return _conv3d(x, p["w"], p.get("b"), strides=(stride_t, 1, 1),
                       padding=((0, 0),) + sp)
    if not cache.streaming:
        return _conv3d(x, p["w"], p.get("b"), strides=(stride_t, 1, 1),
                       padding=((2 * t_pad, 0),) + sp)
    if cache.mode == "init":
        prev = jnp.zeros(x.shape[:1] + (2 * t_pad,) + x.shape[2:], x.dtype)
    else:
        prev = cache.pull()
    eff = jnp.concatenate([prev, x], axis=1)
    cache.push(eff[:, -2 * t_pad:])
    return _conv3d(eff, p["w"], p.get("b"), strides=(stride_t, 1, 1),
                   padding=((0, 0),) + sp)


def vae_rms_norm(x, gamma, channel_last=True):
    """F.normalize over channels · sqrt(C) · gamma — wan_video_vae.py:55-70."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    scale = x.shape[-1] ** 0.5
    y = xf / jnp.maximum(n, 1e-12) * scale
    return (y * gamma.astype(jnp.float32)).astype(dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _norm_silu(p_gamma, x):
    """vae_rms_norm -> SiLU. Measured on v5e (2026-08-17): routing this
    through the fused Pallas kernel (ops/fused_norms.vae_rms_silu) makes
    the streamed decode 3x SLOWER (5.6 -> 16.5 s) — XLA already fuses the
    norm+silu into the surrounding conv program, and the pallas_call
    forces materialization + layout round-trips. Keep plain jnp."""
    return _silu(vae_rms_norm(x, p_gamma))


def residual_block(p, x, cache: CacheBank):
    """RMSnorm→SiLU→CausalConv ×2 + shortcut — wan_video_vae.py:267-301."""
    h = x
    if "shortcut" in p:
        h = causal_conv3d(p["shortcut"], x, cache, t_pad=0)
    y = _norm_silu(p["norm1"], x)
    y = causal_conv3d(p["conv1"], y, cache, t_pad=1, spatial_pad=1)
    y = _norm_silu(p["norm2"], y)
    y = causal_conv3d(p["conv2"], y, cache, t_pad=1, spatial_pad=1)
    return y + h


def attention_block(p, x):
    """Single-head per-frame spatial self-attention — wan_video_vae.py:304-342."""
    b, t, h, w, c = x.shape
    y = x.reshape(b * t, h, w, c)
    yn = vae_rms_norm(y, p["norm"])
    qkv = _conv2d(yn, p["qkv"]["w"], p["qkv"]["b"])  # 1x1
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum("bsc,btc->bst", q, k).astype(jnp.float32) * (c**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bst,btc->bsc", probs, v).reshape(b * t, h, w, c)
    o = _conv2d(o, p["proj"]["w"], p["proj"]["b"])
    return (y + o).reshape(b, t, h, w, c)


def _upsample2x_conv3x3_subpixel(x, w, b):
    """conv3x3(nearest-2x-upsample(x)) computed WITHOUT the upsample.

    Each output pixel of the upsampled conv sees only a 2×2 neighbourhood
    of the ORIGINAL grid (duplicated pixels share taps), so the op equals
    a stride-2 transposed conv whose 4×4 kernel carries the duplicated-tap
    sums [k0, k0+k1, k1+k2, k2] per axis (derivation below).

    Same math as repeat+conv to fp-reassociation (the tap sums move into
    the weights; test_subpixel_upsample_matches_repeat_conv gates 1e-5 in
    fp32); 16/9 fewer effective MACs and the 4×-sized nearest-upsampled
    intermediate never materializes."""
    # Single lhs-dilated (transposed) conv — the formulation XLA lowers
    # cleanly (measured fastest: decode 5.09 -> 4.83 s).  Two rejected
    # alternatives, both measured on v5e: explicit 4-subconv +
    # stack/reshape interleave hands layout assignment a size-2 minormost
    # dim that the (8,128) tile pads 64x (52 GB alloc for an 818 MB
    # array); 4-subconv + interior-pad placement is layout-safe but
    # slower (5.15 s — the pads don't fuse into one output loop).
    # Derivation: with zero-stuffed input S (S[2i] = X[i]) and pad 2,
    # even outputs take taps (k0 on X[i-1], k1+k2 on X[i]) at stuffed
    # offsets 0/2 and odd outputs (k0+k1 on X[i], k2 on X[i+1]) at 1/3,
    # giving the 4-tap kernel [k0, k0+k1, k1+k2, k2] per axis.
    rows = jnp.stack([w[0], w[0] + w[1], w[1] + w[2], w[2]])        # (4,3,ci,co)
    k4 = jnp.stack([rows[:, 0], rows[:, 0] + rows[:, 1],
                    rows[:, 1] + rows[:, 2], rows[:, 2]], axis=1)   # (4,4,ci,co)
    o = lax.conv_general_dilated(
        x, k4.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return o + b.astype(o.dtype)


def _spatial_resample(p, x, mode):
    """The 2D half of Resample38 — wan_video_vae.py:242-265."""
    b, t, h, w, c = x.shape
    y = x.reshape(b * t, h, w, c)
    if mode.startswith("upsample"):
        y = _upsample2x_conv3x3_subpixel(y, p["conv"]["w"], p["conv"]["b"])
    elif mode.startswith("downsample"):
        # ZeroPad2d (left 0, right 1, top 0, bottom 1) + stride-2 conv
        y = _conv2d(y, p["conv"]["w"], p["conv"]["b"], strides=(2, 2),
                    padding=((0, 1), (0, 1)))
    return y.reshape((b, t) + y.shape[1:])


def resample38(p, x, mode, cache: CacheBank, first_chunk: bool):
    """Resample38 forward — wan_video_vae.py:120-174 (semantics) / 227-265.

    downsample3d: spatial first, then stride-2 time conv (first frame passes
    through untouched temporally). upsample3d: time conv + frame doubling
    first (first frame untouched), then spatial.
    """
    if mode == "none":
        return x

    if mode == "upsample3d":
        if not cache.streaming:
            head, tail = x[:, :1], x[:, 1:]
            if tail.shape[1] > 0:
                y = causal_conv3d(p["time_conv"], tail, cache, t_pad=1)
                y = _double_frames(y)
                x = jnp.concatenate([head, y], axis=1)
            else:
                x = head
        else:
            if cache.mode == "init":
                # 'Rep' sentinel ≡ zero cache for the next chunk
                cache.push(jnp.zeros(x.shape[:1] + (2,) + x.shape[2:], x.dtype))
            else:
                prev = cache.pull()
                eff = jnp.concatenate([prev, x], axis=1)
                cache.push(eff[:, -2:])
                y = _conv3d(eff, p["time_conv"]["w"], p["time_conv"]["b"])
                x = _double_frames(y)
        return _spatial_resample(p, x, mode)

    x = _spatial_resample(p, x, mode)

    if mode == "downsample3d":
        if not cache.streaming:
            head = x[:, :1]
            y = _conv3d(x, p["time_conv"]["w"], p["time_conv"]["b"],
                        strides=(2, 1, 1))
            x = jnp.concatenate([head, y], axis=1)
        else:
            if cache.mode == "init":
                cache.push(x[:, -1:])
            else:
                prev = cache.pull()
                eff = jnp.concatenate([prev, x], axis=1)
                cache.push(x[:, -1:])
                x = _conv3d(eff, p["time_conv"]["w"], p["time_conv"]["b"],
                            strides=(2, 1, 1))
    return x


def _double_frames(y):
    """(B,T,H,W,2C) -> (B,2T,H,W,C): channel halves become frame pairs
    (reference wan_video_vae.py:153-156).

    Written as channel-slices + interior-padded adds on the (major) frame
    axis: the reshape/transpose/reshape form makes TPU layout assignment
    factor a size-2 dim minormost and the (8,128) tile pads it up to 64x
    (observed 26 GB alloc for a 408 MB tensor in the tiled 720p decode).
    Every output frame is written by exactly one slice — exact."""
    b, t, h, w, c2 = y.shape
    c = c2 // 2
    zero = jnp.zeros((), y.dtype)
    even = lax.pad(y[..., :c], zero,
                   ((0, 0, 0), (0, 1, 1), (0, 0, 0), (0, 0, 0), (0, 0, 0)))
    odd = lax.pad(y[..., c:], zero,
                  ((0, 0, 0), (1, 0, 1), (0, 0, 0), (0, 0, 0), (0, 0, 0)))
    return even + odd


def avg_down3d(x, out_channels, factor_t, factor_s):
    """AvgDown3D — wan_video_vae.py:345-395 (channel-last)."""
    b, t, h, w, c = x.shape
    pad_t = (-t) % factor_t
    if pad_t:
        x = jnp.concatenate(
            [jnp.zeros((b, pad_t, h, w, c), x.dtype), x], axis=1
        )
        t = t + pad_t
    ft, fs = factor_t, factor_s
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    # group layout (C, ft, fs_h, fs_w) flattened, then (out, group) mean
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, t // ft, h // fs, w // fs, c * ft * fs * fs
    )
    group = c * ft * fs * fs // out_channels
    x = x.reshape(x.shape[:4] + (out_channels, group))
    return x.mean(axis=-1)


def dup_up3d(x, out_channels, factor_t, factor_s, first_chunk):
    """DupUp3D — wan_video_vae.py:398-439 (channel-last).

    Reference math: repeat channels ``repeats``× elementwise, view as
    (co, ft, fs, fs) and interleave (ft, fs, fs) into (t, h, w).  The flat
    repeated channel for output channel c' at offset (i, j, k) is
    c'·S + off (S = ft·fs², off = i·fs² + j·fs + k), and jnp.repeat maps
    flat -> original flat // repeats, so the (i, j, k) sub-grid is the
    strided channel slice x[..., off//repeats :: S//repeats] — computed
    directly, with interior-padded adds for the spatial/temporal
    placement (the repeat+reshape+transpose form trips the same TPU
    layout pathology as _double_frames; every position gets exactly one
    contribution — exact).  The two decoder38 cases get structured
    layout-safe forms (measured: the pad fallback costs +0.22 s at
    480p)."""
    b, t, h, w, c = x.shape
    ft, fs = factor_t, factor_s
    S = ft * fs * fs
    repeats = out_channels * S // c
    assert S % repeats == 0, (out_channels, ft, fs, c)
    k_stride = S // repeats
    if repeats == S:
        # every offset maps to the same channels -> pure nearest-neighbor
        # duplication along t/h/w (decoder38 stages 0-1: co == c)
        y = jnp.repeat(jnp.repeat(jnp.repeat(x, ft, axis=1), fs, axis=2),
                       fs, axis=3)
    elif ft == 1 and repeats == fs:
        # offset (j, k) -> slice j (k-independent): interleave the channel
        # slices along H (major-axis stack, layout-safe), duplicate along W
        # (decoder38 stage 2: co == c/2)
        slices = [x[..., j::k_stride] for j in range(fs)]
        y = jnp.stack(slices, axis=3).reshape(b, t, fs * h, w, out_channels)
        y = jnp.repeat(y, fs, axis=3)
    else:
        # general fallback: interior-padded placement (exact, layout-safe,
        # ~5% slower at 480p than the structured forms above)
        zero = jnp.zeros((), x.dtype)
        y = None
        for i in range(ft):
            for j in range(fs):
                for k in range(fs):
                    off = i * fs * fs + j * fs + k
                    sl = x[..., off // repeats::k_stride]
                    placed = lax.pad(sl, zero, (
                        (0, 0, 0),
                        (i, ft - 1 - i, ft - 1),
                        (j, fs - 1 - j, fs - 1),
                        (k, fs - 1 - k, fs - 1),
                        (0, 0, 0)))
                    y = placed if y is None else y + placed
    if first_chunk:
        y = y[:, ft - 1:]
    return y


# ------------------------------------------------------------------- encoder
def encoder38_forward(p, cfg: WanVAEConfig, x, cache: CacheBank,
                      first_chunk: bool = True):
    """Encoder3d_38 — wan_video_vae.py:620-733."""
    x = causal_conv3d(p["conv1"], x, cache, t_pad=1, spatial_pad=1)

    dims = cfg.enc_dims
    for i in range(len(cfg.dim_mult)):
        stage = p["down"][i]
        t_down = cfg.temperal_downsample[i] if i < len(cfg.temperal_downsample) else False
        down_flag = i != len(cfg.dim_mult) - 1
        x_copy = x
        for blk in stage["blocks"]:
            x = residual_block(blk, x, cache)
        if down_flag:
            mode = "downsample3d" if t_down else "downsample2d"
            x = resample38(stage["resample"], x, mode, cache, first_chunk)
        sc = avg_down3d(
            x_copy, dims[i + 1],
            factor_t=2 if t_down else 1,
            factor_s=2 if down_flag else 1,
        )
        x = x + sc

    x = residual_block(p["middle"]["res1"], x, cache)
    x = attention_block(p["middle"]["attn"], x)
    x = residual_block(p["middle"]["res2"], x, cache)

    x = _norm_silu(p["head"]["norm"], x)
    x = causal_conv3d(p["head"]["conv"], x, cache, t_pad=1, spatial_pad=1)
    return x


def encoder_v1_forward(p, cfg: WanVAEConfig, x, cache: CacheBank,
                       first_chunk: bool = True):
    """Encoder3d (Wan2.1) — wan_video_vae.py:517-617: plain residual stacks
    + Resample, no Avg shortcuts."""
    x = causal_conv3d(p["conv1"], x, cache, t_pad=1, spatial_pad=1)
    for i in range(len(cfg.dim_mult)):
        stage = p["down"][i]
        for blk in stage["blocks"]:
            x = residual_block(blk, x, cache)
        if "resample" in stage:
            t_down = cfg.temperal_downsample[i] if i < len(cfg.temperal_downsample) else False
            mode = "downsample3d" if t_down else "downsample2d"
            x = resample38(stage["resample"], x, mode, cache, first_chunk)
    x = residual_block(p["middle"]["res1"], x, cache)
    x = attention_block(p["middle"]["attn"], x)
    x = residual_block(p["middle"]["res2"], x, cache)
    x = _norm_silu(p["head"]["norm"], x)
    x = causal_conv3d(p["head"]["conv"], x, cache, t_pad=1, spatial_pad=1)
    return x


def decoder_v1_forward(p, cfg: WanVAEConfig, x, cache: CacheBank,
                       first_chunk: bool = True):
    """Decoder3d (Wan2.1) — wan_video_vae.py:736-838: the old Resample
    halves channels on spatial upsample (Conv2d(dim, dim//2))."""
    x = causal_conv3d(p["conv1"], x, cache, t_pad=1, spatial_pad=1)
    x = residual_block(p["middle"]["res1"], x, cache)
    x = attention_block(p["middle"]["attn"], x)
    x = residual_block(p["middle"]["res2"], x, cache)
    for i in range(len(cfg.dim_mult)):
        stage = p["up"][i]
        for blk in stage["blocks"]:
            x = residual_block(blk, x, cache)
        if "resample" in stage:
            t_up = cfg.temperal_upsample[i] if i < len(cfg.temperal_upsample) else False
            mode = "upsample3d" if t_up else "upsample2d"
            x = resample38(stage["resample"], x, mode, cache, first_chunk)
    x = _norm_silu(p["head"]["norm"], x)
    x = causal_conv3d(p["head"]["conv"], x, cache, t_pad=1, spatial_pad=1)
    return x


def decoder38_forward(p, cfg: WanVAEConfig, x, cache: CacheBank,
                      first_chunk: bool = True):
    """Decoder3d_38 — wan_video_vae.py:842-940."""
    dims = cfg.dec_dims
    x = causal_conv3d(p["conv1"], x, cache, t_pad=1, spatial_pad=1)

    x = residual_block(p["middle"]["res1"], x, cache)
    x = attention_block(p["middle"]["attn"], x)
    x = residual_block(p["middle"]["res2"], x, cache)

    for i in range(len(cfg.dim_mult)):
        stage = p["up"][i]
        t_up = cfg.temperal_upsample[i] if i < len(cfg.temperal_upsample) else False
        up_flag = i != len(cfg.dim_mult) - 1
        x_main = x
        for blk in stage["blocks"]:
            x_main = residual_block(blk, x_main, cache)
        if up_flag:
            mode = "upsample3d" if t_up else "upsample2d"
            x_main = resample38(stage["resample"], x_main, mode, cache, first_chunk)
            sc = dup_up3d(
                x, dims[i + 1],
                factor_t=2 if t_up else 1, factor_s=2,
                first_chunk=first_chunk,
            )
            x = x_main + sc
        else:
            x = x_main

    x = _norm_silu(p["head"]["norm"], x)
    x = causal_conv3d(p["head"]["conv"], x, cache, t_pad=1, spatial_pad=1)
    return x


# ------------------------------------------------------------ patchify helpers
def pixel_patchify(x, patch):
    """(B,T,H,W,C) -> (B,T,H/p,W/p,C·p·p) with torch channel order
    'b c f (h q) (w r) -> b (c r q) f h w' (wan_video_vae.py:199-211)."""
    if patch == 1:
        return x
    b, t, h, w, c = x.shape
    q = r = patch
    y = x.reshape(b, t, h // q, q, w // r, r, c)
    # channel order (c, r, q)
    y = y.transpose(0, 1, 2, 4, 6, 5, 3).reshape(b, t, h // q, w // r, c * r * q)
    return y


def pixel_unpatchify(x, patch, out_channels=3):
    if patch == 1:
        return x
    b, t, h, w, _ = x.shape
    q = r = patch
    y = x.reshape(b, t, h, w, out_channels, r, q)
    y = y.transpose(0, 1, 2, 6, 3, 5, 4).reshape(b, t, h * q, w * r, out_channels)
    return y


# ---------------------------------------------------------------- public API
def _full(fn, p, cfg, x, first_chunk=True):
    return fn(p, cfg, x, CacheBank("full"), first_chunk)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _chunk_fns(cfg: "WanVAEConfig", which: str):
    """Jitted first/steady chunk programs, cached per config so repeated
    encode/decode calls never recompile."""
    if which == "enc":
        fwd = encoder38_forward if cfg.arch == "38" else encoder_v1_forward
        key = "encoder"
    else:
        fwd = decoder38_forward if cfg.arch == "38" else decoder_v1_forward
        key = "decoder"

    @jax.jit
    def first_fn(params, xc):
        bank = CacheBank("init")
        y = fwd(params[key], cfg, xc, bank, first_chunk=True)
        return y, bank.out

    @jax.jit
    def step_fn(params, xc, entries):
        bank = CacheBank("step", list(entries))
        y = fwd(params[key], cfg, xc, bank, first_chunk=False)
        return y, bank.out

    return first_fn, step_fn


def vae38_encode_core(params, cfg: WanVAEConfig, x, streaming: bool = False):
    """Patchified pixels -> normalized latent mu. x: (B, T, H, W, 12)."""
    enc_fwd = encoder38_forward if cfg.arch == "38" else encoder_v1_forward
    if not streaming:
        out = _full(enc_fwd, params["encoder"], cfg, x)
        out = causal_conv3d(params["conv1"], out, CacheBank("full"), t_pad=0)
    else:
        t = x.shape[1]
        chunks = [x[:, :1]] + [x[:, 1 + 4 * i: 1 + 4 * (i + 1)] for i in range((t - 1) // 4)]
        first_fn, step_fn = _chunk_fns(cfg, "enc")
        outs = []
        y, cache_entries = first_fn(params, chunks[0])
        outs.append(y)
        for c in chunks[1:]:
            y, cache_entries = step_fn(params, c, tuple(cache_entries))
            outs.append(y)
        out = jnp.concatenate(outs, axis=1)
        out = causal_conv3d(params["conv1"], out, CacheBank("full"), t_pad=0)
    mu = out[..., : cfg.z_dim]
    mean = params["latent_mean"].astype(mu.dtype)
    inv_std = (1.0 / params["latent_std"]).astype(mu.dtype)
    return (mu - mean) * inv_std


def vae38_decode_core(params, cfg: WanVAEConfig, z, streaming: bool = False,
                      frames_per_chunk: int = 1):
    """Normalized latents -> patchified pixels. z: (B, T, h, w, z_dim).

    frames_per_chunk > 1 batches several latent frames per streamed
    dispatch — same causal math (the conv caches carry across chunks for
    any chunk length), but XLA's reduction order inside the larger conv
    programs differs, so outputs match the per-frame stream only to fp
    tolerance (test_wan_vae.py::test_decode_multiframe_chunks), not
    bit-exactly. Larger chunks raise MXU occupancy at the small-spatial
    decoder stages (measured on v5e: 5.6 -> ~5.1 s at 4)."""
    mean = params["latent_mean"].astype(z.dtype)
    std = params["latent_std"].astype(z.dtype)
    z = z * std + mean
    x = causal_conv3d(params["conv2"], z, CacheBank("full"), t_pad=0)
    dec_fwd = decoder38_forward if cfg.arch == "38" else decoder_v1_forward
    if not streaming:
        return _full(dec_fwd, params["decoder"], cfg, x)

    first_fn, step_fn = _chunk_fns(cfg, "dec")
    outs = []
    y, entries = first_fn(params, x[:, :1])
    outs.append(y)
    k = max(1, int(frames_per_chunk))
    for i in range(1, x.shape[1], k):
        y, entries = step_fn(params, x[:, i: i + k], tuple(entries))
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def vae38_encode(params, cfg: WanVAEConfig, video, streaming: bool = False):
    """video (B, C, T, H, W) in [-1,1] -> latents (B, z, T', H/16, W/16).

    Keeps the reference BCTHW interface (wan_video_vae.py:1298-1323)."""
    x = jnp.transpose(video, (0, 2, 3, 4, 1))  # BTHWC
    x = pixel_patchify(x, cfg.patch_size)
    mu = vae38_encode_core(params, cfg, x, streaming)
    return jnp.transpose(mu, (0, 4, 1, 2, 3))


def vae38_decode(params, cfg: WanVAEConfig, latents, streaming: bool = False,
                 clamp: bool = True, frames_per_chunk: int = 1):
    """latents (B, z, T', h, w) -> video (B, C, T, H, W) in [-1,1]."""
    z = jnp.transpose(latents, (0, 2, 3, 4, 1))
    x = vae38_decode_core(params, cfg, z, streaming,
                          frames_per_chunk=frames_per_chunk)
    x = pixel_unpatchify(x, cfg.patch_size, cfg.in_channels)
    video = jnp.transpose(x, (0, 4, 1, 2, 3))
    if clamp:
        video = jnp.clip(video, -1, 1)
    return video


# ------------------------------------------------------------------ converter
def _c3(w):  # torch OIDHW -> DHWIO
    return np.asarray(w).transpose(2, 3, 4, 1, 0)


def _c2(w):  # torch OIHW -> HWIO
    return np.asarray(w).transpose(2, 3, 1, 0)


def convert_vae_v1_state_dict(sd: Dict[str, np.ndarray], cfg: WanVAEConfig,
                              dtype=None) -> Dict[str, Any]:
    """Torch VideoVAE_ (Wan2.1) state dict -> pytree.

    Encoder3d/Decoder3d use FLAT nn.Sequential numbering mixing residual
    blocks and resamples (wan_video_vae.py:543-558, 767-783); the decoder's
    spatial upsample halves channels, so the next stage's first residual
    block sees dims[i+1]//2 inputs (":770-771").
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def conv3(prefix):
        return {"w": _c3(sd[prefix + ".weight"]), "b": np.asarray(sd[prefix + ".bias"])}

    def conv2(prefix):
        return {"w": _c2(sd[prefix + ".weight"]), "b": np.asarray(sd[prefix + ".bias"])}

    def gamma(prefix):
        return np.asarray(sd[prefix + ".gamma"]).reshape(-1)

    def res(prefix, has_shortcut):
        p = {
            "norm1": gamma(prefix + ".residual.0"),
            "conv1": conv3(prefix + ".residual.2"),
            "norm2": gamma(prefix + ".residual.3"),
            "conv2": conv3(prefix + ".residual.6"),
        }
        if has_shortcut:
            p["shortcut"] = conv3(prefix + ".shortcut")
        return p

    def attn(prefix):
        return {"norm": gamma(prefix + ".norm"),
                "qkv": conv2(prefix + ".to_qkv"),
                "proj": conv2(prefix + ".proj")}

    nmult = len(cfg.dim_mult)
    enc_dims = cfg.enc_dims
    down, idx = [], 0
    for i in range(nmult):
        blocks, in_dim = [], enc_dims[i]
        for _ in range(cfg.num_res_blocks):
            blocks.append(res(f"encoder.downsamples.{idx}", in_dim != enc_dims[i + 1]))
            in_dim = enc_dims[i + 1]
            idx += 1
        stage = {"blocks": blocks}
        if i != nmult - 1:
            rp = f"encoder.downsamples.{idx}"
            stage["resample"] = {"conv": conv2(rp + ".resample.1")}
            if i < len(cfg.temperal_downsample) and cfg.temperal_downsample[i]:
                stage["resample"]["time_conv"] = conv3(rp + ".time_conv")
            idx += 1
        down.append(stage)

    dec_dims = cfg.dec_dims
    up, idx = [], 0
    for i in range(nmult):
        in_dim = dec_dims[i] if i == 0 else dec_dims[i] // 2
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res(f"decoder.upsamples.{idx}", in_dim != dec_dims[i + 1]))
            in_dim = dec_dims[i + 1]
            idx += 1
        stage = {"blocks": blocks}
        if i != nmult - 1:
            rp = f"decoder.upsamples.{idx}"
            stage["resample"] = {"conv": conv2(rp + ".resample.1")}
            if i < len(cfg.temperal_upsample) and cfg.temperal_upsample[i]:
                stage["resample"]["time_conv"] = conv3(rp + ".time_conv")
            idx += 1
        up.append(stage)

    mean_tab = VAE16_MEAN if cfg.z_dim <= 16 else VAE38_MEAN
    std_tab = VAE16_STD if cfg.z_dim <= 16 else VAE38_STD
    params = {
        "encoder": {
            "conv1": conv3("encoder.conv1"),
            "down": down,
            "middle": {
                "res1": res("encoder.middle.0", False),
                "attn": attn("encoder.middle.1"),
                "res2": res("encoder.middle.2", False),
            },
            "head": {"norm": gamma("encoder.head.0"), "conv": conv3("encoder.head.2")},
        },
        "conv1": conv3("conv1"),
        "conv2": conv3("conv2"),
        "decoder": {
            "conv1": conv3("decoder.conv1"),
            "middle": {
                "res1": res("decoder.middle.0", False),
                "attn": attn("decoder.middle.1"),
                "res2": res("decoder.middle.2", False),
            },
            "up": up,
            "head": {"norm": gamma("decoder.head.0"), "conv": conv3("decoder.head.2")},
        },
        "latent_mean": mean_tab[: cfg.z_dim].copy(),
        "latent_std": std_tab[: cfg.z_dim].copy(),
    }
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)


def convert_vae38_state_dict(sd: Dict[str, np.ndarray], cfg: WanVAEConfig,
                             dtype=None) -> Dict[str, Any]:
    """Torch VideoVAE38_ state dict (optionally 'model.'-prefixed) -> pytree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def conv3(prefix):
        return {"w": _c3(sd[prefix + ".weight"]), "b": np.asarray(sd[prefix + ".bias"])}

    def conv2(prefix):
        return {"w": _c2(sd[prefix + ".weight"]), "b": np.asarray(sd[prefix + ".bias"])}

    def gamma(prefix):
        return np.asarray(sd[prefix + ".gamma"]).reshape(-1)

    def res(prefix, has_shortcut):
        p = {
            "norm1": gamma(prefix + ".residual.0"),
            "conv1": conv3(prefix + ".residual.2"),
            "norm2": gamma(prefix + ".residual.3"),
            "conv2": conv3(prefix + ".residual.6"),
        }
        if has_shortcut:
            p["shortcut"] = conv3(prefix + ".shortcut")
        return p

    def attn(prefix):
        return {
            "norm": gamma(prefix + ".norm"),
            "qkv": conv2(prefix + ".to_qkv"),
            "proj": conv2(prefix + ".proj"),
        }

    enc_dims = cfg.enc_dims
    down = []
    for i in range(len(cfg.dim_mult)):
        pre = f"encoder.downsamples.{i}"
        blocks = []
        in_dim = enc_dims[i]
        for j in range(cfg.num_res_blocks):
            blocks.append(res(f"{pre}.downsamples.{j}", in_dim != enc_dims[i + 1]))
            in_dim = enc_dims[i + 1]
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            rp = f"{pre}.downsamples.{cfg.num_res_blocks}"
            stage["resample"] = {"conv": conv2(rp + ".resample.1")}
            if cfg.temperal_downsample[i]:
                stage["resample"]["time_conv"] = conv3(rp + ".time_conv")
        down.append(stage)

    dec_dims = cfg.dec_dims
    up = []
    for i in range(len(cfg.dim_mult)):
        pre = f"decoder.upsamples.{i}"
        blocks = []
        in_dim = dec_dims[i]
        for j in range(cfg.num_res_blocks + 1):
            blocks.append(res(f"{pre}.upsamples.{j}", in_dim != dec_dims[i + 1]))
            in_dim = dec_dims[i + 1]
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            rp = f"{pre}.upsamples.{cfg.num_res_blocks + 1}"
            stage["resample"] = {"conv": conv2(rp + ".resample.1")}
            if cfg.temperal_upsample[i]:
                stage["resample"]["time_conv"] = conv3(rp + ".time_conv")
        up.append(stage)

    params = {
        "encoder": {
            "conv1": conv3("encoder.conv1"),
            "down": down,
            "middle": {
                "res1": res("encoder.middle.0", False),
                "attn": attn("encoder.middle.1"),
                "res2": res("encoder.middle.2", False),
            },
            "head": {"norm": gamma("encoder.head.0"), "conv": conv3("encoder.head.2")},
        },
        "conv1": conv3("conv1"),
        "conv2": conv3("conv2"),
        "decoder": {
            "conv1": conv3("decoder.conv1"),
            "middle": {
                "res1": res("decoder.middle.0", False),
                "attn": attn("decoder.middle.1"),
                "res2": res("decoder.middle.2", False),
            },
            "up": up,
            "head": {"norm": gamma("decoder.head.0"), "conv": conv3("decoder.head.2")},
        },
        "latent_mean": VAE38_MEAN[: cfg.z_dim].copy(),
        "latent_std": VAE38_STD[: cfg.z_dim].copy(),
    }
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


def init_vae_params(cfg: WanVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Structure-true zero-init params for both VAE archs (norm scales=1).

    Weightless instantiation for timing runs (``bench.py``,
    ``benchmarks/``) — the tree layouts match ``convert_vae38_state_dict``
    / ``convert_vae_v1_state_dict`` exactly, including the v1 decoder's
    channel-halving spatial resample (reference wan_video_vae.py:770-771)
    and frame-doubling time conv.
    """
    def c3(kt, kh, kw, cin, cout):
        return {"w": jnp.zeros((kt, kh, kw, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def c2(kh, kw, cin, cout):
        return {"w": jnp.zeros((kh, kw, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def res(cin, cout):
        p = {"norm1": jnp.ones((cin,), dtype), "conv1": c3(3, 3, 3, cin, cout),
             "norm2": jnp.ones((cout,), dtype), "conv2": c3(3, 3, 3, cout, cout)}
        if cin != cout:
            p["shortcut"] = c3(1, 1, 1, cin, cout)
        return p

    def attn(c):
        return {"norm": jnp.ones((c,), dtype), "qkv": c2(1, 1, c, 3 * c),
                "proj": c2(1, 1, c, c)}

    v1 = cfg.arch != "38"
    enc = cfg.enc_dims
    down = []
    for i in range(len(cfg.dim_mult)):
        blocks, cin = [], enc[i]
        for _ in range(cfg.num_res_blocks):
            blocks.append(res(cin, enc[i + 1]))
            cin = enc[i + 1]
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {"conv": c2(3, 3, enc[i + 1], enc[i + 1])}
            if i < len(cfg.temperal_downsample) and cfg.temperal_downsample[i]:
                stage["resample"]["time_conv"] = c3(3, 1, 1, enc[i + 1],
                                                    enc[i + 1])
        down.append(stage)

    dec = cfg.dec_dims
    up = []
    for i in range(len(cfg.dim_mult)):
        cin = dec[i] if (i == 0 or not v1) else dec[i] // 2
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res(cin, dec[i + 1]))
            cin = dec[i + 1]
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            d = dec[i + 1]
            stage["resample"] = {
                "conv": c2(3, 3, d, d // 2 if v1 else d)}
            if i < len(cfg.temperal_upsample) and cfg.temperal_upsample[i]:
                stage["resample"]["time_conv"] = c3(3, 1, 1, d, 2 * d)
        up.append(stage)

    z2 = cfg.z_dim * 2
    cin_ch = cfg.conv_in_channels
    return {
        "encoder": {
            "conv1": c3(3, 3, 3, cin_ch, enc[0]),
            "down": down,
            "middle": {"res1": res(enc[-1], enc[-1]), "attn": attn(enc[-1]),
                       "res2": res(enc[-1], enc[-1])},
            "head": {"norm": jnp.ones((enc[-1],), dtype),
                     "conv": c3(3, 3, 3, enc[-1], z2)},
        },
        "conv1": c3(1, 1, 1, z2, z2),
        "conv2": c3(1, 1, 1, cfg.z_dim, cfg.z_dim),
        "decoder": {
            "conv1": c3(3, 3, 3, cfg.z_dim, dec[0]),
            "middle": {"res1": res(dec[0], dec[0]), "attn": attn(dec[0]),
                       "res2": res(dec[0], dec[0])},
            "up": up,
            "head": {"norm": jnp.ones((dec[-1],), dtype),
                     "conv": c3(3, 3, 3, dec[-1], cin_ch)},
        },
        "latent_mean": jnp.asarray(
            (VAE16_MEAN if cfg.z_dim <= 16 else VAE38_MEAN)[: cfg.z_dim], dtype),
        "latent_std": jnp.asarray(
            (VAE16_STD if cfg.z_dim <= 16 else VAE38_STD)[: cfg.z_dim], dtype),
    }
