"""Wav2Vec2 audio feature extractor (XLSR-53 large) — TPU-native JAX port.

The reference's ``WanS2VAudioEncoder`` wraps transformers' ``Wav2Vec2ForCTC``
with the facebook/wav2vec2-large-xlsr-53 config and uses it purely as a
feature extractor: run the waveform through the model and collect ALL 25
hidden states (conv-projected embeddings + 24 transformer layers), then
linearly resample the 50 Hz feature track to the 30 Hz video rate
(``animation/diffsynth/models/wav2vec.py:45-112``).

Architecture (transformers ``Wav2Vec2Model``, ``do_stable_layer_norm=True``,
``feat_extract_norm='layer'``):

  * 7-layer conv feature encoder over the raw 16 kHz waveform
    (kernels 10/3/3/3/3/2/2, strides 5/2/2/2/2/2/2 -> one frame per 320
    samples = 50 fps), each conv followed by channel LayerNorm + exact GELU;
  * feature projection: LayerNorm + Linear(512 -> 1024);
  * grouped conv positional embedding (kernel 128, groups 16, same-pad with
    one trailing frame dropped for the even kernel) + GELU, added residually;
  * 24 pre-norm ("stable layer norm") transformer layers: LN -> MHA (16
    heads, biased projections) -> residual; LN -> GELU MLP (4096) -> residual;
  * a final LayerNorm applied after the last layer.

Hidden-state indexing matches transformers exactly: state 0 is the
pos-conv-augmented projection, states 1..23 are the inputs to layers 1..23,
and state 24 is the final layer output *after* the closing LayerNorm.

All math is fp32 (the reference runs the audio tower in fp32 too); the
tensor layout is NWC so the convs map directly onto XLA's TPU conv path.
Inference-only (dropout/LayerDrop/SpecAugment are eval no-ops).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.norms import layer_norm
from .s2v import get_audio_embed_bucket_fps, linear_interpolation_np


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """facebook/wav2vec2-large-xlsr-53 (reference wav2vec.py:50-98)."""

    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _conv1d_nwc(x, w, b=None, stride=1, padding=(0, 0), groups=1):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), (padding,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _attention(p, x, num_heads: int):
    """Standard biased MHA, fp32 softmax (transformers Wav2Vec2Attention)."""
    b, t, c = x.shape
    d = c // num_heads

    def split(h):
        return h.reshape(b, t, num_heads, d)

    q = split(_dense(p["q"], x)) * (d ** -0.5)
    k = split(_dense(p["k"], x))
    v = split(_dense(p["v"], x))
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, t, c)
    return _dense(p["o"], o)


def wav2vec2_all_hidden_states(params, cfg: Wav2Vec2Config, input_values):
    """input_values (B, T) normalized waveform -> (L+1, B, T', hidden).

    Equivalent of ``Wav2Vec2Model(..., output_hidden_states=True)`` in eval
    mode (reference wav2vec.py:102-112 stacks exactly these)."""
    x = input_values.astype(jnp.float32)[..., None]  # (B, T, 1)
    for conv, stride in zip(params["conv_layers"], cfg.conv_stride):
        x = _conv1d_nwc(x, conv["conv"]["w"], conv["conv"].get("b"),
                        stride=stride)
        x = layer_norm(x, cfg.layer_norm_eps, conv["ln"]["w"], conv["ln"]["b"])
        x = _gelu(x)

    # feature projection
    x = layer_norm(x, cfg.layer_norm_eps, params["fp_ln"]["w"],
                   params["fp_ln"]["b"])
    x = _dense(params["fp_proj"], x)

    # grouped-conv positional embedding (same pad, even kernel drops the
    # trailing frame)
    k = cfg.num_conv_pos_embeddings
    pos = _conv1d_nwc(x, params["pos_conv"]["w"], params["pos_conv"]["b"],
                      padding=(k // 2, k // 2),
                      groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + _gelu(pos)

    def body(h, layer):
        pre = h
        y = layer_norm(h, cfg.layer_norm_eps, layer["ln1"]["w"],
                       layer["ln1"]["b"])
        h = h + _attention(layer, y, cfg.num_attention_heads)
        y = layer_norm(h, cfg.layer_norm_eps, layer["ln2"]["w"],
                       layer["ln2"]["b"])
        h = h + _dense(layer["ffn2"], _gelu(_dense(layer["ffn1"], y)))
        return h, pre

    x, pre_states = lax.scan(body, x, params["layers"])
    x = layer_norm(x, cfg.layer_norm_eps, params["final_ln"]["w"],
                   params["final_ln"]["b"])
    return jnp.concatenate([pre_states, x[None]], axis=0)


def normalize_waveform(waveform: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor zero-mean / unit-variance normalization
    (the reference's ``processor(input_audio, ...)`` call, wav2vec.py:103)."""
    x = np.asarray(waveform, np.float32).reshape(-1)
    return (x - x.mean()) / np.sqrt(x.var() + 1e-7)


def resample_waveform(waveform: np.ndarray, sample_rate: int,
                      target_rate: int = 16000) -> np.ndarray:
    if sample_rate == target_rate:
        return np.asarray(waveform, np.float32).reshape(-1)
    x = np.asarray(waveform, np.float32).reshape(-1)
    n_out = int(round(len(x) * target_rate / sample_rate))
    t_in = np.arange(len(x)) / sample_rate
    t_out = np.arange(n_out) / target_rate
    return np.interp(t_out, t_in, x).astype(np.float32)


def extract_audio_feat(params, cfg: Wav2Vec2Config, waveform,
                       sample_rate: int = 16000,
                       video_rate: int = 30) -> np.ndarray:
    """waveform (T,) -> (25, T@video_rate, hidden) fp32 numpy
    (reference ``extract_audio_feat`` with return_all_layers=True,
    wav2vec.py:102-112; feature frame rate is 50 fps at 16 kHz)."""
    x = normalize_waveform(resample_waveform(waveform, sample_rate))
    states = wav2vec2_all_hidden_states(params, cfg, jnp.asarray(x)[None])
    feat = np.asarray(states)[:, 0]  # (L+1, T', hidden)
    return linear_interpolation_np(feat, input_fps=50, output_fps=video_rate)


def audio_embeds_from_waveform(params, cfg: Wav2Vec2Config, waveform,
                               sample_rate: int = 16000, num_frames: int = 81,
                               fps: int = 16, m: int = 0,
                               video_rate: int = 30) -> List[np.ndarray]:
    """Full ``get_audio_feats_per_inference`` (wav2vec.py:186-191): returns a
    list of (1, 25, hidden·(2m+1), num_frames-1) buckets, one per
    inference segment of the (possibly long) audio clip."""
    batch_frames = num_frames - 1
    feat = extract_audio_feat(params, cfg, waveform, sample_rate, video_rate)
    bucket, n = get_audio_embed_bucket_fps(feat, fps=fps,
                                           batch_frames=batch_frames, m=m,
                                           video_rate=video_rate)
    emb = bucket[None].transpose(0, 2, 3, 1).astype(np.float32)
    return [emb[..., i * batch_frames:(i + 1) * batch_frames]
            for i in range(n)]


# --------------------------------------------------------------- converter
def _resolve_weight_norm(sd, prefix: str) -> np.ndarray:
    """Materialize a torch weight_norm(dim=2) conv weight from either the
    legacy ``weight_g``/``weight_v`` or the parametrize
    ``parametrizations.weight.original{0,1}`` layouts."""
    if prefix + ".weight" in sd:
        return np.asarray(sd[prefix + ".weight"])
    if prefix + ".weight_g" in sd:
        g = np.asarray(sd[prefix + ".weight_g"])
        v = np.asarray(sd[prefix + ".weight_v"])
    else:
        g = np.asarray(sd[prefix + ".parametrizations.weight.original0"])
        v = np.asarray(sd[prefix + ".parametrizations.weight.original1"])
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(v.dtype)


def convert_wav2vec2_state_dict(sd: Dict[str, np.ndarray],
                                cfg: Optional[Wav2Vec2Config] = None,
                                dtype=np.float32) -> Dict[str, Any]:
    """transformers ``Wav2Vec2ForCTC``/``Wav2Vec2Model`` state dict (with
    optional ``model.`` / ``wav2vec2.`` prefixes) -> our params pytree."""
    cfg = cfg or Wav2Vec2Config()
    for pre in ("model.", "wav2vec2."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}

    def g(name):
        return np.asarray(sd[name]).astype(dtype)

    def lw(name):
        return {"w": g(name + ".weight").T, "b": g(name + ".bias")}

    def ln(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}"
        p = {"conv": {"w": g(pre + ".conv.weight").transpose(2, 1, 0)},
             "ln": ln(pre + ".layer_norm")}
        if cfg.conv_bias:
            p["conv"]["b"] = g(pre + ".conv.bias")
        conv_layers.append(p)

    pos_w = _resolve_weight_norm(sd, "encoder.pos_conv_embed.conv")
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layers.append({
            "ln1": ln(pre + ".layer_norm"),
            "q": lw(pre + ".attention.q_proj"),
            "k": lw(pre + ".attention.k_proj"),
            "v": lw(pre + ".attention.v_proj"),
            "o": lw(pre + ".attention.out_proj"),
            "ln2": ln(pre + ".final_layer_norm"),
            "ffn1": lw(pre + ".feed_forward.intermediate_dense"),
            "ffn2": lw(pre + ".feed_forward.output_dense"),
        })
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)

    return {
        "conv_layers": conv_layers,
        "fp_ln": ln("feature_projection.layer_norm"),
        "fp_proj": lw("feature_projection.projection"),
        "pos_conv": {"w": pos_w.astype(dtype).transpose(2, 1, 0),
                     "b": g("encoder.pos_conv_embed.conv.bias")},
        "layers": stacked,
        "final_ln": ln("encoder.layer_norm"),
    }


def init_wav2vec2_params(rng: np.random.RandomState,
                         cfg: Wav2Vec2Config) -> Dict[str, Any]:
    """Random params in our layout (tests / shape checks)."""
    def w(*shape, scale=0.02):
        return rng.normal(0, scale, shape).astype(np.float32)

    def lw(din, dout):
        return {"w": w(din, dout), "b": np.zeros(dout, np.float32)}

    def ln(d):
        return {"w": np.ones(d, np.float32), "b": np.zeros(d, np.float32)}

    conv_layers = []
    cin = 1
    for cout, k in zip(cfg.conv_dim, cfg.conv_kernel):
        p = {"conv": {"w": w(k, cin, cout, scale=0.1)}, "ln": ln(cout)}
        if cfg.conv_bias:
            p["conv"]["b"] = np.zeros(cout, np.float32)
        conv_layers.append(p)
        cin = cout
    h, f = cfg.hidden_size, cfg.intermediate_size
    layers = [{
        "ln1": ln(h), "q": lw(h, h), "k": lw(h, h), "v": lw(h, h),
        "o": lw(h, h), "ln2": ln(h), "ffn1": lw(h, f), "ffn2": lw(f, h),
    } for _ in range(cfg.num_hidden_layers)]
    return {
        "conv_layers": conv_layers,
        "fp_ln": ln(cfg.conv_dim[-1]),
        "fp_proj": lw(cfg.conv_dim[-1], h),
        "pos_conv": {
            "w": w(cfg.num_conv_pos_embeddings,
                   h // cfg.num_conv_pos_embedding_groups, h, scale=0.05),
            "b": np.zeros(h, np.float32)},
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_ln": ln(h),
    }
