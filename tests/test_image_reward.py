"""ImageReward (BLIP) parity.

Text side goldens against transformers' BlipTextModel (the med-BERT the
original BLIP/ImageReward uses, ported by HF); vision side against an
independent timm-style ViT double; the full scorer drives the converter
from a state dict using the published ImageReward-v1.0 naming.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from fairygen_tpu.models.image_reward import (  # noqa: E402
    BlipViTConfig,
    MedBertConfig,
    blip_vit_forward,
    convert_image_reward_state_dict,
    image_reward_score,
    med_bert_forward,
)


# ---- torch timm-style ViT double (blip.py VisionTransformer) ----
class TimmViT(nn.Module):
    def __init__(self, cfg: BlipViTConfig):
        super().__init__()
        d = cfg.hidden_size
        n = (cfg.image_size // cfg.patch_size) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, cfg.patch_size,
                                          stride=cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(cfg.num_layers):
            b = nn.Module()
            b.norm1 = nn.LayerNorm(d, eps=1e-6)
            b.attn = nn.Module()
            b.attn.qkv = nn.Linear(d, 3 * d)
            b.attn.proj = nn.Linear(d, d)
            b.norm2 = nn.LayerNorm(d, eps=1e-6)
            b.mlp = nn.Module()
            b.mlp.fc1 = nn.Linear(d, int(d * cfg.mlp_ratio))
            b.mlp.fc2 = nn.Linear(int(d * cfg.mlp_ratio), d)
            self.blocks.append(b)
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.num_heads = cfg.num_heads

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed[:, : x.shape[1]]
        for b in self.blocks:
            h = b.norm1(x)
            qkv = b.attn.qkv(h)
            q, k, v = qkv.chunk(3, dim=-1)

            def heads(t):
                return t.view(B, t.shape[1], self.num_heads, -1).transpose(1, 2)

            att = (heads(q) @ heads(k).transpose(-2, -1)) * (
                (q.shape[-1] // self.num_heads) ** -0.5)
            o = (att.softmax(-1) @ heads(v)).transpose(1, 2).reshape(
                B, q.shape[1], -1)
            x = x + b.attn.proj(o)
            x = x + b.mlp.fc2(nn.functional.gelu(b.mlp.fc1(b.norm2(x))))
        return self.norm(x)


def _vit_sd(model, prefix="blip.visual_encoder."):
    return {prefix + k: v.detach().numpy() for k, v in
            model.state_dict().items()}


@pytest.mark.slow
def test_blip_vit_matches_torch():
    torch.manual_seed(0)
    cfg = BlipViTConfig.tiny()
    m = TimmViT(cfg)
    m.eval()
    sd = _vit_sd(m)
    # convert via the full converter (needs text keys too -> use direct path)
    x = torch.randn(2, 3, cfg.image_size, cfg.image_size)
    with torch.no_grad():
        ref = m(x).numpy()
    # build full fake ckpt with a minimal text side so the converter runs
    tcfg = MedBertConfig.tiny()
    text = _tiny_blip_text(tcfg)
    sd.update({f"blip.text_encoder.{k}": v.detach().numpy()
               for k, v in text.state_dict().items()
               if "position_ids" not in k})
    sd.update(_mlp_sd(tcfg.hidden_size))
    params, vit_cfg, _ = convert_image_reward_state_dict(sd)
    assert vit_cfg.num_layers == cfg.num_layers
    assert vit_cfg.patch_size == cfg.patch_size
    got = blip_vit_forward(
        dict(params["visual_encoder"]),
        BlipViTConfig.tiny(),  # tiny heads (converter guesses for full size)
        jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def _tiny_blip_text(tcfg: MedBertConfig):
    from transformers.models.blip.configuration_blip import BlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    cfg = BlipTextConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        num_hidden_layers=tcfg.num_layers,
        num_attention_heads=tcfg.num_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        encoder_hidden_size=tcfg.encoder_width,
        is_decoder=True,  # creates the cross-attention modules
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    m = BlipTextModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


def _mlp_sd(hidden):
    torch.manual_seed(2)
    dims = [(hidden, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    out = {}
    for idx, (i, o) in zip((0, 2, 4, 6, 7), dims):
        out[f"mlp.layers.{idx}.weight"] = torch.randn(o, i).numpy() * 0.05
        out[f"mlp.layers.{idx}.bias"] = torch.randn(o).numpy() * 0.05
    return out


@pytest.mark.slow
def test_med_bert_matches_blip_text_model():
    tcfg = MedBertConfig.tiny()
    m = _tiny_blip_text(tcfg)
    sd = {f"blip.text_encoder.{k}": v.detach().numpy()
          for k, v in m.state_dict().items() if "position_ids" not in k}
    # converter needs vision keys: add a tiny vision side
    vcfg = BlipViTConfig.tiny()
    sd.update(_vit_sd(TimmViT(vcfg)))
    sd.update(_mlp_sd(tcfg.hidden_size))
    params, _, bert_cfg = convert_image_reward_state_dict(sd)
    assert bert_cfg.num_layers == tcfg.num_layers
    assert bert_cfg.intermediate_size == tcfg.intermediate_size

    ids = torch.randint(0, tcfg.vocab_size, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 6:] = 0
    enc = torch.randn(2, 5, tcfg.encoder_width)
    with torch.no_grad():
        ref = m(input_ids=ids, attention_mask=mask,
                encoder_hidden_states=enc,
                encoder_attention_mask=torch.ones(2, 5, dtype=torch.long),
                is_decoder=False, return_dict=True).last_hidden_state.numpy()
    got = med_bert_forward(params["text_encoder"], tcfg,
                           jnp.asarray(ids.numpy()),
                           jnp.asarray(mask.numpy()),
                           jnp.asarray(enc.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_image_reward_score_end_to_end():
    vcfg, tcfg = BlipViTConfig.tiny(), MedBertConfig.tiny()
    vit = TimmViT(vcfg)
    txt = _tiny_blip_text(tcfg)
    sd = _vit_sd(vit)
    sd.update({f"blip.text_encoder.{k}": v.detach().numpy()
               for k, v in txt.state_dict().items()
               if "position_ids" not in k})
    sd.update(_mlp_sd(tcfg.hidden_size))
    params, _, _ = convert_image_reward_state_dict(sd)

    ids = np.array([[2, 5, 9, 3, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    pix = np.random.default_rng(3).standard_normal(
        (1, 3, vcfg.image_size, vcfg.image_size)).astype(np.float32)
    score = image_reward_score(params, jnp.asarray(pix), ids, mask,
                               vit_cfg=vcfg, bert_cfg=tcfg)
    assert score.shape == (1,)
    # torch reference composition
    with torch.no_grad():
        emb = vit(torch.tensor(pix))
        feat = txt(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long),
                   encoder_hidden_states=emb,
                   encoder_attention_mask=torch.ones(1, emb.shape[1],
                                                     dtype=torch.long),
                   is_decoder=False,
                   return_dict=True).last_hidden_state[:, 0, :]
        h = feat
        dims = [(tcfg.hidden_size, 1024), (1024, 128), (128, 64), (64, 16),
                (16, 1)]
        torch.manual_seed(2)
        for idx, (i, o) in zip((0, 2, 4, 6, 7), dims):
            w = torch.randn(o, i) * 0.05
            b = torch.randn(o) * 0.05
            h = h @ w.T + b
        from fairygen_tpu.models.image_reward import (
            IMAGE_REWARD_MEAN, IMAGE_REWARD_STD,
        )

        ref = ((h[..., 0] - IMAGE_REWARD_MEAN) / IMAGE_REWARD_STD).numpy()
    np.testing.assert_allclose(np.asarray(score), ref, atol=1e-5, rtol=1e-4)
