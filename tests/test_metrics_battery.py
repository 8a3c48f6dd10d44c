"""CLIP vision tower / CLIPScore / LPIPS-squeeze vs torch goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.lpips import convert_lpips_state_dict, lpips_distance
from fairygen_tpu.models.sdxl.clip import (
    CLIPVisionConfig, clip_vision_encode, convert_clip_vision_state_dict,
)
from fairygen_tpu.utils.metrics import clip_score


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_clip_vision_tower(goldens):
    g = goldens("metrics")
    cfg = CLIPVisionConfig.tiny()
    params = convert_clip_vision_state_dict(_sd(g, "cv"), cfg)
    emb = clip_vision_encode(params, cfg, jnp.asarray(g["cv_pix"]))
    np.testing.assert_allclose(np.asarray(emb), g["cv_emb"], atol=2e-5, rtol=1e-4)


def test_clip_score_composition(goldens):
    g = goldens("metrics")
    cfg = CLIPVisionConfig.tiny()
    params = convert_clip_vision_state_dict(_sd(g, "cv"), cfg)
    emb = clip_vision_encode(params, cfg, jnp.asarray(g["cv_pix"]))
    score = clip_score(emb, jnp.asarray(g["cs_txt"]))
    np.testing.assert_allclose(np.asarray(score), g["cs_score"], atol=1e-3)


@pytest.mark.slow
def test_lpips_squeeze(goldens):
    g = goldens("metrics")
    params = convert_lpips_state_dict(_sd(g, "lp"))
    d = lpips_distance(params, jnp.asarray(g["lp_a"]), jnp.asarray(g["lp_b"]))
    np.testing.assert_allclose(np.asarray(d), g["lp_dist"], atol=1e-5, rtol=1e-4)
    # identical images -> zero distance
    z = lpips_distance(params, jnp.asarray(g["lp_a"]), jnp.asarray(g["lp_a"]))
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-7)


def test_open_clip_converter_matches_hf():
    """Same tensors in OpenCLIP layout vs HF layout convert identically."""
    import jax

    from fairygen_tpu.models.sdxl.clip import (
        CLIPTextConfig,
        convert_clip_text_state_dict,
        convert_open_clip_state_dict,
    )

    rng = np.random.default_rng(0)
    vd, td, layers, heads = 16, 8, 2, 2
    p, img, vocab, ctx = 4, 8, 20, 6

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    oc = {"logit_scale": np.asarray(np.log(100.0), np.float32)}
    # visual tower
    oc["visual.conv1.weight"] = r(vd, 3, p, p)
    oc["visual.class_embedding"] = r(vd)
    oc["visual.positional_embedding"] = r((img // p) ** 2 + 1, vd)
    for n in ("visual.ln_pre", "visual.ln_post"):
        oc[n + ".weight"], oc[n + ".bias"] = r(vd), r(vd)
    oc["visual.proj"] = r(vd, 10)
    # text tower
    oc["token_embedding.weight"] = r(vocab, td)
    oc["positional_embedding"] = r(ctx, td)
    oc["ln_final.weight"], oc["ln_final.bias"] = r(td), r(td)
    oc["text_projection"] = r(td, 5)
    for tower, dim in (("visual.transformer", vd), ("transformer", td)):
        for i in range(layers):
            pre = f"{tower}.resblocks.{i}"
            oc[pre + ".attn.in_proj_weight"] = r(3 * dim, dim)
            oc[pre + ".attn.in_proj_bias"] = r(3 * dim)
            oc[pre + ".attn.out_proj.weight"] = r(dim, dim)
            oc[pre + ".attn.out_proj.bias"] = r(dim)
            for n in (".ln_1", ".ln_2"):
                oc[pre + n + ".weight"], oc[pre + n + ".bias"] = r(dim), r(dim)
            oc[pre + ".mlp.c_fc.weight"] = r(2 * dim, dim)
            oc[pre + ".mlp.c_fc.bias"] = r(2 * dim)
            oc[pre + ".mlp.c_proj.weight"] = r(dim, 2 * dim)
            oc[pre + ".mlp.c_proj.bias"] = r(dim)

    visual, text, scale = convert_open_clip_state_dict(oc)
    assert scale == 100.0

    # equivalent HF-format text state dict from the same tensors
    hf = {
        "text_model.embeddings.token_embedding.weight": oc["token_embedding.weight"],
        "text_model.embeddings.position_embedding.weight": oc["positional_embedding"],
        "text_model.final_layer_norm.weight": oc["ln_final.weight"],
        "text_model.final_layer_norm.bias": oc["ln_final.bias"],
        "text_projection.weight": oc["text_projection"].T,
    }
    for i in range(layers):
        s, t_ = f"transformer.resblocks.{i}", f"text_model.encoder.layers.{i}"
        w, b = oc[s + ".attn.in_proj_weight"], oc[s + ".attn.in_proj_bias"]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            hf[f"{t_}.self_attn.{name}.weight"] = w[j * td:(j + 1) * td]
            hf[f"{t_}.self_attn.{name}.bias"] = b[j * td:(j + 1) * td]
        hf[t_ + ".self_attn.out_proj.weight"] = oc[s + ".attn.out_proj.weight"]
        hf[t_ + ".self_attn.out_proj.bias"] = oc[s + ".attn.out_proj.bias"]
        hf[t_ + ".layer_norm1.weight"] = oc[s + ".ln_1.weight"]
        hf[t_ + ".layer_norm1.bias"] = oc[s + ".ln_1.bias"]
        hf[t_ + ".layer_norm2.weight"] = oc[s + ".ln_2.weight"]
        hf[t_ + ".layer_norm2.bias"] = oc[s + ".ln_2.bias"]
        hf[t_ + ".mlp.fc1.weight"] = oc[s + ".mlp.c_fc.weight"]
        hf[t_ + ".mlp.fc1.bias"] = oc[s + ".mlp.c_fc.bias"]
        hf[t_ + ".mlp.fc2.weight"] = oc[s + ".mlp.c_proj.weight"]
        hf[t_ + ".mlp.fc2.bias"] = oc[s + ".mlp.c_proj.bias"]

    tcfg = CLIPTextConfig.tiny(num_layers=layers, hidden_size=td,
                               num_heads=heads, intermediate_size=2 * td,
                               vocab_size=vocab, max_position_embeddings=ctx)
    text_hf = convert_clip_text_state_dict(hf, tcfg)
    jax.tree.map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
        text, text_hf,
    )
    # visual tree sanity: shapes line up with the forward's expectations
    assert visual["patch_embedding"].shape == (3 * p * p, vd)
    assert visual["visual_projection"].shape == (vd, 10)
    assert len(visual["layers"]) == layers


def test_hps_score_smoke():
    import jax

    from fairygen_tpu.models.sdxl.clip import CLIPTextConfig, CLIPVisionConfig
    from fairygen_tpu.utils.metrics import hps_score

    vcfg = CLIPVisionConfig.tiny(hidden_act="gelu")
    tcfg = CLIPTextConfig.tiny(projection_dim=16, hidden_act="gelu",
                               eos_token_id=99)
    rng = np.random.default_rng(1)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    def blockp(d, m):
        return {
            "ln1": {"w": jnp.ones(d), "b": jnp.zeros(d)},
            "ln2": {"w": jnp.ones(d), "b": jnp.zeros(d)},
            "attn": {k: {"w": r(d, d), "b": r(d)}
                     for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": {"w": r(d, m), "b": r(m)},
            "fc2": {"w": r(m, d), "b": r(d)},
        }

    d = vcfg.hidden_size
    visual = {
        "patch_embedding": r(3 * vcfg.patch_size ** 2, d),
        "class_embedding": r(d),
        "position_embedding": r((vcfg.image_size // vcfg.patch_size) ** 2 + 1, d),
        "pre_layernorm": {"w": jnp.ones(d), "b": jnp.zeros(d)},
        "post_layernorm": {"w": jnp.ones(d), "b": jnp.zeros(d)},
        "visual_projection": r(d, vcfg.projection_dim),
        "layers": [blockp(d, vcfg.intermediate_size)
                   for _ in range(vcfg.num_layers)],
    }
    td = tcfg.hidden_size
    text = {
        "token_embedding": r(tcfg.vocab_size, td),
        "position_embedding": r(tcfg.max_position_embeddings, td),
        "final_layer_norm": {"w": jnp.ones(td), "b": jnp.zeros(td)},
        "text_projection": r(td, 16),
        "layers": [blockp(td, tcfg.intermediate_size)
                   for _ in range(tcfg.num_layers)],
    }
    img = (np.random.default_rng(2).random((40, 48, 3)) * 255).astype(np.uint8)
    ids = np.array([[1, 5, 7, 99, 0, 0]], np.int32)
    s = hps_score(img, ids, visual, vcfg, text, tcfg)
    assert -1.0 <= s <= 1.0
