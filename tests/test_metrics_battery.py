"""CLIP vision tower / CLIPScore / LPIPS-squeeze vs torch goldens."""
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


def test_lpips_squeeze(goldens):
    g = goldens("metrics")
    params = convert_lpips_state_dict(_sd(g, "lp"))
    d = lpips_distance(params, jnp.asarray(g["lp_a"]), jnp.asarray(g["lp_b"]))
    np.testing.assert_allclose(np.asarray(d), g["lp_dist"], atol=1e-5, rtol=1e-4)
    # identical images -> zero distance
    z = lpips_distance(params, jnp.asarray(g["lp_a"]), jnp.asarray(g["lp_a"]))
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-7)
