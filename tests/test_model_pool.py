"""ModelPool hash detection + from_pretrained wiring."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.core.io import save_safetensors
from fairygen_tpu.core.model_pool import ModelPool
from fairygen_tpu.core.registry import MODEL_REGISTRY


def test_registry_contains_reference_hashes():
    # TI2V-5B DiT hash from the reference table (configs/model_configs.py)
    specs = MODEL_REGISTRY.lookup("1f5ab7703c6fc803fdded85ff040c316")
    assert specs and specs[0].model_name == "wan_video_dit"
    assert specs[0].extra_kwargs["dim"] == 3072
    assert specs[0].extra_kwargs["seperated_timestep"] is True
    # UMT5 + VAE hashes present
    assert MODEL_REGISTRY.lookup("9c8818c2cbea55eca56c7b447df170da")
    assert MODEL_REGISTRY.lookup("e1de6c02cdac79f8b739f4d3698cd216")
    assert len(MODEL_REGISTRY.known_names) >= 30


def test_pool_loads_with_hints(tmp_path, goldens):
    g = goldens("wan_pipeline")
    dit_sd = {k[5:]: g[k] for k in g.files if k.startswith("dit::")}
    path = str(tmp_path / "dit.safetensors")
    save_safetensors(path, dit_sd)
    extra = dict(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    pool = ModelPool().load([path], dtype=jnp.float32,
                            hints={path: ("wan_video_dit", extra)})
    params, cfg = pool.fetch_model("wan_video_dit")
    assert cfg.dim == 96
    assert params["blocks"]["modulation"].shape[0] == 2


def test_env_model_hints(tmp_path, goldens, monkeypatch):
    """FAIRYGEN_MODEL_HINTS: a JSON file of path -> [name, extra_kwargs]
    lets every CLI load resized/custom checkpoints (tiny CI models,
    finetunes with changed dims) without per-CLI hint plumbing."""
    import json

    g = goldens("wan_pipeline")
    dit_sd = {k[5:]: g[k] for k in g.files if k.startswith("dit::")}
    path = str(tmp_path / "dit.safetensors")
    save_safetensors(path, dit_sd)
    extra = dict(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=[1, 2, 2], num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    hints_file = tmp_path / "hints.json"
    hints_file.write_text(json.dumps({path: ["wan_video_dit", extra]}))
    monkeypatch.setenv("FAIRYGEN_MODEL_HINTS", str(hints_file))
    pool = ModelPool().load([path], dtype=jnp.float32)
    params, cfg = pool.fetch_model("wan_video_dit")
    assert cfg.dim == 96 and cfg.patch_size == (1, 2, 2)


def test_env_model_hints_umt5_and_vae_extra_kwargs(tmp_path, goldens, monkeypatch):
    """The umt5/vae builders honor resized extra_kwargs (tiny configs)."""
    import json

    gu = goldens("umt5")
    te_sd = {k[4:]: gu[k] for k in gu.files if k.startswith("sd::")}
    te_path = str(tmp_path / "umt5.safetensors")
    save_safetensors(te_path, te_sd)
    gv = goldens("wan_pipeline")
    vae_sd = {k[5:]: gv[k] for k in gv.files if k.startswith("vae::")}
    vae_path = str(tmp_path / "vae.safetensors")
    save_safetensors(vae_path, vae_sd)
    hints_file = tmp_path / "hints.json"
    hints_file.write_text(json.dumps({
        te_path: ["wan_video_text_encoder", dict(
            vocab=128, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
            num_layers=2)],
        vae_path: ["wan_video_vae", dict(
            dim=8, z_dim=4, dec_dim=8, num_res_blocks=1)],
    }))
    monkeypatch.setenv("FAIRYGEN_MODEL_HINTS", str(hints_file))
    pool = ModelPool().load([te_path, vae_path], dtype=jnp.float32)
    _, te_cfg = pool.fetch_model("wan_video_text_encoder")
    assert te_cfg.dim == 32 and te_cfg.num_layers == 2
    _, vae_cfg = pool.fetch_model("wan_video_vae")
    assert vae_cfg.z_dim == 4 and vae_cfg.arch == "38"


@pytest.mark.slow
def test_from_pretrained_with_hints(tmp_path, goldens):
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline

    g = goldens("wan_pipeline")
    dit_sd = {k[5:]: g[k] for k in g.files if k.startswith("dit::")}
    vae_sd = {k[5:]: g[k] for k in g.files if k.startswith("vae::")}
    p1 = str(tmp_path / "dit.safetensors")
    save_safetensors(p1, dit_sd)
    extra = dict(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    pipe = WanVideoPipeline.from_pretrained(
        [p1], dtype=jnp.float32, hints={p1: ("wan_video_dit", extra)}
    )
    assert pipe.dit_cfg.dim == 96 and pipe.vae_params is None
    lat = pipe(
        context=jnp.zeros((1, 6, 32)), cfg_scale=1.0, seed=0,
        height=32, width=32, num_frames=5, num_inference_steps=2,
        output_type="latents",
    )
    assert lat.shape == (1, 4, 2, 2, 2)


def test_inspect_checkpoint_tool(tmp_path):
    """tools/inspect_checkpoint.py: reports hash + registry verdict; exits
    0 on a registry hash match, 1 otherwise."""
    import importlib.util
    import io as io_mod
    import os
    from contextlib import redirect_stdout

    import numpy as np
    from safetensors.numpy import save_file

    from fairygen_tpu.core.io import hash_state_dict_keys
    from fairygen_tpu.core.registry import MODEL_REGISTRY, ModelSpec

    spec = importlib.util.spec_from_file_location(
        "inspect_checkpoint", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "inspect_checkpoint.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    sd = {"blocks.0.w": np.zeros((4, 4), np.float32)}
    p = tmp_path / "toy.safetensors"
    save_file(sd, str(p))

    out = io_mod.StringIO()
    with redirect_stdout(out):
        matched = tool.inspect(str(p))
    assert not matched
    assert "NO registry match" in out.getvalue()
    assert "blocks.*" in out.getvalue()

    # register the hash -> tool reports the match
    h = hash_state_dict_keys(sd)
    MODEL_REGISTRY._by_hash.setdefault(h, []).append(
        ModelSpec(model_hash=h, model_name="toy_model", extra_kwargs={}))
    try:
        out = io_mod.StringIO()
        with redirect_stdout(out):
            matched = tool.inspect(str(p))
        assert matched
        assert "toy_model" in out.getvalue()
    finally:
        MODEL_REGISTRY._by_hash.pop(h, None)
