"""FluxLoRAEncoder + LoraMerger + hot-LoRA runtime parity
(tools/gen_goldens_flux_lora_runtime.py).  The hot (unfused) path is also
checked self-consistently against fuse-at-load: base + sum x@Aᵀ@Bᵀ must
equal running with W += A@B folded in."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import FluxDiTConfig, init_flux_dit_params
from fairygen_tpu.models.flux.lora_runtime import (
    FluxLoRAEncoderConfig,
    convert_flux_lora_encoder_state_dict,
    convert_lora_merger_state_dict,
    flux_lora_encoder_forward,
    lora_merger_apply,
    stack_hot_lora,
)

CFG = FluxDiTConfig.tiny()
ENC_CFG = FluxLoRAEncoderConfig(
    embed_dim=64, intermediate_size=128, num_encoder_layers=1, num_heads=4,
    head_dim=16, num_embeds_per_lora=4, num_special_embeds=1,
    num_double_blocks=2, num_single_blocks=2, dim=96)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_lora_runtime.npz")


def test_lora_encoder_matches_reference(g):
    params, _ = convert_flux_lora_encoder_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("enc.")}, ENC_CFG)
    lora = {k[5:]: g[k] for k in g.files if k.startswith("lora.")}
    emb = flux_lora_encoder_forward(params, ENC_CFG, lora)
    np.testing.assert_allclose(np.asarray(emb), g["emb"], atol=2e-5,
                               rtol=1e-4)


def test_lora_merger_matches_reference(g):
    p = convert_lora_merger_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("mg.")})
    out = lora_merger_apply(jax.tree.map(jnp.asarray, p),
                            jnp.asarray(g["base"]), jnp.asarray(g["loras"]))
    np.testing.assert_allclose(np.asarray(out), g["merged"], atol=2e-5,
                               rtol=1e-4)


def test_pipeline_hot_lora_and_encoder(g):
    """Hot LoRAs (merger-gated) + encoder tokens through the pipeline."""
    from fairygen_tpu.models.flux.lora_runtime import (
        convert_lora_merger_state_dict,
    )
    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

    rng = np.random.default_rng(11)
    params = init_flux_dit_params(jax.random.PRNGKey(1), CFG)
    enc_p, _ = convert_flux_lora_encoder_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("enc.")}, ENC_CFG)
    merger = convert_lora_merger_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("mg.")})
    # dim-16 merger params don't fit the tiny dit widths; build per-layer
    # mergers of the right width from broadcasts
    lora = {k[5:]: g[k] for k in g.files if k.startswith("lora.")}
    import jax.numpy as _jnp

    def fit(dim):
        return jax.tree.map(
            lambda a: _jnp.asarray(np.resize(np.asarray(a), (dim,)),
                                   _jnp.float32), merger)

    from fairygen_tpu.models.flux.lora_runtime import (
        DOUBLE_LORA_DIMS,
        SINGLE_LORA_DIMS,
        _scaled_dims,
    )

    patcher = {}
    for i in range(2):
        for s, (_, dout) in _scaled_dims(DOUBLE_LORA_DIMS, CFG).items():
            patcher[f"blocks.{i}.{s}"] = fit(dout)
        for s, (_, dout) in _scaled_dims(SINGLE_LORA_DIMS, CFG).items():
            patcher[f"single_blocks.{i}.{s}"] = fit(dout)

    # ENC_CFG uses a 64-wide embed; the tiny dit wants context_dim 48 —
    # mismatch is fine for the encoder call itself, so only test the hot
    # path through the pipeline and the encoder standalone above.
    pipe = FluxImagePipeline(dit_params=params, dit_cfg=CFG,
                             lora_patcher=(patcher, None),
                             dtype=jnp.float32)
    pipe.load_hot_loras([lora], use_merger=True)
    pe = jnp.asarray(rng.standard_normal((1, 6, 48)), jnp.float32)
    pl = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    lat = pipe(prompt_emb=pe, pooled_prompt_emb=pl,
               latents=rng.standard_normal((1, 4, 8, 12)).astype("float32"),
               height=64, width=96, num_inference_steps=2,
               output_type="latent")
    assert lat.shape == (1, 4, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()


def test_hot_lora_matches_fused():
    """Without a merger, hot LoRAs must reproduce fuse-at-load exactly."""
    from fairygen_tpu.models.flux.dit import flux_dit_forward

    rng = np.random.default_rng(7)
    params = init_flux_dit_params(jax.random.PRNGKey(0), CFG)
    lora = {}
    for fam, n, dims in (("blocks", 2,
                          {"attn.a_to_qkv": (96, 288),
                           "ff_a.0": (96, 384)}),
                         ("single_blocks", 2, {"to_qkv_mlp": (96, 672)})):
        for i in range(n):
            for s, (din, dout) in dims.items():
                lora[f"{fam}.{i}.{s}.lora_A.weight"] = (
                    rng.standard_normal((2, din)) * 0.1).astype("float32")
                lora[f"{fam}.{i}.{s}.lora_B.weight"] = (
                    rng.standard_normal((dout, 2)) * 0.1).astype("float32")
    hot = stack_hot_lora([lora], CFG)

    fused = jax.tree.map(lambda a: a, params)
    for i in range(2):
        for s, path in (("attn.a_to_qkv", ("double_blocks", "attn",
                                           "a_qkv")),
                        ("ff_a.0", ("double_blocks", "ff_a", "fc1"))):
            d = (lora[f"blocks.{i}.{s}.lora_A.weight"].T
                 @ lora[f"blocks.{i}.{s}.lora_B.weight"].T)
            node = fused
            for k in path[:-1]:
                node = node[k]
            node[path[-1]]["w"] = node[path[-1]]["w"].at[i].add(d)
        d = (lora[f"single_blocks.{i}.to_qkv_mlp.lora_A.weight"].T
             @ lora[f"single_blocks.{i}.to_qkv_mlp.lora_B.weight"].T)
        fused["single_blocks"]["to_qkv_mlp"]["w"] = \
            fused["single_blocks"]["to_qkv_mlp"]["w"].at[i].add(d)

    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 12)), jnp.float32)
    t = jnp.asarray([500.0])
    pe = jnp.asarray(rng.standard_normal((1, 6, 48)), jnp.float32)
    pl = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    gd = jnp.asarray([3.5])
    out_hot = flux_dit_forward(params, CFG, lat, t, pe, pl, gd,
                               hot_lora=hot)
    out_fused = flux_dit_forward(fused, CFG, lat, t, pe, pl, gd)
    np.testing.assert_allclose(np.asarray(out_hot), np.asarray(out_fused),
                               atol=1e-4, rtol=1e-3)


def test_scale_hot_lora_selects_and_blends():
    """scale_hot_lora: zero weights drop an adapter exactly, a one-hot
    over a 2-stack equals the 1-stack of the selected adapter, and 0.5
    halves the delta — per-request selection without recompiling."""
    from fairygen_tpu.models.flux.dit import flux_dit_forward
    from fairygen_tpu.models.flux.lora_runtime import scale_hot_lora

    rng = np.random.default_rng(11)
    params = init_flux_dit_params(jax.random.PRNGKey(0), CFG)

    def make_lora(seed):
        r = np.random.default_rng(seed)
        lora = {}
        for fam, n, dims in (("blocks", 2, {"attn.a_to_qkv": (96, 288)}),
                             ("single_blocks", 2, {"to_qkv_mlp": (96, 672)})):
            for i in range(n):
                for s, (din, dout) in dims.items():
                    lora[f"{fam}.{i}.{s}.lora_A.weight"] = (
                        r.standard_normal((2, din)) * 0.1).astype("float32")
                    lora[f"{fam}.{i}.{s}.lora_B.weight"] = (
                        r.standard_normal((dout, 2)) * 0.1).astype("float32")
        return lora

    la, lb = make_lora(1), make_lora(2)
    both = stack_hot_lora([la, lb], CFG)
    only_a = stack_hot_lora([la], CFG)

    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 12)), jnp.float32)
    t = jnp.asarray([500.0])
    pe = jnp.asarray(rng.standard_normal((1, 6, 48)), jnp.float32)
    pl = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    gd = jnp.asarray([3.5])

    def fwd(hot):
        return np.asarray(flux_dit_forward(params, CFG, lat, t, pe, pl, gd,
                                           hot_lora=hot))

    # one-hot on adapter A == the 1-stack of A
    np.testing.assert_allclose(
        fwd(scale_hot_lora(both, jnp.asarray([1.0, 0.0]))), fwd(only_a),
        atol=1e-5, rtol=1e-4)
    # all-zero == base model
    np.testing.assert_allclose(
        fwd(scale_hot_lora(both, jnp.asarray([0.0, 0.0]))), fwd(None),
        atol=1e-5, rtol=1e-4)
    # per-layer linearity: half strength halves each hot_dense delta
    # (the end-to-end output is nonlinear in the deltas, so check at the
    # layer the scaling actually acts on)
    from fairygen_tpu.models.flux.lora_runtime import hot_dense

    p = {"w": jnp.asarray(rng.standard_normal((96, 288)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 96)), jnp.float32)
    entry = {k: v[0] for k, v in
             only_a["double"]["attn.a_to_qkv"].items()}  # block 0 slice
    entry_half = {k: v[0] for k, v in scale_hot_lora(
        only_a, jnp.asarray([0.5]))["double"]["attn.a_to_qkv"].items()}
    y0 = hot_dense(p, x, None)
    y1 = hot_dense(p, x, entry)
    yh = hot_dense(p, x, entry_half)
    np.testing.assert_allclose(np.asarray(yh - y0),
                               np.asarray(y1 - y0) * 0.5,
                               atol=1e-5, rtol=1e-4)
    # shape guards
    with pytest.raises(ValueError, match="scales"):
        scale_hot_lora(both, jnp.asarray([1.0]))
    with pytest.raises(ValueError, match="1-D"):
        scale_hot_lora(both, jnp.ones((2, 2)))
