"""FLUX.1 MMDiT golden parity vs the reference torch implementation
(goldens produced by tools/gen_goldens_flux.py driving the REAL
model_fn_flux_image on a hand-assembled tiny FluxDiT)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
    init_flux_dit_params,
    prepare_image_ids,
)

CFG = FluxDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_dit.npz")


def _sd(g):
    return {k[3:]: g[k] for k in g.files if k.startswith("sd.")}


@pytest.mark.slow
def test_flux_dit_matches_reference(g):
    params = convert_flux_dit_state_dict(_sd(g), CFG)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux_dit_prescaled_matches(g):
    """scale·log2e folded into the q-norm gammas == unscaled path."""
    params = convert_flux_dit_state_dict(_sd(g), CFG, prescale=True)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]), prescaled=True,
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=5e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux_dit_kontext_matches_reference(g):
    from fairygen_tpu.models.flux.dit import patchify

    params = convert_flux_dit_state_dict(_sd(g), CFG)
    kontext = jnp.asarray(g["kontext"])
    kid = prepare_image_ids(kontext.shape[2], kontext.shape[3]).copy()
    kid[:, 0] += 1
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
        kontext_latents=patchify(kontext), kontext_image_ids=kid,
    )
    np.testing.assert_allclose(np.asarray(out), g["out_kontext"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux_dit_bfl_naming_roundtrip(g):
    """BFL checkpoint naming -> normalize_flux_dit_source -> same forward."""
    from fairygen_tpu.models.flux.dit import (
        _BFL_DOUBLE,
        _BFL_SINGLE,
        _BFL_TOP,
        normalize_flux_dit_source,
    )

    sd = _sd(g)
    inv_top = {v: k for k, v in _BFL_TOP.items()}
    inv_dbl = {v: k for k, v in _BFL_DOUBLE.items()}
    inv_sgl = {v: k for k, v in _BFL_SINGLE.items()}
    bfl = {}
    for name, v in sd.items():
        parts = name.split(".")
        stem, leaf = ".".join(parts[:-1]), parts[-1]
        if stem in inv_top:
            bfl[f"{inv_top[stem]}.{leaf}"] = v
        elif parts[0] == "blocks":
            suf = ".".join(parts[2:])
            if suf in inv_dbl:
                bfl[f"double_blocks.{parts[1]}.{inv_dbl[suf]}"] = v
            else:
                sufstem = ".".join(parts[2:-1])
                bfl[f"double_blocks.{parts[1]}.{inv_dbl[sufstem]}.{leaf}"] = v
        elif parts[0] == "single_blocks":
            suf = ".".join(parts[2:])
            if suf in inv_sgl:
                bfl[f"single_blocks.{parts[1]}.{inv_sgl[suf]}"] = v
            else:
                sufstem = ".".join(parts[2:-1])
                bfl[f"single_blocks.{parts[1]}.{inv_sgl[sufstem]}.{leaf}"] = v
        else:
            raise AssertionError(name)
    norm = normalize_flux_dit_source(bfl)
    assert set(norm) == set(sd)
    params = convert_flux_dit_state_dict(norm, CFG)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_flux_dit_init_and_remat():
    import jax

    params = init_flux_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (2, 4, 8, 8)) * 0.3
    out = flux_dit_forward(
        params, CFG, lat, jnp.asarray([500.0, 100.0]),
        jax.random.normal(jax.random.key(2), (2, 6, CFG.context_dim)),
        jax.random.normal(jax.random.key(3), (2, CFG.pooled_dim)),
        jnp.asarray([3.5, 3.5]),
    )
    assert out.shape == (2, 4, 8, 8)
    out_r = flux_dit_forward(
        params, CFG, lat, jnp.asarray([500.0, 100.0]),
        jax.random.normal(jax.random.key(2), (2, 6, CFG.context_dim)),
        jax.random.normal(jax.random.key(3), (2, CFG.pooled_dim)),
        jnp.asarray([3.5, 3.5]), remat=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
