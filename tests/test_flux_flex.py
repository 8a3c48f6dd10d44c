"""Flex parity (tools/gen_goldens_flux_flex.py): the channel-concatenated
inpaint/mask/control condition and the control-stop switch."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
)

CFG = FluxDiTConfig.tiny(in_dim=52)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_flex.npz")


def _run(g, flex):
    params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    return flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]), flex_condition=jnp.asarray(flex))


def test_flex_condition(g):
    np.testing.assert_allclose(np.asarray(_run(g, g["flex_condition"])),
                               g["out_cond"], atol=2e-4, rtol=1e-3)


def test_flex_uncondition(g):
    """t < flex_control_stop_timestep -> the zero-control variant."""
    np.testing.assert_allclose(np.asarray(_run(g, g["flex_uncondition"])),
                               g["out_uncond"], atol=2e-4, rtol=1e-3)
