"""Camera controller parity vs reference goldens."""
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.camera import (
    SimpleAdapterConfig, convert_simple_adapter_state_dict,
    generate_camera_coordinates, process_pose_file, simple_adapter_forward,
)


def test_camera_coordinates_and_plucker(goldens):
    g = goldens("wan_camera")
    coords = generate_camera_coordinates("LeftUp", 5, 1 / 54)
    np.testing.assert_allclose(np.array(coords), g["coords"], atol=1e-12)
    pl = process_pose_file(coords, width=32, height=16)
    np.testing.assert_allclose(pl, g["plucker"], atol=1e-5, rtol=1e-5)


def test_simple_adapter_forward(goldens):
    g = goldens("wan_camera")
    cfg = SimpleAdapterConfig(in_dim=6, out_dim=32)
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_simple_adapter_state_dict(sd, cfg)
    out = simple_adapter_forward(params, cfg, jnp.asarray(g["x"]))
    np.testing.assert_allclose(np.asarray(out), g["o"], atol=2e-5, rtol=1e-4)
