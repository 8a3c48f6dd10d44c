"""Depth-Anything port vs transformers' torch implementation (golden)."""
import numpy as np
import pytest

import pathlib

GOLDENS = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def golden():
    path = GOLDENS / "depth_anything.npz"
    if not path.exists():
        pytest.skip("run tools/gen_goldens_depth_anything.py first")
    return np.load(path)


def _params(golden):
    from fairygen_tpu.models.depth_anything import (
        DepthAnythingConfig, convert_depth_anything_state_dict,
    )

    cfg = DepthAnythingConfig.tiny()
    sd = {k[4:]: golden[k] for k in golden.files if k.startswith("sd::")}
    return cfg, convert_depth_anything_state_dict(sd, cfg)


def test_native_grid_matches_torch(golden):
    import jax.numpy as jnp

    from fairygen_tpu.models.depth_anything import depth_anything_forward

    cfg, params = _params(golden)
    x = jnp.asarray(golden["x_native"]).transpose(0, 2, 3, 1)  # NCHW->NHWC
    out = depth_anything_forward(params, cfg, x)
    np.testing.assert_allclose(np.asarray(out), golden["d_native"],
                               atol=2e-4, rtol=1e-3)


def test_interpolated_pos_embed_matches_torch(golden):
    """Rectangular input off the native grid: exercises the bicubic
    (a=-0.75) position-embedding interpolation and non-square fusion."""
    import jax.numpy as jnp

    from fairygen_tpu.models.depth_anything import depth_anything_forward

    cfg, params = _params(golden)
    x = jnp.asarray(golden["x_rect"]).transpose(0, 2, 3, 1)
    out = depth_anything_forward(params, cfg, x)
    np.testing.assert_allclose(np.asarray(out), golden["d_rect"],
                               atol=2e-4, rtol=1e-3)


def test_resize_matches_torch_semantics():
    """bilinear/bicubic helpers vs torch.nn.functional.interpolate."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from fairygen_tpu.models.depth_anything import (
        bicubic_resize, bilinear_resize,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for (oh, ow), mode, ac in [((9, 4), "bilinear", True),
                               ((9, 4), "bilinear", False),
                               ((11, 13), "bicubic", False)]:
        ref = torch.nn.functional.interpolate(
            xt, size=(oh, ow), mode=mode, align_corners=ac)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        fn = bilinear_resize if mode == "bilinear" else bicubic_resize
        out = np.asarray(fn(jnp.asarray(x), oh, ow, ac))
        np.testing.assert_allclose(out, ref, atol=1e-5,
                                   err_msg=f"{mode} ac={ac}")


def test_depth_to_image_normalization():
    from fairygen_tpu.models.depth_anything import depth_to_image

    d = np.array([[0.0, 1.0], [2.0, 4.0]], np.float32)
    img = depth_to_image(d)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 0 and img[1, 1, 0] == 255
