"""Annotator parity (reference utils/controlnet/annotator.py:1-62)."""
import numpy as np
import pytest

from fairygen_tpu.utils.annotator import (
    PROCESSOR_IDS,
    Annotator,
    canny_edges,
)


def _fixture_image(h=96, w=128):
    """Synthetic scene: gradient background + square + disc + diagonal."""
    rs = np.random.RandomState(0)
    img = np.linspace(30, 180, w, dtype=np.float32)[None, :].repeat(h, axis=0)
    img = img + rs.normal(0, 4, (h, w))
    img[20:60, 30:70] = 220.0
    yy, xx = np.mgrid[:h, :w]
    img[(yy - 70) ** 2 + (xx - 100) ** 2 < 15 ** 2] = 15.0
    for i in range(40):
        img[5 + i, 5 + i] = 250.0
    g = np.clip(img, 0, 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)


def test_canny_matches_cv2_exactly():
    cv2 = pytest.importorskip("cv2")
    img = _fixture_image()
    ref = cv2.Canny(img, 100, 200)
    ours = canny_edges(img, 100, 200)
    agree = (ref == ours).mean()
    assert agree == 1.0, f"pixel agreement {agree:.4f}"


def test_canny_matches_cv2_grayscale_noise():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (64, 80), np.uint8)
    ref = cv2.Canny(img, 100, 200)
    ours = canny_edges(img, 100, 200)
    assert (ref == ours).mean() == 1.0


def test_canny_annotator_end_to_end():
    from PIL import Image

    img = Image.fromarray(_fixture_image())
    ann = Annotator("canny")
    out = ann(img)
    assert out.size == img.size
    arr = np.asarray(out)
    assert arr.shape[-1] == 3
    # edges exist and the map is mostly black
    assert arr.max() == 255
    assert (arr > 127).mean() < 0.5


def test_passthrough_ids():
    from PIL import Image

    img = Image.fromarray(_fixture_image())
    for pid in ("tile", "none", "inpaint"):
        out = Annotator(pid)(img)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_external_detectors_contract():
    with pytest.raises(NotImplementedError, match="precompute"):
        Annotator("depth")
    from PIL import Image

    img = Image.fromarray(_fixture_image())
    # skip_processor treats input as already annotated (reference :36-38)
    out = Annotator("openpose", skip_processor=True)(img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    with pytest.raises(ValueError):
        Annotator("not_a_processor")


def test_processor_id_list_matches_reference():
    assert PROCESSOR_IDS == ("canny", "depth", "softedge", "lineart",
                             "lineart_anime", "openpose", "normal", "tile",
                             "none", "inpaint")


def test_depth_annotator_native(tmp_path):
    """Annotator('depth', model_path=...) runs the in-repo Depth-Anything
    port end-to-end from a transformers-format checkpoint file."""
    torch = pytest.importorskip("torch")
    from transformers import (DepthAnythingConfig as TorchCfg,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    from fairygen_tpu.core.io import save_safetensors

    torch.manual_seed(0)
    bc = Dinov2Config(hidden_size=64, num_hidden_layers=4,
                      num_attention_heads=1, intermediate_size=128,
                      patch_size=14, image_size=56, out_indices=[1, 2, 3, 4],
                      apply_layernorm=True, reshape_hidden_states=False)
    cfg = TorchCfg(backbone_config=bc, reassemble_hidden_size=64,
                   fusion_hidden_size=16, neck_hidden_sizes=[8, 8, 16, 16],
                   head_hidden_size=8, patch_size=14,
                   reassemble_factors=[4, 2, 1, 0.5])
    m = DepthAnythingForDepthEstimation(cfg).eval()
    path = str(tmp_path / "depth_tiny.safetensors")
    save_safetensors(path, {k: v.numpy() for k, v in m.state_dict().items()})

    from PIL import Image

    ann = Annotator("depth", model_path=path, detect_resolution=56)
    img = Image.fromarray(_fixture_image())
    out = ann(img)
    assert out.size == img.size
    arr = np.asarray(out)
    assert arr.shape[-1] == 3 and arr.dtype == np.uint8
    # grayscale control map, full dynamic range after min-max normalize
    assert arr.min() == 0 and arr.max() == 255

    # parity with the torch reference on the SAME preprocessed tensor
    from fairygen_tpu.models.depth_anything import preprocess_depth_anything
    from fairygen_tpu.utils.annotator import Annotator as _A

    jcfg, params = ann._depth
    x = preprocess_depth_anything(_fixture_image(), jcfg, 56)
    with torch.no_grad():
        ref = m(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).predicted_depth.numpy()
    from fairygen_tpu.models.depth_anything import depth_anything_forward

    out_j = np.asarray(depth_anything_forward(params, jcfg, x))
    np.testing.assert_allclose(out_j, ref, atol=2e-4, rtol=1e-3)
