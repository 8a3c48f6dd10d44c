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
