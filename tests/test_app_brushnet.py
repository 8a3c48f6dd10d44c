"""Gradio app helpers (reference app_brushnet.py process()/resize_image).

UI-independent logic is tested directly; the gradio UI layer is gated and
skipped when gradio is not installed.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from app_brushnet import (  # noqa: E402
    build_demo,
    prepare_mask_and_image,
    resize_image,
    run_inpaint,
)


def test_resize_image_snaps_to_64():
    img = np.zeros((300, 500, 3), np.uint8)
    out = resize_image(img, 256)
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    # shortest side lands near the target resolution
    assert abs(min(out.shape[:2]) - 256) <= 32


def test_prepare_mask_upload_path():
    img = np.full((64, 64, 3), 200, np.uint8)
    # uploaded mask at a different size: white square = inpaint region
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    masked, mask = prepare_mask_and_image(img, input_mask=m)
    assert mask.shape == (64, 64, 1)
    assert mask.max() == 1.0 and mask.min() == 0.0
    # masked image zeros inside the inpaint region, original outside
    assert masked[32, 32].sum() == 0
    assert (masked[0, 0] == 200).all()


def test_prepare_mask_invert():
    img = np.full((16, 16, 3), 100, np.uint8)
    m = np.zeros((16, 16), np.uint8)
    m[:8] = 255
    _, mask = prepare_mask_and_image(img, input_mask=m)
    _, inv = prepare_mask_and_image(img, input_mask=m, invert_mask=True)
    np.testing.assert_array_equal(mask + inv, np.ones_like(mask))


def test_prepare_mask_sam_path_flips_keep_mask():
    # SAM returns keep-masks; app flips them to inpaint convention
    img = np.full((8, 8, 3), 50, np.uint8)
    keep = np.zeros((8, 8, 3), np.uint8)
    keep[:4] = 255  # keep top half
    _, mask = prepare_mask_and_image(img, original_mask=keep)
    assert (mask[:4] == 0).all() and (mask[4:] == 1).all()


def test_prepare_mask_requires_inputs():
    with pytest.raises(ValueError):
        prepare_mask_and_image(None, input_mask=np.zeros((4, 4)))
    with pytest.raises(ValueError):
        prepare_mask_and_image(np.zeros((4, 4, 3), np.uint8))


def test_run_inpaint_blend_guard_and_call():
    calls = {}

    def fake_pipe(**kw):
        calls.update(kw)
        return [np.zeros((kw["height"], kw["width"], 3), np.uint8)]

    img = np.full((64, 64, 3), 128, np.uint8)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:48, 16:48] = 1.0
    with pytest.raises(ValueError):
        run_inpaint(fake_pipe, img, mask, "p", blended=True,
                    control_strength=0.5)
    out = run_inpaint(fake_pipe, img, mask, "a cake", seed=7,
                      num_inference_steps=3)
    assert len(out) == 1
    assert calls["prompt"] == "a cake"
    assert calls["seed"] == 7
    assert calls["num_inference_steps"] == 3
    # masked image passed to the pipeline is zeroed in the inpaint region
    assert calls["image"][32, 32].sum() == 0


def test_build_demo_gated():
    try:
        import gradio  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="gradio"):
            build_demo(pipe=None)
    else:
        demo = build_demo(pipe=lambda **kw: [])
        assert demo is not None
