"""Integration smoke against REAL reference data assets (skipped when the
reference checkout is absent — e.g. CI without /root/reference)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference/stylization/dora_training/data/train/pig"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference assets not mounted"
)


def test_dora_data_prep_on_reference_pig():
    """The Style-DoRA input prep (resize, [-1,1] pixels, latent-grid mask)
    runs on the actual single-image training pair."""
    from PIL import Image

    img = Image.open(os.path.join(REF, "pig.jpg")).convert("RGB").resize((64, 64))
    mask = Image.open(os.path.join(REF, "mask.jpg")).convert("L").resize((64, 64))
    pixel = np.asarray(img, np.float32) / 127.5 - 1.0
    m = (np.asarray(mask, np.float32) > 127).astype(np.float32)
    assert pixel.min() >= -1 and pixel.max() <= 1
    assert 0.05 < m.mean() < 0.95  # character covers part of the frame
    # latent-grid nearest resize (train.py:1215-1217 semantics)
    h = w = 8
    ih = np.arange(h) * 64 // h
    iw = np.arange(w) * 64 // w
    ml = m[ih][:, iw]
    assert ml.shape == (8, 8) and set(np.unique(ml)).issubset({0.0, 1.0})


def test_unified_dataset_on_reference_metadata():
    from fairygen_tpu.data import UnifiedDataset

    meta = os.path.join(REF, "metadata.csv")
    ds = UnifiedDataset(
        base_path=REF, metadata_path=meta, repeat=1,
        data_file_keys=("file_name", "image", "mask"),
        main_data_operator=UnifiedDataset.default_image_operator(
            base_path=REF, height=32, width=32),
    )
    assert len(ds) >= 1
    item = ds[0]
    # whichever key the csv uses, at least the text column should survive
    assert isinstance(item, dict) and len(item) >= 1
