"""Data operator DSL, UnifiedDataset, video IO, checkpoint round-trips."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.data import (
    ImageCropAndResize,
    LoadImage,
    LoadNpz,
    RouteByExtensionName,
    RouteByType,
    ToAbsolutePath,
    ToList,
    UnifiedDataset,
)
from fairygen_tpu.core.io import load_safetensors, save_safetensors, load_shapes
from fairygen_tpu.utils.video import save_frames, save_video


def _make_image(path, w=40, h=30):
    from PIL import Image

    rs = np.random.RandomState(0)
    Image.fromarray(rs.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def test_operator_pipeline(tmp_path):
    img = tmp_path / "a.png"
    _make_image(str(img))
    op = ToAbsolutePath(str(tmp_path)) >> LoadImage() >> ImageCropAndResize(16, 16) >> ToList()
    out = op("a.png")
    assert isinstance(out, list) and out[0].size == (16, 16)


def test_crop_and_resize_max_pixels(tmp_path):
    img = tmp_path / "b.png"
    _make_image(str(img), w=100, h=60)
    op = LoadImage() >> ImageCropAndResize(max_pixels=600, height_division_factor=8,
                                           width_division_factor=8)
    out = op(str(img))
    w, h = out.size
    assert w % 8 == 0 and h % 8 == 0 and w * h <= 6000


def test_unified_dataset_csv_and_repeat(tmp_path):
    img = tmp_path / "x.png"
    _make_image(str(img))
    meta = tmp_path / "meta.csv"
    meta.write_text("video,prompt\nx.png,a drawing\n")
    ds = UnifiedDataset(
        base_path=str(tmp_path), metadata_path=str(meta), repeat=3,
        data_file_keys=("video",),
        main_data_operator=UnifiedDataset.default_video_operator(
            base_path=str(tmp_path), height=16, width=16),
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["prompt"] == "a drawing"
    assert isinstance(item["video"], list) and item["video"][0].size == (16, 16)


def test_unified_dataset_cached_npz(tmp_path):
    np.savez(tmp_path / "c1.npz", latents=np.ones((2, 2)), prompt=np.array("hi", dtype=object))
    ds = UnifiedDataset(base_path=str(tmp_path))
    assert len(ds) == 1
    item = ds[0]
    assert item["latents"].shape == (2, 2) and item["prompt"] == "hi"


def test_save_video_and_frames(tmp_path):
    frames = [np.full((8, 8, 3), i * 40, np.uint8) for i in range(4)]
    p = save_video(frames, str(tmp_path / "v.mp4"), fps=4)
    assert os.path.exists(p)
    save_frames(frames, str(tmp_path / "frames"))
    assert len(os.listdir(tmp_path / "frames")) == 4


def test_safetensors_roundtrip(tmp_path):
    import ml_dtypes

    sd = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": np.ones((4,), dtype=ml_dtypes.bfloat16),
    }
    path = str(tmp_path / "w.safetensors")
    save_safetensors(path, sd, metadata={"format": "pt"})
    back = load_safetensors(path)
    np.testing.assert_array_equal(back["a"], sd["a"])
    assert back["b"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert load_shapes(path) == {"a": [2, 3], "b": [4]}


def test_lora_checkpoint_roundtrip(tmp_path):
    from fairygen_tpu.models.adapters import add_lora_to_wan_dit, merge_stage_weights
    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.runner import ModelLogger, wan_lora_state_dict

    cfg = WanDiTConfig.tiny(num_heads=4, dim=96)
    params = init_dit_params(jax.random.key(0), cfg)
    params = add_lora_to_wan_dit(params, jax.random.key(1), rank=4, with_b2=True)
    sd = wan_lora_state_dict(params)
    assert any(k.endswith(".lora_B2.weight") for k in sd)
    assert any(k.endswith(".lora_A.default.weight") for k in sd)

    logger = ModelLogger(str(tmp_path))
    path = logger.save(params, "step-1.safetensors")
    back = load_safetensors(path)
    assert set(back) == set(sd)

    # stage merge on the saved layout works
    merged = merge_stage_weights(back, back)
    assert any("lora_B" in k for k in merged)


@pytest.mark.slow
def test_orbax_train_state_roundtrip(tmp_path):
    import optax

    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.train_step import make_wan_sft_train_step
    from fairygen_tpu.training.runner import restore_train_state, save_train_state

    cfg = WanDiTConfig.tiny(num_heads=4, dim=96)
    init_state, train_step = make_wan_sft_train_step(cfg, optax.adamw(1e-4), remat=False)
    params = init_dit_params(jax.random.key(0), cfg)
    state = init_state(params)
    batch = {
        "latents": jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8)),
        "context": jax.random.normal(jax.random.key(2), (1, 6, 32)),
    }
    state, _ = train_step(state, batch, jax.random.key(3))
    save_train_state(str(tmp_path / "ckpt"), state)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = restore_train_state(str(tmp_path / "ckpt"), abstract)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored.params["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(state.params["blocks"]["self_attn"]["q"]["w"]),
    )


def test_load_wav_all_pcm_widths(tmp_path):
    """load_wav decodes 8/16/24/32-bit PCM (and downmixes stereo) — a
    hardcoded-int16 reader would feed garbage into the S2V audio path."""
    import wave

    import numpy as np

    from fairygen_tpu.utils.video import load_wav

    sr = 16000
    ref = np.sin(2 * np.pi * 440.0 * np.arange(256) / sr).astype(np.float32)

    def write(path, width, data_f32, n_ch=1):
        if n_ch > 1:
            data_f32 = np.repeat(data_f32[:, None], n_ch, axis=1).ravel()
        with wave.open(str(path), "wb") as f:
            f.setnchannels(n_ch)
            f.setsampwidth(width)
            f.setframerate(sr)
            if width == 1:
                raw = (np.clip(data_f32, -1, 1) * 127 + 128).astype(
                    np.uint8).tobytes()
            elif width == 2:
                raw = (np.clip(data_f32, -1, 1) * 32767).astype(
                    "<i2").tobytes()
            elif width == 3:
                i32 = (np.clip(data_f32, -1, 1) * 8388607).astype("<i4")
                raw = i32.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
            else:
                raw = (np.clip(data_f32, -1, 1) * 2147483647).astype(
                    "<i4").tobytes()
            f.writeframes(raw)

    for width, tol in ((1, 2e-2), (2, 1e-4), (3, 1e-6), (4, 1e-7)):
        p = tmp_path / f"w{width}.wav"
        write(p, width, ref)
        out, got_sr = load_wav(str(p))
        assert got_sr == sr and out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=tol)

    stereo = tmp_path / "stereo.wav"
    write(stereo, 2, ref, n_ch=2)
    out, _ = load_wav(str(stereo))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_model_logger_async_save_matches_sync(tmp_path):
    """async_save writes the same bytes off-thread; flush() joins and
    re-raises write failures."""
    import jax

    from fairygen_tpu.core.io import load_safetensors
    from fairygen_tpu.models.adapters import add_lora_to_wan_dit
    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.runner import ModelLogger

    cfg = WanDiTConfig.tiny(num_heads=4, dim=96)
    params = add_lora_to_wan_dit(
        init_dit_params(jax.random.key(0), cfg), jax.random.key(1), rank=4)

    sync = ModelLogger(str(tmp_path / "sync"))
    async_ = ModelLogger(str(tmp_path / "async"), async_save=True)
    p_sync = sync.save(params, "step-1.safetensors")
    p_async = async_.save(params, "step-1.safetensors")
    async_.flush()
    a, b = load_safetensors(p_sync), load_safetensors(p_async)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    # a failing background write surfaces at flush
    bad = ModelLogger(str(tmp_path / "bad"), async_save=True,
                      state_dict_fn=lambda p: (_ for _ in ()).throw(
                          RuntimeError("disk full")))
    bad.save(params, "step-1.safetensors")
    with pytest.raises(RuntimeError, match="disk full"):
        bad.flush()
