"""ModelConfig resolution (reference core/loader/config.py:8-118).

All offline: pre-populated directories + skip_download, plus a fake
download backend to exercise the download path without network.
"""
import os

import pytest

from fairygen_tpu.core.model_config import (
    ModelConfig,
    register_download_backend,
    resolve_model_paths,
)


def _touch(*parts):
    path = os.path.join(*parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("x")
    return path


def test_path_passthrough():
    cfg = ModelConfig(path="/some/model.safetensors")
    assert cfg.resolve() == "/some/model.safetensors"


def test_requires_path_or_model_id():
    with pytest.raises(ValueError):
        ModelConfig().resolve()


def test_skip_download_glob(tmp_path):
    base = str(tmp_path)
    _touch(base, "org/model", "diffusion_pytorch_model-00001.safetensors")
    _touch(base, "org/model", "diffusion_pytorch_model-00002.safetensors")
    _touch(base, "org/model", "config.json")
    cfg = ModelConfig(
        model_id="org/model",
        origin_file_pattern="diffusion_pytorch_model*.safetensors",
        local_model_path=base,
        skip_download=True,
    )
    paths = cfg.resolve()
    assert isinstance(paths, list) and len(paths) == 2
    assert all(p.endswith(".safetensors") for p in paths)
    assert paths == sorted(paths)


def test_single_match_flattens_to_str(tmp_path):
    # reference quirk: 1-element list becomes the bare path (config.py:108)
    base = str(tmp_path)
    _touch(base, "org/m", "model.safetensors")
    cfg = ModelConfig(
        model_id="org/m", origin_file_pattern="model.safetensors",
        local_model_path=base, skip_download=True,
    )
    assert cfg.resolve() == os.path.join(base, "org/m", "model.safetensors")


def test_no_pattern_resolves_to_dir(tmp_path):
    base = str(tmp_path)
    _touch(base, "org/m", "anything.bin")
    cfg = ModelConfig(model_id="org/m", local_model_path=base,
                      skip_download=True)
    assert cfg.resolve() == os.path.join(base, "org/m")


def test_dir_pattern_gets_star_suffix():
    cfg = ModelConfig(model_id="x/y", origin_file_pattern="vae/")
    assert cfg.parse_origin_file_pattern() == "vae/*"


def test_missing_files_raise(tmp_path):
    cfg = ModelConfig(
        model_id="org/absent", origin_file_pattern="*.safetensors",
        local_model_path=str(tmp_path), skip_download=True,
    )
    with pytest.raises(FileNotFoundError):
        cfg.resolve()


def test_env_overrides(tmp_path, monkeypatch):
    base = str(tmp_path)
    _touch(base, "org/m", "w.bin")
    monkeypatch.setenv("FAIRYGEN_MODEL_BASE_PATH", base)
    monkeypatch.setenv("FAIRYGEN_SKIP_DOWNLOAD", "true")
    cfg = ModelConfig(model_id="org/m", origin_file_pattern="w.bin")
    assert cfg.resolve() == os.path.join(base, "org/m", "w.bin")


def test_fake_download_backend(tmp_path):
    base = str(tmp_path)
    calls = []

    def fake(model_id, local_dir, pattern, existing):
        calls.append((model_id, pattern, tuple(existing)))
        _touch(local_dir, "weights.safetensors")

    register_download_backend("faketest", fake)
    cfg = ModelConfig(
        model_id="org/dl", origin_file_pattern="weights.safetensors",
        local_model_path=base, download_source="faketest",
    )
    path = cfg.resolve()
    assert path == os.path.join(base, "org/dl", "weights.safetensors")
    assert calls == [("org/dl", "weights.safetensors", ())]
    # second resolve on a fresh config: file exists -> passed as ignore-list
    cfg2 = ModelConfig(
        model_id="org/dl", origin_file_pattern="weights.safetensors",
        local_model_path=base, download_source="faketest",
    )
    cfg2.resolve()
    assert calls[1][2] == ("weights.safetensors",)


def test_unknown_source_raises(tmp_path):
    cfg = ModelConfig(model_id="a/b", origin_file_pattern="*",
                      local_model_path=str(tmp_path),
                      download_source="nonsense")
    with pytest.raises(ValueError):
        cfg.resolve()


def test_resolve_model_paths_mixed(tmp_path):
    base = str(tmp_path)
    p1 = _touch(base, "org/m", "a.safetensors")
    p2 = _touch(base, "org/m", "b.safetensors")
    out = resolve_model_paths([
        "/plain/path.bin",
        ModelConfig(model_id="org/m", origin_file_pattern="*.safetensors",
                    local_model_path=base, skip_download=True),
    ])
    assert out == ["/plain/path.bin", p1, p2]
