"""Native multithreaded checkpoint streamer vs mmap fallback."""
import numpy as np
import pytest

from fairygen_tpu.core.io import load_safetensors, save_safetensors


def test_native_loader_matches_mmap(tmp_path):
    import ml_dtypes

    rs = np.random.RandomState(0)
    sd = {
        f"layer{i}.weight": rs.randn(64, 128).astype(np.float32) for i in range(6)
    }
    sd["big.bf16"] = rs.randn(256, 256).astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "w.safetensors")
    save_safetensors(path, sd)

    ref = load_safetensors(path, native=False)
    fast = load_safetensors(path, native=True)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(fast[k]), np.asarray(ref[k]))

    # bf16 -> f32 widening path
    ref32 = load_safetensors(path, dtype=np.float32, native=False)
    fast32 = load_safetensors(path, dtype=np.float32, native=True)
    for k in sd:
        np.testing.assert_array_equal(fast32[k], ref32[k])
        assert fast32[k].dtype == np.float32


def test_native_lib_builds():
    from fairygen_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("no compiler available")
    assert hasattr(lib, "fairygen_parallel_read")
