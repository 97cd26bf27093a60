"""Native C++ PLY loader vs the NumPy parser (same SoA output)."""


import numpy as np
import pytest

from gaussianrenderer_tpu.scene.io import (
    _load_ply_numpy,
    load_ply,
    make_random_scene,
    save_ply,
)


@pytest.fixture(scope="module")
def ply_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ply") / "scene.ply")
    save_ply(make_random_scene(3000, seed=7), path)
    return path


def _native_available():
    try:
        from gaussianrenderer_tpu.native import ply_native

        ply_native._get_lib()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_matches_numpy(ply_file):
    from gaussianrenderer_tpu.native import ply_native

    a = ply_native.load(ply_file, 2)
    b, _ = _load_ply_numpy(ply_file, 2)
    names = ["positions", "sh", "opacity", "scales", "quats"]
    for x, y, name in zip(a, b, names):
        np.testing.assert_allclose(x, y, rtol=2e-6, atol=2e-6, err_msg=name)


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_rejects_garbage(tmp_path):
    from gaussianrenderer_tpu.native import ply_native

    bad = str(tmp_path / "bad.ply")
    with open(bad, "w") as f:
        f.write("not a ply\n")
    with pytest.raises(ValueError):
        ply_native.load(bad, 2)


def test_load_ply_prefers_native_and_matches(ply_file):
    scene_fast = load_ply(ply_file, use_native=True)
    scene_ref = load_ply(ply_file, use_native=False)
    np.testing.assert_allclose(
        np.asarray(scene_fast.positions), np.asarray(scene_ref.positions)
    )
    np.testing.assert_allclose(
        np.asarray(scene_fast.sh), np.asarray(scene_ref.sh)
    )
