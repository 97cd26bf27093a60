"""PLY loader/writer tests (replacing the reference's parser_test smoke)."""


import numpy as np
import pytest

from gaussianrenderer_tpu.scene.io import (
    load_ply,
    make_random_scene,
    save_ply,
)


def _write_test_ply(path, n=7, sh_rest=24, extra_props=False, fmt="binary_little_endian 1.0"):
    rng = np.random.default_rng(3)
    names = ["x", "y", "z", "nxx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
    names += [f"f_rest_{i}" for i in range(sh_rest)]
    names += ["opacity", "scale_0", "scale_1", "scale_2"]
    names += [f"rot_{i}" for i in range(4)]
    if extra_props:
        names += ["weird_extra"]
    data = rng.normal(size=(n, len(names))).astype("<f4")
    header = ["ply", f"format {fmt}", "comment test scene", f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        data.tofile(f)
    return names, data


def test_load_activations_and_layout(tmp_path):
    path = str(tmp_path / "scene.ply")
    names, data = _write_test_ply(path)
    scene = load_ply(path, use_native=False)
    assert scene.num_gaussians == 7
    np.testing.assert_allclose(np.asarray(scene.positions), data[:, 0:3], rtol=1e-6)
    # Activations baked at load: sigmoid(opacity), exp(scale).
    col = names.index("opacity")
    np.testing.assert_allclose(
        np.asarray(scene.opacity), 1 / (1 + np.exp(-data[:, col])), rtol=1e-5
    )
    col = names.index("scale_0")
    np.testing.assert_allclose(
        np.asarray(scene.scales)[:, 0], np.exp(data[:, col]), rtol=1e-5
    )
    # SH layout: f_dc_c at sh[c], f_rest_j at sh[3+j] (reference layout).
    np.testing.assert_allclose(
        np.asarray(scene.sh)[:, 3], data[:, names.index("f_rest_0")], rtol=1e-6
    )
    assert scene.sh_degree == 2
    np.testing.assert_allclose(
        np.asarray(scene.quats), data[:, -4:], rtol=1e-6
    )


def test_unknown_properties_skipped(tmp_path):
    path = str(tmp_path / "scene.ply")
    _write_test_ply(path, extra_props=True)
    scene = load_ply(path, use_native=False)
    assert scene.num_gaussians == 7


def test_ascii_rejected(tmp_path):
    path = str(tmp_path / "scene.ply")
    _write_test_ply(path, fmt="ascii 1.0")
    with pytest.raises(ValueError, match="unsupported PLY format"):
        load_ply(path, use_native=False)


def test_truncated_body_rejected(tmp_path):
    path = str(tmp_path / "scene.ply")
    _write_test_ply(path, n=7)
    raw = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(raw[:-40])
    with pytest.raises(ValueError, match="truncated"):
        load_ply(path, use_native=False)


def test_sh_degree3_rest_coeffs(tmp_path):
    path = str(tmp_path / "scene.ply")
    names, data = _write_test_ply(path, sh_rest=45)
    # Degree-2 load keeps only 24 rest coeffs (reference behavior).
    scene2 = load_ply(path, use_native=False, max_sh_degree=2)
    assert scene2.sh.shape[1] == 27
    # Degree-3 load keeps all 45.
    scene3 = load_ply(path, use_native=False, max_sh_degree=3)
    assert scene3.sh.shape[1] == 48
    np.testing.assert_allclose(
        np.asarray(scene3.sh)[:, 47], data[:, names.index("f_rest_44")], rtol=1e-6
    )


def test_load_ply_stored_degree(tmp_path):
    """max_sh_degree=None loads the file's own stored degree: degree-3
    files keep their trained band, degree-2 files are NOT zero-padded
    and mislabeled as degree 3 (what gr-edit/gr-eval load with)."""
    p3 = str(tmp_path / "deg3.ply")
    _write_test_ply(p3, sh_rest=45)
    assert load_ply(p3, use_native=False, max_sh_degree=None).sh.shape[1] == 48
    p2 = str(tmp_path / "deg2.ply")
    _write_test_ply(p2, sh_rest=24)
    assert load_ply(p2, use_native=False, max_sh_degree=None).sh.shape[1] == 27
    p0 = str(tmp_path / "deg0.ply")
    _write_test_ply(p0, sh_rest=0)
    assert load_ply(p0, use_native=False, max_sh_degree=None).sh.shape[1] == 3


def test_save_load_roundtrip(tmp_path):
    scene = make_random_scene(50, seed=11)
    path = str(tmp_path / "rt.ply")
    save_ply(scene, path)
    back = load_ply(path, use_native=False)
    np.testing.assert_allclose(
        np.asarray(back.positions), np.asarray(scene.positions), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(back.opacity), np.asarray(scene.opacity), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(back.scales), np.asarray(scene.scales), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(back.sh), np.asarray(scene.sh), rtol=1e-5, atol=1e-6
    )


def test_spacetime_roundtrip_and_alias(tmp_path):
    """4D scenes persist: save_ply writes t_center/t_sigma/vx/vy/vz and
    load_ply restores them exactly; the SpacetimeGaussians naming
    (trbf_center, log-stored trbf_scale, motion_0..2) is accepted too."""
    scene = make_random_scene(64, seed=11, spacetime=True)
    path = str(tmp_path / "st.ply")
    save_ply(scene, path)
    back = load_ply(path, use_native=False)
    assert back.time_params is not None
    np.testing.assert_allclose(
        np.asarray(back.time_params),
        np.asarray(scene.time_params),
        rtol=1e-6,
        atol=1e-7,
    )
    # Native loader path must not silently drop the time fields (4D files
    # are routed to the NumPy loader by the header sniff).
    back_n = load_ply(path, use_native=True)
    assert back_n.time_params is not None

    # SpacetimeGaussians-named file
    tp = np.asarray(scene.time_params)
    names = ["x", "y", "z", "f_dc_0", "opacity",
             "scale_0", "scale_1", "scale_2",
             "rot_0", "rot_1", "rot_2", "rot_3",
             "trbf_center", "trbf_scale"] + [f"motion_{i}" for i in range(3)]
    n = tp.shape[0]
    body = np.zeros((n, len(names)), dtype="<f4")
    body[:, 0:3] = np.asarray(scene.positions)
    body[:, 12] = tp[:, 0]
    body[:, 13] = np.log(tp[:, 1])
    body[:, 14:17] = tp[:, 2:5]
    p2 = str(tmp_path / "stg.ply")
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {x}" for x in names] + ["end_header"]
    with open(p2, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        body.tofile(f)
    ext = load_ply(p2, use_native=False)
    assert ext.time_params is not None
    np.testing.assert_allclose(
        np.asarray(ext.time_params), tp, rtol=1e-5, atol=1e-6
    )


def test_morton_ordering_groups_neighbors():
    scene = make_random_scene(512, seed=5)
    ordered = scene.morton_sorted()
    # Same multiset of positions.
    a = np.asarray(scene.positions)
    b = np.asarray(ordered.positions)
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b)
    # Mean hop distance along the curve should beat random order.
    orig = np.asarray(scene.positions)
    mort = np.asarray(ordered.positions)
    hop = lambda p: float(np.mean(np.linalg.norm(np.diff(p, axis=0), axis=1)))
    assert hop(mort) < hop(orig) * 0.6


def test_morton_ordering_survives_nonfinite_splats():
    """One exploded (NaN/Inf) splat — routine in real trained PLYs — must
    not poison the Morton bounds: finite splats keep the same relative
    order as in the NaN-free scene, non-finite codes stay defined."""
    import warnings

    from gaussianrenderer_tpu.scene.gaussians import morton_codes

    scene = make_random_scene(256, seed=6)
    pos = np.asarray(scene.positions).copy()
    clean_codes = morton_codes(pos)

    bad = pos.copy()
    bad[7] = np.nan
    bad[101, 0] = np.inf
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old code warned on NaN cast
        codes = morton_codes(bad)

    finite = np.isfinite(bad).all(axis=1)
    # Finite splats: identical codes (bounds came from finite rows only).
    np.testing.assert_array_equal(codes[finite], clean_codes[finite])
    # Non-finite splats: deterministic low-corner code.
    assert codes[7] == codes[101] == morton_codes(
        np.concatenate([bad[finite], pos[:1] * 0 + np.asarray(bad[finite]).min(axis=0)], axis=0)
    )[-1]
