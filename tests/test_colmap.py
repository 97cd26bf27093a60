"""COLMAP ingestion: binary parsing, pose conversion, SfM init, fit hook.

The fixtures are synthesized COLMAP workspaces written with struct.pack
(the reverse of scene/colmap.py's readers, following the public COLMAP
binary spec) — the same oracle pattern as the sort harnesses.
"""

import os
import struct

import numpy as np
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.scene import colmap


def _rotmat(axis, angle):
    from gaussianrenderer_tpu.scene.edit import axis_angle_rotation

    return axis_angle_rotation(axis, np.rad2deg(angle))


def _rot_to_qvec(r):
    """3×3 rotation → COLMAP (w, x, y, z) quaternion."""
    w = np.sqrt(max(0.0, 1.0 + r[0, 0] + r[1, 1] + r[2, 2])) / 2.0
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def write_colmap_workspace(
    root, poses, width=64, height=48, fy=60.0, points=None, colors=None
):
    """poses: list of (R_w2c (3,3), t_w2c (3,)). Writes sparse/0 + images/."""
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    with open(os.path.join(sparse, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        # PINHOLE: fx, fy, cx, cy
        fh.write(struct.pack("<iiQQ", 1, 1, width, height))
        fh.write(struct.pack("<dddd", fy, fy, width / 2, height / 2))

    rng = np.random.default_rng(3)
    with open(os.path.join(sparse, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(poses)))
        for i, (r, t) in enumerate(poses):
            q = _rot_to_qvec(r)
            name = f"frame_{i:03d}.png"
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<dddd", *q))
            fh.write(struct.pack("<ddd", *t))
            fh.write(struct.pack("<i", 1))
            fh.write(name.encode() + b"\x00")
            n2d = 2  # a couple of 2D track points (skipped by the reader)
            fh.write(struct.pack("<Q", n2d))
            for _ in range(n2d):
                fh.write(struct.pack("<ddQ", 1.0, 2.0, 0))
            from PIL import Image

            img = (rng.uniform(0, 1, (height, width, 3)) * 255).astype(
                np.uint8
            )
            Image.fromarray(img).save(os.path.join(img_dir, name))

    if points is not None:
        with open(os.path.join(sparse, "points3D.bin"), "wb") as fh:
            fh.write(struct.pack("<Q", len(points)))
            for j, p in enumerate(points):
                fh.write(struct.pack("<Q", j))
                fh.write(struct.pack("<ddd", *p))
                fh.write(struct.pack("<BBB", *colors[j]))
                fh.write(struct.pack("<d", 0.5))
                fh.write(struct.pack("<Q", 1))  # track of length 1
                fh.write(struct.pack("<ii", 1, 0))


@pytest.fixture
def workspace(tmp_path):
    poses = []
    for i in range(3):
        r = _rotmat([0.2, 1.0, 0.1 * i], 0.4 * i + 0.1)
        t = np.array([0.1 * i, -0.2, 3.0 + i])
        poses.append((r, t))
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, -1.0], [-2.0, 0.5, 1.0]])
    cols = np.array([[255, 0, 0], [0, 128, 0], [10, 20, 250]], np.uint8)
    write_colmap_workspace(str(tmp_path), poses, points=pts, colors=cols)
    return str(tmp_path), poses, pts, cols


def test_binary_roundtrip(workspace):
    root, poses, pts, cols = workspace
    sparse = colmap.find_sparse_dir(root)
    cams = colmap.read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    assert cams[1].fy == 60.0
    # fov from fy: 2 atan(H / 2fy)
    assert cams[1].fov_y_deg == pytest.approx(
        np.degrees(2 * np.arctan(48 / 120.0))
    )

    images = colmap.read_images_bin(os.path.join(sparse, "images.bin"))
    assert len(images) == 3
    for i, (r, t) in enumerate(poses):
        im = images[i + 1]
        assert im.name == f"frame_{i:03d}.png"
        np.testing.assert_allclose(
            colmap.qvec2rotmat(im.qvec), r, atol=1e-6
        )
        # c2w = [R^T | -R^T t]
        c2w = colmap.pose_to_c2w(im.qvec, im.tvec)
        np.testing.assert_allclose(c2w[:, :3], r.T, atol=1e-6)
        np.testing.assert_allclose(c2w[:, 3], -r.T @ t, atol=1e-5)

    xyz, rgb, err = colmap.read_points3d_bin(
        os.path.join(sparse, "points3D.bin")
    )
    np.testing.assert_allclose(xyz, pts)
    np.testing.assert_array_equal(rgb, cols)
    np.testing.assert_allclose(err, 0.5)


def test_load_views_autodetects_colmap(workspace):
    root, poses, _, _ = workspace
    from gaussianrenderer_tpu.train import load_views

    cfg = RenderConfig(height=48, width=64)
    views = load_views(root, cfg)
    assert len(views) == 3
    for (params, target), (r, t) in zip(views, poses):
        assert target.shape == (3, 48, 64)
        assert float(target.min()) >= 0.0 and float(target.max()) <= 1.0
        # Camera center = -R^T t.
        np.testing.assert_allclose(
            np.asarray(params.position), -r.T @ t, atol=1e-5
        )


def test_load_views_resizes_same_aspect(workspace, tmp_path):
    root, _, _, _ = workspace
    from gaussianrenderer_tpu.train import load_views

    views = load_views(root, RenderConfig(height=24, width=32))
    assert views[0][1].shape == (3, 24, 32)
    with pytest.raises(ValueError, match="aspect"):
        load_views(root, RenderConfig(height=64, width=64))


def test_init_from_points_inverts_dc_color(workspace):
    root, _, pts, cols = workspace
    xyz, rgb = colmap.load_colmap_points(root)
    params = colmap.init_from_points(xyz, rgb, n=3, sh_degree=1, seed=0)
    assert params.positions.shape == (3, 3)
    assert params.sh.shape == (3, 12)
    # Render-time DC color = 0.5 + C0·dc must reproduce the point color.
    back = 0.5 + 0.28209479177387814 * np.asarray(params.sh[:, :3])
    order = np.lexsort(np.asarray(params.positions).T)
    np.testing.assert_allclose(
        back[order],
        (cols.astype(np.float32) / 255.0)[np.lexsort(pts.T)],
        atol=2e-3,
    )
    # Opacity starts at 0.1 (sigmoid of the raw value).
    op = 1 / (1 + np.exp(-np.asarray(params.raw_opacity)))
    np.testing.assert_allclose(op, 0.1, atol=1e-6)
    assert np.isfinite(np.asarray(params.raw_scales)).all()


def test_init_from_points_upsamples():
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 1, (50, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    params = colmap.init_from_points(xyz, rgb, n=200, sh_degree=0, seed=1)
    assert params.positions.shape == (200, 3)
    pos = np.asarray(params.positions)
    assert np.isfinite(pos).all()
    # The first 50 are the original points; clones are jittered nearby.
    np.testing.assert_allclose(pos[:50], xyz)
    assert params.sh.shape == (200, 3)


def test_rotmat2qvec_roundtrip():
    rng = np.random.default_rng(7)
    for i in range(20):
        # Include near-180° rotations (the w≈0 branch).
        angle = np.pi * (i / 19.0)
        r = _rotmat(rng.normal(size=3), angle)
        q = colmap.rotmat2qvec(r)
        np.testing.assert_allclose(colmap.qvec2rotmat(q), r, atol=1e-9)


def test_camera_w2c_roundtrips_through_from_pose():
    """Export a renderer Camera to COLMAP and re-import: same pose."""
    from gaussianrenderer_tpu.scene.camera import Camera

    for pos, look in [
        ([2.0, 1.5, -3.0], [0.0, 0.0, 0.0]),
        ([-1.0, 4.0, 2.0], [0.5, -0.5, 0.0]),
        ([0.0, -2.0, 5.0], [1.0, 1.0, 1.0]),
    ]:
        cam = Camera()
        cam.set_position(pos)
        cam.set_look_at(look)
        cam.set_fov_y(60.0)
        cam.set_aspect_ratio(4 / 3)
        cam.update_camera_matrices()

        qvec, tvec = colmap.camera_w2c(cam)
        cam2 = Camera.from_pose(
            colmap.pose_to_c2w(qvec, tvec),
            fov_y_deg=60.0,
            aspect=4 / 3,
            convention="opencv",
        )
        np.testing.assert_allclose(cam2.position, pos, atol=1e-5)
        np.testing.assert_allclose(cam2.f_axis, cam.f_axis, atol=1e-5)
        np.testing.assert_allclose(cam2.u_axis, cam.u_axis, atol=1e-5)
        np.testing.assert_allclose(cam2.view, cam.view, atol=1e-5)


def test_writers_roundtrip_through_readers(tmp_path):
    """Package writers vs package readers, plus the independent
    struct-level writer above as the format oracle."""
    cams = {
        1: colmap.ColmapCamera(
            "PINHOLE", 64, 48, np.array([60.0, 61.0, 32.0, 24.0])
        ),
        3: colmap.ColmapCamera(
            "SIMPLE_PINHOLE", 32, 32, np.array([40.0, 16.0, 16.0])
        ),
    }
    p = str(tmp_path / "cameras.bin")
    colmap.write_cameras_bin(p, cams)
    back = colmap.read_cameras_bin(p)
    assert set(back) == {1, 3}
    assert back[3].model == "SIMPLE_PINHOLE" and back[3].fy == 40.0
    np.testing.assert_allclose(back[1].params, cams[1].params)

    r = _rotmat([0.3, 1.0, -0.2], 0.7)
    images = {
        5: colmap.ColmapImage(
            _rot_to_qvec(r), np.array([0.1, 0.2, 0.3]), 1, "a.png"
        )
    }
    p = str(tmp_path / "images.bin")
    colmap.write_images_bin(p, images)
    back = colmap.read_images_bin(p)
    assert back[5].name == "a.png" and back[5].camera_id == 1
    np.testing.assert_allclose(back[5].qvec, images[5].qvec)
    np.testing.assert_allclose(back[5].tvec, images[5].tvec)

    xyz = np.array([[1.0, 2.0, 3.0], [-1.0, 0.0, 4.0]])
    rgb01 = np.array([[1.0, 0.0, 0.5], [0.2, 0.4, 0.6]])
    p = str(tmp_path / "points3D.bin")
    colmap.write_points3d_bin(p, xyz, rgb01)  # float color path
    bx, brgb, berr = colmap.read_points3d_bin(p)
    np.testing.assert_allclose(bx, xyz)
    np.testing.assert_array_equal(brgb[0], [255, 0, 128])
    np.testing.assert_allclose(berr, 0.0)


def test_save_colmap_workspace_end_to_end(tmp_path):
    """Synthesize a capture with the high-level writer; load_views and
    the SfM init must consume it — the capture-demo loop in miniature."""
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.train import load_views

    rng = np.random.default_rng(11)
    cams, frames = [], []
    for i in range(3):
        cam = Camera()
        ang = 2 * np.pi * i / 3
        cam.set_position([3 * np.sin(ang), 1.0, 3 * np.cos(ang)])
        cam.set_look_at([0, 0, 0])
        cam.set_fov_y(60.0)
        cam.set_aspect_ratio(64 / 48)
        cam.update_camera_matrices()
        cams.append(cam)
        frames.append(
            (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
        )
    pts = rng.normal(0, 1, (10, 3)).astype(np.float32)
    root = colmap.save_colmap_workspace(
        str(tmp_path), cams, frames,
        points_xyz=pts, points_rgb=rng.uniform(0, 1, (10, 3)),
    )

    cfg = RenderConfig(height=48, width=64)
    views = load_views(root, cfg)
    assert len(views) == 3
    for (params, target), cam in zip(views, cams):
        np.testing.assert_allclose(
            np.asarray(params.position), cam.position, atol=1e-5
        )
        # Target is planar bottom-up; row 0 of the saved image is the
        # framebuffer's TOP row → compare against the flipped source.
        assert target.shape == (3, 48, 64)
    xyz, rgb = colmap.load_colmap_points(root)
    np.testing.assert_allclose(xyz, pts, atol=1e-6)
    params = colmap.init_from_points(xyz, rgb, n=16, sh_degree=0)
    assert params.positions.shape == (16, 3)


def test_native_points_reader_matches_python(tmp_path):
    """The C++ points3D parser returns byte-identical data to the Python
    loop, including variable-length observation tracks."""
    rng = np.random.default_rng(5)
    n = 500
    pts = rng.normal(0, 10, (n, 3))
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    errs = rng.uniform(0, 2, n)
    path = str(tmp_path / "points3D.bin")
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", n))
        for j in range(n):
            fh.write(struct.pack("<Q", j * 7 + 1))
            fh.write(struct.pack("<ddd", *pts[j]))
            fh.write(struct.pack("<BBB", *cols[j]))
            fh.write(struct.pack("<d", errs[j]))
            track = int(rng.integers(0, 9))  # variable-length tracks
            fh.write(struct.pack("<Q", track))
            for _ in range(track):
                fh.write(struct.pack("<ii", 1, 0))

    x_py, c_py, e_py = colmap.read_points3d_bin(path, use_native=False)
    from gaussianrenderer_tpu.native import colmap_native

    x_nat, c_nat, e_nat = colmap_native.load_points(path)
    np.testing.assert_array_equal(x_nat, x_py)
    np.testing.assert_array_equal(c_nat, c_py)
    np.testing.assert_array_equal(e_nat, e_py)
    np.testing.assert_allclose(x_py, pts)

    # Truncated file: native must reject, not read past the end.
    trunc = str(tmp_path / "trunc.bin")
    with open(path, "rb") as fh:
        data = fh.read()
    with open(trunc, "wb") as fh:
        fh.write(data[: len(data) - 9])
    with pytest.raises(ValueError):
        colmap_native.load_points(trunc)
    # And the public reader falls back cleanly / errors equivalently.
    with pytest.raises(ValueError):
        colmap.read_points3d_bin(trunc, use_native=False)


def test_fit_scene_runs_on_colmap_views(workspace):
    root, _, _, _ = workspace
    from gaussianrenderer_tpu.train import fit_scene, load_views

    cfg = RenderConfig(height=48, width=64, compositor="diff",
                       sh_degree=1, diff_max_chunks=2,
                       min_instance_capacity=1024)
    views = load_views(root, cfg)
    xyz, rgb = colmap.load_colmap_points(root)
    params = colmap.init_from_points(xyz, rgb, n=64, sh_degree=1, seed=0)
    params, hist = fit_scene(views, cfg, params, steps=2)
    assert np.isfinite(hist["losses"][-1])


def test_load_views_stride_matches_post_slice(workspace):
    """stride=N selects the llffhold split BEFORE any image is loaded,
    with exactly the membership of views[::N]."""
    from gaussianrenderer_tpu.train import load_views

    root, _, _, _ = workspace
    cfg = RenderConfig(height=48, width=64)
    full = load_views(root, cfg)
    split = load_views(root, cfg, stride=2)
    assert len(split) == len(full[::2])
    for (pa, ta), (pb, tb) in zip(split, full[::2]):
        np.testing.assert_array_equal(
            np.asarray(pa.position), np.asarray(pb.position)
        )
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
