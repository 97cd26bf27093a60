"""Camera unit tests (replacing the reference's smoke-only camera_test).

Hand-computed expectations verify the exact reference conventions:
look-at basis with negated forward axis, row-major V/P, M = P·V, frustum
planes, orbit/zoom behavior (reference src/core/scene/camera.cpp).
"""

import math

import numpy as np

from gaussianrenderer_tpu.scene.camera import Camera, perspective_matrix


def test_defaults_match_reference():
    cam = Camera()
    assert cam.fov_y == 45.0
    assert cam.aspect == 1.0
    assert cam.near == 0.1
    assert cam.far == 100.0
    np.testing.assert_allclose(cam.position, [0, 0, 5])
    np.testing.assert_allclose(cam.look_at, [0, 0, 0])


def test_lookat_basis_down_negative_z():
    cam = Camera()
    cam.update_camera_matrices()
    # Camera at +5z looking at origin: f_axis stored negated => +z,
    # r = normalize(f_raw × up) = (-z × y) ... f_raw=(0,0,-1), r=f_raw×y=(1,0,0)? no:
    # cross((0,0,-1),(0,1,0)) = (0*0-(-1)*1, (-1)*0-0*0, 0*1-0*0) = (1,0,0)
    np.testing.assert_allclose(cam.r_axis, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cam.u_axis, [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(cam.f_axis, [0, 0, 1], atol=1e-6)

    # A point at the origin is 5 units in front => camera z = -5.
    p_cam = cam.view @ np.array([0, 0, 0, 1.0], dtype=np.float32)
    np.testing.assert_allclose(p_cam, [0, 0, -5, 1], atol=1e-6)


def test_perspective_matrix_values():
    p = perspective_matrix(90.0, 2.0, 1.0, 10.0)
    f = 1.0 / math.tan(math.radians(45.0))
    np.testing.assert_allclose(p[0, 0], f / 2.0, rtol=1e-6)
    np.testing.assert_allclose(p[1, 1], f, rtol=1e-6)
    np.testing.assert_allclose(p[2, 2], (10 + 1) / (1 - 10), rtol=1e-6)
    np.testing.assert_allclose(p[2, 3], (2 * 10 * 1) / (1 - 10), rtol=1e-6)
    assert p[3, 2] == -1.0
    assert p[3, 3] == 0.0


def test_ndc_projection_center_and_clip():
    cam = Camera()
    cam.set_fov_y(90.0)
    cam.update_camera_matrices()
    # Point straight ahead at distance 5 projects to NDC center.
    out = cam.transform_point_to_camera_space([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(out[:2], [0, 0], atol=1e-6)
    # Point at x = z-dist (45° off-axis at fov 90) lands at NDC x = ±1.
    out = cam.transform_point_to_camera_space([5.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(abs(out[0]), 1.0, atol=1e-5)


def test_orbit_preserves_radius_and_clamps_phi():
    cam = Camera()
    cam.set_position([0.0, 0.0, 5.0])
    cam.set_look_at([1.0, 2.0, 3.0])
    r0 = np.linalg.norm(cam.position - cam.look_at)
    cam.orbit(33.0, 21.0)
    r1 = np.linalg.norm(cam.position - cam.look_at)
    np.testing.assert_allclose(r0, r1, rtol=1e-5)
    # Extreme elevation clamps near the pole instead of flipping.
    cam.orbit(0.0, 500.0)
    rv = cam.position - cam.look_at
    phi = math.acos(rv[1] / np.linalg.norm(rv))
    assert 0.005 < phi < math.pi - 0.005


def test_zoom_moves_along_f_axis():
    cam = Camera()
    cam.update_camera_matrices()
    pos0 = cam.position.copy()
    cam.zoom(1.5)
    np.testing.assert_allclose(cam.position, pos0 + cam.f_axis * 1.5, atol=1e-6)


def test_frustum_planes():
    cam = Camera()
    cam.update_camera_matrices()
    cam.update_frustum_planes()
    planes = cam.plane_normals
    # Near plane normal = f_axis, offset = f·pos - near.
    np.testing.assert_allclose(planes[0, :3], cam.f_axis, atol=1e-6)
    np.testing.assert_allclose(
        planes[0, 3], float(np.dot(cam.f_axis, cam.position)) - cam.near, atol=1e-6
    )
    # Side-plane offsets are zero (camera-relative planes through origin).
    np.testing.assert_allclose(planes[2:, 3], 0.0, atol=1e-7)
    # Side-plane normals are unit length.
    np.testing.assert_allclose(
        np.linalg.norm(planes[2:, :3], axis=1), 1.0, atol=1e-5
    )


def test_params_pytree_roundtrip():
    cam = Camera()
    cam.orbit(10, 5)
    p = cam.params(k_sigma=2.5)
    np.testing.assert_allclose(np.asarray(p.view), cam.view, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p.r_cam), cam.r_cam, atol=1e-7)
    assert float(p.k_sigma) == 2.5
    full = np.asarray(p.proj) @ np.asarray(p.view)
    np.testing.assert_allclose(full, cam.full_proj, atol=1e-5)


def test_from_pose_opencv_roundtrip():
    """Camera.from_pose must reproduce an OpenCV/COLMAP extrinsic exactly:
    world->camera mapping through our view matrix equals (x_cv, -y_cv,
    -z_cv) of the original R, t (OpenGL-style axes flip)."""
    rng = np.random.default_rng(3)
    # Random proper rotation via QR.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    R = q.astype(np.float32)  # world->camera (OpenCV)
    t = rng.normal(size=3).astype(np.float32)
    c2w = np.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)

    cam = Camera.from_pose(c2w, fy=800.0, height=600, aspect=800 / 600)
    # fov from the pinhole pair.
    import math as _m

    assert abs(cam.fov_y - _m.degrees(2 * _m.atan(600 / 1600.0))) < 1e-6
    for p in rng.normal(size=(5, 3)).astype(np.float32):
        cv = R @ p + t
        ours = (cam.view @ np.concatenate([p, [1.0]]))[:3]
        np.testing.assert_allclose(
            ours, [cv[0], -cv[1], -cv[2]], atol=1e-5
        )
    # OpenGL convention: identity c2w looks down -z from origin.
    gl = Camera.from_pose(np.eye(4), fov_y_deg=60.0, convention="opengl")
    np.testing.assert_allclose(gl.position, 0.0, atol=1e-7)
    np.testing.assert_allclose(gl.look_at, [0.0, 0.0, -1.0], atol=1e-7)
