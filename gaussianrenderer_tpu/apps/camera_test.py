"""Camera smoke (reference ``camera_test.cpp``)."""

def main() -> int:
    from gaussianrenderer_tpu.scene.camera import Camera

    cam = Camera()
    cam.set_fov_y(120.0)
    cam.update_camera_matrices()
    cam.update_frustum_planes()
    print("view:\n", cam.view)
    print("proj:\n", cam.proj)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
