"""Interactive viewer demo (reference ``window_test.cpp`` → legacy viewer).

Opens the browser viewer on a synthetic scene — the milestone-2
"interactive viewer" artifact, with orbit/zoom/slider interaction served
over localhost instead of GLFW/OpenGL.
"""

import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.viewer import Canvas

    canvas = Canvas(height=args.size, width=args.size)
    canvas.init()
    canvas.camera.set_position([0.0, 0.0, 6.0])
    canvas.camera.set_fov_y(70.0)
    canvas.camera.set_clipping_planes(0.2, 100.0)
    canvas.camera.update_camera_matrices()
    canvas.set_scene(make_random_scene(args.n, seed=0))
    canvas.serve(port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
