"""PLY parse smoke (reference ``parser_test.cpp``)."""

import sys


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: parser_test <scene.ply>", file=sys.stderr)
        return 2
    from gaussianrenderer_tpu.scene.io import load_ply

    scene = load_ply(sys.argv[1])
    print(
        f"parsed {scene.num_gaussians} gaussians, sh degree {scene.sh_degree}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
