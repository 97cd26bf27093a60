"""gaussianrenderer_tpu — a TPU-native 3D Gaussian-splatting renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wwangg22/GaussianRenderer (C++17/CUDA/OpenGL):

* PLY scene loading with load-time activations (sigmoid opacity, exp scale)
  — parity with reference ``src/core/utils/gaussians.cpp:17-30``.
* Look-at camera with OpenGL-style perspective, orbit/zoom controls and
  frustum planes — parity with reference ``src/core/scene/camera.cpp``.
* A single jit-compiled functional render step replacing the reference's
  imperative kernel-launch pipeline (``src/core/cuda/render.cu:871-1157``):
  frustum/clip cull → SH view-dependent color → EWA 3D→2D covariance
  projection → tile binning → (tile, depth) key sort → per-tile
  front-to-back alpha compositing.
* A Pallas per-tile compositing kernel that turns the reference's
  one-Gaussian-at-a-time shared-memory loop (``render.cu:266-367``) into
  chunked cumprod + MXU matmul compositing.
* Headless Canvas/viewer session, JSONL benchmark harness, Morton ordering,
  4D spacetime Gaussians, and a multi-chip ``shard_map`` render path.
"""

__version__ = "0.1.0"

from gaussianrenderer_tpu.config import RenderConfig, UiSettings
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.gaussians import GaussianScene
from gaussianrenderer_tpu.scene.io import (
    load_ply,
    load_scene,
    make_clustered_scene,
    make_random_scene,
    make_surface_scene,
    save_ply,
)
from gaussianrenderer_tpu.scene.edit import (
    crop_scene,
    merge_scenes,
    prune_scene,
    transform_scene,
)
from gaussianrenderer_tpu.scene.compact import (
    load_compact,
    load_splat,
    save_compact,
    save_splat,
)
from gaussianrenderer_tpu.render import (
    framebuffer_to_image,
    make_renderer,
    render_frame,
    save_png,
)

__all__ = [
    "framebuffer_to_image",
    "save_png",
    "RenderConfig",
    "UiSettings",
    "Camera",
    "GaussianScene",
    "load_ply",
    "load_scene",
    "save_ply",
    "load_compact",
    "load_splat",
    "save_compact",
    "save_splat",
    "crop_scene",
    "merge_scenes",
    "prune_scene",
    "transform_scene",
    "make_random_scene",
    "make_clustered_scene",
    "make_surface_scene",
    "render_frame",
    "make_renderer",
]
