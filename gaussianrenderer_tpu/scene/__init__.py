from gaussianrenderer_tpu.scene.camera import Camera, CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene
from gaussianrenderer_tpu.scene.io import load_ply, save_ply, make_random_scene

__all__ = [
    "Camera",
    "CameraParams",
    "GaussianScene",
    "load_ply",
    "save_ply",
    "make_random_scene",
]
