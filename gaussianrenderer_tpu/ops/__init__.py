from gaussianrenderer_tpu.ops.sh import eval_sh
from gaussianrenderer_tpu.ops.projection import preprocess_gaussians, ProjectedGaussians
from gaussianrenderer_tpu.ops.tiling import build_sorted_instances, TileAssignment

__all__ = [
    "eval_sh",
    "preprocess_gaussians",
    "ProjectedGaussians",
    "build_sorted_instances",
    "TileAssignment",
]
