from gaussianrenderer_tpu.parallel.multichip import (
    balance_strip_bounds,
    make_mesh,
    render_frame_multichip,
    shard_scene,
)

__all__ = [
    "balance_strip_bounds",
    "make_mesh",
    "render_frame_multichip",
    "shard_scene",
]
