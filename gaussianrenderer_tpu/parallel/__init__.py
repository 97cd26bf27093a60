from gaussianrenderer_tpu.parallel.multichip import (
    make_mesh,
    render_frame_multichip,
    shard_scene,
)

__all__ = ["make_mesh", "render_frame_multichip", "shard_scene"]
