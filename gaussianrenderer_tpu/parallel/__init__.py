from gaussianrenderer_tpu.parallel.multichip import (
    balance_strip_bounds,
    balance_strips_for_scene,
    make_mesh,
    render_frame_multichip,
    row_loads_from_rects,
    shard_scene,
    strip_geometry,
    strip_row_loads,
)

__all__ = [
    "balance_strip_bounds",
    "balance_strips_for_scene",
    "make_mesh",
    "render_frame_multichip",
    "row_loads_from_rects",
    "shard_scene",
    "strip_geometry",
    "strip_row_loads",
]
