from gaussianrenderer_tpu.parallel.multichip import (
    a2a_caps_for_scene,
    balance_strip_bounds,
    balance_strips_for_scene,
    default_a2a_caps,
    make_mesh,
    render_frame_multichip,
    row_loads_from_rects,
    shard_scene,
    strip_geometry,
    strip_row_loads,
)

__all__ = [
    "a2a_caps_for_scene",
    "balance_strip_bounds",
    "balance_strips_for_scene",
    "default_a2a_caps",
    "make_mesh",
    "render_frame_multichip",
    "row_loads_from_rects",
    "shard_scene",
    "strip_geometry",
    "strip_row_loads",
]
