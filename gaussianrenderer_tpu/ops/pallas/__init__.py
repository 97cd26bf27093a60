from gaussianrenderer_tpu.ops.pallas.tile_render2 import composite_tiles_packed

__all__ = ["composite_tiles_packed"]
