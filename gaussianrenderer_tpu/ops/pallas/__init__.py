from gaussianrenderer_tpu.ops.pallas.tile_render import composite_tiles_pallas

__all__ = ["composite_tiles_pallas"]
