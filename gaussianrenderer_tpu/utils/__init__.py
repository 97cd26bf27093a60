"""Shared utilities: timing, JSONL benchmark sink, device-time measurement."""

from gaussianrenderer_tpu.utils.timing import (
    device_time,
    measure_floor,
    FrameTimer,
)
from gaussianrenderer_tpu.utils.jsonl import JsonlWriter
from gaussianrenderer_tpu.utils.compile_cache import enable_compilation_cache

__all__ = [
    "device_time",
    "measure_floor",
    "FrameTimer",
    "JsonlWriter",
    "enable_compilation_cache",
]
