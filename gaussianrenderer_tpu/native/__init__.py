"""Native (C++) runtime components, loaded via ctypes.

The reference implements its data loader in C++ (``gaussians.cpp`` /
``misc.cu``); this package provides the TPU-native equivalent as a small
shared library compiled on first use (g++ -O3) with a ctypes binding and a
transparent fallback to the NumPy parser when no compiler is available.
"""

from gaussianrenderer_tpu.native import ply_native  # noqa: F401

__all__ = ["ply_native"]
