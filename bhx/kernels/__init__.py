"""Pallas TPU kernels for the hot geodesic march loop."""

from bhx.kernels.march_pallas import march_pallas, MarchKernelConfig

__all__ = ["march_pallas", "MarchKernelConfig"]
