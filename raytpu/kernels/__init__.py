"""Pallas TPU kernels for the hot path."""

from raytpu.kernels.trace_pallas import render_image_pallas, render_pixels_pallas

__all__ = ["render_image_pallas", "render_pixels_pallas"]
