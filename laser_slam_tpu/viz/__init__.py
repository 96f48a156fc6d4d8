"""Visualization: PNG map rendering (drawmap role) and the live
map/trajectory/scan viewer (the reference's Qt/OpenGL ui/, ui_/,
rawseed/ windows), headless-friendly."""

from .render import grid_to_image, render_map_png, save_png

__all__ = ["grid_to_image", "render_map_png", "save_png"]
