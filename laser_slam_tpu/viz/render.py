"""Map and trajectory rendering to PNG.

Replaces the reference's Qt-based offline renderer
(src/drawmap/drawmap.cpp:96-130: 8-bit QImage → PNG with trajectory
overlay) with a numpy/PIL rasterizer — no GUI stack required.
"""

from __future__ import annotations

import numpy as np

from ..mapping.occupancy import OccupancyGrid


def grid_to_image(grid: OccupancyGrid) -> np.ndarray:
    """Render the grid to ``[H, W, 3]`` uint8: white = free, black =
    occupied, gray = unknown (drawmap's convention)."""
    lo = np.asarray(grid.log_odds)
    p = 1.0 / (1.0 + np.exp(-lo))
    img = np.full(lo.shape + (3,), 200, dtype=np.uint8)  # unknown gray
    known = np.abs(lo) > 1e-6
    shade = np.clip((1.0 - p) * 255.0, 0, 255).astype(np.uint8)
    for c in range(3):
        img[..., c] = np.where(known, shade, img[..., c])
    return img[::-1]  # y-up


def draw_trajectory(
    img: np.ndarray, grid: OccupancyGrid, poses: np.ndarray,
    color=(220, 30, 30),
) -> np.ndarray:
    """Overlay trajectory points onto a rendered grid image."""
    spec = grid.spec
    h = spec.height
    xy = np.asarray(poses)[:, :2]
    ix = np.floor((xy[:, 0] - spec.origin_x) / spec.resolution).astype(int)
    iy = np.floor((xy[:, 1] - spec.origin_y) / spec.resolution).astype(int)
    ok = (ix >= 0) & (ix < spec.width) & (iy >= 0) & (iy < h)
    rows = (h - 1 - iy[ok])  # image is y-flipped
    img = img.copy()
    img[rows, ix[ok]] = color
    return img


def save_png(img: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def render_map_png(
    grid: OccupancyGrid, path: str, poses: np.ndarray | None = None
) -> None:
    img = grid_to_image(grid)
    if poses is not None:
        img = draw_trajectory(img, grid, poses)
    save_png(img, path)
