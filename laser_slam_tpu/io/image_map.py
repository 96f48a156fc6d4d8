"""Occupancy maps from images (and back).

The reference's localization maps are loaded from BMP images
(``CVPmap::constructFromImage``, src/localization/VPmap.cpp:23-60:
dark pixels → occupied, light → free, at 2 cm resolution) with a small
BMP library (src/localization/BMPLib). PIL covers every format here;
the conversion to log-odds keeps the same dark=occupied convention.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mapping.occupancy import (
    GridSpec2D,
    LOCALIZATION_RESOLUTION,
    LO_MAX,
    LO_MIN,
    OccupancyGrid,
)

# Pixel thresholds (VPmap.cpp:41-52: <100 occupied, >200 free).
OCC_PIXEL_MAX = 100
FREE_PIXEL_MIN = 200


def grid_from_image(
    path: str,
    resolution: float = LOCALIZATION_RESOLUTION,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
) -> OccupancyGrid:
    """Load an image as an occupancy grid (dark = occupied, light =
    free, mid-gray = unknown; image row 0 is the map's top)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"))
    img = img[::-1]  # image y-down → grid y-up
    lo = np.zeros(img.shape, np.float32)
    lo[img <= OCC_PIXEL_MAX] = LO_MAX
    lo[img >= FREE_PIXEL_MIN] = LO_MIN
    h, w = img.shape
    return OccupancyGrid(
        log_odds=jnp.asarray(lo),
        spec=GridSpec2D(origin_x, origin_y, resolution, w, h),
    )


def grid_to_image_array(grid: OccupancyGrid) -> np.ndarray:
    """Inverse: uint8 image (0 = occupied, 255 = free, 128 = unknown)."""
    lo = np.asarray(grid.log_odds)
    img = np.full(lo.shape, 128, np.uint8)
    img[lo > 0] = 0
    img[lo < 0] = 255
    return img[::-1]


def save_grid_image(grid: OccupancyGrid, path: str) -> None:
    from PIL import Image

    Image.fromarray(grid_to_image_array(grid)).save(path)
