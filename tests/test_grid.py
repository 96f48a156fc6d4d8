import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.mapping.occupancy import (
    GridSpec2D,
    empty_grid,
    integrate_scans,
    occupied_points,
    spec_for_trajectory,
)
from laser_slam_tpu.ops.preprocess import preprocess

MODEL = LMS211


def _grid_from_room(room, poses):
    ranges = np.stack([room(MODEL, p) for p in poses])
    scans = preprocess(jnp.asarray(ranges), MODEL)
    spec = GridSpec2D(-6.0, -6.0, 0.05, 260, 220)
    return integrate_scans(
        empty_grid(spec), MODEL, scans, jnp.asarray(np.asarray(poses, np.float32))
    )


def test_integrate_marks_walls_occupied_interior_free(room):
    grid = _grid_from_room(room, [(0.0, 0.0, 0.0), (0.5, 0.2, 1.0), (0, 0, 2.5)])
    lo = np.asarray(grid.log_odds)
    spec = grid.spec

    def cell(x, y):
        return lo[int((y - spec.origin_y) / spec.resolution),
                  int((x - spec.origin_x) / spec.resolution)]

    # Wall point hit by many beams (box x in [-3,5], y in [-4,4]).
    assert cell(5.0 + 0.02, 0.0) > 0 or cell(5.0 - 0.03, 0.0) > 0
    # Interior free space.
    assert cell(1.0, 0.0) < 0
    assert cell(0.0, 1.0) < 0
    # Far outside stays unknown.
    assert cell(-5.5, -5.5) == 0


def test_occupied_points_extraction(room):
    grid = _grid_from_room(room, [(0.0, 0.0, 0.0), (0.3, 0.0, 3.0)])
    pts, valid = occupied_points(grid, 4096)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 50
    # All extracted points lie near the box walls.
    on_wall = (
        (np.abs(pts[:, 0] - 5.0) < 0.2)
        | (np.abs(pts[:, 0] + 3.0) < 0.2)
        | (np.abs(pts[:, 1] - 4.0) < 0.2)
        | (np.abs(pts[:, 1] + 4.0) < 0.2)
    )
    assert on_wall.mean() > 0.9


def test_spec_for_trajectory_covers():
    poses = np.array([[0, 0, 0], [10, 5, 1]], np.float32)
    spec = spec_for_trajectory(poses, max_range=8.0, resolution=0.1)
    assert spec.origin_x < -8.0
    assert spec.origin_x + spec.width * spec.resolution > 18.0


def test_integrate_is_jittable(room):
    poses = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    ranges = jnp.asarray(room(MODEL, (0, 0, 0))[None])
    scans = preprocess(ranges, MODEL)
    spec = GridSpec2D(-6.0, -6.0, 0.1, 120, 110)
    out = jax.jit(lambda g, s, p: integrate_scans(g, MODEL, s, p))(
        empty_grid(spec), scans, poses
    )
    assert np.isfinite(np.asarray(out.log_odds)).all()
