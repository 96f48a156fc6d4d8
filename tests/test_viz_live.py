"""Tests for the live viewer (ui/rawseed viewer parity), headless."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.viz.live import LiveViewer, scan_to_world


def test_scan_to_world_projects_valid_beams():
    model = LMS211
    r = np.full(model.n_beams, model.max_range + 10, np.float32)
    mid = model.n_beams // 2  # bearing 0 for the symmetric LMS211 fan
    r[mid] = 2.0
    pts = scan_to_world(model, r, np.asarray([1.0, 1.0, 0.0], np.float32))
    assert pts.shape == (1, 2)
    assert np.allclose(pts[0], [3.0, 1.0], atol=0.02)


def test_viewer_updates_and_captures(tmp_path):
    v = LiveViewer()
    poses = np.cumsum(np.full((20, 3), 0.1, np.float32), axis=0)
    scan = np.random.default_rng(0).uniform(-2, 2, (50, 2)).astype(np.float32)
    v.update(poses=poses, scan_xy=scan)
    frame = v.capture()
    assert frame.ndim == 3 and frame.shape[2] == 3
    v.update(poses=poses * 2.0, scan_xy=scan + 1.0)
    v.capture()

    png = tmp_path / "frame.png"
    gif = tmp_path / "anim.gif"
    v.save_frame(str(png))
    v.save_video(str(gif), fps=5)
    assert png.stat().st_size > 1000
    assert gif.stat().st_size > 1000
    v.close()


def test_viewer_with_map_underlay():
    import jax.numpy as jnp

    from laser_slam_tpu.mapping.occupancy import GridSpec2D, OccupancyGrid

    spec = GridSpec2D(-2.0, -2.0, 0.1, 40, 40)
    grid = OccupancyGrid(
        log_odds=jnp.zeros((40, 40)).at[20, :].set(4.0), spec=spec
    )
    v = LiveViewer()
    v.update(grid=grid, poses=np.zeros((1, 3), np.float32))
    frame = v.capture()
    assert frame.size > 0
    v.close()


def test_cli_view_writes_artifacts(tmp_path, intel_log_path):
    from laser_slam_tpu.cli import main

    frame = tmp_path / "view.png"
    main(
        [
            "view",
            intel_log_path,
            "--scans",
            "60",
            "--stride",
            "30",
            "--frame",
            str(frame),
        ]
    )
    assert frame.stat().st_size > 1000
