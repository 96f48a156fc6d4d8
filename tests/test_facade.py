"""Deployable facade (SlamV1): callback delivery in both work modes
(reference: CSlamV1 + SLAM_CallBack, src/version1/slam_v1.h:44-130)."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.mapping.occupancy import (
    empty_grid,
    integrate_scans,
    spec_for_trajectory,
)
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.runtime.facade import SlamCallbacks, SlamV1
from tests.test_features import _room_ranges

MODEL = LMS211


def _trajectory_scans(n=12):
    poses, ranges = [], []
    for i in range(n):
        p = (0.15 * i, 0.05 * i, 0.02 * i)
        poses.append(p)
        ranges.append(_room_ranges(p, seed=i))
    return np.asarray(poses, np.float32), np.stack(ranges).astype(np.float32)


def test_mapping_mode_callbacks_fire():
    fused, slam_poses, obstacles, errors = [], [], [], []
    cb = SlamCallbacks(
        on_fused_pose=lambda p: fused.append(np.array(p)),
        on_slam_pose=lambda p: slam_poses.append(np.array(p)),
        on_obstacle=lambda v, z: obstacles.append((v, z)),
        on_error=lambda c: errors.append(c),
    )
    s = SlamV1(MODEL, callbacks=cb, work_mode="mapping")
    s.start()
    _, ranges = _trajectory_scans(6)
    for i, r in enumerate(ranges):
        s.feed_odometry(0.15 * i, 0.05 * i, 0.02 * i)
        out = s.feed_scan_main(r)
        assert out is not None and out.shape == (3,)
    s.report_error(3)  # SYS_LOST_CNC_SICK_A
    s.stop()
    assert s.feed_scan_main(ranges[0]) is None  # stopped

    assert len(fused) == 6
    assert len(obstacles) == 6
    assert errors == [3]
    # The robot moved; the pipeline must track roughly that motion.
    assert np.linalg.norm(fused[-1][:2]) > 0.3


def test_localization_mode_converges_near_truth():
    # Build a map from ground-truth poses, then localize a scan from a
    # known pose against it.
    poses, ranges = _trajectory_scans(10)
    scans = preprocess(jnp.asarray(ranges), MODEL)
    spec = spec_for_trajectory(poses, MODEL.max_range, 0.05)
    grid = integrate_scans(empty_grid(spec), MODEL, scans, jnp.asarray(poses))

    locs = []
    cb = SlamCallbacks(on_localization=lambda p: locs.append(np.array(p)))
    s = SlamV1(
        MODEL, callbacks=cb, work_mode="localization",
        localization_grid=grid, n_particles=512,
    )
    s.start()
    true = poses[5]
    for k in range(3):
        s.feed_scan_main(_room_ranges(tuple(true), seed=20 + k))
    assert len(locs) == 3
    err = np.linalg.norm(locs[-1][:2] - true[:2])
    assert err < 1.0  # global relocalization narrows to the right spot
