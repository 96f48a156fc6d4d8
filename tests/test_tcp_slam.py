"""Distributed TCP SLAM: loopback fold over the real wire protocol."""

import numpy as np
import pytest

pytest.importorskip("laser_slam_tpu.native.api")

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.runtime.slam import SlamConfig
from laser_slam_tpu.runtime.tcp_slam import run_loopback


def test_loopback_distributed_slam(intel_log_path):
    log = read_carmen(intel_log_path, max_scans=150)
    traj, loops = run_loopback(
        log.model, log.ranges,
        SlamConfig(anchor_stride=10, max_loops=32),
    )
    assert traj.shape == (150, 3)
    assert np.isfinite(traj).all()
    # Trajectory must actually move (odometry ran client-side).
    assert np.linalg.norm(traj[-1, :2] - traj[0, :2]) > 0.5
