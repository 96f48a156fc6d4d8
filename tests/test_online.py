"""Online facade test: feed scans incrementally, poses must match the
offline odometry chain and the backend round must not corrupt state."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.odometry import odometry_keyframe
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.runtime.online import OnlineSlam
from laser_slam_tpu.runtime.slam import SlamConfig


def test_online_matches_offline_frontend(intel_log_path):
    log = read_carmen(intel_log_path, max_scans=60)
    model = log.model

    slam = OnlineSlam(model, SlamConfig(anchor_stride=10), optimize_every=10**9)
    poses = [slam.feed_scan(r) for r in log.ranges]
    online = np.stack(poses)

    scans = preprocess(jnp.asarray(log.ranges), model)
    offline = np.asarray(odometry_keyframe(model, scans).poses)
    assert np.allclose(online, offline, atol=1e-4)


def test_online_backend_round_runs(intel_log_path):
    log = read_carmen(intel_log_path, max_scans=120)
    slam = OnlineSlam(log.model, SlamConfig(anchor_stride=10, max_loops=32),
                      optimize_every=8)
    for r in log.ranges:
        slam.feed_scan(r)
    traj = slam.trajectory
    assert traj.shape == (120, 3)
    assert np.isfinite(traj).all()
    # Pose callback fires.
    seen = []
    slam2 = OnlineSlam(log.model, on_pose=lambda p: seen.append(p))
    for r in log.ranges[:5]:
        slam2.feed_scan(r)
    assert len(seen) == 4  # first scan initializes without callback
