import numpy as np

from laser_slam_tpu.io.carmen import read_carmen


def test_read_intel(intel_log_path):
    log = read_carmen(intel_log_path)
    assert log.n_scans == 2672
    assert log.ranges.shape == (2672, 181)          # padded 180 → 181
    assert log.gt_pose.shape == (2672, 3)
    assert log.model.name == "LMS211"
    assert abs(log.model.fi_min + np.pi / 2) < 1e-4  # start = -90°
    assert abs(log.model.max_range - 50.0) < 1e-6
    # Out-of-range readings (81.83 m) stay above max_range.
    assert log.ranges.max() > 50.0
    # GT poses look like the building-sized Intel lab loop.
    span = log.gt_pose[:, :2].max(0) - log.gt_pose[:, :2].min(0)
    assert 10.0 < span[0] < 100.0 and 10.0 < span[1] < 100.0
    # Laser pose of the first record matches the first VERTEX2.
    assert np.allclose(log.laser_pose[0], log.gt_pose[0], atol=0.02)


def test_read_fr079(fr079_log_path):
    log = read_carmen(fr079_log_path)
    assert log.n_scans == 1464
    assert log.ranges.shape[1] == 361
    assert log.model.name == "LMS511"


def test_read_mit(mit_log_path):
    log = read_carmen(mit_log_path)
    assert log.n_scans == 1051
    assert log.ranges.shape[1] == 361
