"""Frontend/backend overlap: the async backend must not block feed_scan.

The reference's three threads overlap — ThreadLocal1 keeps matching
scans while ThreadGlobal1 optimizes the graph, with corrections applied
through the synFromGlobal back-edge (slam.cpp:40-67,
threadLocal1.cpp:326-359). VERDICT r3 #6: the r3 backend round blocked
``feed_scan`` for the full round duration. With ``async_backend=True``
the round runs on a host worker thread against a session snapshot and
the correction splices in on completion, extending to scans that
arrived while the round was in flight.
"""

import dataclasses
import time

import numpy as np

from laser_slam_tpu.runtime.online import OnlineSlam
from laser_slam_tpu.runtime.slam import SlamConfig

from tests.test_online_loops import MODEL, box_ranges, loop_trajectory


def _small_cfg():
    return dataclasses.replace(
        SlamConfig(),
        submap_points=256, wide_points=512, max_loops=64,
        verify_chunk=16, n_theta=24, n_peaks=4, per_dst=6,
        search_xy=3.0, gn_iters=10,
    )


def _drive(async_backend: bool):
    slam = OnlineSlam(
        MODEL, cfg=_small_cfg(), optimize_every=4,
        incremental_map=False, async_backend=async_backend,
    )
    gt = loop_trajectory(170)
    rng = np.random.default_rng(0)
    lat = []
    for pose in gt:
        ranges = (box_ranges(pose)
                  + rng.normal(0, 0.004, MODEL.n_beams)).astype(np.float32)
        t0 = time.perf_counter()
        slam.feed_scan(ranges)
        lat.append(time.perf_counter() - t0)
    if async_backend:
        slam.flush()
    return slam, np.asarray(lat), gt


def test_async_backend_overlaps_frontend():
    slam_a, lat_a, gt = _drive(async_backend=True)

    # Loops were found and applied through the async path.
    bank = slam_a._backend._bank
    assert bank is not None
    assert int((bank["act"] & bank["strict"]).sum()) >= 1

    # The corrected trajectory stays consistent after splicing.
    traj = slam_a.trajectory
    gap = np.linalg.norm(traj[-1, :2] - gt[-1, :2])
    assert gap < 1.5, f"async trajectory end deviates {gap:.2f} m"

    # Overlap: a synchronous backend round takes seconds (it contains
    # chunked verification + a robust solve); with async_backend no
    # feed_scan call may block anywhere near that long. The worst feed
    # latency must stay far below the round wall (warm steps are ~tens
    # of ms; allow generous CI headroom).
    sync_round = getattr(slam_a._backend, "_last_round_wall", None)
    # Warm-step latencies only (skip the first 20: compile).
    worst = float(lat_a[20:].max())
    assert sync_round is not None and sync_round > 0
    assert worst < 0.5 * sync_round, (
        f"feed_scan blocked {worst:.2f}s vs backend round "
        f"{sync_round:.2f}s — no overlap"
    )
