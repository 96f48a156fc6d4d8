"""Tests for the rolling egocentric local map (MapService parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211, Scan
from laser_slam_tpu.nav.local_map import (
    LocalMapService,
    empty_local_map,
    obstacle_distance_field,
    recenter,
    update_local_map,
)
from laser_slam_tpu.ops.preprocess import preprocess


def _wall_scan(model, dist=2.0):
    """Scan of a straight wall ``dist`` m ahead (x = dist plane)."""
    fi = np.arange(model.n_beams) * model.dfi + model.fi_min
    r = np.where(np.abs(fi) < 1.0, dist / np.maximum(np.cos(fi), 1e-3), model.max_range + 1)
    s = preprocess(jnp.asarray(r, jnp.float32)[None, :], model)
    return jax.tree.map(lambda a: a[0], s)


def test_update_marks_wall_and_freespace():
    model = LMS211
    lmap = empty_local_map(size=96, resolution=0.1)
    scan = _wall_scan(model, 2.0)
    pose = jnp.zeros(3)
    for _ in range(4):
        lmap = update_local_map(lmap, model, scan, pose)
    prob = np.asarray(lmap.probability())
    # robot sits at the center cell; the wall is 20 cells in +x
    cy, cx = 48, 48
    assert prob[cy, cx + 20] > 0.7, prob[cy, cx + 18 : cx + 24]
    # free space on the way there
    assert prob[cy, cx + 10] < 0.2
    # behind the robot: unknown
    assert abs(prob[cy, cx - 20] - 0.5) < 0.05


def test_recenter_preserves_world_content():
    model = LMS211
    lmap = empty_local_map(size=96, resolution=0.1)
    scan = _wall_scan(model, 2.0)
    lmap = update_local_map(lmap, model, scan, jnp.zeros(3))
    before = np.asarray(lmap.log_odds)
    cy, cx = 48, 48
    assert before[cy, cx + 20] > 0

    # move the robot 1 m forward: the wall cell scrolls 10 cells back
    moved = recenter(lmap, jnp.asarray([1.0, 0.0, 0.0]))
    after = np.asarray(moved.log_odds)
    assert np.allclose(after[cy, cx + 10], before[cy, cx + 20])
    # revealed strip ahead is unknown
    assert np.allclose(after[:, -5:], 0.0)


def test_recenter_same_pose_is_identity():
    lmap = empty_local_map(size=32, resolution=0.1)
    lmap = lmap._replace(log_odds=lmap.log_odds.at[10, 12].set(3.0))
    out = recenter(lmap, jnp.asarray([0.05, 0.05, 0.3]))
    assert np.allclose(np.asarray(out.log_odds), np.asarray(lmap.log_odds))


def test_distance_field_exact_euclidean():
    lmap = empty_local_map(size=48, resolution=0.5)
    occ_at = [(10, 20), (30, 5), (40, 40)]
    lo = lmap.log_odds
    for y, x in occ_at:
        lo = lo.at[y, x].set(5.0)
    lmap = lmap._replace(log_odds=lo)
    d = np.asarray(obstacle_distance_field(lmap))

    yy, xx = np.mgrid[0:48, 0:48]
    brute = np.full((48, 48), np.inf)
    for y, x in occ_at:
        brute = np.minimum(brute, np.hypot(yy - y, xx - x))
    assert np.allclose(d, brute * 0.5, atol=1e-3)


def test_service_stream_and_jit_cache():
    model = LMS211
    svc = LocalMapService(model, size=64, resolution=0.1)
    scan = _wall_scan(model, 1.5)
    for i in range(3):
        m = svc.stream_in(scan, np.asarray([0.1 * i, 0.0, 0.0], np.float32))
    d = np.asarray(svc.distance_field())
    # the robot center keeps clearance to the wall roughly 1.5 - 0.2 m
    assert 0.8 < d[32, 32] < 1.6, d[32, 32]
