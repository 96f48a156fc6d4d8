"""Submap hierarchy: reduction, bboxes, submap-vs-submap loop verification."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core import se2
from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.graph.loop_closure import LoopCandidates
from laser_slam_tpu.graph.submap import (
    SUBMAP_RESOLUTION,
    build_submaps,
    reduce_group,
    submap_bboxes,
    verify_loops_submap,
)
from laser_slam_tpu.ops.preprocess import preprocess

MODEL = LMS211


def make_log(room, poses):
    ranges = np.stack([room(MODEL, p) for p in poses])
    return preprocess(jnp.asarray(ranges), MODEL)


def test_reduce_group_dedups_to_voxels(room):
    # Two identical scans from the same pose: every point duplicated, so
    # the reduced cloud must contain each voxel at most once.
    poses = [(0.0, 0.0, 0.0), (0.0, 0.0, 0.0)]
    scans = make_log(room, poses)
    pts = scans.points(MODEL)
    ok = ~scans.bad & (scans.ranges < MODEL.max_range)
    rel = jnp.zeros((2, 3), jnp.float32)
    out_pts, out_ok = reduce_group(pts, ok, rel, max_points=512)

    n_valid = int(out_ok.sum())
    assert 0 < n_valid <= 512
    vox = np.floor(
        np.asarray(out_pts, dtype=np.float64)[np.asarray(out_ok)]
        / SUBMAP_RESOLUTION
    ).astype(np.int64)
    keys = vox[:, 0] * 1_000_000 + vox[:, 1]
    assert len(np.unique(keys)) == n_valid  # no duplicate voxels
    # Roughly one voxel per valid input beam (181 beams, convex room).
    assert n_valid >= int(ok[0].sum()) * 0.8


def test_build_submaps_shapes_and_bbox(room):
    # 20 scans moving along +x → 2 submaps of 10.
    poses = np.array(
        [(0.05 * t, 0.0, 0.0) for t in range(20)], np.float32
    )
    scans = make_log(room, poses)
    sm = build_submaps(MODEL, scans, jnp.asarray(poses), stride=10,
                       max_points=512)
    assert sm.points.shape == (2, 512, 2)
    assert list(np.asarray(sm.anchor_idx)) == [0, 10]

    lo, hi = submap_bboxes(sm, jnp.asarray(poses)[sm.anchor_idx])
    lo, hi = np.asarray(lo), np.asarray(hi)
    # Room walls are at x in [-3, 5], y in [-4, 4]; the laser sees the
    # forward half-plane, so the bbox must span the room up to resolution.
    assert np.all(hi[:, 0] > 4.5) and np.all(hi[:, 1] > 3.5)
    assert np.all(lo[:, 1] < -3.5)


def test_verify_loops_submap_accepts_true_loop(room):
    # Two passes over the same place; the second pass's estimated anchor
    # is offset by odometry drift. Verification must recover the drift.
    true_poses = np.array(
        [(0.05 * t, 0.0, 0.0) for t in range(10)]
        + [(0.05 * t, 0.0, 0.0) for t in range(10)],
        np.float32,
    )
    scans = make_log(room, true_poses)
    drift = np.array([0.3, -0.2, 0.05], np.float32)
    est_poses = true_poses.copy()
    est_poses[10:] = np.asarray(
        se2.compose(jnp.asarray(drift), jnp.asarray(true_poses[10:]))
    )

    sm = build_submaps(MODEL, scans, jnp.asarray(true_poses), stride=10,
                       max_points=512)
    anchor_poses = jnp.asarray(est_poses)[sm.anchor_idx]
    cand = LoopCandidates(
        src=jnp.asarray([0], jnp.int32),
        dst=jnp.asarray([1], jnp.int32),
        valid=jnp.asarray([True]),
    )
    loops = verify_loops_submap(sm, anchor_poses, cand, max_corr=1.5)
    assert bool(loops.accept[0])
    # True relative pose between the two anchors is identity (same spot).
    rel = np.asarray(loops.rel[0])
    assert np.linalg.norm(rel[:2]) < 0.08
    assert abs(rel[2]) < 0.03


def test_verify_loops_submap_rejects_far_candidate(room):
    poses = np.array(
        [(0.05 * t, 0.0, 0.0) for t in range(10)]
        + [(0.05 * t + 30.0, 1.5, 0.8) for t in range(10)],
        np.float32,
    )
    # Second group sees a *different* room (shifted box).
    r1 = np.stack([room(MODEL, p) for p in poses[:10]])
    r2 = np.stack(
        [room(MODEL, p, box=(25.0, 36.0, -2.0, 7.0)) for p in poses[10:]]
    )
    scans = preprocess(jnp.asarray(np.concatenate([r1, r2])), MODEL)
    sm = build_submaps(MODEL, scans, jnp.asarray(poses), stride=10,
                       max_points=512)
    # Lie to the verifier that they're in the same place.
    anchor_poses = jnp.asarray(
        np.stack([poses[0], poses[0] + np.array([0.5, 0, 0], np.float32)])
    )
    cand = LoopCandidates(
        src=jnp.asarray([0], jnp.int32),
        dst=jnp.asarray([1], jnp.int32),
        valid=jnp.asarray([True]),
    )
    loops = verify_loops_submap(sm, anchor_poses, cand, max_corr=1.5)
    assert not bool(loops.accept[0])
