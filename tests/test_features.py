"""Feature pipeline: detection stability, descriptor invariance,
RANSAC transform recovery (reference: FLIRT wrapper in
src/mapGraph/FlirterNode.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.core import se2
from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.features import (
    describe_features,
    descriptor_distance,
    detect_features,
    match_features,
)
from laser_slam_tpu.ops.preprocess import preprocess


MODEL = LMS211


def _room_ranges(pose, n=181, seed=0):
    """Ray-cast a cornered polygon room from ``pose`` (analytic)."""
    # Rectangular room [-4, 6] x [-3, 5] with a protruding block corner —
    # blobs/corners for the detector to find.
    fi = np.arange(n) * np.deg2rad(1.0) - np.pi / 2 + pose[2]
    ox, oy = pose[0], pose[1]
    segs = [
        ((-4, -3), (6, -3)),
        ((6, -3), (6, 5)),
        ((6, 5), (-4, 5)),
        ((-4, 5), (-4, -3)),
        ((1, -3), (1, -1)),
        ((1, -1), (2.5, -1)),
        ((2.5, -1), (2.5, -3)),
    ]
    r = np.full(n, 50.0)
    for (x1, y1), (x2, y2) in segs:
        dx, dy = x2 - x1, y2 - y1
        for i in range(n):
            cx, cy = np.cos(fi[i]), np.sin(fi[i])
            den = cx * dy - cy * dx
            if abs(den) < 1e-12:
                continue
            t = ((x1 - ox) * dy - (y1 - oy) * dx) / den
            u_num = (x1 - ox) * cy - (y1 - oy) * cx
            u = u_num / -den if abs(den) > 1e-12 else -1
            # solve: o + t*c = p1 + u*(p2-p1)
            A = np.array([[cx, -dx], [cy, -dy]])
            b = np.array([x1 - ox, y1 - oy])
            det = np.linalg.det(A)
            if abs(det) < 1e-12:
                continue
            t, u = np.linalg.solve(A, b)
            if t > 0.05 and 0.0 <= u <= 1.0:
                r[i] = min(r[i], t)
    rng = np.random.default_rng(seed)
    return r + rng.normal(0, 0.005, n)


def _scan_at(pose, seed=0):
    r = jnp.asarray(_room_ranges(pose, seed=seed), jnp.float32)
    return jax.tree.map(lambda x: x[0], preprocess(r[None, :], MODEL))


def test_detector_finds_features_and_is_fixed_shape():
    scan = _scan_at((0.0, 0.0, 0.0))
    feats = jax.jit(lambda s: detect_features(MODEL, s))(scan)
    assert feats.xy.shape == (32, 2)
    n = int(jnp.sum(feats.valid))
    assert n >= 4  # the room's corners
    # All valid features lie on finite-range returns.
    assert bool(jnp.all(jnp.linalg.norm(feats.xy[feats.valid], axis=-1) < 50.0))


def test_detector_repeatable_under_rotation():
    """Corners of the room should be re-detected (in world frame) from a
    rotated viewpoint."""
    pa = (0.0, 0.0, 0.0)
    pb = (0.0, 0.0, 0.35)
    fa = detect_features(MODEL, _scan_at(pa))
    fb = detect_features(MODEL, _scan_at(pb, seed=1))
    wa = np.asarray(se2.transform_points(jnp.asarray(pa, jnp.float32), fa.xy))
    wb = np.asarray(se2.transform_points(jnp.asarray(pb, jnp.float32), fb.xy))
    va, vb = np.asarray(fa.valid), np.asarray(fb.valid)
    # Each of the strongest world-frame features of A has a neighbour in B.
    hits = 0
    for p in wa[va][:6]:
        d = np.linalg.norm(wb[vb] - p, axis=1)
        hits += int(d.min() < 0.3)
    assert hits >= 3


def test_descriptor_normalized_and_distance_separates():
    scan = _scan_at((0.0, 0.0, 0.0))
    feats = detect_features(MODEL, scan)
    desc = describe_features(MODEL, scan, feats)
    sums = np.asarray(jnp.sum(desc, axis=-1))
    valid = np.asarray(feats.valid)
    assert np.all(sums[valid] <= 1.0 + 1e-5)
    d = np.asarray(descriptor_distance(desc, desc))
    # Self-distance is zero; χ² is symmetric and bounded by 1.
    assert np.allclose(np.diag(d)[valid], 0.0, atol=1e-6)
    assert np.allclose(d, d.T, atol=1e-6)
    assert d[valid][:, valid].max() <= 1.0 + 1e-5


@pytest.mark.parametrize("true_pose", [(0.3, -0.2, 0.25), (-0.4, 0.3, -0.3)])
def test_ransac_recovers_relative_pose(true_pose):
    """Scans from two poses: match_features must recover B's frame in
    A's frame = inverse(pose_a) ∘ pose_b."""
    pa = (0.0, 0.0, 0.0)
    pb = true_pose
    sa = _scan_at(pa, seed=0)
    sb = _scan_at(pb, seed=1)
    fa = detect_features(MODEL, sa)
    fb = detect_features(MODEL, sb)
    da = describe_features(MODEL, sa, fa)
    db = describe_features(MODEL, sb, fb)
    res = jax.jit(match_features)(fa, da, fb, db)
    assert not bool(res.fail)
    expected = np.asarray(
        se2.relative(jnp.asarray(pa, jnp.float32), jnp.asarray(pb, jnp.float32))
    )
    got = np.asarray(res.pose)
    assert np.linalg.norm(got[:2] - expected[:2]) < 0.15
    assert abs(se2.normalize_angle(got[2] - expected[2])) < 0.1
    assert float(res.information) > 0


def test_verify_loops_features_accepts_true_revisit():
    """Two scans from (nearly) the same pose must verify as a loop; a
    far-apart pair must not."""
    from laser_slam_tpu.graph.loop_closure import (
        LoopCandidates,
        verify_loops_features,
    )

    poses = np.array(
        [[0, 0, 0], [1.5, 0.5, 0.2], [0.05, -0.05, 0.02]], np.float32
    )
    scans = [
        _scan_at(tuple(p), seed=i) for i, p in enumerate(poses)
    ]
    anchor_scans = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    cand = LoopCandidates(
        src=jnp.array([0, 1]), dst=jnp.array([2, 2]),
        valid=jnp.array([True, True]),
    )
    # Feed slightly wrong pose estimates (odometry drift) — feature
    # verification should still recover the true revisit 0 -> 2.
    est = jnp.asarray(poses + np.array([[0, 0, 0], [0.2, -0.1, 0.05], [0.3, 0.2, -0.04]], np.float32))
    out = verify_loops_features(MODEL, anchor_scans, est, cand)
    assert bool(out.accept[0])
    got = np.asarray(out.rel[0])
    expected = np.asarray(se2.relative(jnp.asarray(poses[0]), jnp.asarray(poses[2])))
    assert np.linalg.norm(got[:2] - expected[:2]) < 0.2
