import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.core import se2
from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.ops import preprocess as pp
from laser_slam_tpu.ops.correlative import build_likelihood_grid, match_correlative
from laser_slam_tpu.ops.icp_points import match_icp_points, scan_to_points
from laser_slam_tpu.ops.plicp import match_plicp

MODEL = LMS211


def _pillar_ranges(pose, center=(2.0, 1.5), radius=0.4):
    """Ray-circle intersection distances for an interior pillar (breaks
    the rectangle's rotational symmetry for global-search tests)."""
    x0, y0, th = pose
    n = MODEL.n_beams
    ang = th + (np.arange(n) * MODEL.dfi + MODEL.fi_min)
    dx, dy = np.cos(ang), np.sin(ang)
    fx, fy = x0 - center[0], y0 - center[1]
    b = fx * dx + fy * dy
    c = fx * fx + fy * fy - radius * radius
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    return np.where(hit, t, np.inf).astype(np.float32)


def _room_with_pillar(room, pose):
    r = room(MODEL, pose)
    return np.minimum(r, _pillar_ranges(pose)).astype(np.float32)


# Irregular pentagon: no two walls parallel or at 90° — no Manhattan
# aliasing, which global rotation search needs to be testable on a
# single synthetic room.
_POLY = np.array(
    [[-3.0, -2.5], [4.0, -3.5], [5.5, 1.0], [1.0, 4.0], [-2.5, 2.0]],
    dtype=np.float64,
)


def _polygon_ranges(pose):
    x0, y0, th = pose
    n = MODEL.n_beams
    ang = th + (np.arange(n) * MODEL.dfi + MODEL.fi_min)
    dx, dy = np.cos(ang), np.sin(ang)
    best = np.full(n, np.inf)
    v = _POLY
    for k in range(len(v)):
        p, q = v[k], v[(k + 1) % len(v)]
        ex, ey = q[0] - p[0], q[1] - p[1]
        den = dx * ey - dy * ex
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((p[0] - x0) * ey - (p[1] - y0) * ex) / den
            s = ((p[0] - x0) * dy - (p[1] - y0) * dx) / den
        ok = (np.abs(den) > 1e-9) & (t > 0) & (s >= 0) & (s <= 1)
        best = np.where(ok & (t < best), t, best)
    best = np.where(np.isfinite(best), best, MODEL.max_range + 1.0)
    return np.minimum(
        best, _pillar_ranges(pose, center=(1.5, 0.5), radius=0.35)
    ).astype(np.float32)


def _pair(room, pose_a, rel, seed=0, polygon=False):
    rng = np.random.default_rng(seed)
    pose_b = tuple(np.asarray(se2.compose(jnp.asarray(pose_a), jnp.asarray(rel))))
    gen = _polygon_ranges if polygon else (lambda p: room(MODEL, p))
    ra = gen(pose_a) + rng.normal(0, 0.004, MODEL.n_beams).astype(np.float32)
    rb = gen(pose_b) + rng.normal(0, 0.004, MODEL.n_beams).astype(np.float32)
    return (
        pp.preprocess(jnp.asarray(ra), MODEL),
        pp.preprocess(jnp.asarray(rb), MODEL),
    )


def test_plicp_recovers_pose(room):
    rel = (0.08, -0.04, 0.05)
    sa, sb = _pair(room, (0.3, -0.2, 0.15), rel)
    res = match_plicp(MODEL, sa, sb)
    assert not bool(res.fail)
    assert np.allclose(np.asarray(res.pose), rel, atol=0.03)
    # Covariance is SPD and small for a well-constrained room.
    cov = np.asarray(res.cov)
    assert np.all(np.linalg.eigvalsh(cov) > 0)
    assert np.trace(cov) < 0.1


def test_plicp_covariance_grows_in_corridor():
    # Two parallel walls only: translation along the corridor (x here)
    # is unobservable; its variance must dominate.
    n = MODEL.n_beams
    fi = np.arange(n) * MODEL.dfi + MODEL.fi_min
    d = np.sin(fi)
    with np.errstate(divide="ignore"):
        r = np.where(np.abs(d) > 0.05, 1.5 / np.abs(d), MODEL.max_range + 1)
    r = np.clip(r, 0.1, MODEL.max_range + 1).astype(np.float32)
    sa = pp.preprocess(jnp.asarray(r), MODEL)
    res = match_plicp(MODEL, sa, sa)
    cov = np.asarray(res.cov)
    assert cov[0, 0] > 10 * cov[1, 1]


def test_correlative_full_rotation_search(room):
    # ~70° rotation — far beyond the banded matchers' ±20° window but
    # with substantial FOV overlap. (At >100° a 180°-FOV scanner shares
    # <40% of its view and a symmetric room aliases — that regime is
    # handled by the weak-edge path, not by matching.)
    rel = (0.2, -0.1, 1.2)
    sa, sb = _pair(room, (0.5, 0.3, 0.1), rel, polygon=True)
    res = match_correlative(MODEL, sa, sb, search_xy=1.2, n_theta=72)
    assert not bool(res.fail)
    est = np.asarray(res.pose)
    assert np.allclose(est[:2], rel[:2], atol=0.08)
    assert abs(se2.normalize_angle(jnp.asarray(est[2] - rel[2]))) < 0.05


def test_correlative_batched_vmap(room):
    rels = np.array([[0.1, 0.0, 0.5], [-0.2, 0.1, -1.0]], dtype=np.float32)
    pairs = [
        _pair(room, (0.2, 0.1, 0.0), tuple(r), seed=i, polygon=True)
        for i, r in enumerate(rels)
    ]
    sa = jax.tree.map(lambda *x: jnp.stack(x), *[p[0] for p in pairs])
    sb = jax.tree.map(lambda *x: jnp.stack(x), *[p[1] for p in pairs])
    res = jax.vmap(
        lambda a, b: match_correlative(MODEL, a, b, search_xy=1.2, n_theta=48)
    )(sa, sb)
    est = np.asarray(res.pose)
    assert np.allclose(est[:, :2], rels[:, :2], atol=0.1)


def test_likelihood_grid_peaks_at_endpoints(room):
    scan = pp.preprocess(jnp.asarray(room(MODEL, (0.0, 0.0, 0.0))), MODEL)
    grid = build_likelihood_grid(MODEL, scan)
    pts, ok = scan_to_points(MODEL, scan)
    pts = np.asarray(pts)[np.asarray(ok)]
    g = grid.shape[0]
    ix = np.floor((pts[:, 0] + 12.8) / 0.10).astype(int)
    iy = np.floor((pts[:, 1] + 12.8) / 0.10).astype(int)
    inb = (ix >= 0) & (ix < g) & (iy >= 0) & (iy < g)
    vals = np.asarray(grid)[iy[inb], ix[inb]]
    assert vals.mean() > 0.8


def test_icp_points_masked_invalid(room):
    sa, sb = _pair(room, (0.0, 0.0, 0.0), (0.05, 0.0, 0.0))
    rp, rok = scan_to_points(MODEL, sa)
    cp, cok = scan_to_points(MODEL, sb)
    # Invalidate half the current points — result should still converge.
    cok = cok & (jnp.arange(MODEL.n_beams) % 2 == 0)
    res = match_icp_points(rp, rok, cp, cok)
    assert not bool(res.fail)
    assert np.allclose(np.asarray(res.pose), [0.05, 0, 0], atol=0.03)
