"""Correlative scan matching: exhaustive pose-grid search on TPU.

The reference handles hard alignments (fast rotation, loop closures with
unknown relative pose) with FLIRT interest points + RANSAC
(src/mapGraph/FlirterNode.cpp:394-482) and MRPT ICP over submap clouds
(MapNode.cpp:625-655). A TPU-first redesign replaces both with
*correlative* matching: rasterize the reference scan into a blurred
likelihood grid and score **every** pose in a (θ, tx, ty) search volume
by summing grid lookups of the transformed current scan — a dense
gather/reduce with no data-dependent control flow that finds the global
optimum over its window (no local minima, unlike ICP). The rotation axis
is processed with ``lax.map`` so the live score volume stays small even
when the matcher is vmapped over hundreds of candidate pairs; a trimmed
point-ICP polish recovers sub-cell accuracy.

This is the robust front for:
- odometry fallback on aggressive rotation (PSM's ±window search fails),
- loop-closure verification from drift-sized initial errors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se2
from ..core.scan import LaserModel, Scan
from .icp_points import match_icp_points, scan_to_points

Array = jnp.ndarray

GRID_RES = 0.10          # [m] cell size of the likelihood grid
GRID_HALF_EXTENT = 12.8  # [m] half-width of the grid (256 cells at 10 cm)
BLUR_SIGMA_CELLS = 1.0   # Gaussian blur of the hit grid, in cells
MIN_SCORE = 0.25         # acceptance floor on mean point likelihood


class CorrelativeResult(NamedTuple):
    pose: Array    # [3] best relative pose (cur in ref frame)
    score: Array   # [] mean per-point likelihood of the best pose (0..1)
    fail: Array    # [] bool


def build_likelihood_grid(
    model: LaserModel,
    scan: Scan,
    res: float = GRID_RES,
    half_extent: float = GRID_HALF_EXTENT,
    blur_sigma: float = BLUR_SIGMA_CELLS,
) -> Array:
    """Rasterize a scan's endpoints into a blurred occupancy-likelihood
    grid ``[G, G]`` (sensor at the center), values in [0, 1]."""
    g = int(round(2 * half_extent / res))
    pts, ok = scan_to_points(model, scan)
    ix = jnp.floor((pts[:, 0] + half_extent) / res).astype(jnp.int32)
    iy = jnp.floor((pts[:, 1] + half_extent) / res).astype(jnp.int32)
    inb = ok & (ix >= 0) & (ix < g) & (iy >= 0) & (iy < g)
    flat = jnp.where(inb, iy * g + ix, 0)
    hits = jnp.zeros(g * g, scan.ranges.dtype).at[flat].add(
        jnp.where(inb, 1.0, 0.0)
    )
    grid = jnp.clip(hits.reshape(g, g), 0.0, 1.0)

    # Separable Gaussian blur (5-cell kernel, peak 1).
    r = jnp.arange(-2, 3, dtype=scan.ranges.dtype)
    k = jnp.exp(-0.5 * (r / blur_sigma) ** 2)
    blur1 = jax.vmap(lambda row: jnp.correlate(row, k, mode="same"))(grid)
    blur2 = jax.vmap(lambda col: jnp.correlate(col, k, mode="same"))(blur1.T).T
    return jnp.clip(blur2, 0.0, 1.0)


def _score_theta(
    grid: Array,
    res: float,
    half_extent: float,
    pts: Array,      # [N, 2]
    valid: Array,    # [N]
    theta: Array,    # []
    steps: Array,    # [T] translation offsets (multiples of res)
    base_xy: Array,  # [2]
) -> Array:
    """Score grid ``[T, T]`` for one rotation: mean point likelihood at
    every (tx, ty) shift. The shift moves whole cells, so one floor +
    integer offsets covers the entire translation window."""
    g = grid.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    rx = pts[:, 0] * c - pts[:, 1] * s + base_xy[0]
    ry = pts[:, 0] * s + pts[:, 1] * c + base_xy[1]
    ix = jnp.floor((rx + half_extent) / res).astype(jnp.int32)   # [N]
    iy = jnp.floor((ry + half_extent) / res).astype(jnp.int32)
    off = jnp.round(steps / res).astype(jnp.int32)               # [T]

    gx = ix[:, None] + off[None, :]                              # [N, Tx]
    gy = iy[:, None] + off[None, :]                              # [N, Ty]
    okx = (gx >= 0) & (gx < g)
    oky = (gy >= 0) & (gy < g)
    gxc = jnp.clip(gx, 0, g - 1)
    gyc = jnp.clip(gy, 0, g - 1)

    flat = gyc[:, None, :] * g + gxc[:, :, None]                 # [N, Tx, Ty]
    vals = jnp.take(grid.reshape(-1), flat)
    ok = valid[:, None, None] & okx[:, :, None] & oky[:, None, :]
    vals = jnp.where(ok, vals, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1).astype(vals.dtype)
    return jnp.sum(vals, axis=0) / n                             # [Tx, Ty]


def match_correlative(
    model: LaserModel,
    ref: Scan,
    cur: Scan,
    init_pose: Array | None = None,
    search_xy: float = 2.4,
    search_theta: float = float(jnp.pi),
    n_theta: int = 72,
    res: float = GRID_RES,
    refine: bool = True,
    prior_xy: float = 0.02,
    prior_theta: float = 0.005,
) -> CorrelativeResult:
    """Correlative match of ``cur`` against ``ref`` over the search
    volume ``±search_xy [m] × ±search_theta [rad]`` centered on
    ``init_pose``, followed by a trimmed point-ICP polish.

    ``prior_xy``/``prior_theta`` add a quadratic penalty on distance from
    ``init_pose`` — far below real peak contrast, but enough to break the
    ties a corridor's translation-invariant (or a symmetric room's
    rotation-invariant) score plateau produces.
    """
    dtype = cur.ranges.dtype
    if init_pose is None:
        init_pose = jnp.zeros(3, dtype)

    grid = build_likelihood_grid(model, ref, res=res)
    pts, valid = scan_to_points(model, cur)

    thetas = init_pose[2] + jnp.linspace(
        -search_theta, search_theta, n_theta, dtype=dtype
    )
    n_steps = int(search_xy / res)
    steps = jnp.arange(-n_steps, n_steps + 1, dtype=dtype) * res

    score = jax.lax.map(
        lambda th: _score_theta(
            grid, res, GRID_HALF_EXTENT, pts, valid, th, steps, init_pose[:2]
        ),
        thetas,
    )                                                           # [K, T, T]
    dth_pen = se2.normalize_angle(thetas - init_pose[2]) ** 2
    penalty = (
        prior_theta * dth_pen[:, None, None]
        + prior_xy * (steps**2)[None, :, None]
        + prior_xy * (steps**2)[None, None, :]
    )
    score = score - penalty
    k = jnp.argmax(score)
    kk, ka, kb = jnp.unravel_index(k, score.shape)
    pose = jnp.stack(
        [
            init_pose[0] + steps[ka],
            init_pose[1] + steps[kb],
            se2.normalize_angle(thetas[kk]),
        ]
    )
    best = score[kk, ka, kb]

    if refine:
        ref_pts, ref_ok = scan_to_points(model, ref)
        icp = match_icp_points(
            ref_pts, ref_ok, pts, valid, pose, iters=15, max_corr=3.0 * res
        )
        pose = jnp.where(icp.fail, pose, icp.pose)

    return CorrelativeResult(pose=pose, score=best, fail=best < MIN_SCORE)
