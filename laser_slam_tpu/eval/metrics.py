"""Trajectory accuracy metrics: ATE and relative pose error.

The reference evaluates accuracy with per-pair translation/rotation error
against CARMEN ground truth (``testAccuracy``,
src/zhpsm/ZHPolar_Match.cpp:364-447) and by overlaying dumped
trajectories (MapGraph.cpp:399-447). We provide the standard metrics the
field uses today — absolute trajectory error after optimal SE(2)
alignment (Umeyama/Kabsch) plus the reference's per-pair RPE — batched in
JAX so evaluation also runs on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import se2

Array = jnp.ndarray


class AteResult(NamedTuple):
    rmse: Array
    mean: Array
    median: Array
    max: Array


def align_se2(est_xy: Array, gt_xy: Array) -> tuple[Array, Array]:
    """Optimal rotation+translation aligning ``est_xy [T,2]`` onto
    ``gt_xy [T,2]`` (2D Umeyama without scale). Returns ``(R, t)``."""
    mu_e = jnp.mean(est_xy, axis=0)
    mu_g = jnp.mean(gt_xy, axis=0)
    e = est_xy - mu_e
    g = gt_xy - mu_g
    sxx = jnp.sum(e[:, 0] * g[:, 0])
    syy = jnp.sum(e[:, 1] * g[:, 1])
    sxy = jnp.sum(e[:, 0] * g[:, 1])
    syx = jnp.sum(e[:, 1] * g[:, 0])
    theta = jnp.arctan2(sxy - syx, sxx + syy)
    rot = se2.rotation_matrix(theta)
    t = mu_g - rot @ mu_e
    return rot, t


def ate(est: Array, gt: Array) -> AteResult:
    """Absolute trajectory error of ``est [T,3]`` vs ``gt [T,3]`` after
    SE(2) alignment; statistics over per-pose translation errors [m]."""
    rot, t = align_se2(est[:, :2], gt[:, :2])
    aligned = est[:, :2] @ rot.T + t
    errs = jnp.linalg.norm(aligned - gt[:, :2], axis=-1)
    return AteResult(
        rmse=jnp.sqrt(jnp.mean(errs**2)),
        mean=jnp.mean(errs),
        median=jnp.median(errs),
        max=jnp.max(errs),
    )


def rpe(est: Array, gt: Array, delta: int = 1) -> tuple[Array, Array]:
    """Relative pose error at step ``delta``: per-pair translation [m] and
    rotation [rad] error arrays (testAccuracy's per-pair metric)."""
    rel_e = se2.relative(est[:-delta], est[delta:])
    rel_g = se2.relative(gt[:-delta], gt[delta:])
    d = se2.relative(rel_g, rel_e)
    return jnp.linalg.norm(d[:, :2], axis=-1), jnp.abs(se2.normalize_angle(d[:, 2]))
