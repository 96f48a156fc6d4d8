"""Accuracy diagnostics: where does residual trajectory error live?

The reference evaluates only aggregate per-pair error (``testAccuracy``,
src/zhpsm/ZHPolar_Match.cpp:364-447) and eyeballs overlaid trajectories
(MapGraph.cpp:399-447). For a loop-closing SLAM system that is not
enough: an aggregate ATE of several meters with hundreds of accepted
loops means the error is *structured* — concentrated in uncovered
trajectory spans, in orientation drift between anchors, or in wrong
loops bending the solve — and each cause needs a different fix. This
module breaks the error down:

- :func:`segment_errors` — per-segment translation/heading error after
  one global alignment (which spans are bad?);
- :func:`loop_coverage` — per-anchor count of bank loops (which spans
  are unconstrained?);
- :func:`classify_loops` — each loop's measured relative pose checked
  against ground truth (how many accepted loops are actually wrong, and
  by how much?).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..core import se2
from .metrics import align_se2


def _wrap(a: np.ndarray) -> np.ndarray:
    return (a + np.pi) % (2 * np.pi) - np.pi


class SegmentErrors(NamedTuple):
    seg_start: np.ndarray   # [S] first scan index of each segment
    t_rmse: np.ndarray      # [S] translation RMSE [m] within the segment
    t_max: np.ndarray       # [S]
    h_mean: np.ndarray      # [S] mean |heading error| [rad]


def aligned_errors(est: np.ndarray, gt: np.ndarray):
    """Per-pose translation error [T] and heading error [T] after one
    global SE(2) alignment of ``est`` onto ``gt`` (the ATE alignment)."""
    import jax.numpy as jnp

    rot, t = align_se2(jnp.asarray(est[:, :2]), jnp.asarray(gt[:, :2]))
    rot = np.asarray(rot)
    t = np.asarray(t)
    xy = est[:, :2] @ rot.T + t
    terr = np.linalg.norm(xy - gt[:, :2], axis=-1)
    dtheta = float(np.arctan2(rot[1, 0], rot[0, 0]))
    herr = _wrap(est[:, 2] + dtheta - gt[:, 2])
    return terr, herr


def segment_errors(
    est: np.ndarray, gt: np.ndarray, seg_len: int = 100
) -> SegmentErrors:
    """Per-segment breakdown of globally-aligned trajectory error."""
    terr, herr = aligned_errors(est, gt)
    t = est.shape[0]
    starts = np.arange(0, t, seg_len)
    t_rmse, t_max, h_mean = [], [], []
    for s in starts:
        sl = slice(s, min(s + seg_len, t))
        t_rmse.append(float(np.sqrt(np.mean(terr[sl] ** 2))))
        t_max.append(float(np.max(terr[sl])))
        h_mean.append(float(np.mean(np.abs(herr[sl]))))
    return SegmentErrors(
        seg_start=starts,
        t_rmse=np.asarray(t_rmse),
        t_max=np.asarray(t_max),
        h_mean=np.asarray(h_mean),
    )


def loop_coverage(
    src: np.ndarray, dst: np.ndarray, active: np.ndarray, n_anchors: int
) -> np.ndarray:
    """[A] count of active bank loops touching each anchor."""
    cov = np.zeros(n_anchors, np.int32)
    np.add.at(cov, src[active], 1)
    np.add.at(cov, dst[active], 1)
    return cov


class LoopReport(NamedTuple):
    n: int                 # active loops
    n_correct: int         # |rel - rel_gt| within tolerance
    t_err: np.ndarray      # [n] translation error vs GT [m]
    r_err: np.ndarray      # [n] rotation error vs GT [rad]
    gap: np.ndarray        # [n] anchor index gap
    src: np.ndarray
    dst: np.ndarray


def classify_loops(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    active: np.ndarray,
    gt_anchor: np.ndarray,
    t_tol: float = 0.5,
    r_tol: float = 0.2,
) -> LoopReport:
    """Check each active loop's measured relative pose against the
    ground-truth relative pose of its anchors."""
    import jax.numpy as jnp

    s = src[active]
    d = dst[active]
    m = rel[active]
    rel_gt = np.asarray(
        se2.relative(jnp.asarray(gt_anchor[s]), jnp.asarray(gt_anchor[d]))
    )
    diff = np.asarray(se2.relative(jnp.asarray(rel_gt), jnp.asarray(m)))
    t_err = np.linalg.norm(diff[:, :2], axis=-1)
    r_err = np.abs(_wrap(diff[:, 2]))
    correct = (t_err < t_tol) & (r_err < r_tol)
    return LoopReport(
        n=int(active.sum()),
        n_correct=int(correct.sum()),
        t_err=t_err,
        r_err=r_err,
        gap=np.abs(d.astype(np.int64) - s.astype(np.int64)),
        src=s,
        dst=d,
    )
