"""Loop-closure detection: batched gating + batched verification.

TPU-native redesign of the reference's serial candidate scan
(``CMapGraph::addMapNodeCov`` loops over all prior submaps,
src/mapGraph/MapGraph.cpp:1272-1484):

- geometric gates — bounding-box overlap ratio ≥ 0.4
  (isOverlappedArea:962-993) and center distance ≤ 2 m
  (isLoopyArea:995-1032, constant-covariance mode) — are evaluated for
  **all** anchor pairs at once as a dense masked matrix;
- candidate verification (the reference rasterizes each submap and runs
  MRPT ICP per candidate, MapNode.cpp:625-759) becomes one vmapped
  scan-matcher batch, shardable across chips;
- acceptance mirrors the reference's gates: match success, bounded
  correction vs the initial guess (isBigTrafo:2103-2114), and a
  match-quality threshold (ICP_QUALITY_THRESHOLD 0.8 / 0.45,
  MapGraph.cpp:42-43);
- mismatch pruning keeps the largest pairwise-consistent cluster of
  accepted loops per target (deleteMisMatch / calculateFinalPose
  semantics, MapGraph.cpp:110-223) via a vote matrix instead of
  sequential deletion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se2
from ..core.scan import LaserModel, Scan
from ..ops.icp_points import match_icp_points, scan_to_points

Array = jnp.ndarray

LOOP_RADIUS = 2.0          # [m] isLoopyArea constant-cov search radius
BBOX_OVERLAP_MIN = 0.4     # isOverlappedArea threshold
MIN_INDEX_GAP = 2          # skip adjacent submaps (addMapNodeCov:1342)
MAX_TRANSFORM_DELTA = 1.5  # [m] DIS_THRESHOLD (MapGraph.cpp:40)
MAX_ANGLE_DELTA = 0.8      # [rad] bound on correction vs odometry guess
QUALITY_MIN = 0.45         # ICP_QUALITY_REVERSE_THRESHOLD (MapGraph.cpp:43)
MATCH_ERR_MAX = 0.12       # [m] mean matched-point distance gate


class LoopCandidates(NamedTuple):
    src: Array    # [C] anchor indices (earlier scan)
    dst: Array    # [C] anchor indices (later scan)
    valid: Array  # [C] bool


class VerifiedLoops(NamedTuple):
    src: Array
    dst: Array
    rel: Array       # [C, 3] measured relative pose src→dst
    quality: Array   # [C] matched-beam fraction
    accept: Array    # [C] bool


def submap_bboxes(
    model: LaserModel, scans: Scan, poses: Array
) -> tuple[Array, Array]:
    """Per-scan world-frame AABBs of valid beam endpoints:
    ``(lo [T,2], hi [T,2])`` (the role of CMapNode::updateObsRange,
    MapNode.cpp:150)."""
    fi = model.bearings(scans.ranges.dtype)
    ok = ~scans.bad & (scans.ranges < model.max_range)
    ang = poses[:, 2:3] + fi[None, :]
    ex = poses[:, 0:1] + scans.ranges * jnp.cos(ang)
    ey = poses[:, 1:2] + scans.ranges * jnp.sin(ang)
    big = 1e9
    lo = jnp.stack(
        [
            jnp.min(jnp.where(ok, ex, big), axis=1),
            jnp.min(jnp.where(ok, ey, big), axis=1),
        ],
        axis=-1,
    )
    hi = jnp.stack(
        [
            jnp.max(jnp.where(ok, ex, -big), axis=1),
            jnp.max(jnp.where(ok, ey, -big), axis=1),
        ],
        axis=-1,
    )
    return lo, hi


def gate_matrix(
    centers: Array,
    bbox_lo: Array,
    bbox_hi: Array,
    radius: float | Array = LOOP_RADIUS,
    min_gap: int = MIN_INDEX_GAP,
) -> Array:
    """``[A, A]`` bool: entry (i, j) true iff anchors i<j are loop-closure
    candidates under the distance + bbox-overlap gates."""
    a = centers.shape[0]
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    near = d2 <= radius * radius

    lo_i, hi_i = bbox_lo[:, None, :], bbox_hi[:, None, :]
    lo_j, hi_j = bbox_lo[None, :, :], bbox_hi[None, :, :]
    inter_lo = jnp.maximum(lo_i, lo_j)
    inter_hi = jnp.minimum(hi_i, hi_j)
    inter = jnp.clip(inter_hi - inter_lo, 0.0)
    inter_area = inter[..., 0] * inter[..., 1]
    area_j = jnp.prod(jnp.clip(hi_j - lo_j, 1e-6), axis=-1)
    overlap_ok = (inter_area / area_j) >= BBOX_OVERLAP_MIN

    ii = jnp.arange(a)
    ordered = (ii[None, :] - ii[:, None]) > min_gap   # j - i > gap
    return near & overlap_ok & ordered


def select_candidates(
    gate: Array, centers: Array, max_pairs: int
) -> LoopCandidates:
    """Pick up to ``max_pairs`` gated pairs, nearest-first, fixed shape."""
    a = gate.shape[0]
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    score = jnp.where(gate, -d2, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_pairs)
    valid = jnp.isfinite(vals)
    return LoopCandidates(src=idx // a, dst=idx % a, valid=valid)


def verify_loops(
    model: LaserModel,
    anchor_scans: Scan,
    anchor_poses: Array,
    cand: LoopCandidates,
    max_corr: float | Array = 1.5,
) -> VerifiedLoops:
    """Batch-verify candidates with free-form trimmed point ICP (the
    zhicp/MRPT role), initializing from the current pose estimates. All
    candidates verify in one vmap, shardable across chips."""
    ref = jax.tree.map(lambda x: x[cand.src], anchor_scans)
    cur = jax.tree.map(lambda x: x[cand.dst], anchor_scans)
    init = se2.relative(anchor_poses[cand.src], anchor_poses[cand.dst])

    ref_pts, ref_ok = jax.vmap(lambda s: scan_to_points(model, s))(ref)
    cur_pts, cur_ok = jax.vmap(lambda s: scan_to_points(model, s))(cur)
    res = jax.vmap(
        lambda rp, ro, cp, co, p: match_icp_points(
            rp, ro, cp, co, p, max_corr=max_corr
        )
    )(ref_pts, ref_ok, cur_pts, cur_ok, init)

    # Reciprocal check: match the pair in the opposite direction too and
    # require the two estimates to invert each other. Perceptually
    # aliased matches (repeated corridors/rooms) rarely reciprocate —
    # this is the batched counterpart of the reference's neighbor
    # consensus validVerify (MapGraph.cpp:1932-1958).
    bwd = jax.vmap(
        lambda cp, co, rp, ro, p: match_icp_points(
            cp, co, rp, ro, p, max_corr=max_corr
        )
    )(cur_pts, cur_ok, ref_pts, ref_ok, se2.inverse(init))
    cycle = se2.compose(res.pose, bwd.pose)
    reciprocal = (jnp.linalg.norm(cycle[:, :2], axis=-1) < 0.10) & (
        jnp.abs(se2.normalize_angle(cycle[:, 2])) < 0.035
    )

    delta = se2.relative(init, res.pose)
    small_corr = (jnp.linalg.norm(delta[:, :2], axis=-1) < MAX_TRANSFORM_DELTA) & (
        jnp.abs(se2.normalize_angle(delta[:, 2])) < MAX_ANGLE_DELTA
    )
    accept = (
        cand.valid
        & ~res.fail
        & ~bwd.fail
        & reciprocal
        & small_corr
        & (res.goodness >= QUALITY_MIN)
        & (res.err < MATCH_ERR_MAX)
    )
    rel = jnp.where(accept[:, None], jnp.nan_to_num(res.pose), 0.0)
    return VerifiedLoops(
        src=cand.src, dst=cand.dst, rel=rel, quality=res.goodness, accept=accept
    )


def consistency_prune(loops: VerifiedLoops, anchor_poses: Array) -> Array:
    """Keep loops consistent with the majority. Each accepted loop implies
    a pose correction ``c = (pose_src ⊕ rel) ⊖-ish pose_dst``; loops whose
    implied corrections agree (within 1 m / 0.3 rad) vote for each other,
    and loops with below-median votes are dropped — the batched analog of
    deleteMisMatch's pairwise-distance pruning (MapGraph.cpp:169-223)."""
    pred_dst = se2.compose(anchor_poses[loops.src], loops.rel)
    corr = jnp.concatenate(
        [
            pred_dst[:, :2] - anchor_poses[loops.dst, :2],
            se2.normalize_angle(pred_dst[:, 2:3] - anchor_poses[loops.dst, 2:3]),
        ],
        axis=-1,
    )
    dt = jnp.linalg.norm(corr[:, None, :2] - corr[None, :, :2], axis=-1)
    da = jnp.abs(se2.normalize_angle(corr[:, None, 2] - corr[None, :, 2]))
    agree = (dt < 1.0) & (da < 0.3)
    agree = agree & loops.accept[None, :] & loops.accept[:, None]
    votes = jnp.sum(agree, axis=1)
    n_acc = jnp.sum(loops.accept)
    # Require support from at least a third of accepted loops (≥1).
    min_votes = jnp.maximum(n_acc // 3, 1)
    return loops.accept & (votes >= min_votes)


def verify_loops_features(
    model: LaserModel,
    anchor_scans: Scan,
    anchor_poses: Array,
    cand: LoopCandidates,
    seed: int = 0,
) -> VerifiedLoops:
    """Feature-RANSAC loop verification — the reference's descriptor
    path (``CMapNode::matchNodePair`` RANSAC feature matching,
    src/mapGraph/MapNode.cpp:657-698 / FlirterNode.cpp:394-423) as a
    batched alternative to :func:`verify_loops`.

    Detects + describes interest points on every anchor once (vmapped),
    then RANSAC-matches each candidate pair at once. Unlike ICP
    verification it needs no initial pose, so it also validates loops
    whose odometry guess has drifted beyond ICP's convergence basin;
    ``quality`` is the inlier fraction of the feature budget.
    """
    from ..features import describe_features, detect_features, match_features

    feats = jax.vmap(lambda s: detect_features(model, s))(anchor_scans)
    descs = jax.vmap(lambda s, f: describe_features(model, s, f))(
        anchor_scans, feats
    )

    fa = jax.tree.map(lambda x: x[cand.src], feats)
    fb = jax.tree.map(lambda x: x[cand.dst], feats)
    da = descs[cand.src]
    db = descs[cand.dst]
    keys = jax.random.split(jax.random.PRNGKey(seed), cand.src.shape[0])
    res = jax.vmap(match_features)(fa, da, fb, db, keys)

    # Gate against the current estimate like isBigTrafo (MapGraph.cpp:
    # 2103-2114) but with a wider radius: features tolerate more drift.
    init = se2.relative(anchor_poses[cand.src], anchor_poses[cand.dst])
    delta = se2.relative(init, res.pose)
    small_corr = (
        jnp.linalg.norm(delta[:, :2], axis=-1) < 2.0 * MAX_TRANSFORM_DELTA
    ) & (jnp.abs(se2.normalize_angle(delta[:, 2])) < MAX_ANGLE_DELTA)

    k = feats.valid.shape[-1]
    quality = res.n_inliers.astype(res.pose.dtype) / float(k)
    accept = cand.valid & ~res.fail & small_corr & (res.n_inliers >= 8)
    rel = jnp.where(accept[:, None], jnp.nan_to_num(res.pose), 0.0)
    return VerifiedLoops(
        src=cand.src, dst=cand.dst, rel=rel, quality=quality, accept=accept
    )
