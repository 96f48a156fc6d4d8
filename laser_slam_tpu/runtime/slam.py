"""Full SLAM pipelines: offline batch and online facade.

``slam_offline`` is the TPU-first pipeline: on-device keyframe odometry
(one ``lax.scan``), then a fixed number of loop-closure rounds, each a
single jitted program — batched gating over all anchor pairs, one vmapped
verification batch, robust graph solve — followed by trajectory
re-attachment. It covers the role of the reference's 3-thread online
pipeline + backend (SURVEY §3.2: ThreadLocal1/2 + ThreadGlobal1 +
CMapGraph) in a form where every expensive step is one large batched
kernel instead of a serial loop.

The anchor spacing mirrors the reference's submap granularity
(``g_session_size`` = 10 pose nodes per MapNode, MapGraph.cpp:725), and
edge information values mirror its constants (adj=50, loop=10,
MapGraph.cpp:250-261).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se2
from ..core.scan import LaserModel, Scan
from ..graph.loop_closure import (
    VerifiedLoops,
    consistency_prune,
    drift_radius_matrix,
    gate_matrix,
    pcm_prune,
    select_candidates,
    submap_bboxes,
    verify_loops,
    verify_loops_correlative,
)
from ..graph.place_recognition import signature_gate, submap_signatures
from ..graph.submap import (
    Submaps,
    build_submaps,
    submap_bboxes as merged_bboxes,
    verify_loops_submap,
    wide_clouds,
)
from ..graph.solve import PoseGraph, optimize, optimize_with_init
from ..ops.odometry import odometry_keyframe
from ..ops.preprocess import preprocess

Array = jnp.ndarray

INFO_ADJ = 50.0    # sequential-edge information (MapGraph.cpp:251)
INFO_LOOP = 10.0   # loop-edge information (MapGraph.cpp:252)
INFO_WEAK = 0.5    # sequential edges spanning a weak/low-overlap step
#                    (the reference's corridor value, MapGraph.cpp:253)


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    anchor_stride: int = 10        # g_session_size (MapGraph.cpp:725)
    max_loops: int = 512           # loop-candidate batch capacity
    rounds: int = 6                # gate→verify→optimize repetitions
    #                                (each verifies a fresh candidate
    #                                slice; accepted loops accumulate)
    loop_radius: float = 2.0       # isLoopyArea constant-cov radius [m]
    gn_iters: int = 20
    use_submaps: bool = False      # verify loops submap-vs-submap (MapNode
    #                                hierarchy) instead of scan-vs-scan
    submap_points: int = 768       # fixed point budget per submap
    # Correlative loop closing (init-free; the default pipeline).
    use_correlative: bool = True
    drift_rate: float = 0.15       # [m / anchor step] gate-radius growth
    #                                (measured p95 odometry drift on
    #                                intel-lab ≈ 0.2 m/anchor-step)
    drift_anneal: float = 0.35     # per-round decay of drift_rate
    radius_max: float = 25.0       # [m] clip of the gate radius — must
    #                                admit full-drift revisits; precision
    #                                comes from verification, not gating
    per_dst: int = 12              # candidate budget per later anchor
    search_xy: float = 5.0         # [m] identity-centered verify window
    n_theta: int = 72              # rotation samples over ±π
    coarse_res: float = 0.3        # [m] correlative grid cell
    verify_chunk: int = 32         # candidates per memory chunk
    sig_per_dst: int = 6           # signature-gate candidates per anchor
    radius_max_uncov: float = 60.0 # [m] gate-radius clip for pairs that
    #                                would cover a zero-coverage anchor:
    #                                uncovered spans never benefited from
    #                                earlier solves, so their pose
    #                                estimates still carry full drift and
    #                                the annealed radius would never
    #                                reach their true revisits (measured:
    #                                anchors 10-41 of intel-lab stayed
    #                                unconstrained through all rounds)
    min_quality: float = 0.7       # ICP goodness floor on loops —
    #                                measured 99% edge precision; the
    #                                solve needs few-and-right edges
    #                                (loosening to 0.6 floods the bank
    #                                with mild-wrong loops and WORSENS
    #                                ATE despite higher recall)
    wing: int = 4                  # ± submaps in the wide reference cloud
    wide_points: int = 1536        # point budget of a wide cloud
    n_peaks: int = 4               # polished correlative peaks per pair
    pcm_rate: float = 0.25         # [m/√anchor-step] PCM drift tolerance
    #                                (random-walk model; see pcm_prune)
    trim_residual_t: float = 1.0   # [m] post-solve loop-residual trim
    trim_residual_r: float = 0.3   # [rad]
    promote_residual_t: float = 0.7  # [m] tentative-loop promotion gate
    promote_residual_r: float = 0.2  # [rad]


class SlamResult(NamedTuple):
    poses: Array          # [T, 3] optimized trajectory
    odo_poses: Array      # [T, 3] raw odometry trajectory
    anchor_idx: Array     # [A] scan indices of graph vertices
    n_loops: Array        # [] accepted loop edges (last round)
    chi2: Array           # [] final graph chi²


def _loop_round(
    model: LaserModel,
    cfg: SlamConfig,
    anchor_scans: Scan,
    anchor_poses: Array,
    rel_seq: Array,
    radius: Array | float | None = None,
    seq_weight: Array | None = None,
    submaps: Submaps | None = None,
):
    """One gate→verify→prune→solve round over anchors; returns updated
    anchor poses and the number of accepted loops. ``radius`` may be a
    traced scalar so the compiled round is reusable across rounds with
    an escalating search radius. ``seq_weight [A-1]`` scales sequential
    edge information (weak odometry intervals get INFO_WEAK/INFO_ADJ).
    With ``submaps``, gating and verification run on the merged
    keyframe-group clouds (the MapNode hierarchy) instead of single
    anchor scans."""
    if radius is None:
        radius = cfg.loop_radius
    if submaps is not None:
        bbox_lo, bbox_hi = merged_bboxes(submaps, anchor_poses)
    else:
        bbox_lo, bbox_hi = submap_bboxes(model, anchor_scans, anchor_poses)
    gate = gate_matrix(anchor_poses[:, :2], bbox_lo, bbox_hi, radius=radius)
    cand = select_candidates(gate, anchor_poses[:, :2], cfg.max_loops)
    if submaps is not None:
        loops = verify_loops_submap(
            submaps, anchor_poses, cand, max_corr=radius
        )
    else:
        loops = verify_loops(
            model, anchor_scans, anchor_poses, cand, max_corr=radius
        )
    keep = consistency_prune(loops, anchor_poses)

    a = anchor_poses.shape[0]
    seq_i = jnp.arange(a - 1, dtype=jnp.int32)
    seq_j = seq_i + 1
    eye = jnp.eye(3, dtype=anchor_poses.dtype)
    if seq_weight is None:
        seq_weight = jnp.ones(a - 1, anchor_poses.dtype)

    i_all = jnp.concatenate([seq_i, loops.src.astype(jnp.int32)])
    j_all = jnp.concatenate([seq_j, loops.dst.astype(jnp.int32)])
    meas = jnp.concatenate([rel_seq, loops.rel], axis=0)
    info = jnp.concatenate(
        [
            jnp.tile(eye[None] * INFO_ADJ, (a - 1, 1, 1))
            * seq_weight[:, None, None],
            jnp.tile(eye[None] * INFO_LOOP, (cfg.max_loops, 1, 1))
            * loops.quality[:, None, None],
        ],
        axis=0,
    )
    active = jnp.concatenate([jnp.ones(a - 1, bool), keep])
    kernel = jnp.concatenate(
        [
            jnp.zeros(a - 1, jnp.int32),                 # seq: Huber
            jnp.ones(cfg.max_loops, jnp.int32),          # loops: DCS
        ]
    )

    g = PoseGraph(
        poses=anchor_poses,
        v_active=jnp.ones(a, bool),
        i=i_all,
        j=j_all,
        meas=meas,
        info=info,
        e_active=active,
        kernel=kernel,
    )
    g_opt, chi = optimize(g, cfg.gn_iters)
    return g_opt.poses, jnp.sum(keep), chi


def _propose_and_verify(
    cfg: SlamConfig,
    anchor_poses: Array,
    rate: Array,
    submaps: Submaps,
    wide: tuple[Array, Array],
    sig_gate: Array,
    tried: Array,
    coverage: Array,
):
    """One proposal+verification wave: drift-aware pose gate ∪ appearance
    gate, minus already-tried pairs → identity-centered correlative
    verification. Returns the verified loops and the pair mask to add to
    ``tried``. ``coverage [A]`` counts bank loops touching each anchor;
    pairs that would bind an uncovered anchor are verified first.

    This is the TPU form of the reference's addMapNodeCov loop search
    (MapGraph.cpp:1272-1484) with its two blind spots fixed: candidates
    are proposed even where the odometry estimate is useless, and
    verification needs no initial guess (identity-centered exhaustive
    search), so drift-sized loops close instead of being silently
    unreachable. Each wave gets a fresh slice of the candidate space —
    the ``tried`` exclusion spends the fixed verification budget on new
    pairs every round while accepted loops accumulate in the caller's
    bank.
    """
    a = anchor_poses.shape[0]
    dtype = anchor_poses.dtype
    centers = anchor_poses[:, :2]

    rad = drift_radius_matrix(
        a, cfg.loop_radius, rate, cfg.radius_max, dtype
    )
    # Escalation for uncovered anchors: their spans were never corrected
    # by a solve, so their pose distances still carry the *full* initial
    # odometry drift — gate them with the un-annealed rate and a wider
    # clip, or their true revisits stay out of reach forever.
    uncov = coverage == 0
    pair_uncov = uncov[:, None] | uncov[None, :]
    rate0 = jnp.asarray(cfg.drift_rate, dtype)
    rad0 = drift_radius_matrix(
        a, cfg.loop_radius, rate0, cfg.radius_max_uncov, dtype
    )
    rad = jnp.where(pair_uncov, jnp.maximum(rad, rad0), rad)
    pose_gate = gate_matrix(
        centers, radius=rad, min_gap=5, overlap_min=None
    )
    gate = (pose_gate | sig_gate) & ~tried
    boost = 0.5 * pair_uncov.astype(dtype)
    cand = select_candidates(
        gate, centers, cfg.max_loops, radius=rad, per_dst=cfg.per_dst,
        boost=boost,
    )

    # Trust radius for acceptance: the *unclipped* drift model — at
    # large gaps odometry carries no information and the geometric
    # verification gates alone must decide. Pairs touching uncovered
    # anchors keep the un-annealed rate here too.
    gap = jnp.abs(cand.dst - cand.src).astype(dtype)
    cand_uncov = uncov[cand.src] | uncov[cand.dst]
    trust_rate = jnp.where(cand_uncov, rate0, rate)
    trust = cfg.loop_radius + trust_rate * gap

    loops = verify_loops_correlative(
        submaps,
        anchor_poses,
        cand,
        cand_radius=trust,
        wide_pts=wide[0],
        wide_ok=wide[1],
        search_xy=cfg.search_xy,
        search_theta=float(jnp.pi),
        n_theta=cfg.n_theta,
        coarse_res=cfg.coarse_res,
        n_peaks=cfg.n_peaks,
        chunk=cfg.verify_chunk,
        quality_min=cfg.min_quality,
        identity_init=True,
    )
    tried_new = tried.at[cand.src, cand.dst].set(
        tried[cand.src, cand.dst] | cand.valid
    )
    return loops, tried_new


def _solve_with_bank(
    cfg: SlamConfig,
    anchor_poses: Array,
    odo_anchor_poses: Array,
    rel_seq: Array,
    seq_weight: Array,
    bank_src: Array,
    bank_dst: Array,
    bank_rel: Array,
    bank_quality: Array,
    bank_active: Array,
    bank_strict: Array,
):
    """Robust solve over the sequential chain + the accumulated loop
    bank: PCM pruning (drift-scaled mutual consistency through the raw
    odometry), tentative-loop promotion, LAGO linear initialization, LM
    with Huber/DCS kernels, then one residual-trim + re-solve pass.

    Two complementary residual mechanisms act around the solves:

    - **trim** removes strict loops whose measurement disagrees with the
      first solution: with ~90%+ of strict loops correct the first
      solution is mostly right, so a grossly false loop (perceptual
      alias, typically 10-25 m wrong) shows a huge residual and is
      deactivated. PCM alone cannot make this separation (an aliased
      cluster stays self-consistent under drift-scaled thresholds), and
      DCS only downweights — it cannot un-bend LAGO's linear stage.
    - **promotion** adds loose-tier loops whose residual under the
      current estimate is small: correct tentative matches sit within
      centimeters of a near-correct solution while wrong ones are
      meters off (measured 36-correct / 3-wrong at 0.7 m on intel-lab),
      so each solve unlocks the low-overlap loops — exactly the long-gap
      constraints the strict gates are too conservative to pass."""
    a = anchor_poses.shape[0]
    dtype = anchor_poses.dtype
    bank = VerifiedLoops(
        src=bank_src, dst=bank_dst, rel=bank_rel, quality=bank_quality,
        accept=bank_active,
    )
    keep = pcm_prune(bank, odo_anchor_poses, rate_t=cfg.pcm_rate)

    def promoted(poses):
        pred = se2.relative(poses[bank_src], poses[bank_dst])
        d = se2.relative(bank_rel, pred)
        near = (
            jnp.linalg.norm(d[:, :2], axis=-1) < cfg.promote_residual_t
        ) & (jnp.abs(se2.normalize_angle(d[:, 2])) < cfg.promote_residual_r)
        return bank_active & ~bank_strict & near

    # Strict loops only for the first solve: promotion under a still-
    # drifted estimate admits exactly the drift-consistent (wrong)
    # tentatives and anchors the drift (measured: ATE 9.8 vs 6.2 when
    # promoting pre-solve on intel-lab).
    keep = keep & bank_strict

    seq_i = jnp.arange(a - 1, dtype=jnp.int32)
    eye = jnp.eye(3, dtype=dtype)
    i_all = jnp.concatenate([seq_i, bank_src.astype(jnp.int32)])
    j_all = jnp.concatenate([seq_i + 1, bank_dst.astype(jnp.int32)])
    meas = jnp.concatenate([rel_seq, bank_rel], axis=0)
    info = jnp.concatenate(
        [
            jnp.tile(eye[None] * INFO_ADJ, (a - 1, 1, 1))
            * seq_weight[:, None, None],
            jnp.tile(eye[None] * INFO_LOOP, (bank_src.shape[0], 1, 1))
            * jnp.clip(bank_quality, 0.0, 1.0)[:, None, None],
        ],
        axis=0,
    )
    active = jnp.concatenate([jnp.ones(a - 1, bool), keep])
    kernel = jnp.concatenate(
        [jnp.zeros(a - 1, jnp.int32),
         jnp.ones(bank_src.shape[0], jnp.int32)]
    )
    g = PoseGraph(
        poses=anchor_poses,
        v_active=jnp.ones(a, bool),
        i=i_all,
        j=j_all,
        meas=meas,
        info=info,
        e_active=active,
        kernel=kernel,
    )
    g_opt, chi = optimize_with_init(g, cfg.gn_iters)

    # Residual trim + promotion under the first solution, then re-solve.
    pred = se2.relative(g_opt.poses[bank_src], g_opt.poses[bank_dst])
    d = se2.relative(bank_rel, pred)
    bad = (jnp.linalg.norm(d[:, :2], axis=-1) > cfg.trim_residual_t) | (
        jnp.abs(se2.normalize_angle(d[:, 2])) > cfg.trim_residual_r
    )
    keep2 = ((keep & bank_strict) | promoted(g_opt.poses)) & ~bad
    active2 = jnp.concatenate([jnp.ones(a - 1, bool), keep2])
    g2 = g_opt._replace(e_active=active2)
    g_opt2, chi2_ = optimize(g2, cfg.gn_iters)
    return g_opt2.poses, jnp.sum(keep2), chi2_


def run_correlative_rounds(
    cfg: SlamConfig,
    submaps: Submaps,
    anchor_poses: Array,
    rel_seq: Array,
    seq_weight: Array,
    bank: dict | None = None,
    tried: Array | None = None,
    odo_anchor_poses: Array | None = None,
):
    """The init-free loop-closure backend: ``cfg.rounds`` waves of
    propose→verify→bank→robust-solve over prebuilt submaps.

    Factored out of :func:`slam_offline` so the online/deployable paths
    (and replay tooling) drive the *same* machinery incrementally: pass
    ``bank``/``tried`` from a previous call to continue a session. The
    reference's counterpart is the backend loop search performed on
    every submap insert (threadGlobal1.cpp:62-128 → addMapNodeCov,
    MapGraph.cpp:1272-1484).

    Returns ``(anchor_poses, n_loops, chi, bank, tried)``.
    """
    import numpy as np

    dtype = anchor_poses.dtype
    sig_gate = jax.jit(
        lambda p, v: signature_gate(
            submap_signatures(p, v), min_gap=5, per_dst=cfg.sig_per_dst
        )
    )(submaps.points, submaps.valid)
    if odo_anchor_poses is None:
        # First call of a session: the incoming estimate IS the raw
        # odometry chain (the PCM/drift reference).
        odo_anchor_poses = anchor_poses
    wide = jax.jit(
        lambda sm, op: wide_clouds(
            sm, op, wing=cfg.wing, max_points=cfg.wide_points
        )
    )(submaps, odo_anchor_poses)
    verify_fn = jax.jit(
        lambda ap, rate, sm, wd, sg, tr, cov: _propose_and_verify(
            cfg, ap, rate, sm, wd, sg, tr, cov
        )
    )
    solve_fn = jax.jit(
        lambda ap, op, rels, w, bs, bd, br, bq, ba, bt:
        _solve_with_bank(
            cfg, ap, op, rels, w, bs, bd, br, bq, ba, bt
        )
    )
    a = int(anchor_poses.shape[0])
    if tried is None:
        tried = jnp.zeros((a, a), bool)
    cap = cfg.max_loops
    if bank is None:
        bank = {
            "src": np.zeros(cap, np.int32),
            "dst": np.zeros(cap, np.int32),
            "rel": np.zeros((cap, 3), np.float32),
            "q": np.zeros(cap, np.float32),
            "act": np.zeros(cap, bool),
            "strict": np.zeros(cap, bool),
        }
    n_loops = jnp.asarray(0)
    chi = jnp.asarray(0.0, dtype)
    for r in range(cfg.rounds):
        # The drift-rate anneals: once a solve has absorbed the
        # loops found so far, pose distances are trustworthy at
        # tighter radii and the budget shifts to nearby pairs.
        # Already-verified pairs are excluded, so every round spends
        # its full budget on a new slice of the candidate space;
        # accepted loops persist in the bank across rounds.
        rate = jnp.asarray(
            cfg.drift_rate * (cfg.drift_anneal**r), dtype
        )
        cov = np.zeros(a, np.int32)
        on = bank["act"] & bank["strict"]
        np.add.at(cov, bank["src"][on], 1)
        np.add.at(cov, bank["dst"][on], 1)
        loops, tried = verify_fn(
            anchor_poses, rate, submaps, wide, sig_gate, tried,
            jnp.asarray(cov),
        )
        acc = np.asarray(loops.accept)
        # Bank both tiers: strict accepts enter the solve directly;
        # tentative matches wait in the bank until the promotion
        # residual check in _solve_with_bank unlocks them (ADVICE r2:
        # banking only `acc` made the whole promotion path dead code).
        take = acc | np.asarray(loops.tentative)
        src = np.concatenate([bank["src"][bank["act"]],
                              np.asarray(loops.src)[take]])
        dst = np.concatenate([bank["dst"][bank["act"]],
                              np.asarray(loops.dst)[take]])
        rel = np.concatenate([bank["rel"][bank["act"]],
                              np.asarray(loops.rel)[take]])
        q = np.concatenate([bank["q"][bank["act"]],
                            np.asarray(loops.quality)[take]])
        strict = np.concatenate([bank["strict"][bank["act"]],
                                 acc[take]])
        # Strict loops outrank tentative ones when the cap binds.
        order = np.argsort(-(q + 10.0 * strict))[:cap]
        n = len(order)
        for key, val in (("src", src), ("dst", dst), ("rel", rel),
                         ("q", q), ("strict", strict)):
            bank[key][:n] = val[order]
        bank["act"][:] = False
        bank["act"][:n] = True
        anchor_poses, n_loops, chi = solve_fn(
            anchor_poses, odo_anchor_poses, rel_seq, seq_weight,
            jnp.asarray(bank["src"]), jnp.asarray(bank["dst"]),
            jnp.asarray(bank["rel"]), jnp.asarray(bank["q"]),
            jnp.asarray(bank["act"]), jnp.asarray(bank["strict"]),
        )
    return anchor_poses, n_loops, chi, bank, tried


def slam_offline(
    model: LaserModel,
    ranges: Array,
    cfg: SlamConfig = SlamConfig(),
    diag: dict | None = None,
) -> SlamResult:
    """End-to-end SLAM over a ``[T, N]`` range log.

    Host-orchestrated: the odometry chain, the loop round, and the
    re-attachment each compile once; the loop round is re-invoked
    ``cfg.rounds`` times with updated poses (same shapes → cached
    executable), keeping XLA program size independent of round count.
    """
    front = jax.jit(
        lambda r: _frontend(model, cfg, r), static_argnums=()
    )
    (scans, odo_poses, anchor_idx, anchor_scans, anchor_poses, rel_seq,
     seq_weight) = front(ranges)

    submaps = None
    if cfg.use_submaps or cfg.use_correlative:
        submaps = jax.jit(
            lambda s, p: build_submaps(
                model, s, p, cfg.anchor_stride, cfg.submap_points
            )
        )(scans, odo_poses)

    n_loops = jnp.asarray(0)
    chi = jnp.asarray(0.0, ranges.dtype)

    if cfg.use_correlative:
        odo_anchor_poses = anchor_poses
        anchor_poses, n_loops, chi, bank, tried = run_correlative_rounds(
            cfg, submaps, anchor_poses, rel_seq, seq_weight,
            odo_anchor_poses=odo_anchor_poses,
        )
    else:
        round_fn = jax.jit(
            lambda a_scans, a_poses, rels, radius, w, sm: _loop_round(
                model, cfg, a_scans, a_poses, rels, radius, w, sm
            )
        )
        for r in range(cfg.rounds):
            # Escalating search radius: early rounds close tight,
            # reliable loops; later rounds, with drift already reduced,
            # reach farther (the role of the reference's covariance-
            # scaled isLoopyArea search, MapGraph.cpp:1012-1017).
            radius = jnp.asarray(cfg.loop_radius * (2.0**r), ranges.dtype)
            anchor_poses, n_loops, chi = round_fn(
                anchor_scans, anchor_poses, rel_seq, radius, seq_weight,
                submaps if cfg.use_submaps else None,
            )

    final = jax.jit(
        lambda ap, op: _reattach(cfg, ap, op)
    )(anchor_poses, odo_poses)

    if diag is not None and cfg.use_correlative:
        import numpy as np

        diag["bank"] = {k: np.array(v) for k, v in bank.items()}
        diag["anchor_poses"] = np.asarray(anchor_poses)
        diag["odo_anchor_poses"] = np.asarray(odo_anchor_poses)
        diag["tried"] = np.asarray(tried)
        diag["seq_weight"] = np.asarray(seq_weight)

    return SlamResult(
        poses=final,
        odo_poses=odo_poses,
        anchor_idx=anchor_idx,
        n_loops=n_loops,
        chi2=chi,
    )


def _frontend(model: LaserModel, cfg: SlamConfig, ranges: Array):
    scans = preprocess(ranges, model)
    odo = odometry_keyframe(model, scans)
    t = ranges.shape[0]
    anchor_idx = jnp.arange(0, t - (t % cfg.anchor_stride), cfg.anchor_stride)
    anchor_scans = jax.tree.map(lambda x: x[anchor_idx], scans)
    anchor_poses = odo.poses[anchor_idx]
    rel_seq = se2.relative(anchor_poses[:-1], anchor_poses[1:])
    # An anchor interval containing any weak odometry step gets the
    # reference's corridor-grade information (INFO_WEAK vs INFO_ADJ).
    k = anchor_idx.shape[0]
    # Step t (the match scan t-1 → t) is covered by anchor edge
    # floor((t-1)/stride); sum weak flags per edge.
    edge_of_step = jnp.clip(
        (jnp.arange(t) - 1) // cfg.anchor_stride, 0, k - 2
    )
    weak_per_edge = jax.ops.segment_sum(
        odo.weak.astype(jnp.int32), edge_of_step, num_segments=k - 1
    )
    seq_weight = jnp.where(weak_per_edge > 0, INFO_WEAK / INFO_ADJ, 1.0)
    return (scans, odo.poses, anchor_idx, anchor_scans, anchor_poses,
            rel_seq, seq_weight)


def _reattach(cfg: SlamConfig, anchor_poses: Array, odo_poses: Array) -> Array:
    t = odo_poses.shape[0]
    seg = jnp.arange(t) // cfg.anchor_stride
    seg = jnp.clip(seg, 0, anchor_poses.shape[0] - 1)
    anchors_of_t = seg * cfg.anchor_stride
    rel_to_anchor = se2.relative(odo_poses[anchors_of_t], odo_poses)
    return se2.compose(anchor_poses[seg], rel_to_anchor)
