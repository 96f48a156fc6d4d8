"""Probe mit-cscail's uncovered-but-revisited anchors: propose the
GT-true pair for every zero-coverage anchor with a GT revisit < 3 m and
run the full correlative verification, printing the per-gate breakdown.

Usage: python tools/exp/probe_mit_uncovered.py [log] [npz]
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
from laser_slam_tpu.graph.loop_closure import (
    LoopCandidates, verify_loops_correlative,
)
from laser_slam_tpu.runtime.slam import SlamConfig, HINGE_WEIGHT
import laser_slam_tpu.core.se2 as se2

name = sys.argv[1] if len(sys.argv) > 1 else "mit-cscail"
npz = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/diag/r4c_{name}.npz"
log = read_carmen(f"/root/reference/data/{name}.log")
d = np.load(npz)
odo = jnp.asarray(d["odo"])
gt = d["gt"]
cfg = SlamConfig()

scans = jax.jit(lambda r: preprocess(r, log.model))(jnp.asarray(log.ranges))
submaps = jax.jit(
    lambda s, p: build_submaps(
        log.model, s, p, cfg.anchor_stride, cfg.submap_points
    )
)(scans, odo)
A = int(submaps.points.shape[0])
aidx = np.arange(A) * cfg.anchor_stride
ga = gt[aidx]
anchor_poses = jnp.asarray(d["anchor"])  # final optimized poses
sw = d["seq_weight"]
block_id = jnp.asarray(
    np.concatenate([[0], np.cumsum((sw > 0) & (sw <= 2 * HINGE_WEIGHT))]),
    jnp.int32,
)
wide = jax.jit(
    lambda sm, op, bid: wide_clouds(
        sm, op, wing=cfg.wing, max_points=cfg.wide_points, block_id=bid
    )
)(submaps, jnp.asarray(d["odo_anchor"]), block_id)

cov = d["cov"]
xy = ga[:, :2]
D = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
gap = np.abs(np.arange(A)[:, None] - np.arange(A)[None, :])
D[gap < 20] = np.inf
pairs = []
for a in np.where(cov == 0)[0]:
    j = int(np.argmin(D[a]))
    if D[a, j] < 3.0:
        s, t = (a, j) if a < j else (j, a)
        pairs.append((s, t))
pairs = sorted(set(pairs))
n = len(pairs)
C = 32
npad = (n + C - 1) // C * C
src = np.array([p[0] for p in pairs] + [0] * (npad - n), np.int32)
dst = np.array([p[1] for p in pairs] + [25] * (npad - n), np.int32)
valid = np.array([True] * n + [False] * (npad - n))
cand = LoopCandidates(
    src=jnp.asarray(src), dst=jnp.asarray(dst), valid=jnp.asarray(valid)
)

loops = verify_loops_correlative(
    submaps, anchor_poses, cand,
    cand_radius=jnp.full(npad, 1e9, jnp.float32),
    wide_pts=wide[0], wide_ok=wide[1],
    search_xy=cfg.search_xy, search_theta=float(jnp.pi),
    n_theta=cfg.n_theta, coarse_res=cfg.coarse_res,
    n_peaks=cfg.n_peaks, chunk=cfg.verify_chunk,
    quality_min=cfg.min_quality, identity_init=True,
)
g, acc, tent = jax.device_get(
    ({k: v for k, v in loops.diag.items()}, loops.accept, loops.tentative)
)
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[src]), jnp.asarray(ga[dst])))
pose = g["pose"]
t_err = np.linalg.norm(pose[:, :2] - rel_gt[:, :2], axis=-1)

print(f"{n} probed pairs; accepted={int(acc[:n].sum())} "
      f"tentative={int(tent[:n].sum())}")
print("pair  acc tent | coarse fwd_ok bwd_ok recip peak gate qual err "
      "| goodness err cyc_t cyc_r | gt_t_err")
for i in range(n):
    print(f"({src[i]:3d},{dst[i]:3d}) {int(acc[i])} {int(tent[i])} | "
          f"{g['coarse_score'][i]:.2f} {int(g['fwd_ok'][i])} "
          f"{int(g['bwd_ok'][i])} {int(g['reciprocal'][i])} "
          f"{int(g['near_peak'][i])} {int(g['in_gate'][i])} "
          f"{int(g['quality_ok'][i])} {int(g['err_ok'][i])} | "
          f"{g['goodness'][i]:.2f} {g['err'][i]*100:.1f}cm "
          f"{g['cycle_t'][i]:.2f} {g['cycle_r'][i]:.3f} | {t_err[i]:.2f}")
