"""Probe the intel-lab junk pairs that appeared as 15-27 m wrong strict
accepts after the dual-query change: run the full verification on them
under round-0 conditions (odometry estimate) and print lane + gates.
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

log = read_carmen("/root/reference/data/intel-lab.log")
d = np.load("/root/repo/diag/r4c_intel-lab.npz")
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
ga = gt[np.arange(A) * cfg.anchor_stride]
sw = d["seq_weight"]
block_id = jnp.asarray(
    np.concatenate([[0], np.cumsum((sw > 0) & (sw <= 2 * HINGE_WEIGHT))]),
    jnp.int32,
)
odo_anchor = jnp.asarray(d["odo_anchor"])
wide = jax.jit(
    lambda sm, op, bid: wide_clouds(
        sm, op, wing=cfg.wing, max_points=cfg.wide_points, block_id=bid
    )
)(submaps, odo_anchor, block_id)

pairs = [(30, 112), (38, 99), (17, 234), (20, 99), (39, 104), (23, 223),
         (26, 234), (21, 234), (3, 234), (91, 245)]
n = len(pairs)
C = 32
npad = (n + C - 1) // C * C
src = np.array([p[0] for p in pairs] + [0] * (npad - n), np.int32)
dst = np.array([p[1] for p in pairs] + [25] * (npad - n), np.int32)
valid = np.array([True] * n + [False] * (npad - n))
gap = np.abs(dst - src)
trust = 2.0 + 0.15 * gap  # round-0 uncovered-pair trust radius
cand = LoopCandidates(
    src=jnp.asarray(src), dst=jnp.asarray(dst), valid=jnp.asarray(valid)
)
# Round-0 estimate = raw odometry anchors
loops = verify_loops_correlative(
    submaps, odo_anchor, cand,
    cand_radius=jnp.asarray(trust, jnp.float32),
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
print("pair  acc tent lane | coarse fwd bwd recip peak gate qual err | "
      "goodness err | gt_t_err trust")
for i in range(n):
    print(f"({src[i]:3d},{dst[i]:3d}) {int(acc[i])} {int(tent[i])} "
          f"{int(g['lane'][i])} | "
          f"{g['coarse_score'][i]:.2f} {int(g['fwd_ok'][i])} "
          f"{int(g['bwd_ok'][i])} {int(g['reciprocal'][i])} "
          f"{int(g['near_peak'][i])} {int(g['in_gate'][i])} "
          f"{int(g['quality_ok'][i])} {int(g['err_ok'][i])} | "
          f"{g['goodness'][i]:.2f} {g['err'][i]*100:.1f}cm | "
          f"{t_err[i]:.2f} {trust[i]:.1f}")
