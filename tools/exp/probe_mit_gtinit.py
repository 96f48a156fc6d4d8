"""For the mit-cscail uncovered GT-true pairs: polish ICP initialized AT
the GT relative pose. If even that gives low goodness, the overlap is
fundamentally too low to verify; if it gives high goodness, the coarse
search is missing the true basin.
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
from laser_slam_tpu.graph.loop_closure import match_icp_points
from laser_slam_tpu.runtime.slam import SlamConfig, HINGE_WEIGHT
import laser_slam_tpu.core.se2 as se2

name = sys.argv[1] if len(sys.argv) > 1 else "mit-cscail"
npz = f"/root/repo/diag/r4c_{name}.npz"
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
ga = gt[np.arange(A) * cfg.anchor_stride]
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

pairs = [(14, 102), (15, 92), (15, 101), (17, 83), (18, 83), (20, 91),
         (21, 83), (28, 82), (29, 81), (30, 80), (33, 86), (33, 88)]
src = np.array([p[0] for p in pairs], np.int32)
dst = np.array([p[1] for p in pairs], np.int32)
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[src]), jnp.asarray(ga[dst])))
# GT heading difference — opposite-direction revisits have ~180°
dth = np.degrees(np.abs((ga[dst, 2] - ga[src, 2] + np.pi) % (2 * np.pi) - np.pi))

fit = jax.jit(jax.vmap(
    lambda rwp, rwo, cp, co, ip: match_icp_points(
        rwp, rwo, cp, co, ip, iters=30, max_corr=4.0 * cfg.coarse_res
    )
))
res = fit(wide[0][src], wide[1][src], submaps.points[dst],
          submaps.valid[dst], jnp.asarray(rel_gt))
res = jax.device_get(res)
t_err = np.linalg.norm(res.pose[:, :2] - rel_gt[:, :2], axis=-1)
print("pair  | gt-init goodness err  fail | final_t_err gt_dth_deg")
for i in range(len(pairs)):
    print(f"({src[i]:3d},{dst[i]:3d}) | {res.goodness[i]:.2f} "
          f"{res.err[i]*100:.1f}cm {int(res.fail[i])} | "
          f"{t_err[i]:.2f} {dth[i]:.0f}")
