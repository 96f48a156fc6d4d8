"""Evaluate the coarse correlative score AT the GT relative pose for
mit's uncovered pairs, vs the volume max — is the true alignment
low-scoring (geometry/clutter) or suppressed (peak crowding)?
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
from laser_slam_tpu.ops.correlative import (
    build_likelihood_grid_points, correlative_score_volume,
)
from laser_slam_tpu.runtime.slam import SlamConfig, HINGE_WEIGHT
import laser_slam_tpu.core.se2 as se2

name = "mit-cscail"
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

pw = int(wide[0].shape[1])
stride = max(pw // 192, 1)
res = cfg.coarse_res
n_steps = int(round(cfg.search_xy / res))

def one(rw_p, rw_o, cw_p, cw_o, rg):
    grid = build_likelihood_grid_points(rw_p, rw_o, res=res,
                                        half_extent=12.8, blur_sigma=1.0)
    # volume over thetas centred exactly on the GT theta plus the
    # standard sweep, so the GT cell is exactly representable
    thetas = rg[2] + jnp.linspace(-jnp.pi, jnp.pi, cfg.n_theta,
                                  dtype=rw_p.dtype)
    thetas = jnp.concatenate([thetas, rg[2:3]])
    vol = correlative_score_volume(
        grid, cw_p, cw_o, thetas, n_steps, res, 12.8, rg[:2]
    )
    vmax = vol[:-1].max()
    # score at GT: last theta plane, center cell
    c = n_steps
    at_gt = vol[-1, c, c]
    # and best within +-1 cell of GT
    near = jax.lax.dynamic_slice(vol[-1], (c - 1, c - 1), (3, 3)).max()
    return vmax, at_gt, near

fn = jax.jit(jax.vmap(one))
vmax, at_gt, near = jax.device_get(fn(
    wide[0][src], wide[1][src],
    wide[0][dst][:, ::stride], wide[1][dst][:, ::stride],
    jnp.asarray(rel_gt)))
print("pair   | vol_max at_gt near_gt ratio")
for i in range(len(pairs)):
    print(f"({src[i]:3d},{dst[i]:3d}) | {vmax[i]:.3f} {at_gt[i]:.3f} "
          f"{near[i]:.3f} {near[i]/vmax[i]:.2f}")
