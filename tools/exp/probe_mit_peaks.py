"""Where does the TRUE alignment rank in the coarse correlative peak
list for mit-cscail's uncovered GT-true pairs? Sweeps n_peaks and
reports, per pair, the rank/score of the peak nearest the GT relative
pose and what the triage stage would pick.
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
from laser_slam_tpu.ops.correlative import correlative_top_peaks
from laser_slam_tpu.graph.loop_closure import match_icp_points
from laser_slam_tpu.runtime.slam import SlamConfig, HINGE_WEIGHT
import laser_slam_tpu.core.se2 as se2

name = sys.argv[1] if len(sys.argv) > 1 else "mit-cscail"
NPK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
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
tri_stride = max(pw // 384, 1)

def peaks_one(rw_p, rw_o, cw_p, cw_o):
    pk, sc = correlative_top_peaks(
        rw_p, rw_o, cw_p[::stride], cw_o[::stride],
        jnp.zeros(3, rw_p.dtype),
        n_peaks=NPK, search_xy=cfg.search_xy,
        search_theta=float(jnp.pi), n_theta=cfg.n_theta,
        res=cfg.coarse_res,
        overlap_norm=bool(int(os.environ.get("OVN", "0"))),
    )
    tri = jax.vmap(
        lambda p: match_icp_points(
            rw_p[::2], rw_o[::2], cw_p[::tri_stride], cw_o[::tri_stride],
            p, iters=12, max_corr=4.0 * cfg.coarse_res,
        )
    )(pk)
    return pk, sc, tri.pose, tri.goodness, tri.err, tri.fail

fn = jax.jit(jax.vmap(peaks_one))
if int(os.environ.get("NARROWQ", "0")):
    # Narrow dst submap as the query (padded to the wide width so the
    # compiled fn is reused).
    q_p = np.zeros_like(np.asarray(wide[0][dst]))
    q_o = np.zeros_like(np.asarray(wide[1][dst]))
    npts = submaps.points.shape[1]
    q_p[:, :npts] = np.asarray(submaps.points)[dst]
    q_o[:, :npts] = np.asarray(submaps.valid)[dst]
    pk, sc, tpose, tgood, terr, tfail = jax.device_get(
        fn(wide[0][src], wide[1][src], jnp.asarray(q_p), jnp.asarray(q_o))
    )
else:
    pk, sc, tpose, tgood, terr, tfail = jax.device_get(
        fn(wide[0][src], wide[1][src], wide[0][dst], wide[1][dst])
    )

print(f"n_peaks={NPK}")
print("pair   | true-peak rank d_t d_th score | tri-pick rank tri_t_err "
      "| tri score of true peak")
for i in range(len(pairs)):
    dte = np.linalg.norm(pk[i, :, :2] - rel_gt[i, :2], axis=-1)
    dth = np.abs((pk[i, :, 2] - rel_gt[i, 2] + np.pi) % (2 * np.pi) - np.pi)
    near = (dte < 0.8) & (dth < 0.3)
    rank = int(np.argmax(near)) if near.any() else -1
    tri_score = np.where(~tfail[i] & (terr[i] < 0.1), tgood[i], -1.0)
    pick = int(np.argmax(tri_score))
    pick_t_err = np.linalg.norm(tpose[i, pick, :2] - rel_gt[i, :2])
    ts = tri_score[rank] if rank >= 0 else float("nan")
    print(f"({src[i]:3d},{dst[i]:3d}) | {rank:3d} "
          f"{dte[rank] if rank>=0 else -1:.2f} "
          f"{dth[rank] if rank>=0 else -1:.2f} "
          f"{sc[i, rank] if rank>=0 else -1:.2f} | "
          f"{pick:3d} {pick_t_err:6.2f} | {ts:.2f}")
