"""For uncovered-but-revisited anchors, probe which verification gate
kills the GT-true loop candidates."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
from laser_slam_tpu.graph.loop_closure import LoopCandidates, verify_loops_correlative
from laser_slam_tpu.runtime.slam import SlamConfig

log = read_carmen("/root/reference/data/intel-lab.log")
d = np.load("/root/repo/diag_intel-lab.npz")
odo = jnp.asarray(d["odo"])
gt = d["gt"]
cfg = SlamConfig()

scans = preprocess(jnp.asarray(log.ranges), log.model)
submaps = jax.jit(lambda s, p: build_submaps(log.model, s, p, cfg.anchor_stride, cfg.submap_points))(scans, odo)
A = submaps.points.shape[0]
aidx = np.arange(A) * cfg.anchor_stride
ga = gt[aidx]
anchor_poses = jnp.asarray(d["anchor"])  # final optimized poses
wide = jax.jit(lambda sm, op: wide_clouds(sm, op, wing=cfg.wing, max_points=cfg.wide_points))(submaps, jnp.asarray(d["odo_anchor"]))

# candidate pairs: uncovered anchor x GT-nearest partner (gap>8, dist<3)
cov = d["cov"]
xy = ga[:, :2]
D = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
gap = np.abs(np.arange(A)[:, None] - np.arange(A)[None, :])
D[gap <= 8] = np.inf
pairs = []
for a in np.where(cov == 0)[0]:
    j = int(np.argmin(D[a]))
    if D[a, j] < 3.0:
        s, t = (a, j) if a < j else (j, a)
        pairs.append((s, t))
pairs = sorted(set(pairs))
n = len(pairs)
# pad to chunk multiple
C = 32
npad = (n + C - 1) // C * C
src = np.array([p[0] for p in pairs] + [0] * (npad - n), np.int32)
dst = np.array([p[1] for p in pairs] + [2] * (npad - n), np.int32)
valid = np.array([True] * n + [False] * (npad - n))
cand = LoopCandidates(src=jnp.asarray(src), dst=jnp.asarray(dst), valid=jnp.asarray(valid))

loops = verify_loops_correlative(
    submaps, anchor_poses, cand,
    cand_radius=jnp.full(npad, 1e9, jnp.float32),
    wide_pts=wide[0], wide_ok=wide[1],
    search_xy=cfg.search_xy, search_theta=float(jnp.pi),
    n_theta=cfg.n_theta, coarse_res=cfg.coarse_res,
    n_peaks=cfg.n_peaks, chunk=cfg.verify_chunk,
    quality_min=cfg.min_quality, identity_init=True,
)
g = {k: np.asarray(v) for k, v in loops.diag.items()}
acc = np.asarray(loops.accept)
tent = np.asarray(loops.tentative)
# GT relative pose for truth check
import laser_slam_tpu.core.se2 as se2
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[src]), jnp.asarray(ga[dst])))
pose = g["pose"]
t_err = np.linalg.norm(pose[:, :2] - rel_gt[:, :2], axis=-1)

print(f"{n} probed pairs; accepted={int(acc[:n].sum())} tentative={int(tent[:n].sum())}")
print("pair  acc tent | coarse fwd_ok bwd_ok recip peak gate qual err | goodness err cyc_t cyc_r | gt_t_err")
for i in range(n):
    print(f"({src[i]:3d},{dst[i]:3d}) {int(acc[i])} {int(tent[i])} | "
          f"{g['coarse_score'][i]:.2f} {int(g['fwd_ok'][i])} {int(g['bwd_ok'][i])} "
          f"{int(g['reciprocal'][i])} {int(g['near_peak'][i])} {int(g['in_gate'][i])} "
          f"{int(g['quality_ok'][i])} {int(g['err_ok'][i])} | "
          f"{g['goodness'][i]:.2f} {g['err'][i]*100:.1f}cm {g['cycle_t'][i]:.2f} {g['cycle_r'][i]:.3f} | {t_err[i]:.2f}")
