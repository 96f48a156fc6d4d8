"""Full correlative backend replay on CPU from saved odometry."""
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.graph.submap import build_submaps
from laser_slam_tpu.runtime.slam import SlamConfig, run_correlative_rounds, _reattach
from laser_slam_tpu.eval.metrics import ate
import laser_slam_tpu.core.se2 as se2

t0 = time.time()
log = read_carmen("/root/reference/data/intel-lab.log")
d = np.load("/root/repo/diag_intel-lab.npz")
odo = jnp.asarray(d["odo"])
gt = jnp.asarray(d["gt"])
cfg = SlamConfig()
scans = preprocess(jnp.asarray(log.ranges), log.model)
submaps = jax.jit(lambda s, p: build_submaps(log.model, s, p, cfg.anchor_stride, cfg.submap_points))(scans, odo)
A = submaps.points.shape[0]
aidx = np.arange(A) * cfg.anchor_stride
anchor_poses = odo[aidx]
rel_seq = se2.relative(anchor_poses[:-1], anchor_poses[1:])
seq_w = jnp.asarray(d["seq_weight"])
print(f"setup {time.time()-t0:.0f}s", flush=True)

ap, n_loops, chi, bank, tried = run_correlative_rounds(cfg, submaps, anchor_poses, rel_seq, seq_w)
print(f"rounds done {time.time()-t0:.0f}s", flush=True)
full = _reattach(cfg, ap, odo)
a_slam = float(ate(full, gt).rmse)

ga = np.asarray(gt)[aidx]
on = bank["act"] & bank["strict"]
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[bank["src"]]), jnp.asarray(ga[bank["dst"]])))
diff = np.asarray(se2.relative(jnp.asarray(rel_gt), jnp.asarray(bank["rel"])))
t_err = np.linalg.norm(diff[:, :2], axis=-1)
cov = np.zeros(A, np.int32)
np.add.at(cov, bank["src"][on], 1)
np.add.at(cov, bank["dst"][on], 1)
out = dict(
    ate_slam=round(a_slam, 3),
    n_loops=int(n_loops),
    strict=int(on.sum()),
    strict_correct=int((on & (t_err < 0.5)).sum()),
    tentative=int((bank["act"] & ~bank["strict"]).sum()),
    cov_zero=int((cov == 0).sum()),
    wall=round(time.time() - t0, 1),
)
print(json.dumps(out))
np.savez("/root/repo/tools/exp/replay_out.npz", ap=np.asarray(ap), full=np.asarray(full),
         cov=cov, **{f"bank_{k}": v for k, v in bank.items()})
