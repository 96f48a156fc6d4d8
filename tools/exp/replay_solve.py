"""Replay _solve_with_bank from the saved diag bank with variations."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from laser_slam_tpu.runtime.slam import SlamConfig, _solve_with_bank, _reattach
from laser_slam_tpu.eval.metrics import ate
import laser_slam_tpu.core.se2 as se2

d = np.load("/root/repo/diag/r4_intel-lab.npz")
gt = jnp.asarray(d["gt"])
odo = jnp.asarray(d["odo"])
cfg = SlamConfig()
odo_anchor = jnp.asarray(d["odo_anchor"])
A = odo_anchor.shape[0]
rel_seq = se2.relative(odo_anchor[:-1], odo_anchor[1:])
seq_w = jnp.asarray(d["seq_weight"])
bank = {k: d["bank_" + k] for k in ["src", "dst", "rel", "q", "act", "strict"]}
ga = np.asarray(gt)[np.arange(A) * 10]

def run(name, cfg, act=None, start=None):
    a = act if act is not None else bank["act"]
    st = start if start is not None else odo_anchor
    poses, n, chi, _used = _solve_with_bank(
        cfg, st, odo_anchor, rel_seq, seq_w,
        jnp.asarray(bank["src"]), jnp.asarray(bank["dst"]),
        jnp.asarray(bank["rel"]), jnp.asarray(bank["q"]),
        jnp.asarray(a), jnp.asarray(bank["strict"]),
    )
    full = _reattach(cfg, poses, odo)
    r = float(ate(full, gt).rmse)
    print(f"{name}: ATE={r:.3f} loops={int(n)} chi={float(chi):.1f}")
    return poses

# baseline: solve once from odometry (what round 0 sees is different, but
# final run solves from current estimate each round; emulate 3 iterations)
p = run("solve-from-odo", cfg)
p = run(" iter2", cfg, start=p)
p = run(" iter3", cfg, start=p)

# drop known-wrong loops (gt check): classify
import laser_slam_tpu.core.se2 as se2m
s_, d_, r_, a_ = bank["src"], bank["dst"], bank["rel"], bank["act"]
rel_gt = np.asarray(se2m.relative(jnp.asarray(ga[s_]), jnp.asarray(ga[d_])))
diff = np.asarray(se2m.relative(jnp.asarray(rel_gt), jnp.asarray(r_)))
t_err = np.linalg.norm(diff[:, :2], axis=-1)
wrong = a_ & (t_err > 0.5)
act2 = a_ & ~wrong
print(f"oracle removes {int(wrong.sum())} wrong banked loops")
p = run("oracle-clean", cfg, act=act2)
p = run(" iter2", cfg, act=act2, start=p)
p = run(" iter3", cfg, act=act2, start=p)
