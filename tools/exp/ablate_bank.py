"""Ablate _solve_with_bank mechanisms on a saved diag bank (any log).

Replays the final solve from a committed ``*_diag_<log>.npz`` with one
mechanism disabled/varied at a time, to localize which one bends a good
trajectory (VERDICT r3 #1: SLAM hurts fr079 and mit while helping intel).

Usage: python tools/exp/ablate_bank.py diag/r3j_fr079.npz
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from dataclasses import replace
from laser_slam_tpu.runtime.slam import (
    SlamConfig, _solve_with_bank, _reattach, INFO_ADJ, INFO_WEAK,
)
from laser_slam_tpu.eval.metrics import ate
import laser_slam_tpu.core.se2 as se2

path = sys.argv[1] if len(sys.argv) > 1 else "diag/r3j_fr079.npz"
d = np.load(path)
gt = jnp.asarray(d["gt"])
odo = jnp.asarray(d["odo"])
cfg = SlamConfig()
odo_anchor = jnp.asarray(d["odo_anchor"])
A = odo_anchor.shape[0]
rel_seq = se2.relative(odo_anchor[:-1], odo_anchor[1:])
seq_w0 = jnp.asarray(d["seq_weight"])
bank = {k: d["bank_" + k] for k in ["src", "dst", "rel", "q", "act", "strict"]}
ga = np.asarray(gt)[np.arange(A) * 10]
a_odo = float(ate(odo, gt).rmse)
print(f"{path}: A={A} act={int(bank['act'].sum())} "
      f"strict={int((bank['act'] & bank['strict']).sum())} ate_odo={a_odo:.3f}")

# GT classification of banked loops
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[bank["src"]]),
                                 jnp.asarray(ga[bank["dst"]])))
diff = np.asarray(se2.relative(jnp.asarray(rel_gt), jnp.asarray(bank["rel"])))
t_err = np.linalg.norm(diff[:, :2], axis=-1)
r_err = np.abs((diff[:, 2] + np.pi) % (2 * np.pi) - np.pi)
s_on = bank["act"] & bank["strict"]
wrong = s_on & ((t_err > 0.5) | (r_err > 0.2))
print(f"strict wrong (GT): {int(wrong.sum())}; "
      f"t_err of wrong: {np.sort(t_err[wrong])[::-1][:15].round(2)}")


def run(name, cfg, act=None, seq_w=None, iters=3):
    a = jnp.asarray(act if act is not None else bank["act"])
    w = seq_w if seq_w is not None else seq_w0
    p = odo_anchor
    for it in range(iters):
        p, n, chi, _used = _solve_with_bank(
            cfg, p, odo_anchor, rel_seq, w,
            jnp.asarray(bank["src"]), jnp.asarray(bank["dst"]),
            jnp.asarray(bank["rel"]), jnp.asarray(bank["q"]),
            a, jnp.asarray(bank["strict"]),
        )
    full = _reattach(cfg, p, odo)
    r = float(ate(full, gt).rmse)
    print(f"{name:34s}: ATE={r:6.3f} loops={int(n):4d} chi={float(chi):9.1f}")
    return p, r


run("as-is", cfg)
run("oracle-clean (drop GT-wrong)", cfg, act=bank["act"] & ~wrong)
run("hinges->weak (no 1e-3)", cfg,
    seq_w=jnp.maximum(seq_w0, INFO_WEAK / INFO_ADJ))
run("all-seq-weight-1", cfg, seq_w=jnp.ones(A - 1, jnp.float32))
run("trim 0.5/0.15", replace(cfg, trim_residual_t=0.5, trim_residual_r=0.15))
run("trim 0.3/0.10", replace(cfg, trim_residual_t=0.3, trim_residual_r=0.1))
run("pcm 0.10", replace(cfg, pcm_rate=0.10))
run("pcm 0.05", replace(cfg, pcm_rate=0.05))
run("quality>=0.75", cfg,
    act=bank["act"] & ((bank["q"] >= 0.75) | ~bank["strict"]))
run("oracle+hinges->weak", cfg, act=bank["act"] & ~wrong,
    seq_w=jnp.maximum(seq_w0, INFO_WEAK / INFO_ADJ))
run("trim0.5 + pcm0.10",
    replace(cfg, trim_residual_t=0.5, trim_residual_r=0.15, pcm_rate=0.10))
