"""Replay solve with weak-edge weight variants (jitted). One log per run.

Usage: python tools/exp/weak_edge_ablate.py fr079
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from dataclasses import replace
from laser_slam_tpu.runtime.slam import SlamConfig, _solve_with_bank, _reattach
from laser_slam_tpu.eval.metrics import ate
import laser_slam_tpu.core.se2 as se2

log = sys.argv[1]
d = np.load(f'/root/repo/diag/r3j_{log}.npz')
gt = jnp.asarray(d['gt']); odo = jnp.asarray(d['odo'])
odo_anchor = jnp.asarray(d['odo_anchor']); A = odo_anchor.shape[0]
rel_seq = se2.relative(odo_anchor[:-1], odo_anchor[1:])
sw0 = np.asarray(d['seq_weight']).copy()
bank = {k: d['bank_' + k] for k in ['src', 'dst', 'rel', 'q', 'act', 'strict']}
ga = np.asarray(gt)[np.arange(A) * 10]
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[bank['src']]),
                                 jnp.asarray(ga[bank['dst']])))
diff = np.asarray(se2.relative(jnp.asarray(rel_gt), jnp.asarray(bank['rel'])))
t_err = np.linalg.norm(diff[:, :2], axis=-1)
s_on = bank['act'] & bank['strict']
gross = s_on & (t_err > 2.0)

cfg = SlamConfig()
cfg_t = replace(cfg, trim_residual_t=0.5, trim_residual_r=0.15)
solve = {}
for name, c in [("std", cfg), ("trim", cfg_t)]:
    solve[name] = jax.jit(
        lambda p, w, a, _c=c: _solve_with_bank(
            _c, p, odo_anchor, rel_seq, w,
            jnp.asarray(bank['src']), jnp.asarray(bank['dst']),
            jnp.asarray(bank['rel']), jnp.asarray(bank['q']),
            a, jnp.asarray(bank['strict'])))
reatt = jax.jit(lambda p: _reattach(cfg, p, odo))


def run(name, which, act=None, sw=None, iters=3):
    a = jnp.asarray(act if act is not None else bank['act'])
    w = jnp.asarray(sw if sw is not None else sw0)
    p = odo_anchor
    for _ in range(iters):
        p, n, chi, _used = solve[which](p, w, a)
    r = float(ate(reatt(p), gt).rmse)
    print(f"  {name:34s}: ATE={r:6.3f} loops={int(n)}", flush=True)


print(f"== {log} odo={float(ate(odo, gt).rmse):.3f}")
run("as-is", "std")
for wv in [1.0, 0.5, 0.2]:
    sw = sw0.copy(); sw[np.isclose(sw0, 0.01)] = wv
    run(f"weak->{wv}, hinges kept", "std", sw=sw)
sw1 = sw0.copy(); sw1[np.isclose(sw0, 0.01)] = 1.0
run("weak->1 + trim 0.5/0.15", "trim", sw=sw1)
run("weak->1 + drop gross(>2m GT)", "std", act=bank['act'] & ~gross, sw=sw1)
run("drop gross(>2m GT) only", "std", act=bank['act'] & ~gross)
