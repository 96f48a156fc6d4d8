import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from laser_slam_tpu.graph.loop_closure import VerifiedLoops
import laser_slam_tpu.core.se2 as se2

d = np.load("/root/repo/diag_intel-lab.npz")
gt = d["gt"]; A = d["odo_anchor"].shape[0]
ga = gt[np.arange(A) * 10]
s_, d_, r_ = d["bank_src"], d["bank_dst"], d["bank_rel"]
act, strict = d["bank_act"], d["bank_strict"]
on = act & strict
rel_gt = np.asarray(se2.relative(jnp.asarray(ga[s_]), jnp.asarray(ga[d_])))
diff = np.asarray(se2.relative(jnp.asarray(rel_gt), jnp.asarray(r_)))
t_err = np.linalg.norm(diff[:, :2], axis=-1)
correct = t_err < 0.5

odo_anchor = jnp.asarray(d["odo_anchor"])
loops = VerifiedLoops(src=jnp.asarray(s_), dst=jnp.asarray(d_),
                      rel=jnp.asarray(r_), quality=jnp.asarray(d["bank_q"]),
                      accept=jnp.asarray(on))

def pcm_variant(base_t, rate_t, cap_t, base_r, rate_r, cap_r, sqrt_gap=False, votes_min=2):
    src, dst = loops.src, loops.dst
    odo_ii = se2.relative(odo_anchor[src[:, None]], odo_anchor[src[None, :]])
    odo_jj = se2.relative(odo_anchor[dst[None, :]], odo_anchor[dst[:, None]])
    la = jnp.broadcast_to(loops.rel[:, None, :], odo_ii.shape)
    pred = se2.compose(se2.compose(se2.inverse(odo_ii), la), se2.inverse(odo_jj))
    e = se2.relative(jnp.broadcast_to(loops.rel[None, :, :], pred.shape), pred)
    et = jnp.linalg.norm(e[..., :2], axis=-1)
    er = jnp.abs(se2.normalize_angle(e[..., 2]))
    gap_i = jnp.abs(src[:, None] - src[None, :]).astype(et.dtype)
    gap_j = jnp.abs(dst[:, None] - dst[None, :]).astype(et.dtype)
    g = jnp.sqrt(gap_i + gap_j) if sqrt_gap else (gap_i + gap_j)
    thr_t = jnp.minimum(base_t + rate_t * g, cap_t)
    thr_r = jnp.minimum(base_r + rate_r * g, cap_r)
    ok = loops.accept
    consistent = (et <= thr_t) & (er <= thr_r) & ok[:, None] & ok[None, :]
    votes = jnp.sum(consistent, axis=1)
    seed = jnp.argmax(votes)
    keep = ok & consistent[seed] & (votes >= jnp.minimum(jnp.sum(ok), votes_min))
    return np.asarray(keep)

def report(name, keep):
    kc = int((keep & correct).sum()); kw = int((keep & ~correct & on).sum())
    tc = int((on & correct).sum()); tw = int((on & ~correct).sum())
    print(f"{name}: keep {kc}/{tc} correct, {kw}/{tw} wrong")

report("current (0.15 lin, nocap)", pcm_variant(1.0, 0.15, 1e9, 0.3, 0.012, 1e9))
report("lin cap 6m", pcm_variant(1.0, 0.15, 6.0, 0.3, 0.012, 0.8))
report("lin cap 4m", pcm_variant(1.0, 0.15, 4.0, 0.3, 0.012, 0.6))
report("lin cap 3m", pcm_variant(1.0, 0.15, 3.0, 0.3, 0.012, 0.5))
report("sqrt 0.5 cap 6", pcm_variant(0.5, 0.5, 6.0, 0.2, 0.05, 0.8, sqrt_gap=True))
report("sqrt 0.35 cap 4", pcm_variant(0.5, 0.35, 4.0, 0.2, 0.04, 0.6, sqrt_gap=True))
report("sqrt 0.25 cap 3", pcm_variant(0.3, 0.25, 3.0, 0.15, 0.03, 0.5, sqrt_gap=True))
report("sqrt 0.25 cap 2 v3", pcm_variant(0.3, 0.25, 2.0, 0.15, 0.03, 0.4, votes_min=3))
# which wrong loops survive the best variant?
k = pcm_variant(0.5, 0.35, 4.0, 0.2, 0.04, 0.6, sqrt_gap=True)
surv = np.where(k & ~correct & on)[0]
print("surviving wrong:", [(int(s_[i]), int(d_[i]), round(float(t_err[i]),2)) for i in surv])

def pcm_cc(base_t, rate_t, cap_t, base_r, rate_r, cap_r, sqrt_gap=True):
    src, dst = loops.src, loops.dst
    odo_ii = se2.relative(odo_anchor[src[:, None]], odo_anchor[src[None, :]])
    odo_jj = se2.relative(odo_anchor[dst[None, :]], odo_anchor[dst[:, None]])
    la = jnp.broadcast_to(loops.rel[:, None, :], odo_ii.shape)
    pred = se2.compose(se2.compose(se2.inverse(odo_ii), la), se2.inverse(odo_jj))
    e = se2.relative(jnp.broadcast_to(loops.rel[None, :, :], pred.shape), pred)
    et = jnp.linalg.norm(e[..., :2], axis=-1)
    er = jnp.abs(se2.normalize_angle(e[..., 2]))
    gap_i = jnp.abs(src[:, None] - src[None, :]).astype(et.dtype)
    gap_j = jnp.abs(dst[:, None] - dst[None, :]).astype(et.dtype)
    g = jnp.sqrt(gap_i + gap_j) if sqrt_gap else (gap_i + gap_j)
    thr_t = jnp.minimum(base_t + rate_t * g, cap_t)
    thr_r = jnp.minimum(base_r + rate_r * g, cap_r)
    ok = loops.accept
    consistent = (et <= thr_t) & (er <= thr_r) & ok[:, None] & ok[None, :]
    c = consistent | jnp.eye(consistent.shape[0], dtype=bool)
    # connected components by min-label propagation
    n = c.shape[0]
    lab = jnp.arange(n)
    def body(state):
        lab, changed = state
        new = jnp.min(jnp.where(c, lab[None, :], n), axis=1)
        new = jnp.minimum(new, lab)
        return (new, jnp.any(new != lab))
    lab, _ = jax.lax.while_loop(lambda s: s[1], body, (lab, jnp.asarray(True)))
    # largest component among accepted
    sizes = jax.ops.segment_sum(ok.astype(jnp.int32), lab, num_segments=n)
    big = jnp.argmax(sizes)
    return np.asarray(ok & (lab == big))

print("== connected-component PCM ==")
report("cc lin cap 4", pcm_cc(1.0, 0.15, 4.0, 0.3, 0.012, 0.6, sqrt_gap=False))
report("cc sqrt .35 cap 4", pcm_cc(0.5, 0.35, 4.0, 0.2, 0.04, 0.6))
report("cc sqrt .25 cap 3", pcm_cc(0.3, 0.25, 3.0, 0.15, 0.03, 0.5))
report("cc sqrt .25 cap 2", pcm_cc(0.3, 0.25, 2.0, 0.15, 0.03, 0.4))
report("cc sqrt .2 cap 1.5", pcm_cc(0.3, 0.2, 1.5, 0.15, 0.03, 0.35))
k = pcm_cc(0.3, 0.25, 2.0, 0.15, 0.03, 0.4)
surv = np.where(k & ~correct & on)[0]
print("surviving wrong (cap2):", [(int(s_[i]), int(d_[i]), round(float(t_err[i]),2)) for i in surv])

def pcm_votes(base_t, rate_t, cap_t, base_r, rate_r, cap_r, votes_min=3, sqrt_gap=True):
    src, dst = loops.src, loops.dst
    odo_ii = se2.relative(odo_anchor[src[:, None]], odo_anchor[src[None, :]])
    odo_jj = se2.relative(odo_anchor[dst[None, :]], odo_anchor[dst[:, None]])
    la = jnp.broadcast_to(loops.rel[:, None, :], odo_ii.shape)
    pred = se2.compose(se2.compose(se2.inverse(odo_ii), la), se2.inverse(odo_jj))
    e = se2.relative(jnp.broadcast_to(loops.rel[None, :, :], pred.shape), pred)
    et = jnp.linalg.norm(e[..., :2], axis=-1)
    er = jnp.abs(se2.normalize_angle(e[..., 2]))
    gap_i = jnp.abs(src[:, None] - src[None, :]).astype(et.dtype)
    gap_j = jnp.abs(dst[:, None] - dst[None, :]).astype(et.dtype)
    g = jnp.sqrt(gap_i + gap_j) if sqrt_gap else (gap_i + gap_j)
    thr_t = jnp.minimum(base_t + rate_t * g, cap_t)
    thr_r = jnp.minimum(base_r + rate_r * g, cap_r)
    ok = loops.accept
    consistent = (et <= thr_t) & (er <= thr_r) & ok[:, None] & ok[None, :]
    votes = jnp.sum(consistent, axis=1)
    keep = ok & (votes >= jnp.minimum(jnp.sum(ok), votes_min))
    return np.asarray(keep)

print("== vote-quorum PCM (no seed) ==")
report("v3 sqrt .35 cap 4", pcm_votes(0.5, 0.35, 4.0, 0.2, 0.04, 0.6))
report("v3 sqrt .25 cap 3", pcm_votes(0.3, 0.25, 3.0, 0.15, 0.03, 0.5))
report("v3 sqrt .25 cap 2", pcm_votes(0.3, 0.25, 2.0, 0.15, 0.03, 0.4))
report("v4 sqrt .25 cap 2", pcm_votes(0.3, 0.25, 2.0, 0.15, 0.03, 0.4, votes_min=4))
report("v3 sqrt .2 cap 1.5", pcm_votes(0.3, 0.2, 1.5, 0.1, 0.025, 0.3))
report("v3 lin .15 cap 2", pcm_votes(1.0, 0.15, 2.0, 0.3, 0.012, 0.4, sqrt_gap=False))
k = pcm_votes(0.3, 0.25, 2.0, 0.15, 0.03, 0.4)
surv = np.where(k & ~correct & on)[0]
print("surviving wrong (v3 cap2):", [(int(s_[i]), int(d_[i]), round(float(t_err[i]),2)) for i in surv])
lost = np.where(~k & correct & on)[0]
print("lost correct:", [(int(s_[i]), int(d_[i])) for i in lost])
