"""Peak-level analysis of the correlative verify on GT-true pairs.

Dumps top-K NMS peaks + per-peak ICP triage for a grid of search
configurations, then reports where the true pose lives (in-peaks rate by
rank, effect of resolution / n_theta / precision / backward rescore).
Uses /tmp/probe_inputs.npz from probe_platform.py --prep.
"""
import argparse
import json
import os
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=float, default=0.3)
ap.add_argument("--n_theta", type=int, default=72)
ap.add_argument("--n_peaks", type=int, default=8)
ap.add_argument("--precision", default=None, choices=[None, "highest"])
ap.add_argument("--n_pairs", type=int, default=256)
ap.add_argument("--tag", default="base")
ap.add_argument("--wide_query", action="store_true")
ap.add_argument("--wide_triage", action="store_true")
args = ap.parse_args()
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

if args.precision:
    jax.config.update("jax_default_matmul_precision", args.precision)

from laser_slam_tpu.ops.correlative import correlative_top_peaks
from laser_slam_tpu.ops.icp_points import match_icp_points
import laser_slam_tpu.core.se2 as se2

d = np.load("/tmp/probe_inputs.npz")
n = min(args.n_pairs, len(d["src"]))
src = d["src"][:n]
dst = d["dst"][:n]
rw_pts = jnp.asarray(d["wide_pts"])[src]
rw_ok = jnp.asarray(d["wide_ok"])[src]
c_pts = jnp.asarray(d["sm_pts"])[dst]
c_ok = jnp.asarray(d["sm_ok"])[dst]
cq_pts, cq_ok = (jnp.asarray(d["wide_pts"])[dst], jnp.asarray(d["wide_ok"])[dst]) if args.wide_query else (c_pts, c_ok)
ga = d["gt_anchor"]
rel_gt = np.asarray(
    se2.relative(jnp.asarray(ga[src]), jnp.asarray(ga[dst]))
)

K = args.n_peaks
stride = max((d["wide_pts"] if args.wide_query else d["sm_pts"]).shape[1] // 192, 1)


def one(rw_p, rw_o, c_p, c_o, cq_p, cq_o):
    ip = jnp.zeros(3, jnp.float32)
    peaks, scores = correlative_top_peaks(
        rw_p, rw_o, cq_p[::stride], cq_o[::stride], ip,
        n_peaks=K, search_xy=5.0, search_theta=float(jnp.pi),
        n_theta=args.n_theta, res=args.res,
    )
    tq_p, tq_o = (cq_p[::4], cq_o[::4]) if args.wide_triage else (c_p[::2], c_o[::2])
    tri = jax.vmap(
        lambda pk: match_icp_points(
            rw_p[::2], rw_o[::2], tq_p, tq_o, pk,
            iters=12, max_corr=4.0 * args.res,
        )
    )(peaks)
    return peaks, scores, tri.pose, tri.goodness, tri.err, tri.fail


fn = jax.jit(lambda a, b, c, e, f, g2: jax.lax.map(
    lambda t: one(*t), (a, b, c, e, f, g2)))
CH = 32
outs = []
for i in range(0, n, CH):
    outs.append(fn(rw_pts[i:i+CH], rw_ok[i:i+CH], c_pts[i:i+CH], c_ok[i:i+CH], cq_pts[i:i+CH], cq_ok[i:i+CH]))
peaks, scores, tpose, tgood, terr_icp, tfail = (
    np.concatenate([np.asarray(o[k]) for o in outs]) for k in range(6)
)

# Per-peak truth: polished pose within 0.5 m / 0.2 rad of GT rel.
diff = np.asarray(
    se2.relative(
        jnp.asarray(np.repeat(rel_gt[:, None, :], K, 1).reshape(-1, 3)),
        jnp.asarray(tpose.reshape(-1, 3)),
    )
).reshape(n, K, 3)
t_err = np.linalg.norm(diff[:, :, :2], axis=-1)
r_err = np.abs((diff[:, :, 2] + np.pi) % (2 * np.pi) - np.pi)
true_peak = (t_err < 0.5) & (r_err < 0.2) & ~tfail

any_true = true_peak.any(1)
first_rank = np.where(any_true, np.argmax(true_peak, 1), K)
# current triage choice: best goodness among err<0.1 & ~fail
tri_score = np.where(~tfail & (terr_icp < 0.1), tgood, -1.0)
choice = np.argmax(tri_score, 1)
chose_true = true_peak[np.arange(n), choice]

out = {
    "tag": args.tag, "res": args.res, "n_theta": args.n_theta,
    "n_peaks": K, "precision": args.precision or "default",
    "n": n,
    "true_in_peaks": int(any_true.sum()),
    "rank_hist": np.bincount(first_rank, minlength=K + 1).tolist(),
    "triage_chose_true": int(chose_true.sum()),
}
print(json.dumps(out))
np.savez(
    f"/tmp/peaks_{args.tag}.npz", peaks=peaks, scores=scores,
    tpose=tpose, tgood=tgood, terr=terr_icp, tfail=tfail,
    true_peak=true_peak, choice=choice, src=src, dst=dst,
)
