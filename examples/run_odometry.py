"""End-to-end example: scan-matching odometry on a CARMEN log.

Usage:
    python examples/run_odometry.py [log_path] [--scans K] [--mode keyframe|pairwise]

Loads the log, preprocesses on device, runs the odometry chain, reports
ATE vs the log's VERTEX2 ground truth, and writes an occupancy-grid PNG.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.eval.metrics import ate, rpe
from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.mapping.occupancy import (
    empty_grid,
    integrate_scans,
    spec_for_trajectory,
)
from laser_slam_tpu.ops.odometry import odometry_keyframe, odometry_pairwise
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.viz.render import render_map_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="/root/reference/data/intel-lab.log")
    ap.add_argument("--scans", type=int, default=None)
    ap.add_argument("--mode", choices=["keyframe", "pairwise"], default="keyframe")
    ap.add_argument("--out", default="/tmp/odometry_map.png")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    log = read_carmen(args.log, max_scans=args.scans)
    model = log.model
    print(f"log: {log.n_scans} scans x {model.n_beams} beams ({model.name})")

    t0 = time.time()
    scans = preprocess(jnp.asarray(log.ranges), model)
    jax.block_until_ready(scans.ranges)
    print(f"preprocess: {time.time() - t0:.2f}s")

    run = odometry_keyframe if args.mode == "keyframe" else odometry_pairwise
    runner = lambda s: run(model, s)  # odometry_keyframe is host-orchestrated
    t0 = time.time()
    result = jax.block_until_ready(runner(scans))
    t_first = time.time() - t0
    t0 = time.time()
    result = jax.block_until_ready(runner(scans))
    t_steady = time.time() - t0
    print(
        f"odometry[{args.mode}]: compile+run {t_first:.2f}s, steady {t_steady:.2f}s "
        f"({log.n_scans / t_steady:.1f} scans/s)"
    )
    print(
        f"switched: {int(np.sum(np.asarray(result.switched)))}, "
        f"discarded: {int(np.sum(np.asarray(result.discarded)))}"
    )

    est = np.asarray(result.poses)
    gt = log.gt_pose[: est.shape[0]]
    a = ate(jnp.asarray(est), jnp.asarray(gt))
    tr_err, rot_err = rpe(jnp.asarray(est), jnp.asarray(gt))
    print(
        f"ATE rmse={float(a.rmse):.3f}m mean={float(a.mean):.3f}m "
        f"median={float(a.median):.3f}m max={float(a.max):.3f}m"
    )
    print(
        f"RPE trans mean={float(jnp.mean(tr_err)):.4f}m "
        f"rot mean={np.degrees(float(jnp.mean(rot_err))):.3f}deg"
    )

    spec = spec_for_trajectory(est, model.max_range, resolution=0.05)
    grid = empty_grid(spec)
    grid = jax.jit(
        lambda g, s, p: integrate_scans(g, model, s, p)
    )(grid, scans, jnp.asarray(est))
    render_map_png(jax.device_get(grid), args.out, est)
    print(f"map: {spec.width}x{spec.height} cells -> {args.out}")


if __name__ == "__main__":
    main()
