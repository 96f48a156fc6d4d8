"""Full SLAM (odometry + loop closure + graph solve) on a CARMEN log.

Usage: python examples/run_slam.py [log] [--scans K] [--rounds R]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.eval.metrics import ate
from laser_slam_tpu.io.carmen import read_carmen
from laser_slam_tpu.mapping.occupancy import (
    empty_grid,
    integrate_scans,
    spec_for_trajectory,
)
from laser_slam_tpu.ops.preprocess import preprocess
from laser_slam_tpu.runtime.slam import SlamConfig, slam_offline
from laser_slam_tpu.viz.render import render_map_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="/root/reference/data/intel-lab.log")
    dflt = SlamConfig()
    ap.add_argument("--scans", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=dflt.rounds)
    ap.add_argument("--stride", type=int, default=dflt.anchor_stride)
    ap.add_argument("--radius", type=float, default=dflt.loop_radius)
    ap.add_argument("--max-loops", type=int, default=dflt.max_loops)
    ap.add_argument(
        "--submaps", action="store_true",
        help="verify loops submap-vs-submap (MapNode hierarchy)",
    )
    ap.add_argument("--out", default="/tmp/slam_map.png")
    args = ap.parse_args()

    log = read_carmen(args.log, max_scans=args.scans)
    model = log.model
    cfg = SlamConfig(
        anchor_stride=args.stride,
        rounds=args.rounds,
        loop_radius=args.radius,
        max_loops=args.max_loops,
        use_submaps=args.submaps,
    )
    print(f"{log.n_scans} scans x {model.n_beams} beams; cfg={cfg}")

    t0 = time.time()
    res = jax.block_until_ready(
        slam_offline(model, jnp.asarray(log.ranges), cfg,
                     timestamps=log.timestamps)
    )
    print(f"slam_offline: {time.time() - t0:.2f}s (incl. compile)")
    print(f"loops accepted: {int(res.n_loops)}, chi2: {float(res.chi2):.2f}")

    gt = jnp.asarray(log.gt_pose)
    a_odo = ate(res.odo_poses, gt)
    a_slam = ate(res.poses, gt)
    print(f"ATE odometry: rmse={float(a_odo.rmse):.3f}m mean={float(a_odo.mean):.3f}m")
    print(f"ATE slam:     rmse={float(a_slam.rmse):.3f}m mean={float(a_slam.mean):.3f}m")

    est = np.asarray(res.poses)
    scans = preprocess(jnp.asarray(log.ranges), model)
    spec = spec_for_trajectory(est, model.max_range, resolution=0.05)
    grid = jax.jit(lambda g, s, p: integrate_scans(g, model, s, p))(
        empty_grid(spec), scans, jnp.asarray(est)
    )
    render_map_png(jax.device_get(grid), args.out, est)
    print(f"map -> {args.out}")


if __name__ == "__main__":
    main()
