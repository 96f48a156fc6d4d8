"""Regenerate the reference-implementation baselines.

Builds the reference's own PSM/ICP keyframe odometry (runlogImproved
protocol, src/zhpsm/ZHPolar_Match.cpp:736-854) straight from the
read-only checkout, runs it over the bundled CARMEN logs, and records
its trajectories + ATE + throughput in ``baselines/reference.json``.
The pytest accuracy suite (tests/test_accuracy.py) asserts our pipeline
stays at least this good.

Note on scope: the reference's *full* backend (submap graph + loop
closure) links g2o, CSM, MRPT, FLIRTLib and Qt4, none of which exist in
this image, so the strongest reference pipeline that can actually run
here is its odometry. Its backend quality bar is therefore represented
by the accuracy targets in BASELINE.md (SLAM ATE must beat odometry ATE
and our recorded SLAM bounds).

Usage: python tools/record_baselines.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data"
LOGS = [
    ("intel-lab", "LMS211"),
    ("fr079", "LMS511"),
    ("mit-cscail", "LMS511"),
]

# The reference PSM works in centimeters (PolarParameter.h: ranges in cm,
# testAccuracy converts rx/100 to meters, ZHPolar_Match.cpp:414); its
# trajectory dump is cm as well.
CM = 0.01


def main() -> None:
    import jax.numpy as jnp

    from laser_slam_tpu.eval.metrics import ate
    from laser_slam_tpu.io.carmen import read_carmen

    binary = os.path.join(REPO, "tools", "ref", "ref_odometry")
    if not os.path.exists(binary):
        subprocess.run(
            [os.path.join(REPO, "tools", "ref", "build.sh")], check=True
        )

    out: dict = {"generator": "tools/record_baselines.py", "logs": {}}
    os.makedirs(os.path.join(REPO, "baselines"), exist_ok=True)
    for name, laser in LOGS:
        log_path = os.path.join(REF_DATA, f"{name}.log")
        if not os.path.exists(log_path):
            print(f"skip {name}: no {log_path}", file=sys.stderr)
            continue
        traj_path = os.path.join(REPO, "baselines", f"ref_odo_{name}.txt")
        p = subprocess.run(
            [binary, log_path, laser, traj_path],
            capture_output=True,
            text=True,
            check=True,
        )
        stats = json.loads(p.stderr.strip().splitlines()[-1])

        traj = np.loadtxt(traj_path, dtype=np.float32)
        traj[:, :2] *= CM
        log = read_carmen(log_path)
        n = min(len(traj), log.n_scans)
        a = ate(jnp.asarray(traj[:n]), jnp.asarray(log.gt_pose[:n]))
        entry = {
            "laser": laser,
            "scans": stats["scans"],
            "discarded": stats["discarded"],
            "matches_per_sec_cpu": stats["matches_per_sec"],
            "ate_rmse_m": round(float(a.rmse), 3),
            "ate_mean_m": round(float(a.mean), 3),
            "trajectory": f"baselines/ref_odo_{name}.txt",
        }
        out["logs"][name] = entry
        print(f"{name}: {entry}")

    with open(os.path.join(REPO, "baselines", "reference.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote baselines/reference.json")


if __name__ == "__main__":
    main()
