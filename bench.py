"""Headline benchmark: batched scan matches per second per chip.

Runs the vmapped PSM matcher over real consecutive scan pairs from the
intel-lab CARMEN log on the available accelerator and reports throughput.

Baseline: the reference's own PSM matcher (src/zhpsm/ZHPolar_Match.cpp
pm_psm), compiled with g++ -O2 and timed over the same 2671 intel-lab
pairs on this machine's CPU: 1271.5 matches/s (single-threaded; its ICP
does 604.9). ``vs_baseline`` is our rate divided by that.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_PSM_MATCHES_PER_SEC = 1271.5  # measured, see module docstring

LOG = "/root/reference/data/intel-lab.log"


def log_err(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from laser_slam_tpu.io.carmen import read_carmen
    from laser_slam_tpu.ops.preprocess import preprocess
    from laser_slam_tpu.ops.psm import match_psm

    log_err("devices:", jax.devices())
    log = read_carmen(LOG)
    model = log.model
    scans = preprocess(jnp.asarray(log.ranges), model)

    ref = jax.tree.map(lambda x: x[:-1], scans)
    cur = jax.tree.map(lambda x: x[1:], scans)
    b = ref.ranges.shape[0]  # 2671 pairs

    @jax.jit
    def run(r, c, eps):
        # eps folds a per-repetition perturbation into the input so the
        # backend cannot memoize identical executions.
        c = c._replace(ranges=c.ranges + eps)
        res = jax.vmap(lambda a, b_: match_psm(model, a, b_))(r, c)
        return res.pose, res.fail

    # Warm-up / compile.
    t0 = time.perf_counter()
    pose, fail = jax.block_until_ready(run(ref, cur, jnp.float32(0.0)))
    log_err(f"compile+first: {time.perf_counter() - t0:.2f}s, "
            f"fails={int(np.asarray(fail).sum())}/{b}")

    reps = 5
    t0 = time.perf_counter()
    for k in range(reps):
        eps = jnp.float32(1e-5 * (k + 1))
        pose, fail = run(ref, cur, eps)
    jax.block_until_ready((pose, fail))
    dt = time.perf_counter() - t0
    rate = b * reps / dt
    log_err(f"{reps} reps x {b} pairs in {dt:.3f}s -> {rate:.1f} matches/s")

    print(
        json.dumps(
            {
                "metric": "psm_scan_matches_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "matches/s",
                "vs_baseline": round(rate / REFERENCE_PSM_MATCHES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
