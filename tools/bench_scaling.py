"""Multi-device scaling benchmark (BASELINE.md target: ≥80% frames/s
efficiency from 1 chip to N≥2 hosts).

Measures the two shardable backend workloads on a device mesh:

- batched scan matching (the loop-verification front): vmapped PSM over
  B pairs, batch axis sharded across the mesh;
- the distributed pose-graph step (sharded matching feeding the
  replicated solve, :func:`laser_slam_tpu.parallel.distributed.
  training_step`).

Run on real chips when a multi-chip slice is attached; on a single-chip
or CPU-only machine it uses N virtual host devices
(``xla_force_host_platform_device_count``) — the standard JAX topology
fold (the role of the reference's oneThread build). Writes
``SCALING.json``.

Usage: python tools/bench_scaling.py [--devices 8] [--pairs 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=512)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--tpu", action="store_true",
                    help="use attached accelerator devices as-is")
    args = ap.parse_args()

    import jax

    # Platform must be chosen BEFORE the first backend query — after
    # jax.devices() the backend is latched and config updates are
    # ignored. Real multi-chip slices opt in with --tpu; the default is
    # the N-virtual-device CPU fold (oneThread-style topology folding).
    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from laser_slam_tpu.core.scan import LMS211
    from laser_slam_tpu.ops.psm import match_psm
    from laser_slam_tpu.parallel.mesh import make_mesh, shard_batch

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_pairs

    model = LMS211
    b = args.pairs
    ref, cur, _ = _synthetic_pairs(model, b, seed=0)

    def bench(n_dev: int) -> float:
        mesh = make_mesh(n_dev)
        r = shard_batch(mesh, ref)
        c = shard_batch(mesh, cur)
        fn = jax.jit(
            jax.vmap(lambda a, q: match_psm(model, a, q, banded=True).pose)
        )
        jax.block_until_ready(fn(r, c))          # compile
        ts = []
        for k in range(3):
            c2 = jax.tree.map(lambda x: x, c)._replace(
                ranges=c.ranges + jnp.float32(1e-5 * (k + 1))
            )
            t0 = time.perf_counter()
            jax.block_until_ready(fn(r, c2))
            ts.append(time.perf_counter() - t0)
        return b / float(np.median(ts))

    results = {}
    for n in (1, 2, 4, args.devices):
        if n > len(jax.devices()):
            continue
        rate = bench(n)
        results[str(n)] = round(rate, 1)
        print(f"{n} devices: {rate:.1f} matches/s", file=sys.stderr)

    base = results["1"]
    eff = {
        n: round(rate / (base * int(n)), 3) for n, rate in results.items()
    }
    out = {
        "workload": "sharded batched PSM scan matching",
        "pairs": b,
        "platform": jax.devices()[0].platform,
        "matches_per_sec": results,
        "efficiency_vs_1dev": eff,
        "target": ">=0.80 at max devices (BASELINE.md)",
        "pass": eff[str(max(int(k) for k in results))] >= 0.80,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
