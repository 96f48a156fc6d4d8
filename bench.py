"""Headline benchmark: batched scan matches per second per chip.

Runs the vmapped PSM matcher (banded projection — bit-identical to the
dense path on the bundled logs) over real consecutive scan pairs from
the intel-lab CARMEN log on the available accelerator.

Baseline: the reference's own PSM matcher (src/zhpsm/ZHPolar_Match.cpp
pm_psm), compiled with g++ -O2 and timed over the same 2671 intel-lab
pairs on this machine's CPU: 1271.5 matches/s (single-threaded; its ICP
does 604.9). ``vs_baseline`` is our rate divided by that.

Measurement notes: the axon TPU backend memoizes repeated executions
with identical inputs, so every repetition perturbs the input with
fresh random per-pair noise, every run's outputs are fully fetched, and
the reported rate uses the median per-run wall time.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
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

    rng = np.random.default_rng(int.from_bytes(os.urandom(4)))
    log_err("devices:", jax.devices())
    log = read_carmen(LOG)
    model = log.model
    scans = preprocess(jnp.asarray(log.ranges), model)

    ref = jax.tree.map(lambda x: x[:-1], scans)
    cur = jax.tree.map(lambda x: x[1:], scans)
    b = ref.ranges.shape[0]  # 2671 pairs

    # Fastest path on TPU: the fused Pallas kernel (true per-pair early
    # exit); elsewhere fall back to the XLA fori-loop matcher.
    from laser_slam_tpu.ops.pallas.psm_kernel import (
        match_psm_pallas,
        supports_model,
    )

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and supports_model(model):
        log_err("using fused Pallas PSM kernel")
        fn = jax.jit(lambda a, c: match_psm_pallas(model, a, c))
    else:
        log_err("using XLA vmapped PSM matcher")
        fn = jax.jit(jax.vmap(lambda a, c: match_psm(model, a, c, banded=True)))

    def run_once():
        eps = jnp.asarray(
            rng.uniform(1e-6, 1e-4, size=(b, 1)).astype(np.float32)
        )
        c = cur._replace(ranges=cur.ranges + eps)
        jax.block_until_ready(c.ranges)
        t0 = time.perf_counter()
        out = fn(ref, c)
        np.asarray(out.pose)  # full fetch — defeats async/memo shortcuts
        fails = int(np.asarray(out.fail).sum())
        return time.perf_counter() - t0, fails

    t_first, fails = run_once()  # compile + first run
    log_err(f"compile+first: {t_first:.2f}s, fails={fails}/{b}")

    times = [run_once()[0] for _ in range(5)]
    dt = float(np.median(times))
    rate = b / dt
    log_err(f"per-run times: {[round(t, 3) for t in times]} -> {rate:.1f} matches/s")

    extras = {
        "psm_compile_first_s": round(t_first, 1),
        "psm_fails": fails,
        # Per-run walls for drift tracking: the r1→r3 headline drifted
        # 10287→9909 matches/s with the kernel unchanged — the spread
        # here shows how much is remote-TPU-service run-to-run variance.
        "psm_run_times_s": [round(t, 3) for t in times],
    }
    try:
        extras.update(bench_secondary(model, scans, rng))
    except Exception as e:  # pragma: no cover - secondary metrics optional
        log_err("secondary bench failed:", repr(e))
    if os.environ.get("BENCH_SLAM", "1") != "0":
        try:
            extras.update(bench_slam_wall())
        except Exception as e:  # pragma: no cover
            log_err("slam wall bench failed:", repr(e))

    print(
        json.dumps(
            {
                "metric": "psm_scan_matches_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "matches/s",
                "vs_baseline": round(rate / REFERENCE_PSM_MATCHES_PER_SEC, 2),
                "extras": extras,
            }
        )
    )


def bench_secondary(model, scans, rng):
    """Loop-verification and map-update rates at real SLAM shapes
    (BASELINE.md names ICP correspondence + map updates, not just PSM).
    Written to the JSON 'extras' and stderr; failures don't affect the
    headline metric."""
    import jax
    import jax.numpy as jnp

    from laser_slam_tpu.graph.submap import build_submaps, wide_clouds
    from laser_slam_tpu.mapping.occupancy import (
        empty_grid,
        integrate_scans,
        spec_for_trajectory,
    )

    out = {}
    t_scans = 1280
    sub = jax.tree.map(lambda x: x[:t_scans], scans)
    zeros = jnp.zeros((t_scans, 3), jnp.float32)

    # --- loop verification, the SHIPPED chunked path ---
    # run_correlative_rounds drives host-gathered fixed-size chunks
    # through one small compiled program reused across chunks/rounds/
    # logs (runtime/slam.py verify_fn); r3's bench timed the monolithic
    # verify_loops_correlative program the pipeline no longer uses.
    from laser_slam_tpu.runtime.slam import SlamConfig, _verify_chunk

    cfg = SlamConfig()
    sm = jax.jit(
        lambda s, p: build_submaps(model, s, p, cfg.anchor_stride,
                                   cfg.submap_points)
    )(sub, zeros)
    a = sm.points.shape[0]
    ap = jnp.zeros((a, 3), jnp.float32)
    wp, wo = jax.jit(
        lambda s, o: wide_clouds(s, o, wing=cfg.wing,
                                 max_points=cfg.wide_points)
    )(sm, ap)
    chunk_fn = jax.jit(lambda *args: _verify_chunk(cfg, *args))
    c = cfg.verify_chunk
    n_pairs = 256
    src = np.arange(n_pairs) % (a // 2)
    dst = src + a // 2
    rel = jnp.zeros((c, 3), jnp.float32)
    valid = jnp.ones(c, bool)
    trust = jnp.full(c, 10.0, jnp.float32)

    def run_chunks(offset):
        for i in range(0, n_pairs, c):
            s_ = jnp.asarray((src[i:i + c] + offset) % (a // 2))
            d_ = jnp.asarray(dst[i:i + c])
            jax.block_until_ready(
                chunk_fn(
                    wp[s_], wo[s_], sm.points[s_], sm.valid[s_],
                    wp[d_], wo[d_], sm.points[d_], sm.valid[d_],
                    rel, valid, trust,
                ).accept
            )

    t0 = time.perf_counter()
    run_chunks(0)  # includes the one-time chunk-program compile
    t_first = time.perf_counter() - t0
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        run_chunks(k + 1)  # perturb pairs (axon memoization)
        ts.append(time.perf_counter() - t0)
    steady = float(np.median(ts))
    out["verify_pairs_per_sec"] = round(n_pairs / steady, 1)
    out["verify_chunk_compile_s"] = round(t_first - steady, 1)
    log_err(f"chunked loop verification: {out['verify_pairs_per_sec']} "
            f"pairs/s steady (chunk-program compile ~{t_first - steady:.1f}s)")

    # --- particle-filter localization tick (BASELINE: batched PF) ---
    # One fused predict+weight+resample+estimate program per tick — the
    # reference evaluates 60 particles in a serial loop
    # (particles.cpp:321-387); the vmapped tick runs 4096.
    try:
        out.update(bench_localization(model, scans))
    except Exception as e:  # pragma: no cover
        log_err("localization bench failed:", repr(e))

    # --- occupancy map update ---
    spec = spec_for_trajectory(np.zeros((2, 3)), model.max_range, 0.05)
    mfn = jax.jit(lambda g, s, p: integrate_scans(g, model, s, p))
    g0 = empty_grid(spec)
    jax.block_until_ready(mfn(g0, sub, zeros).log_odds)
    ts = []
    for k in range(3):
        z = zeros + jnp.float32(1e-4 * (k + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(mfn(g0, sub, z).log_odds)
        ts.append(time.perf_counter() - t0)
    out["map_update_scans_per_sec"] = round(
        t_scans / float(np.median(ts)), 1
    )
    log_err(f"map update: {out['map_update_scans_per_sec']} scans/s")
    return out


def bench_localization(model, scans, n_particles=4096, ticks=20):
    """Particle-filter tracking rate at production cloud size."""
    import jax
    import jax.numpy as jnp

    from laser_slam_tpu.core import se2
    from laser_slam_tpu.localization import particle_filter as pf
    from laser_slam_tpu.localization.raycast import likelihood_field
    from laser_slam_tpu.mapping.occupancy import (
        empty_grid, integrate_scans, spec_for_trajectory,
    )

    n_map = 400
    sub = jax.tree.map(lambda x: x[:n_map], scans)
    zeros = jnp.zeros((n_map, 3), jnp.float32)
    spec = spec_for_trajectory(np.zeros((2, 3)), model.max_range, 0.1)
    grid = jax.jit(lambda g, s, p: integrate_scans(g, model, s, p))(
        empty_grid(spec), sub, zeros
    )
    field = likelihood_field(grid)

    key = jax.random.PRNGKey(0)
    state = pf.init_gaussian(key, jnp.zeros(3), n_particles)

    @jax.jit
    def tick(st, rel, r, v, k):
        k1, k2 = jax.random.split(k)
        st = pf.predict(st, rel, k1, sigma_xy=0.05, sigma_theta=0.03)
        st = pf.update_field(st, field, grid, model, r, v)
        st = pf.maybe_resample(st, k2)
        return st, pf.estimate(st)

    rel = jnp.asarray([0.02, 0.0, 0.005], jnp.float32)
    r0 = scans.ranges[0]
    v0 = ~scans.bad[0] & (r0 < model.max_range)
    state, est = tick(state, rel, r0, v0, key)    # compile
    np.asarray(est)
    t0 = time.perf_counter()
    for t in range(1, ticks + 1):
        key, k = jax.random.split(key)
        state, est = tick(
            state, rel, scans.ranges[t % n_map], v0, k
        )
    np.asarray(est)                               # bound the work
    dt = (time.perf_counter() - t0) / ticks
    rate = n_particles / dt
    log_err(f"pf localization: {rate:,.0f} particle-updates/s "
            f"({1.0 / dt:.1f} ticks/s at {n_particles} particles)")
    return {
        "pf_particle_updates_per_sec": round(rate, 0),
        "pf_ticks_per_sec": round(1.0 / dt, 1),
    }


def bench_slam_wall():
    """Cold end-to-end ``slam_offline`` wall time + ATE on the flagship
    log (VERDICT r3 #4: wall-clock lived only in untracked diag files).
    Cold = this process's first compile of every pipeline program; the
    chunked verify/solve programs are shape-stable and reused across
    rounds. Skip with BENCH_SLAM=0."""
    import jax
    import jax.numpy as jnp

    from laser_slam_tpu.eval.metrics import ate
    from laser_slam_tpu.io.carmen import read_carmen
    from laser_slam_tpu.runtime.slam import SlamConfig, slam_offline

    out = {}
    log = read_carmen(LOG)
    t0 = time.perf_counter()
    res = slam_offline(log.model, jnp.asarray(log.ranges), SlamConfig(),
                       timestamps=log.timestamps)
    jax.block_until_ready(res.poses)
    wall = time.perf_counter() - t0
    a = ate(res.poses, jnp.asarray(log.gt_pose))
    out["slam_intel_wall_cold_s"] = round(wall, 1)
    out["slam_intel_ate_m"] = round(float(a.rmse), 3)
    log_err(f"slam_offline intel-lab: {wall:.1f}s cold, "
            f"ATE {float(a.rmse):.3f} m")
    return out


if __name__ == "__main__":
    main()
