"""Fused Pallas PSM kernel vs the XLA reference implementation.

Runs in interpreter mode on the CPU test mesh; the compiled path is
exercised on real TPU hardware by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_slam_tpu.core import se2
from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.ops import preprocess as pp
from laser_slam_tpu.ops.pallas.psm_kernel import match_psm_pallas, supports_model
from laser_slam_tpu.ops.psm import match_psm

MODEL = LMS211


def _batch(room, rels, seed=0):
    rng = np.random.default_rng(seed)
    sa_l, sb_l = [], []
    for rel in rels:
        pa = (0.4, -0.3, 0.2)
        pb = tuple(np.asarray(se2.compose(jnp.asarray(pa), jnp.asarray(rel))))
        ra = room(MODEL, pa) + rng.normal(0, 0.003, MODEL.n_beams).astype(np.float32)
        rb = room(MODEL, pb) + rng.normal(0, 0.003, MODEL.n_beams).astype(np.float32)
        sa_l.append(pp.preprocess(jnp.asarray(ra), MODEL))
        sb_l.append(pp.preprocess(jnp.asarray(rb), MODEL))
    stack = lambda xs: jax.tree.map(lambda *x: jnp.stack(x), *xs)
    return stack(sa_l), stack(sb_l)


def test_pallas_matches_xla_synthetic(room):
    rels = [(0.05, 0.02, 0.03), (-0.1, 0.05, -0.05), (0.0, 0.0, 0.12)]
    sa, sb = _batch(room, rels)
    ref = jax.vmap(lambda a, b: match_psm(MODEL, a, b))(sa, sb)
    pal = match_psm_pallas(MODEL, sa, sb, interpret=True)
    assert not np.any(np.asarray(pal.fail))
    assert np.allclose(np.asarray(pal.pose), np.asarray(ref.pose), atol=2e-3)


def test_pallas_matches_xla_real_pairs(intel_log_path):
    from laser_slam_tpu.io.carmen import read_carmen

    log = read_carmen(intel_log_path, max_scans=9)
    scans = pp.preprocess(jnp.asarray(log.ranges), log.model)
    ref_s = jax.tree.map(lambda x: x[:-1], scans)
    cur_s = jax.tree.map(lambda x: x[1:], scans)
    assert supports_model(log.model)
    ref = jax.vmap(lambda a, b: match_psm(log.model, a, b))(ref_s, cur_s)
    pal = match_psm_pallas(log.model, ref_s, cur_s, interpret=True)
    ok = ~np.asarray(ref.fail) & ~np.asarray(pal.fail)
    d = np.abs(np.asarray(pal.pose) - np.asarray(ref.pose))[ok]
    # Identical algorithm, different op ordering: near-identical results.
    assert np.median(d[:, :2]) < 5e-3
    assert np.median(d[:, 2]) < 5e-3
    assert np.array_equal(np.asarray(ref.fail), np.asarray(pal.fail))


def test_pallas_with_init_pose(room):
    rels = [(0.3, -0.2, 0.3)]
    sa, sb = _batch(room, rels)
    init = jnp.asarray([[0.28, -0.18, 0.28]])
    pal = match_psm_pallas(MODEL, sa, sb, init, interpret=True)
    assert np.allclose(np.asarray(pal.pose)[0], rels[0], atol=0.05)


@pytest.mark.accuracy
def test_pallas_compiled_parity_on_intel():
    """COMPILED (not interpreted) fused-kernel parity over 500+ real
    intel-lab pairs on the TPU (VERDICT r3 #5). Runs in the TPU-sized
    accuracy lane (LASER_SLAM_ACCURACY_TPU=1 pytest -m accuracy); on the
    CPU mesh the compiled Mosaic path is unavailable and the test skips."""
    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("compiled Pallas path needs TPU hardware")
    from laser_slam_tpu.io.carmen import read_carmen

    log = read_carmen("/root/reference/data/intel-lab.log", max_scans=513)
    model = log.model
    scans = pp.preprocess(jnp.asarray(log.ranges), model)
    ref = jax.tree.map(lambda x: x[:-1], scans)
    cur = jax.tree.map(lambda x: x[1:], scans)

    pal = jax.device_get(match_psm_pallas(model, ref, cur))
    xla = jax.device_get(
        jax.jit(jax.vmap(
            lambda a, c: match_psm(model, a, c, banded=True)
        ))(ref, cur)
    )
    fail_p = np.asarray(pal.fail)
    fail_x = np.asarray(xla.fail)
    both_ok = ~fail_p & ~fail_x
    assert both_ok.sum() >= 500
    dp = np.asarray(pal.pose) - np.asarray(xla.pose)
    dt = np.linalg.norm(dp[:, :2], axis=-1)
    dr = np.abs((dp[:, 2] + np.pi) % (2 * np.pi) - np.pi)
    # Measured on the full 2671-pair log (tools/exp/pallas_parity.py):
    # median agreement 0.6 mm / 0.016°, p99 5.3 cm / 0.87° — a small
    # tail where the two iteration orders settle in different local
    # minima of the same degenerate corridor pairs.
    assert np.percentile(dt[both_ok], 50) < 5e-3
    assert np.degrees(np.percentile(dr[both_ok], 50)) < 0.1
    assert np.percentile(dt[both_ok], 99) < 0.15
    assert np.degrees(np.percentile(dr[both_ok], 99)) < 2.0
    # Failure sets stay small and nearly coincident: the ~11 failing
    # pairs are degenerate geometry both implementations reject (the
    # set flickers by ±1 under 1e-4 m input noise — marginal pairs at
    # the det/valid-count gates, not a kernel defect).
    assert fail_p.sum() <= 20
    assert (fail_p & ~fail_x).sum() <= 5
