import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.ops import preprocess as pp


def test_median_filter_matches_numpy():
    rng = np.random.default_rng(0)
    r = rng.uniform(0.5, 10.0, size=(181,)).astype(np.float32)
    out = np.asarray(pp.median_filter(jnp.asarray(r)))
    # Reference clamps window indices at the edges (ZHPolar_Match.cpp:1625).
    padded = np.concatenate([[r[0]] * 2, r, [r[-1]] * 2])
    expect = np.array([np.median(padded[i : i + 5]) for i in range(181)])
    assert np.allclose(out, expect, atol=1e-6)


def test_median_filter_removes_spikes():
    r = np.full(181, 5.0, dtype=np.float32)
    r[90] = 0.5  # chair leg
    out = np.asarray(pp.median_filter(jnp.asarray(r)))
    assert np.allclose(out, 5.0)


def test_far_point_mask():
    r = jnp.array([1.0, 49.0, 51.0, 80.0])
    mask = pp.far_point_mask(r, LMS211)
    assert np.array_equal(np.asarray(mask), [False, False, True, True])


def test_pair_connected_simple_jump():
    r = np.full(32, 3.0, dtype=np.float32)
    r[16:] = 6.0  # discontinuity between beam 15 and 16
    bad = np.zeros(32, dtype=bool)
    c = np.asarray(pp.pair_connected(jnp.asarray(r), jnp.asarray(bad)))
    assert not c[0]
    assert c[1:16].all()
    assert not c[16]
    assert c[17:].all()


def test_pair_connected_extrapolation_keeps_wall():
    # A wall at grazing incidence: consecutive range deltas exceed the
    # threshold but grow linearly — the extrapolation rule keeps the
    # segment together (ZHPolar_Match.cpp:1530-1537).
    r = (3.0 + 0.3 * np.arange(32)).astype(np.float32)  # deltas 0.3 > 0.2
    bad = np.zeros(32, dtype=bool)
    c = np.asarray(pp.pair_connected(jnp.asarray(r), jnp.asarray(bad)))
    # Pair 1 breaks (delta too big, no extrapolation history), but once a
    # linear run is established the extrapolation rule connects the rest.
    assert c[3:].all()


def test_segment_ids_singletons_zero():
    pair_ok = jnp.asarray(
        np.array([0, 1, 1, 0, 0, 0, 1, 0], dtype=bool)
    )  # beams 0-2 one segment, beam 3,4 singletons? (3 connects nothing)
    seg = np.asarray(pp.segment_ids(pair_ok))
    assert seg[0] == seg[1] == seg[2] != 0
    assert seg[3] != seg[2]
    assert seg[4] == 0  # isolated: no left or right pair
    assert seg[5] == seg[6] != 0


def test_preprocess_shapes_and_batch():
    rng = np.random.default_rng(1)
    r = rng.uniform(0.5, 10.0, size=(4, 181)).astype(np.float32)
    scan = pp.preprocess(jnp.asarray(r), LMS211)
    assert scan.ranges.shape == (4, 181)
    assert scan.bad.shape == (4, 181)
    assert scan.seg.dtype == jnp.int32
