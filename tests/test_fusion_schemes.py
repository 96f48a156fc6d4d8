"""Tests for the covariance/UdU filters and the landmark-SLAM schemes
(Bayes++ parity surface: covFlt.cpp, UdU.cpp, kalmanSLAM.cpp,
fastSLAM.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core import se2
from laser_slam_tpu.fusion import kalman
from laser_slam_tpu.fusion.slam_schemes import (
    ekfslam_init,
    ekfslam_observe,
    ekfslam_predict,
    fastslam_estimate,
    fastslam_init,
    fastslam_neff,
    fastslam_observe,
    fastslam_predict,
    fastslam_resample,
)


# -- covariance (EKF) filter -------------------------------------------------


def test_kalman_linear_converges():
    s = kalman.init(jnp.zeros(3), 4.0)
    z = jnp.asarray([1.0, -2.0, 0.5])
    F = jnp.eye(3)
    for _ in range(8):
        s = kalman.predict_linear(s, F, 0.01)
        s = kalman.update_linear(s, jnp.eye(3), z - s.mean, 0.01)
    assert np.allclose(np.asarray(s.mean), np.asarray(z), atol=0.05)
    assert np.all(np.diag(np.asarray(s.cov)) < 0.1)


def test_kalman_nonlinear_range_observe():
    # observe distance to origin; state should shrink toward the circle
    s = kalman.init(jnp.asarray([2.0, 0.0]), 1.0)
    h = lambda x: jnp.linalg.norm(x)
    for _ in range(10):
        s = kalman.update(s, h, jnp.asarray(1.0), 0.001)
    assert abs(float(jnp.linalg.norm(s.mean)) - 1.0) < 0.02


# -- UdU factorized filter ----------------------------------------------------


def test_udu_factorize_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5)).astype(np.float32)
    P = A @ A.T + 0.5 * np.eye(5, dtype=np.float32)
    U, d = kalman.udu_factorize(jnp.asarray(P))
    U, d = np.asarray(U), np.asarray(d)
    # U unit upper-triangular
    assert np.allclose(np.diag(U), 1.0)
    assert np.allclose(np.tril(U, -1), 0.0, atol=1e-6)
    assert np.all(d > 0)
    assert np.allclose(U @ np.diag(d) @ U.T, P, atol=1e-3)


def test_bierman_matches_joseph_update():
    """One scalar observe via Bierman factors == covariance filter."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 4)).astype(np.float32)
    P = A @ A.T + np.eye(4, dtype=np.float32)
    mean = jnp.asarray(rng.normal(size=4).astype(np.float32))
    h = jnp.asarray(rng.normal(size=4).astype(np.float32))
    innov = jnp.asarray(0.7, jnp.float32)
    r = 0.3

    ks = kalman.KalmanState(mean, jnp.asarray(P))
    ks = kalman.update_linear(ks, h[None, :], innov[None], r)

    us = kalman.ud_init(mean, jnp.asarray(P))
    us = kalman.bierman_update(us, h, innov, r)

    assert np.allclose(np.asarray(us.mean), np.asarray(ks.mean), atol=1e-3)
    assert np.allclose(np.asarray(us.cov()), np.asarray(ks.cov), atol=1e-2)


def test_thornton_matches_covariance_predict():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(3, 3)).astype(np.float32)
    P = A @ A.T + np.eye(3, dtype=np.float32)
    F = np.eye(3, dtype=np.float32) + 0.1 * rng.normal(size=(3, 3)).astype(
        np.float32
    )
    q = np.asarray([0.2, 0.1, 0.05], np.float32)
    mean = jnp.asarray([1.0, 2.0, 3.0])

    ks = kalman.predict_linear(
        kalman.KalmanState(mean, jnp.asarray(P)), jnp.asarray(F), jnp.diag(jnp.asarray(q))
    )
    us = kalman.thornton_predict(
        kalman.UdState(mean, *kalman.udu_factorize(jnp.asarray(P))),
        jnp.asarray(F),
        jnp.asarray(q),
    )
    assert np.allclose(np.asarray(us.mean), np.asarray(ks.mean), atol=1e-5)
    assert np.allclose(np.asarray(us.cov()), np.asarray(ks.cov), atol=1e-3)


def test_ud_filter_jits():
    @jax.jit
    def step(us):
        us = kalman.thornton_predict(us, jnp.eye(3), jnp.full(3, 0.01))
        return kalman.ud_update(
            us, jnp.eye(3), jnp.asarray([1.0, -1.0, 0.5]) - us.mean, jnp.full(3, 0.1)
        )

    us = kalman.ud_init(jnp.zeros(3), 2.0)
    for _ in range(10):
        us = step(us)
    assert np.allclose(np.asarray(us.mean), [1.0, -1.0, 0.5], atol=0.05)


# -- EKF-SLAM ------------------------------------------------------------------


def _obs(pose, lm, rng=None, noise=0.0):
    d = np.asarray(lm) - np.asarray(pose[:2])
    z = np.asarray(
        [np.hypot(*d), np.arctan2(d[1], d[0]) - pose[2]], np.float32
    )
    if noise:
        z = z + rng.normal(0, noise, 2).astype(np.float32)
    return jnp.asarray(z)


def test_ekfslam_localizes_landmarks():
    lms = np.asarray([[2.0, 1.0], [-1.0, 2.0], [0.5, -2.0]], np.float32)
    s = ekfslam_init(jnp.zeros(3), max_landmarks=4)
    rng = np.random.default_rng(0)
    pose = np.zeros(3, np.float32)
    step = jax.jit(ekfslam_observe)
    for t in range(30):
        motion = jnp.asarray([0.05, 0.0, 0.05])
        s = ekfslam_predict(s, motion, 1e-4)
        pose = np.asarray(se2.compose(jnp.asarray(pose), motion))
        for k in range(3):
            s = step(s, k, _obs(pose, lms[k], rng, 0.005), 1e-4)
    est = np.asarray(s.landmarks())[:3]
    assert np.allclose(est, lms, atol=0.1), est
    assert np.allclose(np.asarray(s.robot()), pose, atol=0.1)
    assert bool(np.all(np.asarray(s.lm_valid)[:3]))


# -- fastSLAM -------------------------------------------------------------------


def test_fastslam_tracks_and_maps():
    lms = np.asarray([[2.0, 1.0], [-1.0, 2.0]], np.float32)
    key = jax.random.PRNGKey(0)
    s = fastslam_init(jnp.zeros(3), n_particles=128, max_landmarks=4)
    rng = np.random.default_rng(1)
    pose = np.zeros(3, np.float32)
    predict = jax.jit(fastslam_predict)
    observe = jax.jit(fastslam_observe)
    for t in range(25):
        motion = jnp.asarray([0.08, 0.0, 0.04])
        key, k1, k2 = jax.random.split(key, 3)
        s = predict(s, k1, motion, jnp.asarray([0.01, 0.01, 0.005]))
        pose = np.asarray(se2.compose(jnp.asarray(pose), motion))
        for k in range(2):
            s = observe(s, k, _obs(pose, lms[k], rng, 0.01), 1e-3)
        if float(fastslam_neff(s)) < 64:
            s = fastslam_resample(s, k2)
    est_pose, est_map = fastslam_estimate(s)
    assert np.allclose(np.asarray(est_pose)[:2], pose[:2], atol=0.25)
    assert np.allclose(np.asarray(est_map)[:2], lms, atol=0.3)


def test_fastslam_resample_resets_weights():
    s = fastslam_init(jnp.zeros(3), n_particles=16, max_landmarks=2)
    s = s._replace(log_w=jnp.arange(16.0))
    s2 = fastslam_resample(s, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(s2.log_w), 0.0)
    # heavy particles dominate the resampled set
    assert float(jnp.mean(s2.poses[:, 0])) == 0.0  # poses identical here
    assert float(fastslam_neff(s2)) == 16.0
