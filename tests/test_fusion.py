import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core import se2
from laser_slam_tpu.fusion import ukf


def test_predict_grows_uncertainty():
    s = ukf.init(jnp.zeros(3), 0.01)
    s2 = ukf.predict(s, None, q=0.5)
    assert np.all(np.diag(np.asarray(s2.cov)) > np.diag(np.asarray(s.cov)))
    assert np.allclose(s2.mean, 0.0)


def test_pose_update_converges():
    s = ukf.init(jnp.zeros(3), 4.0)
    z = jnp.asarray([1.0, -2.0, 0.5])
    for _ in range(6):
        s = ukf.predict(s, None, q=0.01)
        s = ukf.update_pose(s, z, 0.01)
    assert np.allclose(np.asarray(s.mean), np.asarray(z), atol=0.05)
    assert np.all(np.diag(np.asarray(s.cov)) < 0.1)


def test_angle_wrap_in_update():
    s = ukf.init(jnp.asarray([0.0, 0.0, 3.1]), 0.1)
    z = jnp.asarray([0.0, 0.0, -3.1])  # only 0.08 rad away across the cut
    s = ukf.update_pose(s, z, 0.01)
    # must move toward ±pi, not through zero
    assert abs(abs(float(s.mean[2])) - np.pi) < 0.1


def test_partial_beacon_update():
    s = ukf.init(jnp.asarray([0.0, 0.0, 0.7]), 1.0)
    s = ukf.update_partial(s, (0, 1), jnp.asarray([2.0, 3.0]), 0.001)
    assert np.allclose(np.asarray(s.mean[:2]), [2.0, 3.0], atol=0.05)
    assert abs(float(s.mean[2]) - 0.7) < 1e-3  # heading untouched


def test_nonlinear_gps_range():
    # GPS range observation: h(x) = ||x - station|| (config.hpp:180-197).
    station = jnp.asarray([5.0, 0.0])

    def h(x):
        return jnp.linalg.norm(x[:2] - station)

    s = ukf.init(jnp.asarray([1.0, 2.0, 0.0]), jnp.diag(jnp.asarray([1.0, 1.0, 0.01])))
    true = jnp.asarray([0.0, 3.0])
    z = jnp.linalg.norm(true - station)
    for _ in range(8):
        s = ukf.update_nonlinear(s, h, z, 0.01)
    # Mean should move onto the range circle.
    assert abs(float(h(s.mean)) - float(z)) < 0.1


def test_fusion_step_tracks_trajectory():
    rng = np.random.default_rng(0)
    true = jnp.zeros(3)
    s = ukf.init(jnp.zeros(3), 0.01)
    for k in range(30):
        rel = jnp.asarray([0.1, 0.0, 0.05])
        true = se2.compose(true, rel)
        noisy_rel = rel + jnp.asarray(rng.normal(0, 0.01, 3).astype(np.float32))
        slam = true + jnp.asarray(rng.normal(0, 0.02, 3).astype(np.float32))
        inp = ukf.FusionInputs(
            odom_rel=noisy_rel,
            odom_valid=jnp.asarray(True),
            slam_pose=slam,
            slam_valid=jnp.asarray(k % 2 == 0),  # slam at half rate
            beacon_xy=true[:2],
            beacon_valid=jnp.asarray(k % 5 == 0),
        )
        s, _ = jax.jit(ukf.fusion_step)(s, inp)
    err = np.asarray(s.mean - true)
    assert np.linalg.norm(err[:2]) < 0.1
    assert abs(float(se2.normalize_angle(jnp.asarray(err[2])))) < 0.05


def test_fusion_step_timestamp_gating():
    # A stale SLAM observation (timestamp not newer than the filter
    # time) must be skipped — the reference's t_filter_current gate
    # (threadFusion.cpp:225-300).
    s0 = ukf.init(jnp.zeros(3), 0.01)
    inp = ukf.FusionInputs(
        odom_rel=jnp.zeros(3),
        odom_valid=jnp.asarray(False),
        slam_pose=jnp.asarray([5.0, 0.0, 0.0]),
        slam_valid=jnp.asarray(True),
        beacon_xy=jnp.zeros(2),
        beacon_valid=jnp.asarray(False),
        slam_t=jnp.asarray(10.0),
    )
    fresh, t1 = ukf.fusion_step(s0, inp, filter_t=5.0)
    assert float(t1) == 10.0
    assert float(fresh.mean[0]) > 1.0        # observation applied
    stale, t2 = ukf.fusion_step(s0, inp, filter_t=10.0)
    assert float(t2) == 10.0                 # time does not advance
    assert abs(float(stale.mean[0])) < 0.2   # observation skipped
    # default (unstamped) inputs stay always-fresh
    inp0 = inp._replace(slam_t=jnp.inf)
    always, t3 = ukf.fusion_step(s0, inp0, filter_t=10.0)
    assert float(always.mean[0]) > 1.0
    assert float(t3) == 10.0                 # inf never becomes the clock
