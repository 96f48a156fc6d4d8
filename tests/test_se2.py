import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core import se2


def test_compose_identity():
    a = jnp.array([1.0, 2.0, 0.5])
    assert np.allclose(se2.compose(a, se2.identity()), a, atol=1e-6)
    assert np.allclose(se2.compose(se2.identity(), a), a, atol=1e-6)


def test_inverse_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    out = se2.compose(a, se2.inverse(a))
    assert np.allclose(out, np.zeros((16, 3)), atol=1e-5)


def test_relative_compose_roundtrip():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    rel = se2.relative(a, b)
    back = se2.compose(a, rel)
    assert np.allclose(
        se2.normalize_angle(back[..., 2] - b[..., 2]), 0.0, atol=1e-5
    )
    assert np.allclose(back[..., :2], b[..., :2], atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32) * 0.5)
    assert np.allclose(se2.log(se2.exp(t)), t, atol=1e-4)


def test_exp_zero_rotation():
    t = jnp.array([1.0, -2.0, 0.0])
    assert np.allclose(se2.exp(t), t, atol=1e-6)


def test_chain_matches_serial():
    rng = np.random.default_rng(3)
    rel = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32) * 0.1)
    chained = se2.chain(rel)
    acc = rel[0]
    serial = [acc]
    for i in range(1, 10):
        acc = se2.compose(acc, rel[i])
        serial.append(acc)
    serial = jnp.stack(serial)
    assert np.allclose(chained, serial, atol=1e-4)


def test_transform_points():
    pose = jnp.array([1.0, 0.0, np.pi / 2])
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = se2.transform_points(pose, pts)
    assert np.allclose(out, [[1.0, 1.0], [0.0, 0.0]], atol=1e-6)


def test_normalize_angle_range():
    a = jnp.linspace(-10.0, 10.0, 101)
    w = se2.normalize_angle(a)
    assert np.all(np.asarray(w) >= -np.pi - 1e-6)
    assert np.all(np.asarray(w) < np.pi + 1e-6)
    assert np.allclose(np.cos(w), np.cos(a), atol=1e-5)
    assert np.allclose(np.sin(w), np.sin(a), atol=1e-5)
