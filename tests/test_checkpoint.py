"""Checkpoint/resume: pytree round-trip and mid-log session resume
(capability the reference lacks — SURVEY §5 'Checkpoint / resume: none')."""

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.runtime.online import OnlineSlam
from laser_slam_tpu.utils import load_pytree, save_pytree
from laser_slam_tpu.utils.profiling import Profiler
from tests.test_features import _room_ranges

MODEL = LMS211


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3),
        "nested": {"b": jnp.ones(4), "c": None},
        "tup": (np.float32(2.5), np.asarray([1, 2])),
    }
    p = str(tmp_path / "ckpt.npz")
    save_pytree(p, tree, meta={"step": 7})
    flat, meta = load_pytree(p)
    assert meta["step"] == 7
    np.testing.assert_array_equal(flat["a"], tree["a"])
    np.testing.assert_array_equal(flat["nested/b"], np.ones(4))
    assert flat["nested/c"] is None
    assert float(flat["tup/0"]) == 2.5


def test_online_slam_resume_matches_uninterrupted(tmp_path):
    def ranges_at(i):
        return _room_ranges((0.12 * i, 0.04 * i, 0.015 * i), seed=i)

    n_pre, n_post = 6, 4
    # Uninterrupted run.
    full = OnlineSlam(MODEL)
    for i in range(n_pre + n_post):
        full.feed_scan(ranges_at(i))

    # Interrupted + resumed run.
    first = OnlineSlam(MODEL)
    for i in range(n_pre):
        first.feed_scan(ranges_at(i))
    ckpt = str(tmp_path / "session.npz")
    first.save(ckpt)

    resumed = OnlineSlam.resume(MODEL, ckpt)
    assert resumed._t == n_pre
    for i in range(n_pre, n_pre + n_post):
        resumed.feed_scan(ranges_at(i))

    np.testing.assert_allclose(
        resumed.trajectory, full.trajectory, rtol=0, atol=1e-5
    )


def test_profiler_collects_and_reports():
    prof = Profiler()
    with prof.trace("off"):
        pass
    assert prof.report() == {}  # disabled by default
    prof.enable()
    with prof.trace("step"):
        sum(range(1000))
    prof.record("step", 0.002)
    rep = prof.report()
    assert rep["step"]["count"] == 2
    assert "step" in prof.summary()
