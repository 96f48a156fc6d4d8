"""Velocity-profile generation (Trajectory.cpp parity).

Checks the closed-form trapezoid against the physical constraints the
reference's slice loops enforce (NewSegmentRectilinear /
CalMidSpd, Trajectory.cpp:1310-1513): acceleration bounds, distance
integration, end-speed clamping on short segments, and chained
schedules that slow for corners and stop at the goal.
"""

import jax
import numpy as np

from laser_slam_tpu.nav.trajectory import (
    CMD_SLICE,
    MAX_ACC,
    MAX_DEC,
    MAX_SPD,
    plan_velocity_schedule,
    spin_profile,
    trapezoid_profile,
    wheel_velocities,
)


def _check_profile(p, dist, v0, tol=0.08):
    v = np.asarray(p.v)[np.asarray(p.valid)]
    # Slope obeys accel/decel limits (slice-to-slice).
    dv = np.diff(np.concatenate([[v0], v]))
    assert dv.max() <= MAX_ACC * CMD_SLICE + 1e-5
    assert dv.min() >= -MAX_DEC * CMD_SLICE - 1e-5
    # Speed cap.
    assert v.max() <= MAX_SPD + 1e-5
    # Distance integrates to the segment length.
    s = v.sum() * CMD_SLICE
    assert abs(s - dist) < max(tol, 0.05 * dist), (s, dist)


def test_trapezoid_reaches_cruise_and_stops():
    p = jax.jit(trapezoid_profile)(5.0, 0.0, 0.0)
    _check_profile(p, 5.0, 0.0)
    v = np.asarray(p.v)[np.asarray(p.valid)]
    assert abs(v.max() - MAX_SPD) < 1e-3   # long segment hits cruise
    assert v[-1] < 0.05                    # and stops at the end


def test_trapezoid_triangle_on_short_segment():
    p = trapezoid_profile(0.4, 0.0, 0.0)
    _check_profile(p, 0.4, 0.0)
    v = np.asarray(p.v)[np.asarray(p.valid)]
    assert v.max() < MAX_SPD - 0.05        # never reaches cruise


def test_trapezoid_clamps_unreachable_end_speed():
    # 0.2 m cannot reach 0.7 m/s from rest at 0.8 m/s².
    p = trapezoid_profile(0.2, 0.0, MAX_SPD)
    ve = float(p.v_end)
    assert abs(ve - np.sqrt(2 * MAX_ACC * 0.2)) < 1e-3
    _check_profile(p, 0.2, 0.0)


def test_spin_profile_turns_the_angle():
    for ang in (np.pi / 2, -np.pi):
        p = spin_profile(ang)
        w = np.asarray(p.v)[np.asarray(p.valid)]
        turned = w.sum() * CMD_SLICE
        assert abs(turned - ang) < 0.05
        assert np.all(np.sign(w) == np.sign(ang))


def test_wheel_velocities():
    vl, vr = wheel_velocities(0.5, 0.2, wheel_base=0.5)
    assert abs(float(vl) - 0.45) < 1e-6
    assert abs(float(vr) - 0.55) < 1e-6


def test_schedule_slows_for_corners_and_stops():
    # L-shaped path: straight, 90° corner, straight.
    path = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]
    sched = plan_velocity_schedule(path)
    ok = np.asarray(sched.seg_ok)
    assert ok[:2].all() and not ok[2:].any()
    v0 = np.asarray(sched.v[0])[np.asarray(sched.valid[0])]
    v1 = np.asarray(sched.v[1])[np.asarray(sched.valid[1])]
    # Corner speed (end of seg 0 = start of seg 1) well below cruise.
    assert v0[-1] < 0.6 * MAX_SPD
    assert abs(v0[-1] - v1[0]) < MAX_ACC * CMD_SLICE + 0.06  # continuity
    assert v1[-1] < 0.05                    # goal stop
    # Each segment covers its length.
    assert abs(v0.sum() * CMD_SLICE - 4.0) < 0.2
    assert abs(v1.sum() * CMD_SLICE - 4.0) < 0.2


def test_task_engine_velocity_schedule():
    import jax
    import jax.numpy as jnp

    from laser_slam_tpu.app.task import TaskEngine, TaskState
    from laser_slam_tpu.core.scan import LMS211
    from laser_slam_tpu.mapping.occupancy import GridSpec2D, OccupancyGrid
    from laser_slam_tpu.ops.preprocess import preprocess

    spec = GridSpec2D(resolution=0.1, width=120, height=120,
                      origin_x=0.0, origin_y=0.0)
    lo = -np.ones((120, 120), np.float32)
    lo[0, :] = 5.0; lo[-1, :] = 5.0; lo[:, 0] = 5.0; lo[:, -1] = 5.0
    grid = OccupancyGrid(spec=spec, log_odds=jnp.asarray(lo))
    eng = TaskEngine(LMS211, grid, robot_radius=0.2, face_tolerance=10.0)
    assert eng.velocity_schedule() is None
    eng.add_goal((8.0, 2.0), speed_limit=0.4)
    scan = jax.tree.map(
        lambda a: a[0],
        preprocess(jnp.asarray(np.full(181, 10.0, np.float32))[None], LMS211),
    )
    eng.step(np.array([2.0, 2.0, 0.0], np.float32), scan)
    assert eng.state is TaskState.TRACKING
    sched = eng.velocity_schedule()
    assert sched is not None
    v = np.asarray(sched.v)[np.asarray(sched.valid)]
    assert v.max() <= 0.4 + 1e-5          # leg speed cap respected
