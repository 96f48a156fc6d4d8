"""Velocity-profile trajectory generation (Trajectory.cpp parity).

The reference's trajectory layer (src/Main-Ctrl/Task/Trajectory.cpp,
1687 LoC) converts a waypoint path into fixed-rate wheel-velocity
command schedules: per-segment trapezoidal speed profiles with
accel/decel limits (``NewSegmentRectilinear``/``CalMidSpd``,
Trajectory.cpp:1310-1513), cubic blending between segments
(``NewSegmentBlend``, 1515+), in-place spins (``Spin``, 1666), emitted
as ``CMD_SLICE_LEN`` = 0.05 s slices for the motor link
(MainCtrl_Define.h:131-139: MAX_ACC 0.8, MAX_DEACC −0.4, MAX_SPD 0.7).

TPU-idiomatic re-design: each profile is a CLOSED-FORM function of time
sampled onto a fixed-length slice grid with a validity mask — no
branch-per-slice loops; one jittable program covers every segment and
the whole schedule batches under ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Reference constants (MainCtrl_Define.h:131-189).
MAX_ACC = 0.8        # [m/s²]
MAX_DEC = 0.4        # [m/s²] magnitude
MAX_SPD = 0.7        # [m/s]
CMD_SLICE = 0.05     # [s] command slice length
MAX_SLICES = 512     # fixed schedule capacity (25.6 s per segment)


class Profile(NamedTuple):
    v: Array         # [MAX_SLICES] speed at each slice [m/s]
    valid: Array     # [MAX_SLICES] bool — slice is part of the segment
    v_end: Array     # [] achieved end speed (may undershoot the request
    #                  when the segment is too short — the reference
    #                  recomputes fEndSpd the same way)
    t_total: Array   # [] profile duration [s]


def trapezoid_profile(
    dist: Array,
    v0: Array,
    v_end: Array,
    v_max: float = MAX_SPD,
    acc: float = MAX_ACC,
    dec: float = MAX_DEC,
    dt: float = CMD_SLICE,
) -> Profile:
    """Trapezoidal speed profile over a straight segment of ``dist`` m.

    Closed form of NewSegmentRectilinear's case ladder: clamp the
    requested end speed to what the distance allows, find the peak
    (``CalMidSpd``) or cruise speed, and sample accel/cruise/decel
    phases onto the slice grid.
    """
    dtype = jnp.result_type(jnp.asarray(dist).dtype, jnp.float32)
    dist = jnp.asarray(dist, dtype)
    v0 = jnp.asarray(v0, dtype)
    v_end = jnp.asarray(v_end, dtype)

    # Reachable end-speed band over this distance.
    v_up = jnp.sqrt(jnp.maximum(v0 * v0 + 2.0 * acc * dist, 0.0))
    v_dn = jnp.sqrt(jnp.maximum(v0 * v0 - 2.0 * dec * dist, 0.0))
    ve = jnp.clip(v_end, v_dn, v_up)

    # Peak speed of the accel-then-decel triangle (CalMidSpd closed
    # form), capped by v_max into a cruise phase.
    v_peak_sq = (2.0 * acc * dec * dist + dec * v0 * v0 + acc * ve * ve) / (
        acc + dec
    )
    v_peak = jnp.sqrt(jnp.maximum(v_peak_sq, 0.0))
    v_cruise = jnp.minimum(v_peak, jnp.asarray(v_max, dtype))
    v_cruise = jnp.maximum(v_cruise, jnp.maximum(v0, ve))  # pure ramp cases

    t1 = (v_cruise - v0) / acc                       # accel duration
    t3 = (v_cruise - ve) / dec                       # decel duration
    s1 = (v_cruise * v_cruise - v0 * v0) / (2.0 * acc)
    s3 = (v_cruise * v_cruise - ve * ve) / (2.0 * dec)
    s2 = jnp.maximum(dist - s1 - s3, 0.0)
    t2 = jnp.where(v_cruise > 1e-6, s2 / jnp.maximum(v_cruise, 1e-6), 0.0)
    t_total = t1 + t2 + t3

    t = (jnp.arange(MAX_SLICES, dtype=dtype) + 0.5) * dt
    v_t = jnp.where(
        t < t1,
        v0 + acc * t,
        jnp.where(
            t < t1 + t2,
            v_cruise,
            jnp.maximum(v_cruise - dec * (t - t1 - t2), ve),
        ),
    )
    valid = t < t_total
    return Profile(
        v=jnp.where(valid, v_t, 0.0), valid=valid, v_end=ve,
        t_total=t_total,
    )


def spin_profile(
    angle: Array,
    omega_max: float = 1.0,
    alpha: float = 2.0,
    dt: float = CMD_SLICE,
) -> Profile:
    """In-place turn schedule (Spin, Trajectory.cpp:1666): triangular /
    trapezoidal angular-rate profile through ``angle`` rad; ``v`` holds
    the SIGNED angular rate."""
    dtype = jnp.float32
    a = jnp.abs(jnp.asarray(angle, dtype))
    sgn = jnp.sign(jnp.asarray(angle, dtype))
    w_peak = jnp.minimum(jnp.sqrt(alpha * a), omega_max)
    t1 = w_peak / alpha
    s1 = w_peak * w_peak / (2.0 * alpha)
    t2 = jnp.where(w_peak > 1e-6,
                   jnp.maximum(a - 2.0 * s1, 0.0) / jnp.maximum(w_peak, 1e-6),
                   0.0)
    t_total = 2.0 * t1 + t2
    t = (jnp.arange(MAX_SLICES, dtype=dtype) + 0.5) * dt
    w = jnp.where(
        t < t1,
        alpha * t,
        jnp.where(t < t1 + t2, w_peak,
                  jnp.maximum(w_peak - alpha * (t - t1 - t2), 0.0)),
    )
    valid = t < t_total
    return Profile(
        v=jnp.where(valid, sgn * w, 0.0), valid=valid,
        v_end=jnp.zeros((), dtype), t_total=t_total,
    )


def wheel_velocities(v: Array, omega: Array, wheel_base: float) -> tuple:
    """Differential-drive wheel speeds ``(vL, vR)`` from (v, ω) — the
    CalWheelVel conversion (Trajectory.cpp:349)."""
    half = 0.5 * wheel_base
    return v - half * omega, v + half * omega


class Schedule(NamedTuple):
    v: Array         # [S, MAX_SLICES] per-segment speeds
    valid: Array     # [S, MAX_SLICES]
    seg_ok: Array    # [S] segment is real (not padding)
    headings: Array  # [S] segment headings [rad]


def plan_velocity_schedule(
    path: np.ndarray,
    speed_limits: np.ndarray | None = None,
    v_max: float = MAX_SPD,
    acc: float = MAX_ACC,
    dec: float = MAX_DEC,
    max_segments: int = 32,
) -> Schedule:
    """Whole-path schedule (NewTrajectory, Trajectory.cpp:1110): chain
    trapezoids over the waypoint segments, carrying each achieved end
    speed into the next segment's start, with per-segment limits; end
    speed at corners scales with the turn angle (sharp corner → stop,
    the role of segment blending's speed drop)."""
    path = np.asarray(path, np.float32).reshape(-1, 2)
    n_seg = max(len(path) - 1, 0)
    if speed_limits is None:
        speed_limits = np.full(n_seg, v_max, np.float32)
    d = np.diff(path, axis=0)
    lens = np.linalg.norm(d, axis=1)
    heads = np.arctan2(d[:, 1], d[:, 0])
    # Corner end-speed: full speed through straight joints, zero at
    # U-turns (linear in the turn angle).
    turn = np.abs(
        (np.diff(heads, append=heads[-1:] if n_seg else 0.0) + np.pi)
        % (2 * np.pi) - np.pi
    )
    v_corner = np.clip(1.0 - turn / np.pi, 0.0, 1.0) * np.minimum(
        speed_limits, v_max
    )
    v_corner[-1:] = 0.0                       # stop at the goal

    vs = np.zeros((max_segments, MAX_SLICES), np.float32)
    valids = np.zeros((max_segments, MAX_SLICES), bool)
    seg_ok = np.zeros(max_segments, bool)
    headings = np.zeros(max_segments, np.float32)
    v0 = 0.0
    for i in range(min(n_seg, max_segments)):
        vm = float(min(speed_limits[i], v_max))
        p = trapezoid_profile(lens[i], v0, float(v_corner[i]), vm, acc, dec)
        vs[i] = np.asarray(p.v)
        valids[i] = np.asarray(p.valid)
        seg_ok[i] = True
        headings[i] = heads[i]
        v0 = float(p.v_end)
    return Schedule(
        v=jnp.asarray(vs), valid=jnp.asarray(valids),
        seg_ok=jnp.asarray(seg_ok), headings=jnp.asarray(headings),
    )
