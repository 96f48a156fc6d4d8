"""Trajectory tracking and obstacle-aware speed control.

The reference robot layer (src/Main-Ctrl/) couples a trajectory tracker
(Trajectory.cpp, 1687 LoC of waypoint chasing) with an "intelligent
obstacle avoidance" module (IOA.cpp) that partitions the space in front
of the robot into 5 security zones with per-zone speed caps
(MainCtrl_Define.h:26-39). Here both are small pure functions over the
live scan + path, jittable and composable with the SLAM loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import se2
from ..core.scan import LaserModel, Scan

Array = jnp.ndarray

# Security zones: (range [m], max speed [m/s]) — nearest zone wins.
# Mirrors the reference's 5-zone ladder (MainCtrl_Define.h:26-39).
ZONES = ((0.3, 0.0), (0.6, 0.1), (1.0, 0.25), (1.5, 0.5), (2.5, 0.8))
FREE_SPEED = 1.0
ZONE_HALF_ANGLE = 1.0  # [rad] cone in front of the robot considered


class ControlCommand(NamedTuple):
    v: Array       # [] forward speed [m/s]
    omega: Array   # [] angular rate [rad/s]
    zone: Array    # [] int32 active security zone (-1 = free)


def security_speed_cap(model: LaserModel, scan: Scan) -> tuple[Array, Array]:
    """Max safe forward speed from the live scan (IOA semantics):
    the nearest valid return inside the frontal cone picks the zone."""
    fi = model.bearings(scan.ranges.dtype)
    frontal = jnp.abs(fi) < ZONE_HALF_ANGLE
    ok = frontal & ~scan.bad & (scan.ranges > model.min_range)
    nearest = jnp.min(jnp.where(ok, scan.ranges, jnp.inf))

    speed = jnp.asarray(FREE_SPEED, scan.ranges.dtype)
    zone = jnp.asarray(-1, jnp.int32)
    for k in reversed(range(len(ZONES))):
        rng, cap = ZONES[k]
        hit = nearest < rng
        speed = jnp.where(hit, cap, speed)
        zone = jnp.where(hit, k, zone)
    return speed, zone


def pure_pursuit(
    pose: Array,
    path: Array,
    n_valid: Array,
    lookahead: float = 0.6,
    v_des: float = 0.8,
    k_omega: float = 2.0,
) -> tuple[Array, Array]:
    """Pure-pursuit waypoint chase: steer at the first path point at
    least ``lookahead`` ahead of the closest point (Trajectory.cpp's
    carrot-following, reduced to its control law)."""
    n = path.shape[0]
    idx = jnp.arange(n)
    live = idx < n_valid
    d = jnp.linalg.norm(path - pose[None, :2], axis=-1)
    d = jnp.where(live, d, jnp.inf)
    nearest = jnp.argmin(d)
    ahead = (idx >= nearest) & live & (d >= lookahead)
    target_idx = jnp.where(jnp.any(ahead), jnp.argmax(ahead), n_valid - 1)
    target = path[jnp.clip(target_idx, 0, n - 1)]

    local = se2.transform_points(se2.inverse(pose), target[None, :])[0]
    angle = jnp.arctan2(local[1], local[0])
    v = v_des * jnp.cos(jnp.clip(angle, -jnp.pi / 2, jnp.pi / 2))
    omega = k_omega * angle
    return jnp.maximum(v, 0.0), omega


def track_step(
    model: LaserModel,
    scan: Scan,
    pose: Array,
    path: Array,
    n_valid: Array,
    v_des: float = 0.8,
) -> ControlCommand:
    """One control tick: pure pursuit capped by the security zones —
    the composition the reference's C_C main loop performs."""
    v, omega = pure_pursuit(pose, path, n_valid, v_des=v_des)
    cap, zone = security_speed_cap(model, scan)
    return ControlCommand(v=jnp.minimum(v, cap), omega=omega, zone=zone)
