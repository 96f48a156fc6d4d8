"""Waypoint task engine: goal queue + plan + track + replan-on-block.

The role of the reference's task/trajectory layer (src/Main-Ctrl/Task/
Task.cpp, Trajectory/Trajectory.cpp ~3.8 k LoC of hand-rolled state
handling): accept goals, plan a grid path, track it with pure pursuit
under the obstacle-avoidance speed caps, replan when blocked, report
completion. The per-tick compute (plan + control) is jitted device
code; only the small state machine lives on the host.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scan import LaserModel, Scan
from ..mapping.occupancy import OccupancyGrid
from ..nav.controller import ControlCommand, track_step
from ..nav.planner import plan_path


class TaskState(enum.Enum):
    IDLE = "idle"
    PLANNING = "planning"
    TURNING = "turning"     # in-place face-to-milestone before tracking
    TRACKING = "tracking"
    DODGING = "dodging"     # following a local milestone dodge path
    BLOCKED = "blocked"
    STOPPING = "stopping"   # slow-stop ramp (SLOW_BREAK)
    DONE = "done"
    FAILED = "failed"


@dataclasses.dataclass
class TaskEngine:
    """Host-side mission state machine over jitted plan/track kernels."""

    model: LaserModel
    grid: OccupancyGrid
    robot_radius: float = 0.3
    goal_tolerance: float = 0.25          # [m]
    v_des: float = 0.8                    # [m/s]
    blocked_ticks_replan: int = 5         # zone-0 ticks before replanning
    max_replans: int = 3
    face_tolerance: float = 0.6           # [rad] turn in place beyond this
    turn_rate: float = 0.8                # [rad/s] in-place turn
    stop_decel_ticks: int = 10            # slow-stop ramp length
    use_local_dodge: bool = True          # milestone dodge before replan

    def __post_init__(self):
        self.state = TaskState.IDLE
        # Guards mission state against portal/watchdog threads: the
        # portal's on_repath/on_slow_stop/on_cancel handlers (and the
        # heartbeat watchdog) mutate _goals/_path concurrently with the
        # control thread's step(); an unsynchronized clear landing
        # between step()'s state check and its _goals[0] read raises
        # IndexError and kills the control loop. Reentrant because
        # replace_path → add_path → add_goal all take it.
        self._lock = threading.RLock()
        self._goals: deque[np.ndarray] = deque()
        self._speed_limits: deque[float] = deque()  # per-leg caps
        self._path: np.ndarray | None = None
        self._n_valid = 0
        self._blocked = 0
        self._replans = 0
        self._stop_tick = 0
        self._leg_v = self.v_des
        self._plan_fn = jax.jit(
            lambda g, s, d: plan_path(g, s, d, robot_radius=self.robot_radius)
        )
        self._track_fn = jax.jit(
            lambda s, p, path, nv: track_step(
                self.model, s, p, path, nv, v_des=self.v_des
            )
        )
        from ..nav.local_planner import dodge_path

        self._dodge_fn = jax.jit(lambda s: dodge_path(self.model, s))

    # -- mission API ------------------------------------------------------

    def add_goal(self, xy, speed_limit: float | None = None) -> None:
        with self._lock:
            self._add_goal_locked(xy, speed_limit)

    def _add_goal_locked(self, xy, speed_limit: float | None = None) -> None:
        self._goals.append(np.asarray(xy, np.float32))
        self._speed_limits.append(
            self.v_des if speed_limit is None else float(speed_limit)
        )
        if self.state in (TaskState.IDLE, TaskState.DONE):
            self.state = TaskState.PLANNING

    def add_path(self, points, speed_limits=None) -> None:
        """Queue a multi-waypoint task path with optional per-leg speed
        caps — the NEW_TASK_PATH command (Task.cpp:509-548: waypoint
        list + per-point MAX_SPD limits)."""
        points = np.asarray(points, np.float32).reshape(-1, 2)
        if speed_limits is None:
            speed_limits = [None] * len(points)
        for p, s in zip(points, speed_limits):
            self.add_goal(p, s)

    def replace_path(self, points, speed_limits=None) -> None:
        """Replace the current mission with a new path mid-run — the
        RE_TASK_PATH command (Task.cpp:561-588: freeze, clear, reload)."""
        with self._lock:
            self._goals.clear()
            self._speed_limits.clear()
            self._path = None
            self.state = TaskState.IDLE
            self.add_path(points, speed_limits)

    def slow_stop(self) -> None:
        """Decelerate to a stop over ``stop_decel_ticks`` and clear the
        mission — the SLOW_BREAK / Stop-Robot-Slowly command
        (Task.cpp:550-555, MainCtrl_Define.h:86)."""
        with self._lock:
            self._goals.clear()
            self._speed_limits.clear()
            self._path = None
            self._stop_tick = self.stop_decel_ticks
            self.state = TaskState.STOPPING

    def cancel(self) -> None:
        with self._lock:
            self._goals.clear()
            self._speed_limits.clear()
            self._path = None
            self.state = TaskState.IDLE

    def velocity_schedule(self):
        """Feed-forward wheel-speed schedule for the current planned
        path (the reference's command mode: Trajectory.cpp generates
        CMD_SLICE wheel velocities per segment and streams them to the
        motor link, Task.cpp Drive → NewSegmentRectilinear). Returns a
        :class:`..nav.trajectory.Schedule` or None when no path is
        planned. Live control uses :meth:`step` (pure pursuit + zones);
        this is the open-loop profile for lower-level controllers."""
        from ..nav.trajectory import plan_velocity_schedule

        with self._lock:
            if self._path is None:
                return None
            pts = self._path[: self._n_valid]
            leg_v = self._leg_v
        return plan_velocity_schedule(pts, v_max=leg_v)

    def update_grid(self, grid: OccupancyGrid) -> None:
        """Swap in a fresher map (the SLAM global map)."""
        self.grid = grid
        self._plan_fn = jax.jit(
            lambda g, s, d: plan_path(g, s, d, robot_radius=self.robot_radius)
        )

    # -- control tick -----------------------------------------------------

    def step(self, pose, scan: Scan) -> ControlCommand:
        """One control tick; returns the motor command (v=0 when idle).
        Holds the mission lock for the whole tick so portal commands
        apply atomically between ticks, never inside one."""
        with self._lock:
            return self._step_locked(pose, scan)

    def _step_locked(self, pose, scan: Scan) -> ControlCommand:
        pose = np.asarray(pose, np.float32)
        stop = ControlCommand(
            v=jnp.zeros(()), omega=jnp.zeros(()), zone=jnp.asarray(-1, jnp.int32)
        )

        if self.state == TaskState.STOPPING:
            # Linear deceleration ramp (Stop-Robot-Slowly semantics).
            self._stop_tick -= 1
            if self._stop_tick <= 0:
                # Goals queued DURING the ramp start their mission once
                # the ramp completes (ADVICE r4: they were stranded —
                # add_goal only flips IDLE/DONE states).
                self.state = (
                    TaskState.PLANNING if self._goals else TaskState.IDLE
                )
                return stop
            frac = self._stop_tick / self.stop_decel_ticks
            return ControlCommand(
                v=jnp.asarray(self._leg_v * frac),
                omega=jnp.zeros(()),
                zone=jnp.asarray(-1, jnp.int32),
            )

        if self.state == TaskState.PLANNING:
            if not self._goals:
                self.state = TaskState.IDLE
                return stop
            goal = self._goals[0]
            res = self._plan_fn(
                self.grid, jnp.asarray(pose[:2]), jnp.asarray(goal)
            )
            if not bool(res.reached):
                self.state = TaskState.FAILED
                return stop
            self._path = np.asarray(res.path)
            self._n_valid = int(res.n_valid)
            self._leg_v = self._speed_limits[0] if self._speed_limits else (
                self.v_des
            )
            self._blocked = 0
            # Face the first leg before driving: the reference turns in
            # place toward the milestone when the heading is far off
            # (FaceToMilestone, Task.cpp:543, 580).
            tgt = self._path[min(2, self._n_valid - 1)]
            err = self._heading_error(pose, tgt)
            self.state = (
                TaskState.TURNING if abs(err) > self.face_tolerance
                else TaskState.TRACKING
            )

        if self.state == TaskState.TURNING:
            tgt = self._path[min(2, self._n_valid - 1)]
            err = self._heading_error(pose, tgt)
            if abs(err) > 0.15:
                return ControlCommand(
                    v=jnp.zeros(()),
                    omega=jnp.asarray(np.sign(err) * self.turn_rate),
                    zone=jnp.asarray(-1, jnp.int32),
                )
            self.state = TaskState.TRACKING

        if self.state not in (TaskState.TRACKING, TaskState.DODGING):
            return stop

        goal = self._goals[0]
        if np.linalg.norm(pose[:2] - goal) < self.goal_tolerance:
            self._goals.popleft()
            if self._speed_limits:
                self._speed_limits.popleft()
            self._path = None
            if self._goals:
                self.state = TaskState.PLANNING
                return self.step(pose, scan)  # plan the next leg this tick
            self.state = TaskState.DONE
            return stop

        if self.state == TaskState.DODGING:
            # Dodge leg complete when its last waypoint is reached; then
            # return to the original path via a fresh plan (the
            # reference's Back2OriPath, PathPlanning.cpp:246-290).
            end = self._path[self._n_valid - 1]
            if np.linalg.norm(pose[:2] - end) < self.goal_tolerance:
                self.state = TaskState.PLANNING
                return self.step(pose, scan)

        cmd = self._track_fn(
            scan, jnp.asarray(pose), jnp.asarray(self._path),
            jnp.asarray(self._n_valid, jnp.int32),
        )
        cmd = cmd._replace(v=jnp.minimum(cmd.v, self._leg_v))
        # Innermost security zone -> stopped by the speed cap; count and
        # escalate around the obstruction (IOA escalation semantics):
        # first a local milestone dodge (DodgePath), then a full replan.
        if int(cmd.zone) == 0:
            self._blocked += 1
            if self._blocked >= self.blocked_ticks_replan:
                self._replans += 1
                if self._replans > self.max_replans:
                    self.state = TaskState.FAILED
                elif self.use_local_dodge and self.state == TaskState.TRACKING:
                    if not self._try_dodge(pose, scan):
                        self.state = TaskState.PLANNING
                else:
                    self.state = TaskState.PLANNING
                self._blocked = 0
                return stop
        else:
            self._blocked = 0
        return cmd

    def _heading_error(self, pose, tgt_xy) -> float:
        des = float(np.arctan2(tgt_xy[1] - pose[1], tgt_xy[0] - pose[0]))
        return float(
            (des - pose[2] + np.pi) % (2.0 * np.pi) - np.pi
        )

    def _try_dodge(self, pose, scan: Scan) -> bool:
        """Local milestone dodge from the live scan (seed-grow +
        milestone selection, nav/local_planner.py). Returns True when a
        dodge path was adopted."""
        ms = self._dodge_fn(scan)
        if not bool(ms.ok):
            return False
        # Robot-frame waypoints → world frame.
        c, s = np.cos(pose[2]), np.sin(pose[2])
        local = np.asarray(ms.path_xy)
        # local x = forward, y = left.
        world = np.stack(
            [
                pose[0] + c * local[:, 0] - s * local[:, 1],
                pose[1] + s * local[:, 0] + c * local[:, 1],
            ],
            axis=-1,
        ).astype(np.float32)
        self._path = world
        self._n_valid = world.shape[0]
        self.state = TaskState.DODGING
        return True
