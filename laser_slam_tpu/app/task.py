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
    TRACKING = "tracking"
    BLOCKED = "blocked"
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

    def __post_init__(self):
        self.state = TaskState.IDLE
        self._goals: deque[np.ndarray] = deque()
        self._path: np.ndarray | None = None
        self._n_valid = 0
        self._blocked = 0
        self._replans = 0
        self._plan_fn = jax.jit(
            lambda g, s, d: plan_path(g, s, d, robot_radius=self.robot_radius)
        )
        self._track_fn = jax.jit(
            lambda s, p, path, nv: track_step(
                self.model, s, p, path, nv, v_des=self.v_des
            )
        )

    # -- mission API ------------------------------------------------------

    def add_goal(self, xy) -> None:
        self._goals.append(np.asarray(xy, np.float32))
        if self.state in (TaskState.IDLE, TaskState.DONE):
            self.state = TaskState.PLANNING

    def cancel(self) -> None:
        self._goals.clear()
        self._path = None
        self.state = TaskState.IDLE

    def update_grid(self, grid: OccupancyGrid) -> None:
        """Swap in a fresher map (the SLAM global map)."""
        self.grid = grid
        self._plan_fn = jax.jit(
            lambda g, s, d: plan_path(g, s, d, robot_radius=self.robot_radius)
        )

    # -- control tick -----------------------------------------------------

    def step(self, pose, scan: Scan) -> ControlCommand:
        """One control tick; returns the motor command (v=0 when idle)."""
        pose = np.asarray(pose, np.float32)
        stop = ControlCommand(
            v=jnp.zeros(()), omega=jnp.zeros(()), zone=jnp.asarray(-1, jnp.int32)
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
            self._blocked = 0
            self.state = TaskState.TRACKING

        if self.state != TaskState.TRACKING:
            return stop

        goal = self._goals[0]
        if np.linalg.norm(pose[:2] - goal) < self.goal_tolerance:
            self._goals.popleft()
            self._path = None
            if self._goals:
                self.state = TaskState.PLANNING
                return self.step(pose, scan)  # plan the next leg this tick
            self.state = TaskState.DONE
            return stop

        cmd = self._track_fn(
            scan, jnp.asarray(pose), jnp.asarray(self._path),
            jnp.asarray(self._n_valid, jnp.int32),
        )
        # Innermost security zone -> stopped by the speed cap; count and
        # replan around the obstruction (IOA escalation semantics).
        if int(cmd.zone) == 0:
            self._blocked += 1
            if self._blocked >= self.blocked_ticks_replan:
                self._replans += 1
                if self._replans > self.max_replans:
                    self.state = TaskState.FAILED
                else:
                    self.state = TaskState.PLANNING
                return stop
        else:
            self._blocked = 0
        return cmd
