"""Robot composition root: config + SLAM + tasks + portal + logging.

The role of the reference's ``C_C`` (src/Main-Ctrl/C_C.{h,cpp}): parse
the config, bring up the SLAM facade, the task engine, the remote
portal, and the logger, and pump sensor data between them. The
reference wires pthreads and serial ports; here the composition is a
plain object the host application ticks — sensors push in, motor
commands come out of :meth:`control_tick`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.scan import LaserModel
from ..mapping.occupancy import OccupancyGrid
from ..nav.controller import ControlCommand
from ..nav.local_map import LocalMapService
from ..ops.preprocess import preprocess
from ..runtime.facade import SlamCallbacks, SlamV1
from .config import RobotConfig, load_config
from .logfile import LOG_IOA, LOG_NET, LOG_SLAM, LOG_TASK, LogFile
from .portal import NetPortal
from .task import TaskEngine, TaskState


@dataclasses.dataclass
class RobotController:
    """``C_C`` analog: one object owning the full robot stack."""

    model: LaserModel
    config: RobotConfig = dataclasses.field(default_factory=RobotConfig)
    work_mode: str = "mapping"
    localization_grid: OccupancyGrid | None = None
    enable_portal: bool = False

    @classmethod
    def from_config_file(cls, model: LaserModel, path: str, **kw) -> "RobotController":
        return cls(model, config=load_config(path), **kw)

    def __post_init__(self):
        self.log = LogFile(self.config.log_file)
        self.slam = SlamV1(
            self.model,
            callbacks=SlamCallbacks(
                on_error=lambda c: self.log.log(LOG_SLAM, f"error code {c}"),
            ),
            work_mode=self.work_mode,
            localization_grid=self.localization_grid,
        )
        self.slam.start()
        self.tasks: TaskEngine | None = None
        if self.localization_grid is not None:
            self.tasks = TaskEngine(self.model, self.localization_grid)
        self.portal: NetPortal | None = None
        if self.enable_portal:
            self.portal = NetPortal(
                host=self.config.control.ip or "127.0.0.1",
                port=self.config.control.port,
                on_goto=self._goto,
                on_cancel=lambda: self.tasks and self.tasks.cancel(),
                get_pose=lambda: tuple(float(v) for v in self.slam.pose),
                get_state=lambda: (
                    self.tasks.state.value if self.tasks else "no-tasks"
                ),
                on_path=lambda pts: self.tasks and self.tasks.add_path(pts),
                on_repath=lambda pts: (
                    self.tasks and self.tasks.replace_path(pts)
                ),
                on_slow_stop=lambda: self.tasks and self.tasks.slow_stop(),
                # A silent console stops the robot (HEART_BIT supervision).
                on_heartbeat_lost=lambda: (
                    self.tasks and self.tasks.slow_stop()
                ),
            )
            self.portal.start()
            self.log.log(LOG_NET, f"portal listening on {self.portal.port}")
        # ambient map around the robot (MapService/AmbientGridMap role)
        self.local_map = LocalMapService(self.model)
        self._last_scan = None

    # -- sensor pumps ------------------------------------------------------

    def on_scan_main(self, ranges) -> np.ndarray | None:
        self._last_scan = np.asarray(ranges, np.float32)
        pose = self.slam.feed_scan_main(self._last_scan)
        if pose is not None:
            import jax
            import jax.numpy as jnp

            # Reuse the scan the SLAM pipeline already preprocessed on
            # device rather than filtering + uploading a second time.
            scan = self.slam.last_scan
            if scan is None:
                scan = jax.tree.map(
                    lambda a: a[0],
                    preprocess(
                        jnp.asarray(self._last_scan)[None, :], self.model
                    ),
                )
            self.local_map.stream_in(scan, np.asarray(pose, np.float32))
        return pose

    def on_scan_minor(self, ranges) -> None:
        self.slam.feed_scan_minor(ranges)

    def on_odometry(self, x: float, y: float, theta: float) -> None:
        self.slam.feed_odometry(x, y, theta)

    def on_beacon(self, x: float, y: float, theta: float = 0.0) -> None:
        self.slam.feed_beacon(x, y, theta)

    # -- mission / control ---------------------------------------------------

    def _goto(self, x: float, y: float) -> None:
        if self.tasks is None:
            self.log.log(LOG_TASK, "goto rejected: no task engine (no grid)")
            return
        self.tasks.add_goal((x, y))
        self.log.log(LOG_TASK, f"goal queued ({x:.2f}, {y:.2f})")

    def control_tick(self) -> ControlCommand | None:
        """Compute the current motor command from pose + latest scan."""
        if self.tasks is None or self._last_scan is None:
            return None
        import jax
        import jax.numpy as jnp

        scan = jax.tree.map(
            lambda a: a[0],
            preprocess(jnp.asarray(self._last_scan)[None, :], self.model),
        )
        cmd = self.tasks.step(self.slam.pose, scan)
        if self.tasks.state in (TaskState.BLOCKED, TaskState.FAILED):
            self.log.log(LOG_IOA, f"task state {self.tasks.state.value}")
        return cmd

    def shutdown(self) -> None:
        if self.portal is not None:
            self.portal.stop()
        self.slam.stop()
        self.log.close()
