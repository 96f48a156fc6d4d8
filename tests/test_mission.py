"""Mission layer: corner blending, wheel schedules, mission scripts,
system monitor, and the scripted-mission-over-portal round trip
(reference: src/Main-Ctrl/Task/Task.cpp, Trajectory.cpp NewSegmentBlend,
C_C.cpp ThreadSystemMonitor, NetPortal.cpp)."""

import socket

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.app.mission import (
    LegAction, Mission, MissionRunner, MissionStatus,
)
from laser_slam_tpu.app.monitor import (
    SYS_ERR_CTRL_BATTERY_LOW, SYS_LOST_CNC_SICK_A, SYS_OK, SystemMonitor,
)
from laser_slam_tpu.app.portal import NetPortal
from laser_slam_tpu.app.task import TaskEngine
from laser_slam_tpu.nav.trajectory import (
    blend_corner, blend_path, wheel_schedule_along,
)

from tests.test_app import MODEL, _free_grid, _open_scan


# -- corner blending (NewSegmentBlend role) ------------------------------

def test_blend_corner_cuts_a_right_angle_smoothly():
    p0, p1, p2 = [0.0, 0.0], [2.0, 0.0], [2.0, 2.0]
    out = blend_corner(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
                       n_slices=200)
    assert bool(out.ok)
    xy = np.asarray(out.xy)
    # Starts at p0, ends at p2.
    assert np.linalg.norm(xy[0] - p0) < 1e-5
    assert np.linalg.norm(xy[-1] - np.asarray(p2)) < 1e-4
    # The blend CUTS the corner: it never reaches p1 exactly, but comes
    # reasonably close.
    d_corner = np.linalg.norm(xy - np.asarray(p1), axis=1).min()
    assert 0.05 < d_corner < 1.0
    # Smooth: max heading change between consecutive slices stays far
    # below the 90° corner (the whole point of blending).
    seg = np.diff(xy, axis=0)
    head = np.unwrap(np.arctan2(seg[:, 1], seg[:, 0]))
    assert np.abs(np.diff(head)).max() < 0.3


def test_blend_corner_flags_degenerate_uturn():
    out = blend_corner(
        jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 0.0]),
        jnp.asarray([0.0, 0.01]), n_slices=50,
    )
    assert not bool(out.ok)


def test_blend_path_densifies_and_keeps_endpoints():
    path = np.array([[0, 0], [2, 0], [2, 2], [4, 2]], np.float32)
    smooth = blend_path(path, n_slices=40)
    assert len(smooth) > len(path)
    assert np.linalg.norm(smooth[0] - path[0]) < 1e-5
    assert np.linalg.norm(smooth[-1] - path[-1]) < 1e-5


def test_wheel_schedule_along_blended_path():
    path = np.array([[0, 0], [2, 0], [2, 2]], np.float32)
    smooth = blend_path(path)
    sched = wheel_schedule_along(smooth, v_max=0.7, wheel_base=0.5)
    vl, vr, valid = (np.asarray(sched.v_l), np.asarray(sched.v_r),
                     np.asarray(sched.valid))
    assert valid.any()
    # Within limits, and the curve drives the wheels differentially.
    assert np.nanmax(np.abs(vl)) < 2.0 and np.nanmax(np.abs(vr)) < 2.0
    assert np.abs(vl[valid] - vr[valid]).max() > 0.01


# -- mission scripts ------------------------------------------------------

def test_mission_parses_rows_and_config_tags():
    m = Mission.from_rows([(1.0, 2.0), (3.0, 4.0, 0.4, "spin", 1.57, 2)])
    assert len(m.legs) == 2
    assert m.legs[0].action is LegAction.NONE
    assert m.legs[1].speed == 0.4
    assert m.legs[1].action is LegAction.SPIN
    assert m.legs[1].retries == 2

    m2 = Mission.from_config_tags(
        {"Leg1": "1 2 0.5", "Leg2": "3 4 0.3 pause 2.0 0"}
    )
    assert len(m2.legs) == 2 and m2.legs[1].action is LegAction.PAUSE


def _simulate(runner, pose, scan, max_ticks=3000, dt=0.1):
    """Unicycle integration of the runner's commands."""
    for _ in range(max_ticks):
        cmd = runner.tick(pose, scan)
        if runner.status in (MissionStatus.DONE, MissionStatus.FAILED):
            return pose
        v, om = float(cmd.v), float(cmd.omega)
        pose[0] += dt * v * np.cos(pose[2])
        pose[1] += dt * v * np.sin(pose[2])
        pose[2] = (pose[2] + dt * om + np.pi) % (2 * np.pi) - np.pi
    return pose


def test_mission_runner_runs_multi_leg_with_spin_action():
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.35, robot_radius=0.2)
    reached = []
    mission = Mission.from_rows(
        [(6.0, 2.0, 0.6, "spin", 1.57), (6.0, 6.0, 0.4)]
    )
    runner = MissionRunner(eng, mission, on_reached=lambda i, g: reached.append(i))
    runner.start()
    pose = np.array([2.0, 2.0, 0.0], np.float32)
    pose = _simulate(runner, pose, _open_scan())
    assert runner.status is MissionStatus.DONE
    assert reached == [0, 1]
    assert np.linalg.norm(pose[:2] - [6.0, 6.0]) < 0.6


def test_mission_runner_retries_then_fails():
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.3, robot_radius=0.2)
    # Goal outside the walled grid: planning fails every time.
    mission = Mission.from_rows([(50.0, 50.0, 0.5, "none", 0.0, 2)])
    runner = MissionRunner(eng, mission)
    runner.start()
    pose = np.array([2.0, 2.0, 0.0], np.float32)
    scan = _open_scan()
    for _ in range(10):
        runner.tick(pose, scan)
        if runner.status is MissionStatus.FAILED:
            break
    assert runner.status is MissionStatus.FAILED


# -- system monitor -------------------------------------------------------

def test_system_monitor_battery_and_link_codes():
    t = [0.0]
    fired = []
    mon = SystemMonitor(
        ctrl_battery_safe_volt=22.0, link_timeout=1.0,
        on_error=fired.append, clock=lambda: t[0],
    )
    assert mon.poll() == SYS_OK
    mon.report_battery(24.0, 24.0)
    assert mon.poll() == SYS_OK

    mon.link_alive("sick_a")
    t[0] = 2.5                      # link goes silent past the timeout
    assert mon.poll() == SYS_LOST_CNC_SICK_A
    mon.clear()
    mon.link_alive("sick_a")

    mon.report_battery(20.0, 24.0)  # ctrl battery sags
    assert mon.poll() == SYS_ERR_CTRL_BATTERY_LOW
    assert mon.poll() == SYS_ERR_CTRL_BATTERY_LOW  # latched
    assert fired == [SYS_LOST_CNC_SICK_A, SYS_ERR_CTRL_BATTERY_LOW]


# -- scripted mission through the portal ---------------------------------

def test_scripted_mission_via_portal_end_to_end():
    """The VERDICT r4 #6 end-to-end: a multi-leg mission (plan → turn →
    track → spin action → next leg → stop) scripted over the portal's
    MISSION command, with REACHED milestone events pushed back and
    ERR/MAP served — the reference's console workflow
    (NEW_TASK_PATH + ROB_REACH_MIL + GRID_MAP_IN)."""
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.35, robot_radius=0.2)
    mon = SystemMonitor()
    runner_box = {}

    portal = NetPortal(
        on_mission=lambda rows: runner_box.update(
            runner=MissionRunner(
                eng, Mission.from_rows(rows),
                on_reached=lambda i, g: portal.broadcast(
                    f"REACHED {i} {g[0]:.2f} {g[1]:.2f}"
                ),
            )
        ),
        get_error=lambda: (mon.error, "ok"),
        get_map=lambda: (4, 2, 0.1, bytes(range(8))),
    )
    portal.start()
    try:
        c = socket.create_connection(("127.0.0.1", portal.port), timeout=2)
        f = c.makefile("rw", encoding="utf-8", newline="\n")
        f.write("MISSION 6 2 0.6 spin 1.57 ; 6 6 0.4\n")
        f.flush()
        assert f.readline().strip() == "OK"
        assert "runner" in runner_box
        runner = runner_box["runner"]
        runner.start()

        pose = np.array([2.0, 2.0, 0.0], np.float32)
        pose = _simulate(runner, pose, _open_scan())
        assert runner.status is MissionStatus.DONE

        # The milestone events arrived at the console.
        f2 = c.makefile("r", encoding="utf-8", newline="\n")
        c.settimeout(2)
        events = [f.readline().strip(), f.readline().strip()]
        assert events[0].startswith("EVENT REACHED 0")
        assert events[1].startswith("EVENT REACHED 1")

        f.write("ERR\n"); f.flush()
        assert f.readline().strip() == "ERR 0 ok"
        f.write("MAP\n"); f.flush()
        parts = f.readline().strip().split()
        assert parts[0] == "MAP" and parts[1] == "4" and parts[2] == "2"
        import base64
        import zlib

        assert zlib.decompress(base64.b64decode(parts[4])) == bytes(range(8))
    finally:
        portal.stop()
