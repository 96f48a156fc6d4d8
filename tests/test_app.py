"""Robot application layer: config parsing, beacon trilateration, task
engine, portal round-trip (reference: src/Main-Ctrl/)."""

import socket

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.app import (
    NetPortal,
    TaskEngine,
    TaskState,
    load_config,
    parse_tags,
    trilaterate,
)
from laser_slam_tpu.app.config import config_from_tags
from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.mapping.occupancy import GridSpec2D, OccupancyGrid
from laser_slam_tpu.ops.preprocess import preprocess

MODEL = LMS211


def test_config_parses_reference_style_xml(tmp_path):
    # Includes the reference Conf.xml's malformed closing tags on purpose.
    text = """<Params>
<IPA>192.168.0.161</IPA>
<PortA>8878</PortA>
<LaserBIP>192.168.1.6</LaserAIP>
<LaserBPort>8976</LaserAPort>
<LogFile>./robot.txt</LogFile>
<RobotID>18</RobotID>
<MainSICKWeight>0.5</MainSICKWeight>
<OriX>870</OriX>
<RunMode>3</RunMode>
<Robot_Len>0.8</Robot_Len>
"""
    p = tmp_path / "Conf.xml"
    p.write_text(text)
    cfg = load_config(str(p))
    assert cfg.slam_a.ip == "192.168.0.161" and cfg.slam_a.port == 8878
    assert cfg.laser_b.ip == "192.168.1.6" and cfg.laser_b.port == 8976
    assert cfg.robot_id == 18
    assert cfg.run_mode == 3
    assert abs(cfg.origin_x - 8.70) < 1e-6  # cm -> m
    assert cfg.raw["Robot_Len"] == "0.8"
    assert parse_tags("<A>1</A><A>2</A>")["A"] == "2"  # last wins


def test_trilateration_recovers_position():
    beacons = jnp.asarray(
        [[0.0, 0.0], [10.0, 0.0], [0.0, 8.0], [10.0, 8.0]], jnp.float32
    )
    truth = jnp.asarray([3.0, 2.0], jnp.float32)
    rng = np.random.default_rng(0)
    ranges = jnp.linalg.norm(beacons - truth[None, :], axis=-1)
    ranges = ranges + jnp.asarray(rng.normal(0, 0.01, 4), jnp.float32)
    fix = jax.jit(trilaterate)(beacons, ranges, jnp.ones(4, bool))
    assert not bool(fix.fail)
    assert float(jnp.linalg.norm(fix.xy - truth)) < 0.05
    assert float(fix.err) < 0.05

    # Two beacons only -> fail flag.
    fix2 = trilaterate(beacons, ranges, jnp.asarray([True, True, False, False]))
    assert bool(fix2.fail)


def _free_grid(size=120, res=0.1):
    spec = GridSpec2D(
        resolution=res, width=size, height=size,
        origin_x=0.0, origin_y=0.0,
    )
    lo = -np.ones((size, size), np.float32)  # all free
    lo[0, :] = 5.0; lo[-1, :] = 5.0; lo[:, 0] = 5.0; lo[:, -1] = 5.0
    return OccupancyGrid(spec=spec, log_odds=jnp.asarray(lo))


def _open_scan():
    r = np.full(181, 10.0, np.float32)
    return jax.tree.map(
        lambda a: a[0], preprocess(jnp.asarray(r)[None, :], MODEL)
    )


def test_task_engine_plans_tracks_and_completes():
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.3, robot_radius=0.2)
    assert eng.state is TaskState.IDLE
    eng.add_goal((8.0, 8.0))
    assert eng.state is TaskState.PLANNING

    scan = _open_scan()
    pose = np.array([2.0, 2.0, 0.0], np.float32)
    cmd = eng.step(pose, scan)
    # The goal is 45° off the heading: face-to-milestone turns in place
    # first (Task.cpp:543 FaceToMilestone), then tracking engages.
    assert eng.state is TaskState.TURNING
    assert float(cmd.v) == 0.0 and float(cmd.omega) != 0.0
    for _ in range(40):
        pose[2] += 0.05 * float(cmd.omega) / abs(float(cmd.omega))
        cmd = eng.step(pose, scan)
        if eng.state is TaskState.TRACKING:
            break
    assert eng.state is TaskState.TRACKING
    assert float(cmd.v) > 0.0  # moving toward the goal

    # Teleport to the goal: engine must report DONE and stop.
    cmd = eng.step(np.array([8.0, 8.0, 0.0], np.float32), scan)
    assert eng.state is TaskState.DONE
    assert float(cmd.v) == 0.0


def test_portal_command_roundtrip():
    goals, cancels = [], []
    portal = NetPortal(
        on_goto=lambda x, y: goals.append((x, y)),
        on_cancel=lambda: cancels.append(1),
        get_pose=lambda: (1.0, 2.0, 0.5),
        get_state=lambda: "tracking",
    )
    portal.start()
    try:
        with socket.create_connection(("127.0.0.1", portal.port), timeout=5) as c:
            f = c.makefile("rw", encoding="utf-8", newline="\n")
            for cmd, expect in [
                ("PING", "PONG"),
                ("GOTO 3.5 -1.25", "OK"),
                ("POSE", "POSE 1.0000 2.0000 0.5000"),
                ("STATE", "STATE tracking"),
                ("CANCEL", "OK"),
                ("BOGUS", "ERR unknown"),
            ]:
                f.write(cmd + "\n"); f.flush()
                assert f.readline().strip() == expect
    finally:
        portal.stop()
    assert goals == [(3.5, -1.25)]
    assert cancels == [1]


def test_robot_controller_smoke(tmp_path):
    from laser_slam_tpu.app import RobotController
    from laser_slam_tpu.app.config import RobotConfig
    from tests.test_features import _room_ranges

    cfg = RobotConfig(log_file=str(tmp_path / "robot.log"))
    bot = RobotController(MODEL, config=cfg, work_mode="mapping")
    try:
        for i in range(3):
            bot.on_odometry(0.1 * i, 0.0, 0.0)
            pose = bot.on_scan_main(_room_ranges((0.1 * i, 0.0, 0.0), seed=i))
            assert pose is not None
        assert bot.control_tick() is None  # no task engine without a grid
    finally:
        bot.shutdown()
    assert (tmp_path / "robot.log").exists()


def test_motor_link_frames_and_replies():
    from laser_slam_tpu.app.serial_ctrl import (
        CMD_DRIVE,
        LoopbackTransport,
        MotorLink,
        decode_frames,
        encode_frame,
    )

    # Codec: garbage + split frames resync correctly.
    f = encode_frame(CMD_DRIVE, b"\x01\x02")
    buf = bytearray(b"\xff\x00" + f + f[:3])
    frames = decode_frames(buf)
    assert frames == [(CMD_DRIVE, b"\x01\x02")]
    assert bytes(buf) == f[:3]  # partial frame retained

    # Corrupted checksum is skipped.
    bad = bytearray(f)
    bad[-1] ^= 0xFF
    assert decode_frames(bad) == []

    link = MotorLink(LoopbackTransport(), wheel_base=0.5)
    link.drive(0.5, 0.2)          # v, omega -> vL=0.45, vR=0.55
    link.request_odometry()
    link.request_status()
    link.poll()
    assert link.last_odometry is not None
    assert abs(link.last_odometry.x - 1.5) < 1e-9
    assert abs(link.last_odometry.theta - 0.7854) < 1e-9
    assert link.last_status.battery_mv == 24000

    import struct
    frames = decode_frames(bytearray(b"".join(link._t.written)))
    vL, vR, _, _ = struct.unpack("<hhHH", frames[0][1])
    assert (vL, vR) == (450, 550)


def test_task_engine_path_and_slow_stop():
    """NEW_TASK_PATH / SLOW_BREAK parity (Task.cpp:509-588): a queued
    multi-waypoint path with per-leg speed caps, then a slow stop that
    ramps the speed down instead of cutting it."""
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.3, robot_radius=0.2,
                     face_tolerance=10.0)  # no in-place turn in this test
    eng.add_path([(5.0, 2.0), (8.0, 2.0)], speed_limits=[0.3, 0.8])
    scan = _open_scan()
    pose = np.array([2.0, 2.0, 0.0], np.float32)
    cmd = eng.step(pose, scan)
    assert eng.state is TaskState.TRACKING
    # First leg's 0.3 m/s cap binds.
    assert 0.0 < float(cmd.v) <= 0.3 + 1e-6

    eng.slow_stop()
    assert eng.state is TaskState.STOPPING
    vs = []
    for _ in range(eng.stop_decel_ticks + 1):
        vs.append(float(eng.step(pose, scan).v))
    assert eng.state is TaskState.IDLE
    assert vs[-1] == 0.0
    assert all(a >= b for a, b in zip(vs, vs[1:]))  # monotone ramp


def test_task_engine_replace_path():
    """RE_TASK_PATH parity: a running mission is replaced mid-task."""
    grid = _free_grid()
    eng = TaskEngine(MODEL, grid, goal_tolerance=0.3, robot_radius=0.2,
                     face_tolerance=10.0)
    eng.add_goal((8.0, 8.0))
    scan = _open_scan()
    pose = np.array([2.0, 2.0, 0.0], np.float32)
    eng.step(pose, scan)
    assert eng.state is TaskState.TRACKING
    eng.replace_path([(2.0, 6.0)])
    assert eng.state is TaskState.PLANNING
    eng.step(pose, scan)
    assert eng.state is TaskState.TRACKING
    assert list(map(tuple, eng._goals)) == [(2.0, 6.0)]


def test_portal_path_stop_heartbeat():
    import time as _time

    paths, repaths, stops, lost = [], [], [], []
    portal = NetPortal(
        on_path=paths.append,
        on_repath=repaths.append,
        on_slow_stop=lambda: stops.append(1),
        on_heartbeat_lost=lambda: lost.append(1),
        heartbeat_timeout=0.5,
    )
    portal.start()
    try:
        with socket.create_connection(("127.0.0.1", portal.port), timeout=5) as c:
            f = c.makefile("rw", encoding="utf-8", newline="\n")
            for cmd, expect in [
                ("PATH 1.0 2.0 3.0 4.0", "OK"),
                ("REPATH 5.0 6.0", "OK"),
                ("PATH 1.0", "ERR bad args"),
                ("STOP", "OK"),
                ("HEART", "BEAT"),
            ]:
                f.write(cmd + "\n"); f.flush()
                assert f.readline().strip() == expect
        # Armed heartbeat goes silent -> watchdog fires exactly once.
        deadline = _time.time() + 5.0
        while not lost and _time.time() < deadline:
            _time.sleep(0.1)
    finally:
        portal.stop()
    assert paths == [[(1.0, 2.0), (3.0, 4.0)]]
    assert repaths == [[(5.0, 6.0)]]
    assert stops == [1]
    assert lost == [1]
