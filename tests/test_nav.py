import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.mapping.occupancy import GridSpec2D, OccupancyGrid
from laser_slam_tpu.nav.controller import pure_pursuit, security_speed_cap, track_step
from laser_slam_tpu.nav.planner import inflate_obstacles, plan_path, wavefront
from laser_slam_tpu.ops.preprocess import preprocess

MODEL = LMS211


def _wall_grid():
    """10x10m grid with a wall across the middle leaving a gap."""
    spec = GridSpec2D(0.0, 0.0, 0.1, 100, 100)
    lo = np.full((100, 100), -1.0, np.float32)  # known free
    lo[50, :80] = 5.0  # wall row y=5m, gap at x in [8, 10)
    return OccupancyGrid(log_odds=jnp.asarray(lo), spec=spec)


def test_wavefront_goes_around_wall():
    grid = _wall_grid()
    res = jax.jit(
        lambda g: plan_path(g, jnp.asarray([2.0, 2.0]), jnp.asarray([2.0, 8.0]),
                            robot_radius=0.15)
    )(grid)
    assert bool(res.reached)
    path = np.asarray(res.path)[: int(res.n_valid)]
    # Must detour through the gap on the right (x > 7.5).
    assert path[:, 0].max() > 7.5
    # Straight-line distance is 6; the detour must be meaningfully longer.
    assert float(res.length) > 10.0


def test_plan_fails_when_blocked():
    spec = GridSpec2D(0.0, 0.0, 0.1, 60, 60)
    lo = np.full((60, 60), -1.0, np.float32)
    lo[30, :] = 5.0  # full wall, no gap
    grid = OccupancyGrid(log_odds=jnp.asarray(lo), spec=spec)
    res = plan_path(grid, jnp.asarray([1.0, 1.0]), jnp.asarray([1.0, 5.0]),
                    robot_radius=0.15)
    assert not bool(res.reached)


def test_inflation_thickens_walls():
    grid = _wall_grid()
    inflated = np.asarray(inflate_obstacles(grid, robot_radius=0.3))
    assert inflated[48, 40] and inflated[52, 40]  # 2 cells above/below wall
    assert not inflated[40, 40]


def test_security_zones():
    # Clear scan: full speed.
    r = np.full(MODEL.n_beams, 10.0, np.float32)
    scan = preprocess(jnp.asarray(r), MODEL)
    v, zone = security_speed_cap(MODEL, scan)
    assert float(v) == 1.0 and int(zone) == -1
    # Obstacle dead ahead at 0.5 m: zone 1, slow.
    r2 = r.copy()
    mid = MODEL.n_beams // 2
    r2[mid - 3 : mid + 4] = 0.5  # wide enough to survive the median filter
    scan2 = preprocess(jnp.asarray(r2), MODEL)
    v2, zone2 = security_speed_cap(MODEL, scan2)
    assert float(v2) <= 0.11 and int(zone2) in (0, 1)
    # Same obstacle far to the side (outside the cone): ignored.
    r3 = r.copy()
    r3[:7] = 0.5
    v3, _ = security_speed_cap(MODEL, preprocess(jnp.asarray(r3), MODEL))
    assert float(v3) == 1.0


def test_pure_pursuit_steers_toward_path():
    path = jnp.asarray([[1.0, 0.0], [2.0, 0.0], [3.0, 1.0], [4.0, 2.0]])
    n_valid = jnp.asarray(4)
    # Robot at origin facing +y: path is to the right → negative omega.
    v, omega = pure_pursuit(jnp.asarray([0.0, 0.0, jnp.pi / 2]), path, n_valid)
    assert float(omega) < -0.5
    # Facing along the path: small correction, forward speed.
    v2, omega2 = pure_pursuit(jnp.asarray([0.5, 0.0, 0.0]), path, n_valid)
    assert float(v2) > 0.5
    assert abs(float(omega2)) < 1.0


def test_track_step_combines():
    path = jnp.asarray([[1.0, 0.0], [3.0, 0.0]])
    r = np.full(MODEL.n_beams, 10.0, np.float32)
    mid = MODEL.n_beams // 2
    r[mid - 3 : mid + 4] = 0.4  # obstacle ahead
    scan = preprocess(jnp.asarray(r), MODEL)
    cmd = track_step(MODEL, scan, jnp.zeros(3), path, jnp.asarray(2))
    assert float(cmd.v) <= 0.11  # capped by zone
