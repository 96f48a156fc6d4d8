import os

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.io.gps import GpsFix, latlon_to_enu, parse_gga
from laser_slam_tpu.io.image_map import (
    grid_from_image,
    grid_to_image_array,
    save_grid_image,
)
from laser_slam_tpu.io.rawseed import read_rawseed, read_sick_log
from laser_slam_tpu.mapping.occupancy import GridSpec2D, OccupancyGrid


def test_gga_roundtrip():
    s = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
    fix = parse_gga(s)
    assert fix is not None
    assert abs(fix.lat - 48.1173) < 1e-3
    assert abs(fix.lon - 11.5167) < 1e-3
    assert fix.n_sats == 8
    assert parse_gga("$GPRMC,anything") is None
    assert parse_gga("$GPGGA,123519,,,,,0,00,,,M,,M,,*47") is None


def test_enu_conversion():
    e, n = latlon_to_enu(48.0001, 11.0, 48.0, 11.0)
    assert abs(n - 11.1) < 0.3 and abs(e) < 1e-6
    e2, _ = latlon_to_enu(48.0, 11.0001, 48.0, 11.0)
    assert 6.0 < e2 < 8.0  # cos(48°) scaling


def test_image_map_roundtrip(tmp_path):
    lo = np.zeros((40, 50), np.float32)
    lo[10, :] = 5.0       # wall
    lo[20:30, 5:45] = -5.0  # free room
    grid = OccupancyGrid(jnp.asarray(lo), GridSpec2D(0, 0, 0.05, 50, 40))
    path = os.path.join(tmp_path, "map.png")
    save_grid_image(grid, path)
    back = grid_from_image(path, resolution=0.05)
    assert back.spec.width == 50 and back.spec.height == 40
    lo2 = np.asarray(back.log_odds)
    assert (lo2[10, :] > 0).all()
    assert (lo2[20:30, 5:45] < 0).all()
    assert lo2[0, 0] == 0.0  # unknown preserved


def test_rawseed_reader(tmp_path):
    p = os.path.join(tmp_path, "rs.csv")
    n = 181
    with open(p, "w") as f:
        for t in range(3):
            rs = ",".join(f"{2.0 + 0.01*i:.3f}" for i in range(n))
            f.write(f"{1000.5 + t},{n},0,{rs}\n")
    ranges, ts, model = read_rawseed(p)
    assert ranges.shape == (3, 181)
    assert model.n_beams == 181
    assert abs(ts[1] - 1001.5) < 1e-6


def test_sick_log_reader(tmp_path):
    p = os.path.join(tmp_path, "sick.log")
    with open(p, "w") as f:
        f.write("LMS 181 " + " ".join("3.5" for _ in range(181)) + "\n")
    ranges, model = read_sick_log(p)
    assert ranges.shape == (1, 181)
    assert np.allclose(ranges, 3.5)
