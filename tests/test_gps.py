"""GPS driver tests: NMEA parsing, the pty read loop, fusion wiring.

The reference driver is only testable against a live serial GPS
(src/gps_reader/CGPS.cpp); here a pty pair acts as the fake device, the
same pattern the SICK driver tests use with a fake TCP server.
"""

import math
import os
import threading
import time

import numpy as np
import pytest

from laser_slam_tpu.io.gps import (
    GpsDriver,
    GpsError,
    GpsObservation,
    latlon_to_enu,
    parse_gga,
    parse_rmc,
)


def nmea(body: str) -> bytes:
    """Wrap an NMEA body with its checksum + CRLF."""
    acc = 0
    for ch in body:
        acc ^= ord(ch)
    return f"${body}*{acc:02X}\r\n".encode()


GGA = "GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,"
RMC = "GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W"


def test_parse_gga():
    fix = parse_gga(nmea(GGA).decode())
    assert fix is not None
    assert fix.lat == pytest.approx(48 + 7.038 / 60, abs=1e-6)
    assert fix.lon == pytest.approx(11 + 31.0 / 60, abs=1e-6)
    assert fix.quality == 1 and fix.n_sats == 8
    assert fix.timestamp == pytest.approx(12 * 3600 + 35 * 60 + 19)


def test_parse_rmc_speed_course():
    vel = parse_rmc(nmea(RMC).decode())
    assert vel is not None and vel.valid
    assert vel.speed == pytest.approx(22.4 * 0.514444, rel=1e-3)
    assert vel.course == pytest.approx(math.radians(84.4), rel=1e-6)


def test_checksum_rejects_corruption():
    good = nmea(GGA).decode()
    # Flip a digit in the latitude but keep the stale checksum.
    bad = good.replace("4807.038", "4807.039")
    assert parse_gga(good) is not None
    assert parse_gga(bad) is None
    assert parse_rmc(nmea(RMC).decode().replace("022.4", "122.4")) is None


def _gga_at(lat_dm: str, lon_dm: str, t: str, quality: int = 1) -> bytes:
    return nmea(
        f"GPGGA,{t},{lat_dm},N,{lon_dm},E,{quality},08,0.9,545.4,M,46.9,M,,"
    )


class _Pty:
    def __init__(self):
        self.master, self.slave = os.openpty()
        self.path = os.ttyname(self.slave)

    def write(self, data: bytes):
        os.write(self.master, data)

    def close(self):
        for fd in (self.master, self.slave):
            try:
                os.close(fd)
            except OSError:
                pass


def test_driver_delivers_enu_fixes_over_pty():
    pty = _Pty()
    fixes: list[GpsObservation] = []
    errors: list[int] = []
    drv = GpsDriver(
        pty.path, on_fix=fixes.append, on_error=errors.append,
        read_timeout=0.05,
    )
    try:
        drv.start()
        assert drv.ready.wait(2.0)
        # ~111.9 m north per minute of latitude at this latitude scale.
        pty.write(_gga_at("4807.000", "01131.000", "120000"))
        pty.write(nmea(RMC.replace("123519", "120001")))
        pty.write(_gga_at("4807.060", "01131.000", "120001"))
        deadline = time.monotonic() + 3.0
        while len(fixes) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
    finally:
        drv.stop()
        pty.close()

    assert len(fixes) >= 2
    assert fixes[0].east == pytest.approx(0.0, abs=1e-9)
    assert fixes[0].north == pytest.approx(0.0, abs=1e-9)
    # 0.06 arcmin of latitude ≈ 111.2 m north.
    e, n = latlon_to_enu(48 + 7.06 / 60, 0.0, 48 + 7.0 / 60, 0.0)
    assert fixes[1].north == pytest.approx(n, rel=1e-6)
    assert fixes[1].east == pytest.approx(0.0, abs=1e-9)
    # RMC within 2 s of the second fix supplies speed + math heading.
    assert fixes[1].speed == pytest.approx(22.4 * 0.514444, rel=1e-3)
    assert fixes[1].heading == pytest.approx(
        math.pi / 2 - math.radians(84.4), rel=1e-6
    )
    assert drv.n_fixes >= 2
    assert not errors


def test_driver_reports_no_fix_and_derived_velocity():
    pty = _Pty()
    fixes: list[GpsObservation] = []
    errors: list[int] = []
    drv = GpsDriver(
        pty.path, on_fix=fixes.append, on_error=errors.append,
        read_timeout=0.05,
    )
    try:
        drv.start()
        assert drv.ready.wait(2.0)
        pty.write(_gga_at("4807.000", "01131.000", "120000", quality=0))
        pty.write(_gga_at("4807.000", "01131.000", "120000"))
        # 1 s later, moved north — no RMC, so velocity is derived.
        pty.write(_gga_at("4807.060", "01131.000", "120001"))
        deadline = time.monotonic() + 3.0
        while len(fixes) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
    finally:
        drv.stop()
        pty.close()

    assert int(GpsError.NO_FIX) in errors
    assert len(fixes) >= 2
    _, n = latlon_to_enu(48 + 7.06 / 60, 0.0, 48 + 7.0 / 60, 0.0)
    assert fixes[1].speed == pytest.approx(n / 1.0, rel=1e-3)
    assert fixes[1].heading == pytest.approx(math.pi / 2, rel=1e-3)


def test_open_failure_reports_error():
    errors: list[int] = []
    drv = GpsDriver("/nonexistent/gps0", on_error=errors.append)
    stop = threading.Event()
    stop.set()
    drv.run(stop)
    assert errors == [int(GpsError.OPEN_FAILED)]


def test_fusion_wiring_gates_stale_fixes():
    from laser_slam_tpu.core.scan import LMS211
    from laser_slam_tpu.runtime.online import OnlineSlam

    slam = OnlineSlam(LMS211, use_fusion=True, incremental_map=False)
    obs = GpsObservation(
        t=100.0, east=4.0, north=2.0, lat=0, lon=0, speed=0.0,
        heading=0.0, quality=1, n_sats=8,
    )
    slam.feed_gps(obs, r=0.01)
    m1 = np.asarray(slam._fusion.mean)
    assert m1[0] > 1.0 and m1[1] > 0.5  # pulled toward the fix

    # Same timestamp again → stale, ignored.
    shifted = obs._replace(east=-50.0)
    slam.feed_gps(shifted, r=0.01)
    m2 = np.asarray(slam._fusion.mean)
    np.testing.assert_allclose(m1, m2)

    # Newer timestamp → consumed.
    slam.feed_gps(shifted._replace(t=101.0), r=0.01)
    m3 = np.asarray(slam._fusion.mean)
    assert m3[0] < m2[0]
