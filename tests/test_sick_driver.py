"""Live SICK driver against a scripted fake LMS server.

Covers the session state machine (login → outputRange → scandatacfg →
store → run, CSICK.cpp:101-186), scan polling/decoding
(doProcessSimple/decodeScan, CSICK.cpp:208-311), hardware-error
surfacing, and reconnect with error codes."""

import socket
import threading
import time

import numpy as np
import pytest

from laser_slam_tpu.io.sick_driver import (
    SESSION_SEQUENCE,
    SickError,
    SickLMS,
)

try:
    from laser_slam_tpu.native.api import load

    load()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib missing")

STX, ETX = b"\x02", b"\x03"


def make_scandata(n=181, status="0", dist="DIST1"):
    """A minimally valid LMDscandata telegram body (hex mm ranges)."""
    # device status is the 6th whitespace field (decodeScan case 6,
    # CSICK.cpp:230-236)
    head = (
        f"sRA LMDscandata 0 1 89A27F {status} 0 1A4 1A5 D0xxx 0 0 7 0 0 1388 "
        f"168 0 1 0 0 5DC A2 "
    )
    ranges_mm = [2000 + 10 * i for i in range(n)]
    block = (
        f"{dist} 3F800000 00000000 FFF92230 1388 {n:X} "
        + " ".join(f"{r:X}" for r in ranges_mm)
    )
    return head + block


class FakeLMS:
    """Scripted LMS1xx: answers the session sequence and serves scans.

    ``fail_after`` closes the connection after that many scan replies
    (link-loss simulation); ``bad_status`` serves a device-error status
    word; ``reject_login`` refuses the first session command.
    """

    def __init__(self, fail_after=None, bad_status=False, reject_login=False):
        self.fail_after = fail_after
        self.bad_status = bad_status
        self.reject_login = reject_login
        self.sessions = 0
        self._srv = socket.create_server(("127.0.0.1", 0))
        self._srv.settimeout(5.0)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _reply(self, conn, payload: str):
        conn.sendall(STX + payload.encode() + ETX)

    def _serve(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except (TimeoutError, socket.timeout):
                continue
            except OSError:
                return
            self.sessions += 1
            served = 0
            buf = b""
            with conn:
                conn.settimeout(2.0)
                while not self._stop.is_set():
                    try:
                        data = conn.recv(4096)
                    except (TimeoutError, socket.timeout):
                        continue
                    except OSError:
                        break
                    if not data:
                        break
                    buf += data
                    while ETX in buf:
                        end = buf.index(ETX)
                        cmd = buf[1:end].decode()
                        buf = buf[end + 1:]
                        if not self._handle(conn, cmd, served):
                            return
                        if cmd == "sRN LMDscandata":
                            served += 1
                            if (
                                self.fail_after is not None
                                and served >= self.fail_after
                            ):
                                conn.close()
                                self.fail_after = None  # only fail once
                                break

    def _handle(self, conn, cmd, served) -> bool:
        if cmd.startswith("sMN SetAccessMode"):
            if self.reject_login:
                self._reply(conn, "sFA 7")  # CoLa error answer
            else:
                self._reply(conn, "sAN SetAccessMode 1")
        elif cmd.startswith("sWN LMPoutputRange"):
            self._reply(conn, "sWA LMPoutputRange")
        elif cmd.startswith("sWN LMDscandatacfg"):
            self._reply(conn, "sWA LMDscandatacfg")
        elif cmd == "sMN mEEwriteall":
            self._reply(conn, "sAN mEEwriteall 1")
        elif cmd == "sMN Run":
            self._reply(conn, "sAN Run 1")
        elif cmd == "sRN LMDscandata":
            status = "7" if self.bad_status else "0"
            self._reply(conn, make_scandata(status=status))
        else:
            self._reply(conn, "sFA 1")
        return True

    def close(self):
        self._stop.set()
        self._srv.close()
        self._thread.join(timeout=2)


def test_session_sequence_and_poll():
    srv = FakeLMS()
    errors = []
    drv = SickLMS("127.0.0.1", srv.port, on_error=errors.append)
    try:
        assert drv.connect()
        scan = drv.poll()
        assert scan is not None and scan.shape[0] == 181
        # hex 2000mm + 10i -> meters
        np.testing.assert_allclose(scan[0], 2.0, atol=1e-3)
        np.testing.assert_allclose(scan[180], 3.8, atol=1e-3)
        assert errors == []
    finally:
        drv.stop()
        srv.close()


def test_login_rejected_reports_session_failed():
    srv = FakeLMS(reject_login=True)
    errors = []
    drv = SickLMS("127.0.0.1", srv.port, on_error=errors.append)
    try:
        assert not drv.connect()
        assert int(SickError.SESSION_FAILED) in errors
    finally:
        drv.stop()
        srv.close()


def test_bad_status_is_hardware_error():
    srv = FakeLMS(bad_status=True)
    errors = []
    drv = SickLMS("127.0.0.1", srv.port, on_error=errors.append)
    try:
        assert drv.connect()
        assert drv.poll() is None
        assert int(SickError.HARDWARE_ERROR) in errors
    finally:
        drv.stop()
        srv.close()


def test_reconnect_after_link_loss():
    srv = FakeLMS(fail_after=2)
    errors = []
    scans = []
    drv = SickLMS(
        "127.0.0.1",
        srv.port,
        on_scan=scans.append,
        on_error=errors.append,
        poll_interval=0.01,
        timeout=0.5,
        reconnect_backoff=0.01,
    )
    try:
        stop = threading.Event()
        t = threading.Thread(target=drv.run, args=(stop,), daemon=True)
        t.start()
        deadline = time.monotonic() + 10
        while len(scans) < 6 and time.monotonic() < deadline:
            time.sleep(0.05)
        stop.set()
        t.join(timeout=2)
        assert len(scans) >= 6          # kept scanning after the drop
        assert srv.sessions >= 2        # actually reconnected
        assert int(SickError.RECONNECTED) in errors
    finally:
        drv.stop()
        srv.close()


def test_connect_refused_reports_code():
    errors = []
    drv = SickLMS("127.0.0.1", 1, on_error=errors.append, timeout=0.3)
    assert not drv.connect()
    assert errors == [int(SickError.CONNECT_FAILED)]
