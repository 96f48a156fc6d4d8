"""ctypes bindings for the native runtime library.

Builds ``libnative.so`` from :mod:`native.cpp` on first use (g++ -O2,
cached next to the source) and exposes a typed Python API:

- :func:`parse_carmen` — C log parser (drop-in for the Python reader,
  ~10× faster on big logs),
- :class:`ScanRing` — thread-safe producer/consumer scan queue,
- :class:`ScanSocket` / :class:`ScanServer` — length-prefixed TCP
  scan-frame transport (the tcp_slam wire protocol role),
- :func:`cola_build` / :func:`cola_parse_scandata` — SICK CoLa-A codec.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB = os.path.join(_DIR, "libnative.so")
_lock = threading.Lock()
_lib = None


class _CarmenData(ct.Structure):
    _fields_ = [
        ("n_scans", ct.c_int),
        ("n_beams", ct.c_int),
        ("ranges", ct.POINTER(ct.c_float)),
        ("poses", ct.POINTER(ct.c_float)),
        ("stamps", ct.POINTER(ct.c_double)),
        ("n_gt", ct.c_int),
        ("gt", ct.POINTER(ct.c_float)),
        ("start_rad", ct.c_float),
        ("fov_rad", ct.c_float),
        ("max_range", ct.c_float),
    ]


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )
    return _LIB


def load():
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ct.CDLL(_build())
        lib.carmen_parse.restype = ct.POINTER(_CarmenData)
        lib.carmen_parse.argtypes = [ct.c_char_p, ct.c_int]
        lib.carmen_free.argtypes = [ct.POINTER(_CarmenData)]
        lib.ring_create.restype = ct.c_void_p
        lib.ring_create.argtypes = [ct.c_int, ct.c_int]
        lib.ring_destroy.argtypes = [ct.c_void_p]
        lib.ring_push.argtypes = [
            ct.c_void_p, ct.POINTER(ct.c_float), ct.c_int,
            ct.POINTER(ct.c_float), ct.c_double,
        ]
        lib.ring_pop.argtypes = [
            ct.c_void_p, ct.POINTER(ct.c_float), ct.POINTER(ct.c_int),
            ct.POINTER(ct.c_float), ct.POINTER(ct.c_double), ct.c_int,
        ]
        lib.ring_size.argtypes = [ct.c_void_p]
        lib.ring_dropped.argtypes = [ct.c_void_p]
        lib.tcp_serve.argtypes = [ct.c_int]
        lib.tcp_accept.argtypes = [ct.c_int, ct.c_int]
        lib.tcp_connect.argtypes = [ct.c_char_p, ct.c_int]
        lib.tcp_connect.restype = ct.c_int
        lib.tcp_close.argtypes = [ct.c_int]
        lib.send_scan_frame.argtypes = [
            ct.c_int, ct.POINTER(ct.c_float), ct.c_int,
            ct.POINTER(ct.c_float), ct.POINTER(ct.c_float), ct.c_double,
        ]
        lib.recv_frame_type.argtypes = [ct.c_int]
        lib.recv_scan_body.argtypes = [
            ct.c_int, ct.POINTER(ct.c_float), ct.c_int, ct.POINTER(ct.c_int),
            ct.POINTER(ct.c_float), ct.POINTER(ct.c_float),
            ct.POINTER(ct.c_double),
        ]
        lib.send_pose_update.argtypes = [
            ct.c_int, ct.c_int, ct.POINTER(ct.c_float), ct.POINTER(ct.c_float),
        ]
        lib.recv_pose_body.argtypes = [
            ct.c_int, ct.POINTER(ct.c_int), ct.POINTER(ct.c_float),
            ct.POINTER(ct.c_float),
        ]
        lib.cola_build.argtypes = [ct.c_char_p, ct.c_char_p, ct.c_int]
        lib.cola_unwrap.argtypes = [ct.c_char_p, ct.c_int, ct.c_char_p, ct.c_int]
        lib.cola_parse_scandata.argtypes = [
            ct.c_char_p, ct.c_int, ct.POINTER(ct.c_float), ct.c_int,
        ]
        _lib = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_float))


def parse_carmen(path: str, max_scans: int = 0):
    """Native CARMEN parse → dict of numpy arrays + model params."""
    lib = load()
    d = lib.carmen_parse(path.encode(), max_scans)
    if not d:
        raise IOError(f"cannot parse {path}")
    c = d.contents
    try:
        ranges = np.ctypeslib.as_array(
            c.ranges, shape=(c.n_scans, c.n_beams)
        ).copy()
        poses = np.ctypeslib.as_array(c.poses, shape=(c.n_scans, 3)).copy()
        stamps = np.ctypeslib.as_array(c.stamps, shape=(c.n_scans,)).copy()
        gt = np.ctypeslib.as_array(c.gt, shape=(c.n_gt, 3)).copy()
        meta = dict(
            start_rad=float(c.start_rad),
            fov_rad=float(c.fov_rad),
            max_range=float(c.max_range),
        )
    finally:
        lib.carmen_free(d)
    return dict(ranges=ranges, laser_pose=poses, timestamps=stamps, gt=gt, **meta)


class ScanRing:
    """Thread-safe bounded scan queue (drops oldest when full)."""

    def __init__(self, capacity: int = 64, max_beams: int = 541):
        self._lib = load()
        self._h = self._lib.ring_create(capacity, max_beams)
        self._max_beams = max_beams

    def push(self, ranges: np.ndarray, pose=(0, 0, 0), stamp: float = 0.0):
        r = np.ascontiguousarray(ranges, np.float32)
        p = np.asarray(pose, np.float32)
        rc = self._lib.ring_push(self._h, _fp(r), len(r), _fp(p), stamp)
        if rc != 0:
            raise ValueError("scan too large for ring")

    def pop(self, timeout_ms: int = 0):
        r = np.empty(self._max_beams, np.float32)
        p = np.empty(3, np.float32)
        n = ct.c_int()
        ts = ct.c_double()
        rc = self._lib.ring_pop(
            self._h, _fp(r), ct.byref(n), _fp(p), ct.byref(ts), timeout_ms
        )
        if rc != 0:
            return None
        return r[: n.value].copy(), p.copy(), ts.value

    def __len__(self):
        return self._lib.ring_size(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.ring_dropped(self._h)

    def close(self):
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None


class ScanSocket:
    """One endpoint of the scan-frame protocol over a connected fd."""

    def __init__(self, fd: int, max_beams: int = 541):
        self._lib = load()
        self.fd = fd
        self._max_beams = max_beams

    @classmethod
    def connect(cls, host: str, port: int, max_beams: int = 541):
        fd = load().tcp_connect(host.encode(), port)
        if fd < 0:
            raise ConnectionError(f"connect {host}:{port} failed")
        return cls(fd, max_beams)

    def send_scan(self, ranges, pose=(0, 0, 0), cov=None, stamp: float = 0.0):
        r = np.ascontiguousarray(ranges, np.float32)
        p = np.asarray(pose, np.float32)
        c = np.zeros(6, np.float32) if cov is None else np.asarray(cov, np.float32)
        if self._lib.send_scan_frame(self.fd, _fp(r), len(r), _fp(p), _fp(c), stamp) != 0:
            raise ConnectionError("send failed")

    def send_pose(self, frame_id: int, pose, cov=None):
        p = np.asarray(pose, np.float32)
        c = np.zeros(6, np.float32) if cov is None else np.asarray(cov, np.float32)
        if self._lib.send_pose_update(self.fd, frame_id, _fp(p), _fp(c)) != 0:
            raise ConnectionError("send failed")

    def recv(self):
        """Receive the next frame: ``("scan", ranges, pose, cov, stamp)``
        or ``("pose", id, pose, cov)`` or ``None`` on EOF."""
        t = self._lib.recv_frame_type(self.fd)
        if t == 1:
            r = np.empty(self._max_beams, np.float32)
            p = np.empty(3, np.float32)
            c = np.empty(6, np.float32)
            n = ct.c_int()
            ts = ct.c_double()
            if self._lib.recv_scan_body(
                self.fd, _fp(r), self._max_beams, ct.byref(n), _fp(p), _fp(c),
                ct.byref(ts),
            ) != 0:
                return None
            return ("scan", r[: n.value].copy(), p, c, ts.value)
        if t == 2:
            p = np.empty(3, np.float32)
            c = np.empty(6, np.float32)
            fid = ct.c_int()
            if self._lib.recv_pose_body(self.fd, ct.byref(fid), _fp(p), _fp(c)) != 0:
                return None
            return ("pose", fid.value, p, c)
        return None

    def close(self):
        if self.fd >= 0:
            self._lib.tcp_close(self.fd)
            self.fd = -1


class ScanServer:
    """Listening endpoint; ``accept()`` yields :class:`ScanSocket`."""

    def __init__(self, port: int):
        self._lib = load()
        self.fd = self._lib.tcp_serve(port)
        if self.fd < 0:
            raise OSError(f"cannot listen on :{port}")

    def accept(self, timeout_ms: int = 10_000) -> ScanSocket | None:
        fd = self._lib.tcp_accept(self.fd, timeout_ms)
        return ScanSocket(fd) if fd >= 0 else None

    def close(self):
        if self.fd >= 0:
            self._lib.tcp_close(self.fd)
            self.fd = -1


def cola_build(cmd: str) -> bytes:
    lib = load()
    out = ct.create_string_buffer(len(cmd) + 8)
    n = lib.cola_build(cmd.encode(), out, len(cmd) + 8)
    return out.raw[:n]


def cola_unwrap(telegram: bytes) -> bytes:
    lib = load()
    out = ct.create_string_buffer(len(telegram))
    n = lib.cola_unwrap(telegram, len(telegram), out, len(telegram))
    if n < 0:
        raise ValueError("malformed telegram")
    return out.raw[:n]


def cola_parse_scandata(payload: bytes, max_beams: int = 1024) -> np.ndarray:
    lib = load()
    out = np.empty(max_beams, np.float32)
    n = lib.cola_parse_scandata(payload, len(payload), _fp(out), max_beams)
    if n < 0:
        raise ValueError("no DIST1 section")
    return out[:n].copy()
