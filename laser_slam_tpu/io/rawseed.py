"""RawSeed CSV log reader (``timestamp,num_points,offset,r1,...``).

Mirrors ``CPolarMatch::readRawSeed`` (src/zhpsm/ZHPolar_Match.cpp:123-170)
but returns the whole log as one ``[T, N]`` array in meters.
"""

from __future__ import annotations

import numpy as np

from ..core.scan import LaserModel, PRESETS


def read_rawseed(
    path: str, model: LaserModel | None = None, max_scans: int | None = None
):
    """Returns ``(ranges [T, N] float32 meters, timestamps [T], model)``."""
    rows, ts = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 4:
                continue
            n = int(parts[1])
            if model is None:
                for m in PRESETS.values():
                    if n == m.n_beams:
                        model = m
                        break
                if model is None:
                    raise ValueError(f"unknown beam count {n}")
            if n != model.n_beams:
                continue
            r = np.asarray(parts[3 : 3 + n], dtype=np.float32)
            rows.append(r)
            ts.append(float(parts[0]))
            if max_scans is not None and len(rows) >= max_scans:
                break
    if not rows:
        raise ValueError(f"no scans read from {path}")
    ranges = np.stack(rows)
    ranges = np.where(
        ranges < model.min_range, model.max_range + 1.0, ranges
    ).astype(np.float32)
    return ranges, np.asarray(ts), model


def read_sick_log(
    path: str, model: LaserModel | None = None, max_scans: int | None = None
):
    """Whitespace SICK log: ``tag N r1..rN`` per line, meters
    (``CPolarMatch::readSICK``, ZHPolar_Match.cpp:291-330)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            n = int(float(parts[1]))
            if model is None:
                for m in PRESETS.values():
                    if n <= m.n_beams:
                        model = m
                        break
            n = min(n, model.n_beams)
            r = np.full(model.n_beams, model.max_range + 1.0, np.float32)
            r[:n] = np.asarray(parts[2 : 2 + n], dtype=np.float32)
            rows.append(r)
            if max_scans is not None and len(rows) >= max_scans:
                break
    if not rows:
        raise ValueError(f"no scans read from {path}")
    ranges = np.stack(rows)
    ranges = np.where(
        ranges < model.min_range, model.max_range + 1.0, ranges
    ).astype(np.float32)
    return ranges, model
