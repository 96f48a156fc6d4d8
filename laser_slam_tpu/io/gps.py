"""NMEA GPS parsing and local ENU conversion.

The reference's GPS driver (src/gps_reader/CGPS.h:26-50) reads NMEA
sentences from a serial port and converts lat/lon to local metric
offsets. Serial I/O is a host concern; this module provides the pure
parsing/conversion layer, usable on any byte stream.
"""

from __future__ import annotations

import dataclasses
import math

EARTH_RADIUS = 6378137.0  # [m] WGS84 equatorial


@dataclasses.dataclass
class GpsFix:
    timestamp: float       # UTC seconds of day
    lat: float             # degrees, +N
    lon: float             # degrees, +E
    quality: int
    n_sats: int
    altitude: float


def _dm_to_deg(dm: str, hemi: str) -> float:
    """NMEA ddmm.mmmm → decimal degrees."""
    v = float(dm)
    deg = int(v // 100)
    minutes = v - deg * 100
    out = deg + minutes / 60.0
    return -out if hemi in ("S", "W") else out


def parse_gga(sentence: str) -> GpsFix | None:
    """Parse a ``$GPGGA`` sentence; returns None for other/invalid
    sentences (the reference reads GGA for position, CGPS.cpp)."""
    if not sentence.startswith("$") or "GGA" not in sentence[:7]:
        return None
    body = sentence.strip().split("*")[0]
    f = body.split(",")
    if len(f) < 10 or not f[2] or not f[4]:
        return None
    try:
        t = f[1]
        ts = float(t[0:2]) * 3600 + float(t[2:4]) * 60 + float(t[4:]) if t else 0.0
        return GpsFix(
            timestamp=ts,
            lat=_dm_to_deg(f[2], f[3]),
            lon=_dm_to_deg(f[4], f[5]),
            quality=int(f[6] or 0),
            n_sats=int(f[7] or 0),
            altitude=float(f[9] or 0.0),
        )
    except (ValueError, IndexError):
        return None


def latlon_to_enu(lat: float, lon: float, ref_lat: float, ref_lon: float):
    """Equirectangular lat/lon → local (east, north) meters around a
    reference fix (the reference's distance tables, CGPS.h:41-44)."""
    d_lat = math.radians(lat - ref_lat)
    d_lon = math.radians(lon - ref_lon)
    north = d_lat * EARTH_RADIUS
    east = d_lon * EARTH_RADIUS * math.cos(math.radians(ref_lat))
    return east, north
