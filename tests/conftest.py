"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding is
validated on host-platform virtual devices (the standard JAX pattern).
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# The TPU-sized accuracy lane (pytest -m accuracy) opts OUT of the CPU
# mesh: full-log SLAM is ~7 min/log on the TPU and impractical on host
# CPU (see tests/test_accuracy.py).
_USE_TPU = os.environ.get("LASER_SLAM_ACCURACY_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The CI image pre-imports jax with JAX_PLATFORMS=axon (a tunneled TPU);
# env vars are latched by then, so force the platform via the config API.
import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def intel_log_path():
    path = os.path.join(REFERENCE_DATA, "intel-lab.log")
    if not os.path.exists(path):
        pytest.skip("reference intel-lab.log not available")
    return path


@pytest.fixture(scope="session")
def fr079_log_path():
    path = os.path.join(REFERENCE_DATA, "fr079.log")
    if not os.path.exists(path):
        pytest.skip("reference fr079.log not available")
    return path


@pytest.fixture(scope="session")
def mit_log_path():
    path = os.path.join(REFERENCE_DATA, "mit-cscail.log")
    if not os.path.exists(path):
        pytest.skip("reference mit-cscail.log not available")
    return path


def box_room_ranges(model, pose, box=(-3.0, 5.0, -4.0, 4.0)):
    """Analytic ranges of a rectangular room seen from ``pose``.

    A deterministic synthetic fixture (the reference's closest analog is
    the two embedded scans in zhicp/test.cpp:44-60). Returns ``[N]``
    float32 ranges in meters.
    """
    xmin, xmax, ymin, ymax = box
    x0, y0, th = pose
    n = model.n_beams
    ang = th + (np.arange(n) * model.dfi + model.fi_min)
    dx, dy = np.cos(ang), np.sin(ang)
    ts = np.full((4, n), np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k, (t_num, t_den, lo, hi, coord0, d_other) in enumerate(
            [
                (xmin - x0, dx, ymin, ymax, y0, dy),
                (xmax - x0, dx, ymin, ymax, y0, dy),
                (ymin - y0, dy, xmin, xmax, x0, dx),
                (ymax - y0, dy, xmin, xmax, x0, dx),
            ]
        ):
            t = t_num / t_den
            other = coord0 + t * d_other
            ok = (t > 0) & (other >= lo) & (other <= hi)
            ts[k] = np.where(ok, t, np.inf)
    r = ts.min(axis=0)
    r = np.where(np.isfinite(r), r, model.max_range + 1.0)
    return r.astype(np.float32)


@pytest.fixture(scope="session")
def room():
    return box_room_ranges
