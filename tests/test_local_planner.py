"""Seed-grow / milestone local planner (PathPlanning.cpp parity).

Covers the reference's egocentric dodge chain: instant-view rasterize
(PathPlanning.cpp:107-205), seed-grow reachability (27-55), robot-size
erosion (58-104), milestone selection with line-of-sight lowering
(318-448) — re-designed as dense stencils and a vectorized line test.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.core.scan import LMS211
from laser_slam_tpu.nav.local_planner import (
    VIEW_H,
    VIEW_RES,
    VIEW_W,
    dodge_path,
    erode_by_robot,
    instant_view,
    milestone_select,
    seed_grow,
)
from laser_slam_tpu.ops.preprocess import preprocess

MODEL = LMS211


def test_seed_grow_respects_walls():
    obstacle = np.zeros((VIEW_H, VIEW_W), bool)
    obstacle[10, :] = True          # full wall at row 10
    reach = np.asarray(seed_grow(jnp.asarray(obstacle)))
    assert reach[5, 10]             # below the wall: reachable
    assert not reach[20, 10]        # above the wall: sealed off
    # A gap opens the far side.
    obstacle[10, 15] = False
    reach = np.asarray(seed_grow(jnp.asarray(obstacle)))
    assert reach[20, 10]


def test_erosion_shrinks_corridor():
    reach = np.zeros((VIEW_H, VIEW_W), bool)
    reach[:, 8:13] = True           # 5-cell corridor
    trav = np.asarray(erode_by_robot(jnp.asarray(reach), robot_cells=2))
    assert trav[:, 10].any()        # centre line survives
    assert not trav[:, 8].any()     # edges eroded away
    assert not trav[:, 12].any()


def test_milestone_straight_corridor():
    trav = np.zeros((VIEW_H, VIEW_W), bool)
    trav[:40, 8:13] = True
    ms = milestone_select(jnp.asarray(trav))
    assert bool(ms.ok)
    # Milestone in the corridor's far span, roughly centred.
    r, c = np.asarray(ms.milestone_rc)
    assert r >= 35 and 8 <= c <= 13
    path = np.asarray(ms.path_xy)
    assert path.shape == (4, 2)
    # Path marches forward (x = forward in robot frame).
    assert path[-1, 0] > path[0, 0]


def test_milestone_dodges_offset_gap():
    """Wall ahead with a gap on the right: the line target must steer
    into the gap column, not through the wall."""
    trav = np.zeros((VIEW_H, VIEW_W), bool)
    trav[:20, :] = True             # open near field
    trav[20:23, :] = False          # wall band...
    trav[20:23, 15:19] = True       # ...with a gap at columns 15-18
    trav[23:40, 14:20] = True       # free space beyond the gap
    ms = milestone_select(jnp.asarray(trav))
    assert bool(ms.ok)
    r, c = np.asarray(ms.milestone_rc)
    assert r >= 30 and c >= 14      # milestone beyond the wall, right side


def test_dodge_path_end_to_end_jitted():
    """Full chain on a synthetic scan: open 4 m corridor ahead."""
    n = MODEL.n_beams
    fi = np.radians(MODEL.fi_min_deg) + np.arange(n) * np.radians(
        MODEL.fov_deg / (n - 1)
    )
    # Corridor walls at y = ±1 m, open ahead to max range.
    with np.errstate(divide="ignore"):
        r_wall = np.where(np.abs(np.sin(fi)) > 1e-6,
                          1.0 / np.abs(np.sin(fi)), MODEL.max_range)
    ranges = np.minimum(r_wall, MODEL.max_range - 1.0).astype(np.float32)
    scan = jax.tree.map(
        lambda a: a[0], preprocess(jnp.asarray(ranges)[None], MODEL)
    )
    ms = jax.jit(lambda s: dodge_path(MODEL, s))(scan)
    assert bool(ms.ok)
    path = np.asarray(ms.path_xy)
    # Waypoints stay inside the corridor and march forward.
    assert np.all(np.abs(path[:, 1]) < 1.0)
    assert path[-1, 0] > 2.0
