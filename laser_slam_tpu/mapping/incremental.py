"""Incremental occupancy mapping for online sessions.

The reference's MapService keeps a live grid that every new scan updates
in place and the robot layer crops local windows from
(src/Main-Ctrl MapService role; threadGlobal1.cpp:130-138 persists the
global map incrementally). Round-1's online facade instead re-integrated
*all* scans on every local-map emission — O(T) per scan, O(T²) per
session. This module is the O(1)-per-scan replacement:

- ``add`` fuses one scan into a persistent device-resident grid with a
  single compiled scatter program (fixed shapes → compiled once);
- ``rebase`` re-integrates history only when the backend's optimized
  poses actually moved (the reference's ``bigChange`` gate,
  threadGlobal1.cpp:51-60) — loop closures are rare, per-scan cost stays
  flat;
- ``local_crop`` slices an egocentric window straight out of the grid
  (AmbientGridMap role) with ``dynamic_slice`` — no rebuild.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scan import LaserModel, Scan
from .occupancy import GridSpec2D, OccupancyGrid, empty_grid, integrate_scans

Array = jnp.ndarray

# Rebase when any historical pose moved more than this (the reference
# broadcasts pose updates only on "big change", threadGlobal1.cpp:51-60).
REBASE_TRANSLATION = 0.25   # [m]
REBASE_ROTATION = 0.05      # [rad]


@dataclasses.dataclass
class IncrementalMapper:
    """Persistent log-odds grid updated scan-by-scan.

    The grid extent is fixed at construction (``center`` ± ``half_size``)
    — online sessions know their arena; offline rendering with unknown
    extent should keep using ``spec_for_trajectory`` + ``integrate_scans``.
    """

    model: LaserModel
    resolution: float = 0.1
    half_size: float = 60.0
    center: tuple[float, float] = (0.0, 0.0)
    keep_history: bool = True

    def __post_init__(self):
        n = int(round(2 * self.half_size / self.resolution))
        self.spec = GridSpec2D(
            origin_x=self.center[0] - self.half_size,
            origin_y=self.center[1] - self.half_size,
            resolution=self.resolution,
            width=n,
            height=n,
        )
        self.grid: OccupancyGrid = empty_grid(self.spec)
        self._add_fn = jax.jit(
            lambda g, s, p: integrate_scans(
                g,
                self.model,
                jax.tree.map(lambda x: x[None], s),
                p[None],
            )
        )
        self._scans: list[Scan] = []
        self._poses: list[np.ndarray] = []

    # -- O(1) per-scan path ------------------------------------------------

    def add(self, scan: Scan, pose) -> None:
        """Fuse one preprocessed scan posed at ``pose [3]``."""
        pose = jnp.asarray(pose, jnp.float32)
        self.grid = self._add_fn(self.grid, scan, pose)
        if self.keep_history:
            self._scans.append(scan)
            self._poses.append(np.asarray(pose, np.float32))

    def covers(self, poses: np.ndarray, margin: float = 0.0) -> bool:
        """True iff every pose lies inside the fixed arena — callers
        should rebuild at full extent otherwise (beams beyond the arena
        edge are clipped by design; a pose outside it means the map is
        genuinely truncated)."""
        if len(poses) == 0:
            return True
        spec = self.spec
        xy = np.asarray(poses)[:, :2]
        return bool(
            (xy[:, 0] - margin >= spec.origin_x).all()
            and (xy[:, 1] - margin >= spec.origin_y).all()
            and (xy[:, 0] + margin <= spec.origin_x + spec.width * spec.resolution).all()
            and (xy[:, 1] + margin <= spec.origin_y + spec.height * spec.resolution).all()
        )

    # -- rebase on loop closure ---------------------------------------------

    def needs_rebase(self, new_poses: np.ndarray) -> bool:
        """True iff optimized poses moved beyond the bigChange gate."""
        if not self._poses:
            return False
        old = np.stack(self._poses)
        new = np.asarray(new_poses)[: len(old)]
        dt = np.linalg.norm(new[:, :2] - old[: len(new), :2], axis=-1)
        dr = np.abs(
            (new[:, 2] - old[: len(new), 2] + np.pi) % (2 * np.pi) - np.pi
        )
        return bool((dt > REBASE_TRANSLATION).any() or
                    (dr > REBASE_ROTATION).any())

    def rebase(self, new_poses: np.ndarray) -> None:
        """Re-integrate history under corrected poses (rare; call only
        when :meth:`needs_rebase`)."""
        if not self.keep_history or not self._scans:
            return
        n = min(len(self._scans), len(new_poses))
        scans = jax.tree.map(lambda *xs: jnp.stack(xs), *self._scans[:n])
        poses = jnp.asarray(np.asarray(new_poses)[:n], jnp.float32)
        self.grid = integrate_scans(
            empty_grid(self.spec), self.model, scans, poses
        )
        self._poses = [np.asarray(p, np.float32) for p in new_poses[:n]] + \
            self._poses[n:]

    # -- egocentric window (AmbientGridMap role) -----------------------------

    def local_crop(self, pose, half_cells: int = 64) -> tuple[Array, GridSpec2D]:
        """``[2H, 2H]`` log-odds window centered on ``pose``; returns the
        window and its own GridSpec (axis-aligned, not rotated)."""
        spec = self.spec
        cx = int((float(pose[0]) - spec.origin_x) / spec.resolution)
        cy = int((float(pose[1]) - spec.origin_y) / spec.resolution)
        size = 2 * half_cells
        y0 = int(np.clip(cy - half_cells, 0, spec.height - size))
        x0 = int(np.clip(cx - half_cells, 0, spec.width - size))
        win = jax.lax.dynamic_slice(self.grid.log_odds, (y0, x0), (size, size))
        wspec = GridSpec2D(
            origin_x=spec.origin_x + x0 * spec.resolution,
            origin_y=spec.origin_y + y0 * spec.resolution,
            resolution=spec.resolution,
            width=size,
            height=size,
        )
        return win, wspec
