"""Distributed SLAM over TCP: frontend/backend process split.

The reference's distributed topology (src/tcp_slam/): a client runs
scan-matching odometry and streams ``(pose, cov, scan)`` frames to a
server that rebuilds scans, maintains the pose graph, optimizes, and
pushes corrected poses back (serverSocket.cpp:58-116, 43-56). The
``oneThread`` variant folds both into one process for testing
(oneThread/main.cpp).

This module reimplements that topology over the native scan-frame
transport (:mod:`..native.api`): the frontend runs the jitted odometry
step per scan; the backend batches anchors and runs the loop-closure
round + LM solve on its accelerator; pose updates flow back and rebase
the frontend trajectory (the updateLocalPose/synFromGlobal back-edge).
``run_loopback`` is the oneThread-style fold (threads, same wire
protocol through localhost TCP).

For pod-scale SPMD (many chips, one program) see
:mod:`..parallel.distributed`; this module covers the *process/machine*
split with explicit messaging.
"""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se2
from ..core.scan import LaserModel
from ..native.api import ScanServer, ScanSocket
from ..ops.odometry import _OdoCarry, _step
from ..ops.preprocess import preprocess
from ..runtime.slam import SlamConfig, _loop_round, INFO_ADJ, INFO_WEAK


WEAK_STEP_VAR = 1.0  # [m²] variance stamped on weak/deep-fallback steps


class Frontend:
    """Client side: local odometry + scan streaming + pose rebase."""

    def __init__(self, sock: ScanSocket, model: LaserModel):
        self.sock = sock
        self.model = model
        self._step_fn = jax.jit(lambda c, s: _step(model, c, s))
        self._carry = None
        self.poses: list[np.ndarray] = []
        self._updates: "queue.Queue" = queue.Queue()
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self):
        while True:
            frame = self.sock.recv()
            if frame is None:
                break
            if frame[0] == "pose":
                self._updates.put(frame)

    def feed_scan(self, ranges, stamp: float = 0.0) -> np.ndarray:
        scan = preprocess(jnp.asarray(ranges, jnp.float32), self.model)
        weak = False
        if self._carry is None:
            zero = jnp.zeros(3, jnp.float32)
            self._carry = _OdoCarry(scan, scan, zero, zero, zero)
            pose = np.zeros(3, np.float32)
        else:
            self._carry, (p, _, _, w, _f) = self._step_fn(self._carry, scan)
            pose = np.asarray(p)
            weak = bool(w)
        self._apply_updates()
        self.poses.append(pose)
        # Ship the step confidence in the frame's covariance slot (the
        # reference's clientFrontend streams cov[6] the same way,
        # clientFrontend.h:47-53): a weak/deep-fallback step gets a
        # large variance so the backend downweights the sequential edge
        # spanning it instead of trusting it at full strength.
        var = WEAK_STEP_VAR if weak else 0.0
        cov = np.asarray([var, var, var, 0.0, 0.0, 0.0], np.float32)
        self.sock.send_scan(
            np.asarray(ranges, np.float32), pose=pose, cov=cov, stamp=stamp
        )
        return pose

    def _apply_updates(self):
        """Rebase on the newest backend correction (bigChange semantics:
        the delta between old and optimized anchor pose is applied to
        everything after the anchor, threadGlobal1.cpp:51-60)."""
        latest = None
        while not self._updates.empty():
            latest = self._updates.get_nowait()
        if latest is None or self._carry is None:
            return
        _, anchor_id, new_pose, _ = latest
        if anchor_id >= len(self.poses):
            return
        old = jnp.asarray(self.poses[anchor_id])
        new = jnp.asarray(new_pose)
        delta = se2.compose(new, se2.inverse(old))
        for t in range(anchor_id, len(self.poses)):
            self.poses[t] = np.asarray(
                se2.compose(delta, jnp.asarray(self.poses[t]))
            )
        self._carry = self._carry._replace(
            last_gpose=se2.compose(delta, self._carry.last_gpose),
            ref_gpose=se2.compose(delta, self._carry.ref_gpose),
        )

    def close(self):
        self.sock.close()


class Backend:
    """Server side: collect anchors, close loops, push corrections."""

    def __init__(self, conn: ScanSocket, model: LaserModel,
                 cfg: SlamConfig = SlamConfig(), optimize_every: int = 8):
        self.conn = conn
        self.model = model
        self.cfg = cfg
        self.optimize_every = optimize_every
        self._round_fn = jax.jit(
            lambda a_scans, a_poses, rels, radius, w: _loop_round(
                model, cfg, a_scans, a_poses, rels, radius, w
            )
        )
        self.n_loops_total = 0

    def run(self, max_scans: int | None = None) -> np.ndarray:
        """Serve until EOF (or ``max_scans``); returns anchor poses."""
        scans, poses = [], []
        anchor_scans, anchor_ids = [], []
        t = 0
        stride = self.cfg.anchor_stride
        self._weak: list[bool] = []
        while max_scans is None or t < max_scans:
            frame = self.conn.recv()
            if frame is None or frame[0] != "scan":
                break
            _, ranges, pose, cov, _ = frame
            scan = preprocess(jnp.asarray(ranges), self.model)
            scans.append(scan)
            poses.append(np.asarray(pose))
            # Weak-step flag rides the frame covariance (Frontend side).
            self._weak.append(
                cov is not None and float(np.asarray(cov).reshape(-1)[0]) > 0.5
            )
            if t % stride == 0:
                anchor_scans.append(scan)
                anchor_ids.append(t)
                if (
                    len(anchor_scans) >= 8
                    and len(anchor_scans) % self.optimize_every == 0
                ):
                    poses = self._optimize(anchor_scans, anchor_ids, poses)
            t += 1
        return np.stack([poses[i] for i in anchor_ids]) if anchor_ids else np.zeros((0, 3))

    def _optimize(self, anchor_scans, anchor_ids, poses):
        a = len(anchor_scans)
        batch = jax.tree.map(lambda *x: jnp.stack(x), *anchor_scans)
        anchor_poses = jnp.asarray(np.stack([poses[i] for i in anchor_ids]))
        rel_seq = se2.relative(anchor_poses[:-1], anchor_poses[1:])
        # Downweight anchor intervals containing a weak odometry step —
        # same corridor-grade information the offline pipeline applies
        # (slam.py _frontend; MapGraph.cpp:250-261). Round 1 quietly
        # dropped this on the distributed path.
        weak_edge = np.zeros(a - 1, bool)
        for e in range(a - 1):
            lo = anchor_ids[e] + 1
            hi = min(anchor_ids[e + 1] + 1, len(self._weak))
            weak_edge[e] = any(self._weak[lo:hi])
        seq_w = jnp.where(
            jnp.asarray(weak_edge), INFO_WEAK / INFO_ADJ, 1.0
        ).astype(jnp.float32)
        new_poses, n_loops, _ = self._round_fn(
            batch, anchor_poses, rel_seq,
            jnp.asarray(self.cfg.loop_radius, jnp.float32), seq_w,
        )
        self.n_loops_total += int(n_loops)
        # Rebase the server-side trajectory and notify the client of the
        # newest anchor's corrected pose.
        old = jnp.asarray(np.stack(poses))
        seg = np.minimum(np.arange(len(poses)) // self.cfg.anchor_stride, a - 1)
        rel = se2.relative(old[np.asarray(anchor_ids)[seg]], old)
        rebased = np.asarray(se2.compose(jnp.asarray(new_poses)[seg], rel))
        poses = [rebased[i] for i in range(rebased.shape[0])]
        last_id = anchor_ids[-1]
        self.conn.send_pose(last_id, poses[last_id])
        return poses


def run_loopback(
    model: LaserModel,
    ranges: np.ndarray,
    cfg: SlamConfig = SlamConfig(),
    port: int = 0,
) -> tuple[np.ndarray, int]:
    """oneThread-style fold: frontend and backend in one process,
    speaking the real wire protocol over localhost. Returns
    ``(frontend trajectory [T, 3], backend loop count)``."""
    import socket as pysock

    if port == 0:
        s = pysock.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

    server = ScanServer(port)
    result = {}

    def backend_main():
        conn = server.accept(timeout_ms=10_000)
        be = Backend(conn, model, cfg)
        result["anchors"] = be.run(max_scans=len(ranges))
        result["loops"] = be.n_loops_total
        conn.close()

    th = threading.Thread(target=backend_main)
    th.start()
    fe = Frontend(ScanSocket.connect("127.0.0.1", port), model)
    for r in ranges:
        fe.feed_scan(r)
    fe.close()
    th.join(timeout=60)
    server.close()
    return np.stack(fe.poses), result.get("loops", 0)
