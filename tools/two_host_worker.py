"""Worker half of the 2-process-over-sockets scaling measurement: one
"host" (pinned to one CPU core, its own process, its own XLA runtime)
receiving scan batches over TCP, matching them, and shipping poses back.

Protocol (length-prefixed pickles over one TCP connection):
    {"cmd": "init", "ranges": [B, N] f32}      -> {"ok": true}  (compiles)
    {"cmd": "match", "perturb": float}         -> {"poses": [B, 3]}
    {"cmd": "quit"}                            -> closes

Spawned by tools/bench_scaling.py (two_process_sockets section).
"""

import os
import pickle
import socket
import struct
import sys


def send(conn, obj) -> None:
    b = pickle.dumps(obj, protocol=4)
    conn.sendall(struct.pack("<Q", len(b)) + b)


def recv(conn):
    hdr = b""
    while len(hdr) < 8:
        chunk = conn.recv(8 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = struct.unpack("<Q", hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            return None
        buf += chunk
    return pickle.loads(bytes(buf))


def main() -> None:
    port = int(sys.argv[1])
    core = int(sys.argv[2])
    os.sched_setaffinity(0, {core})

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from laser_slam_tpu.core.scan import LMS211
    from laser_slam_tpu.ops.preprocess import preprocess
    from laser_slam_tpu.ops.psm import match_psm

    model = LMS211
    fn = jax.jit(
        lambda a, c: jax.vmap(
            lambda r, q: match_psm(model, r, q, banded=True).pose
        )(a, c)
    )

    conn = socket.create_connection(("127.0.0.1", port))
    ref = cur = None
    while True:
        msg = recv(conn)
        if msg is None or msg["cmd"] == "quit":
            return
        if msg["cmd"] == "init":
            scans = preprocess(jnp.asarray(msg["ranges"]), model)
            ref = jax.tree.map(lambda x: x[:-1], scans)
            cur = jax.tree.map(lambda x: x[1:], scans)
            np.asarray(fn(ref, cur))          # compile
            send(conn, {"ok": True})
        elif msg["cmd"] == "match":
            c2 = cur._replace(ranges=cur.ranges + jnp.float32(msg["perturb"]))
            poses = np.asarray(fn(ref, c2))
            send(conn, {"poses": poses})


if __name__ == "__main__":
    main()
