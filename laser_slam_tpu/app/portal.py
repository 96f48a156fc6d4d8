"""Remote-control portal: line-oriented TCP command server.

The role of the reference's ``NetPortal`` (src/Main-Ctrl/NetPortal/
NetPortal.cpp, 811 LoC of raw-socket framing): an operator console
connects over TCP and issues commands; the portal answers with robot
state. Protocol here is newline-delimited UTF-8, one command per line:

    GOTO <x> <y>      queue a navigation goal (meters)
    CANCEL            abort the current mission
    POSE              -> "POSE x y theta"
    STATE             -> "STATE <task-state>"
    PING              -> "PONG"

Runs on a daemon thread; handlers are supplied by the composition root.
"""

from __future__ import annotations

import socket
import threading
from typing import Callable


class NetPortal:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        on_goto: Callable[[float, float], None] | None = None,
        on_cancel: Callable[[], None] | None = None,
        get_pose: Callable[[], tuple] | None = None,
        get_state: Callable[[], str] | None = None,
    ):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(4)
        self.port = self._srv.getsockname()[1]
        self._on_goto = on_goto
        self._on_cancel = on_cancel
        self._get_pose = get_pose
        self._get_state = get_state
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        try:
            # Unblock accept().
            socket.create_connection(("127.0.0.1", self.port), timeout=0.5).close()
        except OSError:
            pass
        self._srv.close()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        with conn, conn.makefile("rw", encoding="utf-8", newline="\n") as f:
            for line in f:
                if self._stop.is_set():
                    return
                reply = self._dispatch(line.strip())
                if reply is not None:
                    f.write(reply + "\n")
                    f.flush()

    def _dispatch(self, line: str) -> str | None:
        parts = line.split()
        if not parts:
            return None
        cmd = parts[0].upper()
        if cmd == "PING":
            return "PONG"
        if cmd == "GOTO" and len(parts) == 3 and self._on_goto:
            try:
                self._on_goto(float(parts[1]), float(parts[2]))
                return "OK"
            except ValueError:
                return "ERR bad args"
        if cmd == "CANCEL" and self._on_cancel:
            self._on_cancel()
            return "OK"
        if cmd == "POSE" and self._get_pose:
            x, y, th = self._get_pose()
            return f"POSE {x:.4f} {y:.4f} {th:.4f}"
        if cmd == "STATE" and self._get_state:
            return f"STATE {self._get_state()}"
        return "ERR unknown"
