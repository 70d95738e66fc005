"""Viewer bridge — SIBR-compatible TCP server.

Parity target: reference `gaussian_renderer/network_gui.py` (wire
protocol: 4-byte little-endian length + JSON camera message in, raw RGB
bytes + length-prefixed verify string out), polled from the training
loop. The render callback is injected so the bridge stays independent
of the scene state (the reference renders inline at train.py:293-309).
"""

from __future__ import annotations

import json
import socket
from typing import Callable, Optional

import numpy as np


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self):
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def _send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def poll(self, render_fn: Callable[[dict], np.ndarray],
             verify: str = "") -> bool:
        """One poll step (call per training iteration, train.py:293-309).

        render_fn receives the decoded camera message (with view_matrix
        sign-flip already applied like MiniCam) and returns an [H, W, 3]
        float image in [0, 1]. Returns keep-training flag.
        """
        if self.conn is None:
            self.try_connect()
        do_training = True
        while self.conn is not None:
            try:
                msg = self._read()
                width, height = msg["resolution_x"], msg["resolution_y"]
                img_bytes = None
                if width and height:
                    view = np.asarray(msg["view_matrix"],
                                      np.float32).reshape(4, 4)
                    view[:, 1] *= -1
                    view[:, 2] *= -1
                    msg["_w2c"] = view.T  # our convention: plain w2c
                    img = render_fn(msg)
                    img_bytes = memoryview(
                        (np.clip(img, 0, 1) * 255).astype(np.uint8)).tobytes()
                    do_training = bool(msg.get("train", True))
                self._send(img_bytes, verify)
                if do_training and not bool(msg.get("keep_alive", False)):
                    break
            except Exception:
                self.conn = None
        return do_training
