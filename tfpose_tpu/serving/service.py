"""Pose estimation network service — the transport-agnostic equivalent
of the reference ROS node (``scripts/broadcaster_ros.py``: subscribe
image topic -> inference -> publish ``Persons``).

Protocol (TCP, length-prefixed):
  request:  4-byte big-endian length + payload
            payload = 1-byte format tag ('J' jpeg | 'R' raw) +
            for raw: 4B h, 4B w, then h*w*3 uint8 BGR; for jpeg: bytes
  response: 4-byte length + UTF-8 JSON of Persons.to_dict()

A threaded server wraps one estimator; requests are serialised through
the device queue (JAX dispatch is async, so decode of frame N overlaps
the forward of N+1 when multiple clients stream).
"""

from __future__ import annotations

import json
import logging
import socket
import socketserver
import struct
import threading
from typing import Optional, Tuple

import numpy as np

from tfpose_tpu.serving.messages import Persons, humans_to_msg

logger = logging.getLogger("tfpose_tpu.serving")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _decode_payload(payload: bytes) -> Optional[np.ndarray]:
    tag = payload[:1]
    if tag == b"R":
        h, w = struct.unpack(">II", payload[1:9])
        data = np.frombuffer(payload[9:9 + h * w * 3], np.uint8)
        return data.reshape(h, w, 3)
    if tag == b"J":
        import cv2
        arr = np.frombuffer(payload[1:], np.uint8)
        return cv2.imdecode(arr, cv2.IMREAD_COLOR)
    return None


class PoseService:
    """TCP server around a TfPoseEstimator."""

    def __init__(self, estimator, host: str = "127.0.0.1", port: int = 0,
                 upsample_size: float = 4.0, max_batch: int = 1,
                 max_wait_ms: float = 5.0):
        self.estimator = estimator
        self.ratio = upsample_size
        self._batcher = None
        if max_batch > 1:
            from tfpose_tpu.serving.batcher import DynamicBatcher
            self._batcher = DynamicBatcher(
                estimator, max_batch=max_batch, max_wait_ms=max_wait_ms,
                upsample_size=upsample_size)
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                while True:
                    try:
                        (length,) = struct.unpack(
                            ">I", _recv_exact(self.request, 4))
                        payload = _recv_exact(self.request, length)
                    except (ConnectionError, struct.error):
                        return
                    resp = outer._process(payload)
                    data = json.dumps(resp).encode()
                    self.request.sendall(struct.pack(">I", len(data)) + data)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address: Tuple[str, int] = self._server.server_address
        self._thread: Optional[threading.Thread] = None

    def _process(self, payload: bytes) -> dict:
        img = _decode_payload(payload)
        if img is None:
            return {"error": "bad payload (tag must be 'J' or 'R')"}
        if self._batcher is not None:
            # concurrent client threads coalesce into one device batch
            humans = self._batcher.submit(img).result()
        else:
            humans = self.estimator.inference(
                img, resize_to_default=True, upsample_size=self.ratio)
        msg = humans_to_msg(humans, img.shape[1], img.shape[0])
        return msg.to_dict()

    def start(self) -> Tuple[str, int]:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        logger.info("PoseService on %s:%d", *self.address)
        return self.address

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._batcher is not None:
            self._batcher.stop()


class PoseClient:
    """Client for PoseService."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))

    def infer_raw(self, img: np.ndarray) -> Persons:
        h, w = img.shape[:2]
        payload = (b"R" + struct.pack(">II", h, w)
                   + np.ascontiguousarray(img, np.uint8).tobytes())
        return self._roundtrip(payload)

    def infer_jpeg(self, jpeg_bytes: bytes) -> Persons:
        return self._roundtrip(b"J" + jpeg_bytes)

    def _roundtrip(self, payload: bytes) -> Persons:
        self._sock.sendall(struct.pack(">I", len(payload)) + payload)
        (length,) = struct.unpack(">I", _recv_exact(self._sock, 4))
        d = json.loads(_recv_exact(self._sock, length))
        if "error" in d:
            raise ValueError(d["error"])
        return Persons.from_dict(d)

    def close(self):
        self._sock.close()
