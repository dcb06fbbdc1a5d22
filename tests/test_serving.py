"""Serving stack tests: messages, TCP service round-trip, data worker."""

import numpy as np
import pytest

from tfpose_tpu.core.types import BodyPart, Human
from tfpose_tpu.serving import (
    PoseClient,
    PoseService,
    Persons,
    humans_to_msg,
)


def _mk_human():
    h = Human()
    h.body_parts[0] = BodyPart("0-0", 0, 0.5, 0.25, 0.9)
    h.body_parts[1] = BodyPart("0-1", 1, 0.5, 0.40, 0.8)
    h.score = 1.5
    return h


def test_messages_roundtrip():
    msg = humans_to_msg([_mk_human()], 640, 480)
    d = msg.to_dict()
    back = Persons.from_dict(d)
    assert back.image_w == 640 and back.image_h == 480
    assert len(back.persons) == 1
    parts = {bp.part_id: bp for bp in back.persons[0].body_part}
    assert parts[0].x == 0.5 and parts[1].y == 0.40


def test_pose_service_roundtrip():
    from tfpose_tpu.estimator import TfPoseEstimator

    e = TfPoseEstimator("mobilenet_thin", target_size=(96, 80))
    svc = PoseService(e, port=0, upsample_size=2.0)
    host, port = svc.start()
    try:
        client = PoseClient(host, port)
        img = np.random.default_rng(0).integers(
            0, 255, (80, 96, 3), np.uint8)
        msg = client.infer_raw(img)
        assert msg.image_w == 96 and msg.image_h == 80
        assert isinstance(msg.persons, list)
        # second request on same connection
        msg2 = client.infer_raw(img)
        assert msg2.image_w == 96
        client.close()
    finally:
        svc.stop()


def test_pose_service_bad_payload():
    from tfpose_tpu.estimator import TfPoseEstimator

    e = TfPoseEstimator("mobilenet_thin", target_size=(96, 80))
    svc = PoseService(e, port=0)
    host, port = svc.start()
    try:
        import socket
        import struct

        s = socket.create_connection((host, port))
        payload = b"X" + b"garbage"
        s.sendall(struct.pack(">I", len(payload)) + payload)
        hdr = s.recv(4)
        (ln,) = struct.unpack(">I", hdr)
        import json
        resp = json.loads(s.recv(ln))
        assert "error" in resp
        s.close()
    finally:
        svc.stop()


def test_dataworker_stream():
    from tfpose_tpu.train.dataworker import RemoteBatches, serve_batches

    def gen():
        for i in range(100):
            yield {"image": np.full((2, 4, 4, 3), i, np.float32),
                   "heat": np.zeros((2, 1, 1, 19), np.float32)}

    addr, stop = serve_batches(gen(), port=0)
    rb = RemoteBatches([addr])
    it = iter(rb)
    b0 = next(it)
    b1 = next(it)
    assert b0["image"].shape == (2, 4, 4, 3)
    assert float(b0["image"][0, 0, 0, 0]) == 0.0
    assert float(b1["image"][0, 0, 0, 0]) == 1.0
    rb.close()
    stop()
