"""Legacy Caffe-Datum path (reference ``tf_pose/datum_pb2.py`` +
the LMDB packing in ``pose_dataset.py``'s pre-json data layer):
wire-format pin, sample round-trip, shard store, PoseDataset feed,
and train-CLI integration."""

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tfpose_tpu.train.lmdb_dataset import (  # noqa: E402
    DatumPoseDataset,
    DatumShardReader,
    pack_datum,
    unpack_datum,
    write_datum_shard,
)


def _scene(rng, h=64, w=80, n=2):
    from tfpose_tpu.utils import synthetic

    people = synthetic.random_people(rng, n, h, w,
                                     template=synthetic.SPREAD_TEMPLATE)
    img = synthetic.render_image(people, h, w, rng)
    # float_data carries fp32; quantize up front so the file path and
    # the datum path rasterise identical targets
    return img, people.astype(np.float32).astype(np.float64)


def test_datum_wire_format_is_caffe_schema():
    """Field numbers/wire types must match the public Caffe Datum
    schema (what the reference's generated datum_pb2 speaks), so
    payloads interoperate with any Caffe-era producer."""
    from tfpose_tpu.compat import datum_pb2

    d = datum_pb2.Datum(channels=3, height=4, width=5, data=b"xyz",
                        label=7, encoded=True)
    d.float_data.append(1.5)
    raw = d.SerializeToString()
    # tag bytes: field<<3 | wiretype. varint=0, fixed32=5, bytes=2.
    assert bytes([1 << 3 | 0]) + b"\x03" in raw          # channels=3
    assert bytes([2 << 3 | 0]) + b"\x04" in raw          # height=4
    assert bytes([3 << 3 | 0]) + b"\x05" in raw          # width=5
    assert bytes([4 << 3 | 2]) + b"\x03xyz" in raw       # data
    assert bytes([5 << 3 | 0]) + b"\x07" in raw          # label=7
    assert (bytes([6 << 3 | 5]) + struct.pack("<f", 1.5) in raw
            or bytes([6 << 3 | 2]) in raw)               # float_data
    assert bytes([7 << 3 | 0]) + b"\x01" in raw          # encoded=True

    # and a hand-built payload parses back
    hand = (bytes([1 << 3 | 0]) + b"\x02"
            + bytes([2 << 3 | 0]) + b"\x08"
            + bytes([3 << 3 | 0]) + b"\x09"
            + bytes([4 << 3 | 2]) + b"\x02ab")
    e = datum_pb2.Datum()
    e.ParseFromString(hand)
    assert (e.channels, e.height, e.width, e.data) == (2, 8, 9, b"ab")
    assert not e.encoded  # proto2 default


@pytest.mark.parametrize("encoded", [True, False])
def test_pack_unpack_roundtrip(rng, encoded):
    img, joints = _scene(rng)
    d = pack_datum(img, joints, encoded=encoded)
    img2, joints2 = unpack_datum(d)
    np.testing.assert_array_equal(img, img2)   # png is lossless
    np.testing.assert_allclose(joints, joints2, atol=1e-6)
    assert d.label == joints.shape[0]


def test_pack_preserves_missing_joints(rng):
    img, joints = _scene(rng)
    joints[0, 3] = np.nan  # a missing part must survive the trip
    _, joints2 = unpack_datum(pack_datum(img, joints))
    assert np.isnan(joints2[0, 3]).all()
    np.testing.assert_allclose(joints[np.isfinite(joints)],
                               joints2[np.isfinite(joints2)], atol=1e-6)


def test_shard_write_read(tmp_path, rng):
    samples = [_scene(rng, n=1 + i % 3) for i in range(5)]
    path = str(tmp_path / "train.datumshard")
    assert write_datum_shard(path, samples) == 5
    reader = DatumShardReader(path)
    assert len(reader) == 5
    # random access, out of order
    for i in [3, 0, 4, 2, 1]:
        img, joints = unpack_datum(reader.read(i))
        np.testing.assert_array_equal(img, samples[i][0])
        np.testing.assert_allclose(joints, samples[i][1], atol=1e-6)
    # non-shard file is rejected
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"nope")
    with pytest.raises(ValueError):
        DatumShardReader(str(bad))


def test_datum_pose_dataset_matches_file_path(tmp_path, rng):
    """The Datum feed must produce byte-identical batches to the
    json/file path on the same underlying samples (augment off)."""
    import cv2

    from tfpose_tpu.train.dataset import Annotation, PoseDataset

    samples = [_scene(rng) for _ in range(4)]
    shard = str(tmp_path / "s.datumshard")
    write_datum_shard(shard, samples)

    anns = []
    for i, (img, joints) in enumerate(samples):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, img)
        anns.append(Annotation(img_path=p, width=img.shape[1],
                               height=img.shape[0], joints=joints))

    kw = dict(input_size=(64, 64), batch_size=2, augment=False, seed=3)
    ds_file = PoseDataset(anns, **kw)
    ds_datum = DatumPoseDataset(DatumShardReader(shard), **kw)
    for bf, bd in zip(ds_file, ds_datum):
        for k in ("image", "heat", "paf"):
            np.testing.assert_array_equal(bf[k], bd[k])


def test_train_cli_datum_shard(tmp_path, rng):
    """train.py --datum-shard runs the full legacy-format path."""
    import train as train_cli

    shard = str(tmp_path / "train.datumshard")
    write_datum_shard(shard, [_scene(rng, h=32, w=32, n=1)
                              for _ in range(8)])
    state = train_cli.main([
        "--model", "mobilenet_thin",
        "--input-size", "32x32",
        "--batchsize", "4",
        "--max-steps", "2",
        "--log-every", "1",
        "--mesh-data", "4",
        "--datum-shard", shard,
    ])
    assert int(state.step) == 2
