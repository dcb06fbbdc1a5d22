"""Legacy Caffe-LMDB ``Datum`` ingestion — the reference's
``tf_pose/datum_pb2.py`` path rebuilt.

The reference ships a protoc-generated ``datum_pb2.py`` (the public
Caffe ``Datum`` schema) used by its legacy LMDB COCO packing
(`pose_dataset.py`'s pre-json data path). This module provides the
same capability, TPU-rebuild style:

- :mod:`tfpose_tpu.compat.datum_pb2` is generated from
  ``compat/proto/datum.proto`` (same public schema, wire-compatible).
- ``pack_datum`` / ``unpack_datum`` convert one training sample
  (BGR image + per-person 18-part joints) to/from a ``Datum``. The
  image rides ``data`` (PNG-encoded when ``encoded``, raw CHW planes
  otherwise); keypoints ride ``float_data`` as
  ``[n_people, 18*2*n_people floats row-major, NaN for missing]``.
  NOTE: the original CMU meta-channel packing (image + a float-packed
  metadata plane inside ``data``) is not reconstructable without the
  reference mount; this packing is the documented substitute and a
  writer is provided, so the path round-trips (PARITY.md §2.3).
- ``write_datum_shard`` / ``DatumShardReader``: a single-file,
  length-prefixed record store — the LMDB-free fallback (the sandbox
  has no ``lmdb`` module), byte-for-byte the same Datum payloads.
- ``write_lmdb`` / ``LmdbDatumReader``: real LMDB, import-gated.
- ``DatumPoseDataset``: drop-in for :class:`PoseDataset` — same
  augment chain and stride-8 rasterizers, fed from Datum records
  instead of files on disk.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np

from tfpose_tpu.train.dataset import PoseDataset

try:  # pragma: no cover - exercised only where lmdb exists
    import lmdb  # type: ignore

    HAS_LMDB = True
except ImportError:  # pragma: no cover
    lmdb = None
    HAS_LMDB = False


def _datum_mod():
    from tfpose_tpu.compat import datum_pb2

    return datum_pb2


# ---------------------------------------------------------------------------
# sample <-> Datum
# ---------------------------------------------------------------------------

def pack_datum(img_bgr: np.ndarray, joints: np.ndarray,
               encoded: bool = True):
    """(H, W, 3) uint8 BGR + (n_people, 18, 2) float joints -> Datum."""
    import cv2

    datum_pb2 = _datum_mod()
    if img_bgr.dtype != np.uint8 or img_bgr.ndim != 3:
        raise ValueError("expected HWC uint8 BGR image")
    h, w, c = img_bgr.shape
    d = datum_pb2.Datum(channels=c, height=h, width=w, encoded=encoded)
    if encoded:
        ok, buf = cv2.imencode(".png", img_bgr)
        if not ok:
            raise ValueError("png encode failed")
        d.data = buf.tobytes()
    else:
        # Caffe raw layout: CHW planes
        d.data = np.ascontiguousarray(
            img_bgr.transpose(2, 0, 1)).tobytes()
    joints = np.asarray(joints, dtype=np.float32)
    if joints.size and joints.shape[1:] != (18, 2):
        raise ValueError("joints must be (n_people, 18, 2)")
    d.label = int(joints.shape[0]) if joints.size else 0
    d.float_data.append(float(joints.shape[0] if joints.size else 0))
    d.float_data.extend(joints.ravel().tolist())  # NaN survives proto
    return d


def unpack_datum(d) -> Tuple[np.ndarray, np.ndarray]:
    """Datum -> ((H, W, 3) uint8 BGR, (n_people, 18, 2) float joints)."""
    import cv2

    if d.encoded:
        img = cv2.imdecode(
            np.frombuffer(d.data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("image decode failed")
    else:
        img = np.frombuffer(d.data, np.uint8).reshape(
            d.channels, d.height, d.width).transpose(1, 2, 0)
        img = np.ascontiguousarray(img)
    fd = np.asarray(d.float_data, dtype=np.float32)
    if fd.size == 0:
        return img, np.zeros((0, 18, 2), np.float32)
    n = int(fd[0])
    joints = fd[1:1 + n * 36].reshape(n, 18, 2).astype(np.float64)
    return img, joints


# ---------------------------------------------------------------------------
# record stores
# ---------------------------------------------------------------------------

_MAGIC = b"TPDS"  # shard header


def write_datum_shard(path: str,
                      samples: Iterable[Tuple[np.ndarray, np.ndarray]],
                      encoded: bool = True) -> int:
    """Write (img, joints) samples as a length-prefixed Datum shard."""
    n = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        for img, joints in samples:
            payload = pack_datum(img, joints,
                                 encoded=encoded).SerializeToString()
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)
            n += 1
    return n


class DatumShardReader:
    """Random-access reader over a length-prefixed Datum shard file."""

    def __init__(self, path: str):
        self.path = path
        self._offsets: List[Tuple[int, int]] = []
        with open(path, "rb") as f:
            if f.read(4) != _MAGIC:
                raise ValueError(f"{path}: not a datum shard")
            while True:
                hdr = f.read(4)
                if not hdr:
                    break
                (ln,) = struct.unpack("<I", hdr)
                self._offsets.append((f.tell(), ln))
                f.seek(ln, 1)

    def __len__(self) -> int:
        return len(self._offsets)

    def read(self, i: int):
        datum_pb2 = _datum_mod()
        off, ln = self._offsets[i]
        with open(self.path, "rb") as f:
            f.seek(off)
            payload = f.read(ln)
        d = datum_pb2.Datum()
        d.ParseFromString(payload)
        return d

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self.read(i)


def write_lmdb(path: str,
               samples: Iterable[Tuple[np.ndarray, np.ndarray]],
               encoded: bool = True,
               map_size: int = 1 << 30) -> int:  # pragma: no cover
    """Write samples into a real LMDB (requires the lmdb module)."""
    if not HAS_LMDB:
        raise ImportError("lmdb is not available in this environment; "
                          "use write_datum_shard instead")
    env = lmdb.open(path, map_size=map_size)
    n = 0
    with env.begin(write=True) as txn:
        for img, joints in samples:
            key = f"{n:08d}".encode()
            txn.put(key, pack_datum(img, joints,
                                    encoded=encoded).SerializeToString())
            n += 1
    env.close()
    return n


class LmdbDatumReader:  # pragma: no cover - needs the lmdb module
    """Sequential-key LMDB reader matching ``write_lmdb``'s layout."""

    def __init__(self, path: str):
        if not HAS_LMDB:
            raise ImportError("lmdb is not available in this environment")
        self.env = lmdb.open(path, readonly=True, lock=False)
        with self.env.begin() as txn:
            self._n = txn.stat()["entries"]

    def __len__(self) -> int:
        return self._n

    def read(self, i: int):
        datum_pb2 = _datum_mod()
        with self.env.begin() as txn:
            payload = txn.get(f"{i:08d}".encode())
        d = datum_pb2.Datum()
        d.ParseFromString(payload)
        return d

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self.read(i)


# ---------------------------------------------------------------------------
# PoseDataset over Datum records
# ---------------------------------------------------------------------------

class DatumPoseDataset(PoseDataset):
    """`PoseDataset` fed from Datum records (shard or LMDB reader).

    Same augment chain + rasterizers as the json path; only the image/
    joint acquisition differs (decoded from the record store instead of
    read from disk).
    """

    def __init__(self, reader, **kwargs):
        self.reader = reader
        super().__init__(annotations=list(range(len(reader))), **kwargs)

    def _load_one(self, idx: int):  # type: ignore[override]
        img, joints = unpack_datum(self.reader.read(idx))
        return self._prepare(img, joints.copy())
