"""Tensor-file I/O byte-compatible with the reference's ``.pt`` convention.

``SpectDataSet`` directories store one tensor per utterance as a file written
by ``torch.save`` (reference ``_datasets.py:268-680``). To keep those
directories interchangeable we read and write the same format. When torch is
importable (it is an *optional* dependency, used for I/O only — never for
compute) we delegate to it; otherwise a self-contained implementation handles
the modern zipfile ``.pt`` format for single tensors.

The pure-Python path understands torch's zip container: ``<name>/data.pkl``
(a pickle whose persistent IDs are ``('storage', StorageType, key, location,
numel)``) plus raw little-endian buffers at ``<name>/data/<key>``.
"""

import io
import os
import pickle
import struct
import zipfile
from typing import NamedTuple, Optional, Tuple

import numpy as np

__all__ = ["load_tensor", "save_tensor", "tensor_entry", "TensorEntry"]

try:  # I/O-only optional dependency
    import torch as _torch
except ImportError:  # pragma: no cover
    _torch = None

_STORAGE_TO_DTYPE = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}
_DTYPE_TO_STORAGE = {
    np.dtype("float32"): ("FloatStorage", "torch.float32"),
    np.dtype("float64"): ("DoubleStorage", "torch.float64"),
    np.dtype("float16"): ("HalfStorage", "torch.float16"),
    np.dtype("int64"): ("LongStorage", "torch.int64"),
    np.dtype("int32"): ("IntStorage", "torch.int32"),
    np.dtype("int16"): ("ShortStorage", "torch.int16"),
    np.dtype("int8"): ("CharStorage", "torch.int8"),
    np.dtype("uint8"): ("ByteStorage", "torch.uint8"),
    np.dtype("bool"): ("BoolStorage", "torch.bool"),
}


class _StorageStub:
    def __init__(self, name: str):
        self.name = name


class _TorchUnpickler(pickle.Unpickler):
    """Unpickles a torch data.pkl without torch, materializing numpy arrays."""

    def __init__(self, file, archive: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._archive = archive
        self._prefix = prefix

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name.endswith("Storage"):
            return _StorageStub(name)
        if module == "collections":
            import collections

            return getattr(collections, name)
        raise pickle.UnpicklingError(
            f"pure-python .pt reader cannot resolve {module}.{name}"
        )

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[:5]
        assert typename == "storage"
        if isinstance(storage_type, _StorageStub):
            dtype = _STORAGE_TO_DTYPE[storage_type.name]
        else:  # torch.dtype-tagged TypedStorage path (torch >= 1.13 writes this)
            dtype = _STORAGE_TO_DTYPE[str(storage_type).split(".")[-1]]
        data = self._archive.read(f"{self._prefix}/data/{key}")
        return np.frombuffer(data, dtype=dtype, count=numel)


def _rebuild_tensor_v2(storage, offset, size, stride, *args):
    if size:
        # torch strides are in elements; build via as_strided on a copy
        arr = np.lib.stride_tricks.as_strided(
            storage[offset:],
            shape=tuple(size),
            strides=tuple(s * storage.dtype.itemsize for s in stride),
        )
    else:
        arr = storage[offset]
    return np.array(arr)  # own the memory


def _load_pure(path) -> np.ndarray:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl[: -len("/data.pkl")]
        with zf.open(pkl) as f:
            obj = _TorchUnpickler(f, zf, prefix).load()
    return np.asarray(obj)


class _FakeStorageClass:
    """Pickles as ``torch.FloatStorage`` etc. via explicit reduce."""


def _save_pure(arr: np.ndarray, path) -> None:
    shape = np.asarray(arr).shape
    # ascontiguousarray promotes 0-d to (1,); restore the true shape so
    # scalar tensors round-trip with shape () (the torch path guards the
    # same wart with .reshape(arr.shape))
    arr = np.ascontiguousarray(arr).reshape(shape)
    if arr.dtype not in _DTYPE_TO_STORAGE:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    storage_name, _ = _DTYPE_TO_STORAGE[arr.dtype]
    buf = io.BytesIO()
    # Hand-assemble the pickle: torch._utils._rebuild_tensor_v2(
    #   pid('storage', torch.XStorage, '0', 'cpu', numel), 0, size, stride,
    #   False, OrderedDict())
    def _global(module, name):
        return (module + "\n" + name + "\n").encode()

    numel = arr.size
    out = bytearray()
    out += b"\x80\x02"  # PROTO 2
    out += b"c" + _global("torch._utils", "_rebuild_tensor_v2")
    out += b"("  # MARK
    # persistent id tuple -> BINPERSID expects the pid object on stack
    out += b"("  # MARK for pid tuple
    out += b"X" + struct.pack("<I", 7) + b"storage"
    out += b"c" + _global("torch", storage_name)
    out += b"X" + struct.pack("<I", 1) + b"0"
    out += b"X" + struct.pack("<I", 3) + b"cpu"
    out += b"J" + struct.pack("<i", numel)
    out += b"t"  # TUPLE
    out += b"Q"  # BINPERSID
    out += b"K\x00" if numel < 0 else b"J" + struct.pack("<i", 0)  # offset 0
    for tup in (arr.shape, tuple(s // arr.itemsize for s in arr.strides)):
        out += b"("
        for v in tup:
            out += b"J" + struct.pack("<i", v)
        out += b"t"
    out += b"\x89"  # NEWFALSE (requires_grad)
    out += b"ccollections\nOrderedDict\n)R"  # empty OrderedDict backward hooks
    out += b"t"  # TUPLE -> args
    out += b"R"  # REDUCE
    out += b"."  # STOP
    buf.write(bytes(out))

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", arr.tobytes())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")


class TensorEntry(NamedTuple):
    """Where a ``.pt`` file's tensor payload lives, for direct byte reads.

    ``payload_offset`` is the absolute byte offset of the (C-contiguous,
    little-endian) tensor data within the file; a reader that fills an
    ``np.empty(shape, dtype)`` buffer with ``nbytes`` bytes from that offset
    reproduces :func:`load_tensor` exactly. Produced by
    :func:`tensor_entry`; consumed by :mod:`pydrobert_tpu.native`'s threaded
    batch reader.
    """

    payload_offset: int
    dtype: np.dtype
    shape: Tuple[int, ...]

    @property
    def nbytes(self) -> int:
        n = self.dtype.itemsize
        for s in self.shape:
            n *= s
        return n


class _TensorDesc:
    def __init__(self, dtype, key, numel):
        self.dtype, self.key, self.numel = dtype, key, numel


class _HeaderUnpickler(pickle.Unpickler):
    """Unpickles a torch data.pkl WITHOUT reading storage payloads."""

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _header_rebuild
        if name.endswith("Storage"):
            return _StorageStub(name)
        if module == "collections":
            import collections

            return getattr(collections, name)
        raise pickle.UnpicklingError(
            f"header reader cannot resolve {module}.{name}"
        )

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[:5]
        assert typename == "storage"
        if isinstance(storage_type, _StorageStub):
            dtype = _STORAGE_TO_DTYPE[storage_type.name]
        else:
            dtype = _STORAGE_TO_DTYPE[str(storage_type).split(".")[-1]]
        return _TensorDesc(dtype, key, numel)


def _header_rebuild(storage, offset, size, stride, *args):
    if not isinstance(storage, _TensorDesc):
        raise pickle.UnpicklingError("unexpected storage object")
    # only C-contiguous, zero-offset views are direct byte reads (empty
    # tensors read zero bytes, so any stride qualifies)
    expect, acc = [], 1
    for s in reversed(tuple(size)):
        expect.append(acc)
        acc *= s
    contiguous = (
        tuple(stride) == tuple(reversed(expect)) or acc == 0
    ) and offset == 0
    return (storage, tuple(size), contiguous)


def tensor_entry(path_or_fileobj) -> Optional[TensorEntry]:
    """Header-only parse of a single-tensor ``.pt`` zip file.

    Accepts a path or a seekable binary file object (e.g. an uncompressed
    tar member); offsets are relative to the object's byte 0. Returns where
    the raw payload bytes live (see :class:`TensorEntry`), or ``None`` when
    the file can't be read as one contiguous byte range (legacy non-zip
    format, deflated entries, strided/offset tensors, non-tensor pickles)
    — callers then fall back to :func:`load_tensor`.
    """
    try:
        if isinstance(path_or_fileobj, (str, os.PathLike)):
            with open(path_or_fileobj, "rb") as raw:
                return tensor_entry(raw)
        raw = path_or_fileobj
        with zipfile.ZipFile(raw) as zf:
            names = zf.namelist()
            pkl = next(
                (n for n in names if n.endswith("/data.pkl")), None
            )
            if pkl is None:
                return None
            prefix = pkl[: -len("/data.pkl")]
            with zf.open(pkl) as f:
                obj = _HeaderUnpickler(f).load()
            if not (isinstance(obj, tuple) and len(obj) == 3):
                return None
            desc, shape, contiguous = obj
            if not (isinstance(desc, _TensorDesc) and contiguous):
                return None
            numel = 1
            for s in shape:
                numel *= s
            if numel > desc.numel:
                return None
            info = zf.getinfo(f"{prefix}/data/{desc.key}")
            if info.compress_type != zipfile.ZIP_STORED:
                return None
        # the local header's name/extra lengths may differ from the central
        # directory's; read them to find where the payload starts
        raw.seek(info.header_offset)
        hdr = raw.read(30)
        if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
            return None
        name_len = int.from_bytes(hdr[26:28], "little")
        extra_len = int.from_bytes(hdr[28:30], "little")
        payload = info.header_offset + 30 + name_len + extra_len
        return TensorEntry(payload, desc.dtype, tuple(shape))
    except Exception:
        return None


def load_tensor(path, allow_object: bool = False) -> np.ndarray:
    """Load a ``.pt`` tensor file as a numpy array."""
    if _torch is not None:
        t = _torch.load(path, map_location="cpu", weights_only=not allow_object)
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)
    return _load_pure(path)


def save_tensor(arr, path) -> None:
    """Save an array as a ``.pt`` file loadable by ``torch.load``."""
    arr = np.asarray(arr)
    d = os.path.dirname(str(path))
    if d:
        os.makedirs(d, exist_ok=True)
    if _torch is not None:
        # .reshape: some torch versions promote 0-d numpy arrays to shape (1,)
        t = _torch.from_numpy(np.ascontiguousarray(arr)).reshape(arr.shape)
        _torch.save(t, str(path))
    else:
        _save_pure(arr, path)
