"""GGUF v2/v3 container reader (mmap, zero-copy tensor access).

Provides what ggml's gguf loader provides to the reference (model metadata
KV store + tensor table + mmap'd payloads; SURVEY.md §7 step 1), implemented
from the public GGUF spec. Duplicate KV keys are tolerated (last wins),
matching the reference's vocab.patch behavior (SURVEY.md §2.4).
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass, field
from typing import Any, BinaryIO

import numpy as np

from .constants import (
    GGMLType,
    GGUFValueType,
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    tensor_nbytes,
)
from .quants import dequantize

_SCALAR_FMT = {
    GGUFValueType.UINT8: ("<B", 1),
    GGUFValueType.INT8: ("<b", 1),
    GGUFValueType.UINT16: ("<H", 2),
    GGUFValueType.INT16: ("<h", 2),
    GGUFValueType.UINT32: ("<I", 4),
    GGUFValueType.INT32: ("<i", 4),
    GGUFValueType.FLOAT32: ("<f", 4),
    GGUFValueType.BOOL: ("<B", 1),
    GGUFValueType.UINT64: ("<Q", 8),
    GGUFValueType.INT64: ("<q", 8),
    GGUFValueType.FLOAT64: ("<d", 8),
}

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.dtype("<u2"),
    GGUFValueType.INT16: np.dtype("<i2"),
    GGUFValueType.UINT32: np.dtype("<u4"),
    GGUFValueType.INT32: np.dtype("<i4"),
    GGUFValueType.FLOAT32: np.dtype("<f4"),
    GGUFValueType.BOOL: np.uint8,
    GGUFValueType.UINT64: np.dtype("<u8"),
    GGUFValueType.INT64: np.dtype("<i8"),
    GGUFValueType.FLOAT64: np.dtype("<f8"),
}


@dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple[int, ...]  # logical shape, row-major (numpy order)
    ggml_type: GGMLType
    offset: int  # relative to data section start
    nbytes: int = 0

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


class _Cursor:
    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated GGUF file")
        self.pos += n
        return bytes(b)

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.read(8))[0]

    def string(self) -> str:
        n = self.u64()
        return self.read(n).decode("utf-8", errors="replace")

    def value(self, vtype: GGUFValueType) -> Any:
        vtype = GGUFValueType(vtype)
        if vtype == GGUFValueType.STRING:
            return self.string()
        if vtype == GGUFValueType.ARRAY:
            etype = GGUFValueType(self.u32())
            count = self.u64()
            if etype == GGUFValueType.STRING:
                return [self.string() for _ in range(count)]
            if etype == GGUFValueType.ARRAY:
                return [self.value(etype) for _ in range(count)]
            np_dtype = _SCALAR_NP[etype]
            nbytes = count * np.dtype(np_dtype).itemsize
            arr = np.frombuffer(self.read(nbytes), dtype=np_dtype, count=count)
            if etype == GGUFValueType.BOOL:
                return arr.astype(bool)
            return arr
        fmt, size = _SCALAR_FMT[vtype]
        v = struct.unpack(fmt, self.read(size))[0]
        if vtype == GGUFValueType.BOOL:
            return bool(v)
        return v


class GGUFFile:
    """Parsed GGUF file with lazy, zero-copy tensor access."""

    def __init__(self, path: str | os.PathLike):
        self.path = str(path)
        self._file: BinaryIO = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        self.tensor_order: list[str] = []
        self._parse()

    def _parse(self) -> None:
        cur = _Cursor(self._mmap)
        if cur.read(4) != GGUF_MAGIC:
            raise ValueError(f"{self.path}: not a GGUF file")
        self.version = cur.u32()
        if self.version not in (2, 3):
            raise ValueError(f"{self.path}: unsupported GGUF version {self.version}")
        n_tensors = cur.u64()
        n_kv = cur.u64()
        for _ in range(n_kv):
            key = cur.string()
            vtype = GGUFValueType(cur.u32())
            self.metadata[key] = cur.value(vtype)  # duplicate keys: last wins
        for _ in range(n_tensors):
            name = cur.string()
            n_dims = cur.u32()
            # GGUF stores dims in ggml order (fastest-varying first);
            # reverse to numpy row-major order.
            dims = [cur.u64() for _ in range(n_dims)]
            ggml_type = GGMLType(cur.u32())
            offset = cur.u64()
            shape = tuple(reversed(dims)) if dims else (1,)
            info = GGUFTensorInfo(name=name, shape=shape, ggml_type=ggml_type, offset=offset)
            info.nbytes = tensor_nbytes(ggml_type, info.n_elements)
            self.tensors[name] = info
            self.tensor_order.append(name)
        alignment = int(self.metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))
        self.alignment = alignment
        self.data_offset = (cur.pos + alignment - 1) // alignment * alignment

    # -- tensor access --------------------------------------------------------

    def tensor_raw(self, name: str) -> np.ndarray:
        """Raw quantized payload bytes as a zero-copy uint8 view."""
        info = self.tensors[name]
        start = self.data_offset + info.offset
        return np.frombuffer(self._mmap, dtype=np.uint8, count=info.nbytes, offset=start)

    def tensor_f32(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        return dequantize(info.ggml_type, self.tensor_raw(name), info.shape)

    def get(self, key: str, default: Any = None) -> Any:
        return self.metadata.get(key, default)

    @property
    def architecture(self) -> str:
        return str(self.metadata.get("general.architecture", ""))

    def arch_kv(self, suffix: str, default: Any = None) -> Any:
        """Look up '<arch>.<suffix>'."""
        return self.metadata.get(f"{self.architecture}.{suffix}", default)

    def close(self) -> None:
        try:
            self._mmap.close()
        finally:
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
