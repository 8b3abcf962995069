"""Minimal bincode (v2, standard config) reader/writer.

The reference serializes models with Rust's ``bincode::config::standard()``
(/root/reference/vaporetto/src/model.rs:99-153): little-endian, variable-width
integers, zigzag for signed. We implement exactly the subset the model schema
needs so the reference's distribution model files load unchanged, and our
writes round-trip byte-identically.

Varint layout (unsigned): ``x < 251`` one byte; ``0xFB`` + u16 LE;
``0xFC`` + u32 LE; ``0xFD`` + u64 LE. Signed values are zigzag-encoded first.
"""

from __future__ import annotations

import struct
from typing import List

from ..errors import invalid_model

__all__ = ["Reader", "Writer"]

_U16 = struct.Struct("<H")
_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")


class Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read_bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise invalid_model("unexpected end of model data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.read_bytes(1)[0]

    def varu64(self) -> int:
        b = self.u8()
        if b < 0xFB:
            return b
        if b == 0xFB:
            return _U16.unpack(self.read_bytes(2))[0]
        if b == 0xFC:
            return _U32.unpack(self.read_bytes(4))[0]
        if b == 0xFD:
            return _U64.unpack(self.read_bytes(8))[0]
        raise invalid_model("unsupported varint width")

    def i32(self) -> int:
        e = self.varu64()
        v = (e >> 1) ^ -(e & 1)
        if not -(2**31) <= v < 2**31:
            raise invalid_model("i32 out of range")
        return v

    def i64(self) -> int:
        e = self.varu64()
        return (e >> 1) ^ -(e & 1)

    def string(self) -> str:
        n = self.varu64()
        return self.read_bytes(n).decode("utf-8")

    def byte_vec(self) -> bytes:
        n = self.varu64()
        return self.read_bytes(n)

    def i32_vec(self) -> List[int]:
        n = self.varu64()
        return [self.i32() for _ in range(n)]


class Writer:
    def __init__(self):
        self.buf = bytearray()

    def u8(self, v: int) -> None:
        self.buf.append(v & 0xFF)

    def varu64(self, v: int) -> None:
        if v < 0xFB:
            self.buf.append(v)
        elif v <= 0xFFFF:
            self.buf.append(0xFB)
            self.buf += _U16.pack(v)
        elif v <= 0xFFFFFFFF:
            self.buf.append(0xFC)
            self.buf += _U32.pack(v)
        else:
            self.buf.append(0xFD)
            self.buf += _U64.pack(v)

    def i32(self, v: int) -> None:
        self.varu64(((v << 1) ^ (v >> 31)) & 0xFFFFFFFFFFFFFFFF if v < 0 else (v << 1))

    def string(self, s: str) -> None:
        b = s.encode("utf-8")
        self.varu64(len(b))
        self.buf += b

    def byte_vec(self, b: bytes) -> None:
        self.varu64(len(b))
        self.buf += bytes(b)

    def i32_vec(self, xs) -> None:
        self.varu64(len(xs))
        for x in xs:
            self.i32(int(x))

    def getvalue(self) -> bytes:
        return bytes(self.buf)
