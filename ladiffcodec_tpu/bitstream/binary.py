"""ECDC container format + bit packing.

Counterpart of reference srcs/encodec/binary.py: the `ECDC` magic + version
byte + uint32 JSON-metadata header, and BitPacker/BitUnpacker for non-byte-
aligned code widths.  The stream format is BIT-EXACT with the reference
(little-endian-within-byte accumulation, flush emits the partial byte), so
.ecdc files interoperate.

A C++ fast path (see native/) packs whole frames at once; this module is the
readable reference and the fallback.
"""

from __future__ import annotations

import io
import json
import struct
import typing as tp

_encodec_header_struct = struct.Struct("!4sBI")
_ENCODEC_MAGIC = b"ECDC"


def write_ecdc_header(fo: tp.IO[bytes], metadata: tp.Any) -> None:
    meta_dumped = json.dumps(metadata).encode("utf-8")
    header = _encodec_header_struct.pack(_ENCODEC_MAGIC, 0, len(meta_dumped))
    fo.write(header)
    fo.write(meta_dumped)
    fo.flush()


def _read_exactly(fo: tp.IO[bytes], size: int) -> bytes:
    buf = b""
    while len(buf) < size:
        new_buf = fo.read(size)
        if not new_buf:
            raise EOFError(
                f"Impossible to read enough data from the stream, {size} bytes remaining."
            )
        buf += new_buf
        size -= len(new_buf)
    return buf


def read_ecdc_header(fo: tp.IO[bytes]):
    header_bytes = _read_exactly(fo, _encodec_header_struct.size)
    magic, version, meta_size = _encodec_header_struct.unpack(header_bytes)
    if magic != _ENCODEC_MAGIC:
        raise ValueError("File is not in ECDC format.")
    if version != 0:
        raise ValueError("Version not supported.")
    return json.loads(_read_exactly(fo, meta_size).decode("utf-8"))


class BitPacker:
    """Push fixed-width ints, emit bytes LSB-first (reference binary.py:55-88)."""

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        self._current_value = 0
        self._current_bits = 0
        self.bits = bits
        self.fo = fo

    def push(self, value: int) -> None:
        self._current_value += value << self._current_bits
        self._current_bits += self.bits
        while self._current_bits >= 8:
            self.fo.write(bytes([self._current_value & 0xFF]))
            self._current_bits -= 8
            self._current_value >>= 8

    def flush(self) -> None:
        if self._current_bits:
            self.fo.write(bytes([self._current_value]))
            self._current_value = 0
            self._current_bits = 0
        self.fo.flush()


class BitUnpacker:
    """Inverse of BitPacker (reference binary.py:91-122)."""

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        self.bits = bits
        self.fo = fo
        self._mask = (1 << bits) - 1
        self._current_value = 0
        self._current_bits = 0

    def pull(self) -> tp.Optional[int]:
        while self._current_bits < self.bits:
            buf = self.fo.read(1)
            if not buf:
                return None
            self._current_value += buf[0] << self._current_bits
            self._current_bits += 8
        out = self._current_value & self._mask
        self._current_value >>= self.bits
        self._current_bits -= self.bits
        return out


def pack_codes(codes: tp.Sequence[int], bits: int) -> bytes:
    """Vector helper: pack a whole code sequence at once."""
    buf = io.BytesIO()
    packer = BitPacker(bits, buf)
    for c in codes:
        packer.push(int(c))
    packer.flush()
    return buf.getvalue()


def unpack_codes(data: bytes, bits: int, count: int) -> tp.List[int]:
    buf = io.BytesIO(data)
    unpacker = BitUnpacker(bits, buf)
    out = []
    for _ in range(count):
        v = unpacker.pull()
        if v is None:
            raise EOFError("stream ended early")
        out.append(v)
    return out
