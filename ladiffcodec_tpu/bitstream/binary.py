"""ECDC container header + sub-byte code packing.

Wire format (must interoperate byte-for-byte with reference
srcs/encodec/binary.py, which defines it):

* header: magic ``b"ECDC"`` | version u8 | big-endian u32 byte-length of a
  UTF-8 JSON metadata blob | the blob itself.
* packed codes: fixed-width integers accumulated LSB-first into bytes;
  ``flush`` emits any trailing partial byte zero-padded at the top, so a
  reader may see up to ``8 // bits`` ghost values at end-of-stream.

The format originates in Meta AI's EnCodec (github.com/facebookresearch/
encodec, MIT license).  This module is an independent implementation of
that wire format; only the on-stream bytes are shared with the original.

A C++ fast path (see native/) packs whole frames at once; this module is
the streaming implementation and the cross-check.
"""

from __future__ import annotations

import io
import json
import typing as tp

_MAGIC = b"ECDC"
_VERSION = 0
_HEADER_FIXED = len(_MAGIC) + 1 + 4  # magic, version byte, u32 length


def write_ecdc_header(fo: tp.IO[bytes], metadata: tp.Any) -> None:
    """Serialize ``metadata`` as the ECDC file header."""
    blob = json.dumps(metadata).encode("utf-8")
    fo.write(_MAGIC)
    fo.write(_VERSION.to_bytes(1, "big"))
    fo.write(len(blob).to_bytes(4, "big"))
    fo.write(blob)
    fo.flush()


def _read_exactly(fo: tp.IO[bytes], size: int) -> bytes:
    """Read exactly ``size`` bytes, looping over short reads."""
    parts: tp.List[bytes] = []
    want = size
    while want > 0:
        chunk = fo.read(want)
        if not chunk:
            raise EOFError(f"stream ended {want} bytes short of {size}")
        parts.append(chunk)
        want -= len(chunk)
    return b"".join(parts)


def read_ecdc_header(fo: tp.IO[bytes]):
    """Parse and return the JSON metadata of an ECDC stream."""
    fixed = _read_exactly(fo, _HEADER_FIXED)
    if fixed[: len(_MAGIC)] != _MAGIC:
        raise ValueError("File is not in ECDC format.")
    if fixed[len(_MAGIC)] != _VERSION:
        raise ValueError("Version not supported.")
    blob_len = int.from_bytes(fixed[len(_MAGIC) + 1 :], "big")
    return json.loads(_read_exactly(fo, blob_len).decode("utf-8"))


class BitPacker:
    """Stream fixed-width integers into bytes, LSB-first within each byte.

    Bit i of the logical stream lands in byte ``i // 8`` at in-byte
    position ``i % 8`` — the layout reference binary.py:55-88 emits.
    """

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        assert 0 < bits <= 32
        self.bits = bits
        self.fo = fo
        self._acc = 0  # pending bits, next-out bit at position 0
        self._acc_len = 0

    def push(self, value: int) -> None:
        self._acc |= value << self._acc_len
        self._acc_len += self.bits
        if self._acc_len >= 8:
            ready = bytearray()
            while self._acc_len >= 8:
                ready.append(self._acc & 0xFF)
                self._acc >>= 8
                self._acc_len -= 8
            self.fo.write(bytes(ready))

    def flush(self) -> None:
        if self._acc_len > 0:
            self.fo.write(bytes([self._acc & 0xFF]))
            self._acc = 0
            self._acc_len = 0
        self.fo.flush()


class BitUnpacker:
    """Inverse of :class:`BitPacker`.

    Reads one byte at a time on purpose: streams interleave packed blocks
    with other data, so buffering ahead would steal bytes from the next
    reader.  Returns None at end-of-stream (possibly after up to
    ``8 // bits`` zero-padded ghost values, as the format allows).
    """

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        assert 0 < bits <= 32
        self.bits = bits
        self.fo = fo
        self._acc = 0
        self._acc_len = 0

    def pull(self) -> tp.Optional[int]:
        while self._acc_len < self.bits:
            nxt = self.fo.read(1)
            if not nxt:
                return None
            self._acc |= nxt[0] << self._acc_len
            self._acc_len += 8
        value = self._acc & ((1 << self.bits) - 1)
        self._acc >>= self.bits
        self._acc_len -= self.bits
        return value


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
