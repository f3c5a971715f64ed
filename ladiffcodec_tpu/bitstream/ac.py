"""Range/arithmetic coder over quantized CDFs for LM-based entropy coding.

Counterpart of reference srcs/encodec/quantization/ac.py.  The integer
renormalization / common-prefix-flush scheme is reproduced exactly (the
encoder/decoder must agree bit-for-bit), including the
`build_stable_quantized_cdf` float32 roundoff contract (ac.py:18-53) that
makes CDFs identical across machines/frameworks.

This is the ONE inherently serial scalar algorithm in the system (SURVEY.md
§2.9); the production path is the C++ extension in native/ — this module is
the readable reference and cross-check.
"""

from __future__ import annotations

import math
import typing as tp

import numpy as np

from .binary import BitPacker, BitUnpacker


def build_stable_quantized_cdf(
    pdf: np.ndarray,
    total_range_bits: int,
    roundoff: float = 1e-8,
    min_range: int = 2,
    check: bool = True,
) -> np.ndarray:
    """PDF (float32 [N]) -> quantized CDF (int64 [N]) splitting
    [0, 2**total_range_bits - 1] proportionally; same roundoff + min_range
    floor as the reference so both sides derive identical CDFs."""
    pdf = np.asarray(pdf, np.float32)
    if roundoff:
        pdf = (np.floor(pdf / np.float32(roundoff)) * np.float32(roundoff)).astype(np.float32)
    total_range = 2 ** total_range_bits
    cardinality = len(pdf)
    alpha = min_range * cardinality / total_range
    assert alpha <= 1, "you must reduce min_range"
    ranges = np.floor(np.float32((1 - alpha) * total_range) * pdf).astype(np.int64)
    ranges += min_range
    quantized_cdf = np.cumsum(ranges)
    if min_range < 2:
        raise ValueError("min_range must be at least 2.")
    if check:
        assert quantized_cdf[-1] <= 2 ** total_range_bits, quantized_cdf[-1]
        if (np.diff(quantized_cdf) < min_range).any() or quantized_cdf[0] < min_range:
            raise ValueError("You must increase your total_range_bits.")
    return quantized_cdf


class ArithmeticCoder:
    """Reference ac.py:56-167."""

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        assert total_range_bits <= 30
        self.total_range_bits = total_range_bits
        self.packer = BitPacker(bits=1, fo=fo)
        self.low: int = 0
        self.high: int = 0
        self.max_bit: int = -1

    @property
    def delta(self) -> int:
        return self.high - self.low + 1

    def _flush_common_prefix(self) -> None:
        assert self.high >= self.low, (self.low, self.high)
        assert self.high < 2 ** (self.max_bit + 1)
        while self.max_bit >= 0:
            b1 = self.low >> self.max_bit
            b2 = self.high >> self.max_bit
            if b1 == b2:
                self.low -= b1 << self.max_bit
                self.high -= b1 << self.max_bit
                self.max_bit -= 1
                self.packer.push(b1)
            else:
                break

    def push(self, symbol: int, quantized_cdf: np.ndarray) -> None:
        while self.delta < 2 ** self.total_range_bits:
            self.low *= 2
            self.high = self.high * 2 + 1
            self.max_bit += 1
        range_low = 0 if symbol == 0 else int(quantized_cdf[symbol - 1])
        range_high = int(quantized_cdf[symbol]) - 1
        effective_low = int(math.ceil(range_low * (self.delta / (2 ** self.total_range_bits))))
        effective_high = int(math.floor(range_high * (self.delta / (2 ** self.total_range_bits))))
        assert self.low <= self.high
        self.high = self.low + effective_high
        self.low = self.low + effective_low
        assert self.low <= self.high, (effective_low, effective_high, range_low, range_high)
        self._flush_common_prefix()
        assert self.low <= self.high
        assert self.max_bit >= -1
        assert self.max_bit <= 61, self.max_bit

    def flush(self) -> None:
        while self.max_bit >= 0:
            self.packer.push((self.low >> self.max_bit) & 1)
            self.max_bit -= 1
        self.packer.flush()


class ArithmeticDecoder:
    """Reference ac.py:170-260."""

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        self.total_range_bits = total_range_bits
        self.low: int = 0
        self.high: int = 0
        self.current: int = 0
        self.max_bit: int = -1
        self.unpacker = BitUnpacker(bits=1, fo=fo)

    @property
    def delta(self) -> int:
        return self.high - self.low + 1

    def _flush_common_prefix(self) -> None:
        while self.max_bit >= 0:
            b1 = self.low >> self.max_bit
            b2 = self.high >> self.max_bit
            if b1 == b2:
                self.low -= b1 << self.max_bit
                self.high -= b1 << self.max_bit
                self.current -= b1 << self.max_bit
                assert self.high >= self.low
                assert self.low >= 0
                self.max_bit -= 1
            else:
                break

    def pull(self, quantized_cdf: np.ndarray) -> tp.Optional[int]:
        while self.delta < 2 ** self.total_range_bits:
            bit = self.unpacker.pull()
            if bit is None:
                return None
            self.low *= 2
            self.high = self.high * 2 + 1
            self.current = self.current * 2 + bit
            self.max_bit += 1

        # iterative binary search (the reference recurses, ac.py:235-252)
        low_idx, high_idx = 0, len(quantized_cdf) - 1
        while True:
            if high_idx < low_idx:
                raise RuntimeError("Binary search failed")
            mid = (low_idx + high_idx) // 2
            range_low = int(quantized_cdf[mid - 1]) if mid > 0 else 0
            range_high = int(quantized_cdf[mid]) - 1
            effective_low = int(math.ceil(range_low * (self.delta / (2 ** self.total_range_bits))))
            effective_high = int(
                math.floor(range_high * (self.delta / (2 ** self.total_range_bits)))
            )
            low = effective_low + self.low
            high = effective_high + self.low
            if self.current >= low:
                if self.current <= high:
                    sym = mid
                    self.low, self.high, self.current = low, high, self.current
                    break
                low_idx = mid + 1
            else:
                high_idx = mid - 1
        self._flush_common_prefix()
        return sym
