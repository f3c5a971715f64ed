"""Range (arithmetic) coder over quantized CDFs, for LM entropy coding.

Bitstream-compatible with reference srcs/encodec/quantization/ac.py, whose
scheme originates in Meta AI's EnCodec (github.com/facebookresearch/encodec,
MIT license).  Compatibility pins down two numeric contracts:

* CDF quantization (:func:`build_stable_quantized_cdf`): float32 roundoff
  followed by a proportional integer split of ``[0, 2**bits)`` with a
  ``min_range`` floor per symbol, so encoder and decoder derive identical
  CDFs from (possibly differently-rounded) model probabilities.
* Interval narrowing: the reference computes sub-interval bounds as
  ``ceil/floor(range_bound * (delta / 2**bits))`` in *float* arithmetic.
  Because ``delta < 2**(bits+1)`` and ``range_bound < 2**bits``, the product
  has < 2**53 magnitude and the power-of-two division is exact, so the float
  expression equals exact integer arithmetic.  This module therefore uses
  pure integer ceil/floor division — same bits on the wire, no float in the
  hot loop.

This is the ONE inherently serial scalar algorithm in the system (SURVEY.md
§2.9); the production path is the C++ extension in native/ — this module is
the streaming implementation and the cross-check.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from .binary import BitPacker, BitUnpacker


def build_stable_quantized_cdfs(
    pdfs: np.ndarray,
    total_range_bits: int,
    roundoff: float = 1e-8,
    min_range: int = 2,
    check: bool = True,
) -> np.ndarray:
    """Quantize float32 PDFs ``(..., card)`` into integer CDFs over
    ``[0, 2**bits)``, vectorized over every leading axis.

    Each symbol gets ``min_range`` slots plus a share of the remaining
    range proportional to its (roundoff-truncated) probability.  All
    arithmetic below is chosen so any machine computing from the same
    float32 PDF gets the same CDF (reference ac.py:18-53 contract).
    """
    if min_range < 2:
        raise ValueError("min_range must be at least 2.")
    pdfs = np.asarray(pdfs, np.float32)
    if roundoff:
        # truncate to a roundoff grid, in float32, to absorb tiny
        # cross-framework differences in the model's softmax output
        pdfs = (np.floor(pdfs / np.float32(roundoff)) * np.float32(roundoff)).astype(
            np.float32
        )
    total = 2**total_range_bits
    n_symbols = pdfs.shape[-1]
    floor_share = min_range * n_symbols / total
    assert floor_share <= 1, "you must reduce min_range"
    free_slots = np.float32((1 - floor_share) * total)
    widths = np.floor(free_slots * pdfs).astype(np.int64) + min_range
    cdfs = np.cumsum(widths, axis=-1)
    if check:
        assert (cdfs[..., -1] <= total).all(), cdfs[..., -1].max()
        if (cdfs[..., 0] < min_range).any() or (
            np.diff(cdfs, axis=-1) < min_range
        ).any():
            raise ValueError("You must increase your total_range_bits.")
    return cdfs


def build_stable_quantized_cdf(
    pdf: np.ndarray,
    total_range_bits: int,
    roundoff: float = 1e-8,
    min_range: int = 2,
    check: bool = True,
) -> np.ndarray:
    """Single-PDF view of :func:`build_stable_quantized_cdfs`."""
    return build_stable_quantized_cdfs(
        pdf, total_range_bits, roundoff=roundoff, min_range=min_range, check=check
    )


def _interval(
    quantized_cdf: np.ndarray, symbol: int, delta: int, total_range_bits: int
) -> tp.Tuple[int, int]:
    """Sub-interval of ``[0, delta)`` owned by ``symbol``, as inclusive
    (low, high) offsets.  Integer-exact form of the reference's float
    ``ceil/floor(bound * delta / 2**bits)`` (see module docstring)."""
    cdf_lo = int(quantized_cdf[symbol - 1]) if symbol > 0 else 0
    cdf_hi = int(quantized_cdf[symbol]) - 1
    lo = -((-cdf_lo * delta) >> total_range_bits)  # ceil division
    hi = (cdf_hi * delta) >> total_range_bits  # floor division
    return lo, hi


class _RangeState:
    """Shared renormalization state: an integer interval [lo, hi] whose bit
    width grows by appending bits (doubling) and shrinks by retiring the
    leading bits once lo and hi agree on them."""

    def __init__(self, total_range_bits: int):
        assert total_range_bits <= 30
        self.total_range_bits = total_range_bits
        self.lo: int = 0
        self.hi: int = 0
        self.width: int = 0  # current bit-width of the interval coordinates

    @property
    def delta(self) -> int:
        return self.hi - self.lo + 1

    def _agreed_prefix(self) -> tp.Iterator[int]:
        """Yield and retire leading bits shared by lo and hi."""
        while self.width > 0:
            shift = self.width - 1
            bit = self.lo >> shift
            if bit != self.hi >> shift:
                return
            keep = (1 << shift) - 1
            self.lo &= keep
            self.hi &= keep
            self.width -= 1
            yield bit


class ArithmeticCoder(_RangeState):
    """Encode symbols under per-step quantized CDFs into a bit stream.

    Same wire format as reference ac.py:56-167: renormalize until the
    interval spans at least ``2**total_range_bits``, narrow to the symbol's
    sub-interval, then flush the bits the interval endpoints agree on.
    """

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        super().__init__(total_range_bits)
        self.packer = BitPacker(bits=1, fo=fo)

    def push(self, symbol: int, quantized_cdf: np.ndarray) -> None:
        while self.delta < (1 << self.total_range_bits):
            self.lo <<= 1
            self.hi = (self.hi << 1) | 1
            self.width += 1
        off_lo, off_hi = _interval(
            quantized_cdf, symbol, self.delta, self.total_range_bits
        )
        assert off_lo <= off_hi, (symbol, off_lo, off_hi)
        self.hi = self.lo + off_hi
        self.lo = self.lo + off_lo
        for bit in self._agreed_prefix():
            self.packer.push(bit)
        assert 0 <= self.lo <= self.hi
        assert self.width <= 62, self.width

    def flush(self) -> None:
        """Emit the remaining bits of ``lo`` and flush the byte packer."""
        while self.width > 0:
            self.width -= 1
            self.packer.push((self.lo >> self.width) & 1)
        self.packer.flush()


class ArithmeticDecoder(_RangeState):
    """Decode the :class:`ArithmeticCoder` stream (reference ac.py:170-260).

    Tracks the same [lo, hi] interval as the encoder plus ``code``, the
    window of stream bits at the current width; each pull binary-searches
    the CDF for the unique symbol whose sub-interval contains ``code``.
    """

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        super().__init__(total_range_bits)
        self.code: int = 0
        self.unpacker = BitUnpacker(bits=1, fo=fo)

    def pull(self, quantized_cdf: np.ndarray) -> tp.Optional[int]:
        while self.delta < (1 << self.total_range_bits):
            bit = self.unpacker.pull()
            if bit is None:
                return None
            self.lo <<= 1
            self.hi = (self.hi << 1) | 1
            self.code = (self.code << 1) | bit
            self.width += 1

        lo_idx, hi_idx = 0, len(quantized_cdf) - 1
        while lo_idx <= hi_idx:
            mid = (lo_idx + hi_idx) // 2
            off_lo, off_hi = _interval(
                quantized_cdf, mid, self.delta, self.total_range_bits
            )
            if self.code < self.lo + off_lo:
                hi_idx = mid - 1
            elif self.code > self.lo + off_hi:
                lo_idx = mid + 1
            else:
                self.hi = self.lo + off_hi
                self.lo = self.lo + off_lo
                symbol = mid
                break
        else:
            raise RuntimeError("Binary search failed")

        for bit in self._agreed_prefix():
            self.code &= (1 << self.width) - 1
        return symbol
