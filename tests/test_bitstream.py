"""Bit-exact bitstream tests (modeled on the reference's strongest tests:
binary.py:125-149 and ac.py:263-288 round-trips), plus Python<->C++
cross-checks."""

import io

import numpy as np
import pytest

from ladiffcodec_tpu.bitstream.binary import (
    BitPacker,
    BitUnpacker,
    write_ecdc_header,
    read_ecdc_header,
    pack_codes,
    unpack_codes,
)
from ladiffcodec_tpu.bitstream.ac import (
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
from ladiffcodec_tpu.bitstream import native


def test_bitpacker_roundtrip_random_widths():
    rng = np.random.RandomState(1234)
    for rep in range(4):
        length = int(rng.randint(10, 2000))
        bits = int(rng.randint(1, 16))
        tokens = rng.randint(0, 2 ** bits, length).tolist()
        buf = io.BytesIO()
        packer = BitPacker(bits, buf)
        for t in tokens:
            packer.push(int(t))
        packer.flush()
        buf.seek(0)
        unpacker = BitUnpacker(bits, buf)
        rebuilt = []
        while True:
            v = unpacker.pull()
            if v is None:
                break
            rebuilt.append(v)
        assert len(tokens) <= len(rebuilt) <= len(tokens) + 8 // bits
        assert rebuilt[: len(tokens)] == tokens


def test_ecdc_header_roundtrip():
    buf = io.BytesIO()
    meta = {"m": "encodec_24khz", "al": 12345, "nc": 8, "lm": False}
    write_ecdc_header(buf, meta)
    buf.seek(0)
    assert read_ecdc_header(buf) == meta


def test_arithmetic_roundtrip_random_streams():
    rng = np.random.RandomState(1234)
    for _ in range(3):
        cardinality = int(rng.randint(2, 4000))
        steps = int(rng.randint(100, 500))
        fo = io.BytesIO()
        encoder = ArithmeticCoder(fo)
        symbols, pdfs = [], []
        for _ in range(steps):
            logits = rng.randn(cardinality).astype(np.float32)
            pdf = np.exp(logits - logits.max())
            pdf = (pdf / pdf.sum()).astype(np.float32)
            pdfs.append(pdf)
            q_cdf = build_stable_quantized_cdf(pdf, encoder.total_range_bits)
            symbol = int(rng.choice(cardinality, p=pdf / pdf.sum()))
            symbols.append(symbol)
            encoder.push(symbol, q_cdf)
        encoder.flush()

        fo.seek(0)
        decoder = ArithmeticDecoder(fo)
        for idx, (pdf, symbol) in enumerate(zip(pdfs, symbols)):
            q_cdf = build_stable_quantized_cdf(pdf, decoder.total_range_bits)
            assert decoder.pull(q_cdf) == symbol, idx
        assert decoder.pull(np.zeros(1, np.int64) + 2) is None


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNative:
    def test_pack_matches_python(self):
        rng = np.random.RandomState(0)
        for bits in [1, 3, 8, 10, 15]:
            codes = rng.randint(0, 2 ** bits, 777).astype(np.int32)
            py = pack_codes(codes.tolist(), bits)
            cc = native.pack_codes(codes, bits)
            assert py == cc
            back = native.unpack_codes(cc, bits, len(codes))
            np.testing.assert_array_equal(back, codes)
            # python unpack reads C++ bytes
            np.testing.assert_array_equal(unpack_codes(cc, bits, len(codes)), codes)

    def test_cdf_matches_python(self):
        rng = np.random.RandomState(1)
        for n in [3, 100, 1025]:
            pdf = rng.rand(n).astype(np.float32)
            pdf /= pdf.sum()
            np.testing.assert_array_equal(
                native.build_cdf(pdf, 24), build_stable_quantized_cdf(pdf, 24)
            )

    def test_ac_cross_roundtrip(self):
        """C++ encode -> Python decode and vice versa, byte-identical."""
        rng = np.random.RandomState(7)
        steps, card = 200, 512
        pdfs = []
        symbols = []
        for _ in range(steps):
            p = rng.rand(card).astype(np.float32)
            p /= p.sum()
            pdfs.append(p)
            symbols.append(int(rng.randint(card)))
        cdfs = np.stack([build_stable_quantized_cdf(p, 24) for p in pdfs])

        # C++ encode
        enc = native.NativeArithmeticCoder()
        for i in range(steps):
            enc.push_frame(np.array([symbols[i]]), cdfs[i : i + 1])
        cc_bytes = enc.finish()

        # Python encode must produce identical bytes
        fo = io.BytesIO()
        pyenc = ArithmeticCoder(fo)
        for i in range(steps):
            pyenc.push(symbols[i], cdfs[i])
        pyenc.flush()
        assert fo.getvalue() == cc_bytes

        # Python decode of C++ bytes
        fo = io.BytesIO(cc_bytes)
        dec = ArithmeticDecoder(fo)
        got = [dec.pull(cdfs[i]) for i in range(steps)]
        assert got == symbols

        # C++ decode of Python bytes
        ndec = native.NativeArithmeticDecoder(cc_bytes)
        got2 = [int(ndec.pull_frame(cdfs[i : i + 1])[0]) for i in range(steps)]
        ndec.close()
        assert got2 == symbols
