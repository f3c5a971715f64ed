"""Entropy-coding throughput: C++ native codec vs pure-Python reference
(the reference's own self-benchmark shape, encodec/compress.py:188-207)."""

import io, sys, time
sys.path.insert(0, ".")
import numpy as np

from ladiffcodec_tpu.bitstream.binary import BitPacker
from ladiffcodec_tpu.bitstream.ac import ArithmeticCoder, ArithmeticDecoder, build_stable_quantized_cdf
from ladiffcodec_tpu.bitstream import native

rng = np.random.RandomState(0)

# fixed-width packing: 8 codebooks x 50 Hz x 60 s = 24000 codes of 10 bits
codes = rng.randint(0, 1024, 24000).astype(np.int32)
t0 = time.perf_counter()
buf = io.BytesIO(); p = BitPacker(10, buf)
for c in codes: p.push(int(c))
p.flush()
t_py = time.perf_counter() - t0
t0 = time.perf_counter()
data = native.pack_codes(codes, 10)
t_cc = time.perf_counter() - t0
assert buf.getvalue() == data
print(f"bit-pack 24000 codes: python {t_py*1000:.1f} ms, C++ {t_cc*1000:.2f} ms "
      f"({t_py/t_cc:.0f}x)")

# arithmetic coding: 1500 frames x 8 codebooks over 1024-symbol CDFs (30 s @ 50 Hz)
T, K, CARD = 1500, 8, 1024
pdfs = rng.rand(T, K, CARD).astype(np.float32)
pdfs /= pdfs.sum(-1, keepdims=True)
syms = rng.randint(0, CARD, (T, K)).astype(np.int32)
cdfs = np.stack([[build_stable_quantized_cdf(pdfs[t, k], 24) for k in range(K)]
                 for t in range(T)])

t0 = time.perf_counter()
enc = native.NativeArithmeticCoder()
for t in range(T):
    enc.push_frame(syms[t], cdfs[t])
cc_bytes = enc.finish()
t_cc = time.perf_counter() - t0

t0 = time.perf_counter()
fo = io.BytesIO(); pyenc = ArithmeticCoder(fo)
for t in range(T):
    for k in range(K):
        pyenc.push(int(syms[t, k]), cdfs[t, k])
pyenc.flush()
t_py = time.perf_counter() - t0
assert fo.getvalue() == cc_bytes
audio_s = T / 50.0
print(f"AC encode {T*K} symbols ({audio_s:.0f} s audio): python {t_py:.2f} s "
      f"({audio_s/t_py:.1f}x RT), C++ {t_cc*1000:.0f} ms ({audio_s/t_cc:.0f}x RT), "
      f"{t_py/t_cc:.0f}x speedup")

t0 = time.perf_counter()
dec = native.NativeArithmeticDecoder(cc_bytes)
for t in range(T):
    out = dec.pull_frame(cdfs[t])
    assert (out == syms[t]).all()
dec.close()
t_cc = time.perf_counter() - t0
print(f"AC decode: C++ {t_cc*1000:.0f} ms ({audio_s/t_cc:.0f}x RT)")
