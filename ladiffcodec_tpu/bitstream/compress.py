"""wav <-> .ecdc compression API (reference srcs/encodec/compress.py).

Two entropy modes:
  * fixed-width bit packing (`use_lm=False`) — whole-stream C++ fast path
    when the native lib is available;
  * LM arithmetic coding (`use_lm=True`) — the streaming LM runs one jitted
    step per frame (both ends MUST run the identical program so their CDFs
    agree bit-for-bit; see note in `compress_to_file`); CDF quantization is
    batched over codebooks in one numpy/native call, and the range coder
    consumes/produces bits in C++ (Python fallback).
"""

from __future__ import annotations

import io
import math
import struct
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from . import binary
from .ac import ArithmeticCoder, ArithmeticDecoder, build_stable_quantized_cdfs
from . import native
from .encodec_model import EncodecModel, EncodedFrame

MODELS = {
    "encodec_24khz": EncodecModel.encodec_model_24khz,
    "encodec_48khz": EncodecModel.encodec_model_48khz,
}


def resolve_lm_device(lm_device: str = "auto"):
    """Map an `lm_device` policy to a jax.Device or None (= default device).

    "cpu" pins the per-frame streaming LM step to the host CPU backend.  On a
    remote-tunnel TPU runtime each of the 50 per-audio-second LM dispatches
    pays ~100-200 ms of tunnel round-trip, capping --lm coding at ~0.2x RT;
    the 18 MB LM runs the same step on host CPU in well under a millisecond
    while the codec stays on the accelerator.  "auto" = cpu when the default
    backend is a remote/accelerator platform, else default.  CDF stability
    across the two ends is guaranteed by the quantized-CDF grid
    (build_stable_quantized_cdfs' 1e-8 roundoff floor, ac.py), the same
    contract that makes the reference's coder machine-portable."""
    if lm_device in (None, "", "default"):
        return None
    if lm_device == "auto":
        try:
            if jax.default_backend() == "cpu":
                return None
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None
    return jax.devices(lm_device)[0]


def _lm_step_fn(lm, lm_vars, device=None):
    if device is not None:
        lm_vars = jax.device_put(lm_vars, device)
    jstep = jax.jit(lambda v, indices, states, offset: lm.apply(v, indices, states, offset))

    def step(indices, states, offset):
        # committed lm_vars pin compilation + execution to `device`;
        # indices/states follow (numpy / prior-step outputs)
        return jstep(lm_vars, indices, states, offset)

    return step


def compress_to_file(
    model: EncodecModel,
    variables,
    wav: np.ndarray,
    fo: tp.IO[bytes],
    use_lm: bool = False,
    lm=None,
    lm_vars=None,
    lm_device: str = "auto",
) -> None:
    """wav: (channels, L) at model.sample_rate (reference compress.py:28-89)."""
    assert wav.ndim == 2, "Only single waveform can be encoded."
    x = np.moveaxis(wav, 0, -1)[None]  # (1, L, C)
    frames = model.encode(variables, x)

    metadata = {
        "m": model.name,
        "al": wav.shape[-1],
        "nc": frames[0][0].shape[1],
        "lm": use_lm,
    }
    binary.write_ecdc_header(fo, metadata)

    if use_lm:
        assert lm is not None and lm_vars is not None
        lm_step = _lm_step_fn(lm, lm_vars, resolve_lm_device(lm_device))

    for (frame, scale) in frames:
        if scale is not None:
            fo.write(struct.pack("!f", float(scale.reshape(-1)[0])))
        _, K, T = frame.shape
        if use_lm:
            coder = (
                native.NativeArithmeticCoder() if native.available() else ArithmeticCoder(fo)
            )
            # NOTE the LM must run the SAME one-step streaming graph the
            # decoder runs: a teacher-forced full-sequence forward would be
            # ~T times fewer dispatches, but its XLA program is not
            # bit-identical to the streaming one, and any probability drift
            # past the 1e-8 roundoff grid desyncs the decoder's CDFs.
            states, offset = lm.init_state(1)
            input_ = jnp.zeros((1, K, 1), jnp.int32)
            for t in range(T):
                probas, states, offset = lm_step(input_, states, offset)
                input_ = 1 + jnp.asarray(frame[:, :, t : t + 1], jnp.int32)
                p = np.asarray(probas[0, :, :, 0]).T  # (K, card)
                if native.available():
                    cdfs = native.build_cdfs(p, coder.total_range_bits)
                    coder.push_frame(frame[0, :, t].astype(np.int32), cdfs)
                else:
                    cdfs = build_stable_quantized_cdfs(
                        p, coder.total_range_bits, check=False
                    )
                    for k in range(K):
                        coder.push(int(frame[0, k, t]), cdfs[k])
            if native.available():
                fo.write(coder.finish())
            else:
                coder.flush()
        else:
            codes = frame[0].T.reshape(-1)  # time-major: (T, K) flattened
            if native.available():
                fo.write(native.pack_codes(codes.astype(np.int32), model.bits_per_codebook))
            else:
                packer = binary.BitPacker(model.bits_per_codebook, fo)
                for v in codes:
                    packer.push(int(v))
                packer.flush()


def decompress_from_file(
    fo: tp.IO[bytes],
    variables=None,
    model: tp.Optional[EncodecModel] = None,
    lm=None,
    lm_vars=None,
    lm_device: str = "auto",
) -> tp.Tuple[np.ndarray, int]:
    """Returns (wav (channels, L), sample_rate).  Reference compress.py:92-156."""
    metadata = binary.read_ecdc_header(fo)
    model_name, audio_length = metadata["m"], metadata["al"]
    num_codebooks, use_lm = metadata["nc"], metadata["lm"]
    if model is None:
        if model_name not in MODELS:
            raise ValueError(f"The audio was compressed with an unsupported model {model_name}.")
        model = MODELS[model_name]()
    assert variables is not None, "model variables required (no URL downloads here)"

    if use_lm:
        assert lm is not None and lm_vars is not None
        lm_step = _lm_step_fn(lm, lm_vars, resolve_lm_device(lm_device))

    frames: tp.List[EncodedFrame] = []
    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    for seg_offset in range(0, audio_length, segment_stride):
        this_segment_length = min(audio_length - seg_offset, segment_length)
        frame_length = int(math.ceil(this_segment_length / model.sample_rate * model.frame_rate))
        if model.normalize:
            (scale_f,) = struct.unpack("!f", binary._read_exactly(fo, struct.calcsize("!f")))
            scale = np.array([[scale_f]], np.float32)
        else:
            scale = None
        frame = np.zeros((1, num_codebooks, frame_length), np.int64)
        if use_lm:
            if native.available():
                # read the remainder, decode, then rewind fo past the bytes
                # this segment actually consumed
                mark = fo.tell()
                rest = fo.read()
                decoder = native.NativeArithmeticDecoder(rest)
            else:
                decoder = ArithmeticDecoder(fo)
            states, offset = lm.init_state(1)
            input_ = jnp.zeros((1, num_codebooks, 1), jnp.int32)
            for t in range(frame_length):
                probas, states, offset = lm_step(input_, states, offset)
                p = np.asarray(probas[0, :, :, 0]).T
                if native.available():
                    cdfs = native.build_cdfs(p, decoder.total_range_bits)
                    codes = decoder.pull_frame(cdfs)
                else:
                    cdfs = build_stable_quantized_cdfs(
                        p, decoder.total_range_bits, check=False
                    )
                    codes = []
                    for k in range(num_codebooks):
                        code = decoder.pull(cdfs[k])
                        if code is None:
                            raise EOFError("The stream ended sooner than expected.")
                        codes.append(code)
                    codes = np.asarray(codes)
                frame[0, :, t] = codes
                input_ = 1 + jnp.asarray(frame[:, :, t : t + 1], jnp.int32)
            if native.available():
                fo.seek(mark + decoder.tell())
                decoder.close()
        else:
            n = num_codebooks * frame_length
            if native.available():
                nbytes = (n * model.bits_per_codebook + 7) // 8
                data = binary._read_exactly(fo, nbytes)
                codes = native.unpack_codes(data, model.bits_per_codebook, n)
            else:
                unpacker = binary.BitUnpacker(model.bits_per_codebook, fo)
                codes = []
                for _ in range(n):
                    v = unpacker.pull()
                    if v is None:
                        raise EOFError("The stream ended sooner than expected.")
                    codes.append(v)
                codes = np.asarray(codes)
            frame[0] = codes.reshape(frame_length, num_codebooks).T
        frames.append((frame, scale))

    wav = model.decode(variables, frames)  # (1, L, C)
    return np.moveaxis(wav[0], -1, 0)[:, :audio_length], model.sample_rate


def compress(model, variables, wav, use_lm: bool = False, lm=None, lm_vars=None,
             lm_device: str = "auto") -> bytes:
    fo = io.BytesIO()
    compress_to_file(model, variables, wav, fo, use_lm=use_lm, lm=lm, lm_vars=lm_vars,
                     lm_device=lm_device)
    return fo.getvalue()


def decompress(compressed: bytes, variables=None, model=None, lm=None, lm_vars=None,
               lm_device: str = "auto"):
    fo = io.BytesIO(compressed)
    return decompress_from_file(fo, variables=variables, model=model, lm=lm,
                                lm_vars=lm_vars, lm_device=lm_device)
