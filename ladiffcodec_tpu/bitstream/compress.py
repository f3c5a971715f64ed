"""wav <-> .ecdc compression API (reference srcs/encodec/compress.py).

Two entropy modes:
  * fixed-width bit packing (`use_lm=False`) — whole-stream C++ fast path
    when the native lib is available;
  * LM arithmetic coding (`use_lm=True`) — the streaming LM runs one step
    per frame (both ends MUST run the identical program so their CDFs agree
    bit-for-bit; see `_make_lm_stepper`).  The default engine is the host
    NumPy KV-cache step (lm_numpy.py) — the bit-serial loop never touches
    jit dispatch; CDF quantization is batched over codebooks in one
    numpy/native call, and the range coder consumes/produces bits in C++
    (Python fallback).
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


def ensure_host_cpu_backend() -> None:
    """Extend a single-accelerator `jax_platforms` config with the host CPU.

    On this runtime the platform plugin registers ONLY the tunneled TPU
    (`JAX_PLATFORMS=axon`), so `jax.devices("cpu")` raises and the "auto"
    policy below cannot pin the LM step to the host.  Appending ",cpu" keeps
    the first platform the default (codec stays on the TPU) while making the
    host CPU addressable.  Must run before the first backend use; a no-op if
    CPU is already registered or the config is unset (default = all
    platforms, CPU included)."""
    try:
        cur = jax.config.jax_platforms
    except AttributeError:  # future jax without this config name
        return
    if cur and "cpu" not in cur.split(","):
        try:
            jax.config.update("jax_platforms", cur + ",cpu")
        except Exception:
            pass  # backends already initialized - "auto" falls back below


def resolve_lm_device(lm_device: str = "auto"):
    """Map an `lm_device` policy to a jax.Device or None (= default device).

    "cpu" pins the per-frame streaming LM step to the host CPU backend.  On a
    remote-tunnel TPU runtime each of the 50 per-audio-second LM dispatches
    pays ~100-200 ms of tunnel round-trip, capping --lm coding at ~0.2x RT;
    the 18 MB LM runs the same step on host CPU while the codec stays on the
    accelerator.  CDF stability across the two ends is guaranteed by the
    quantized-CDF grid (build_stable_quantized_cdfs' 1e-8 roundoff floor,
    ac.py), the same contract that makes the reference's coder
    machine-portable."""
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


def _make_lm_stepper(lm, lm_vars, lm_device: str, n_q: int):
    """One per-frame prediction interface over both LM engines.

    Returns `step(prev) -> probs`: prev is a (n_q,) int numpy array of
    1 + previous frame's codes (zeros at t=0); probs is (n_q, card) float32.

    `lm_device` policies: "numpy" (and the default "auto") run the host-side
    NumPy KV-cache engine (lm_numpy.NumpyLMEngine) — no jit dispatch in the
    bit-serial loop, ~100x fewer FLOPs/step than the history-recompute jax
    graph; "default"/"cpu"/"tpu" run the jitted jax streaming step on that
    backend.  Encoder and decoder MUST use the same policy: the engines agree
    only to f32 rounding, and any probability drift past the quantized-CDF
    grid desyncs the range coder."""
    if lm_device in ("auto", "numpy"):
        from .lm_numpy import NumpyLMEngine

        eng = NumpyLMEngine(
            lm_vars["params"], n_q=n_q, card=lm.card, dim=lm.dim,
            num_layers=lm.num_layers, past_context=lm.past_context,
        )
        return eng.step

    jstep = _lm_step_fn(lm, lm_vars, resolve_lm_device(lm_device))
    carry = {"so": lm.init_state(1)}

    def step(prev: np.ndarray) -> np.ndarray:
        states, offset = carry["so"]
        probas, states, offset = jstep(
            jnp.asarray(prev, jnp.int32).reshape(1, n_q, 1), states, offset
        )
        carry["so"] = (states, offset)
        return np.asarray(probas[0, :, :, 0], np.float32).T  # (n_q, card)

    return step


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

    for (frame, scale) in frames:
        if scale is not None:
            fo.write(struct.pack("!f", float(scale.reshape(-1)[0])))
        _, K, T = frame.shape
        if use_lm:
            assert lm is not None and lm_vars is not None
            coder = (
                native.NativeArithmeticCoder() if native.available() else ArithmeticCoder(fo)
            )
            # NOTE the LM must run the SAME one-step streaming program the
            # decoder runs: a teacher-forced full-sequence forward would be
            # ~T times fewer steps, but its numerics are not bit-identical
            # to the streaming ones, and any probability drift past the
            # 1e-8 roundoff grid desyncs the decoder's CDFs.
            lm_step = _make_lm_stepper(lm, lm_vars, lm_device, K)
            prev = np.zeros((K,), np.int64)
            for t in range(T):
                p = lm_step(prev)  # (K, card)
                prev = 1 + frame[0, :, t]
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
    return_frames: bool = False,
) -> tp.Tuple[np.ndarray, int]:
    """Returns (wav (channels, L), sample_rate) — or (wav, sr, frames) with
    `return_frames` (the exact decoded code frames, for consumers that decode
    past the codec: the diffusion de-quantizer conditions on the RVQ latent
    of these codes, scripts/demo_e2e.py).  Reference compress.py:92-156."""
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
            lm_step = _make_lm_stepper(lm, lm_vars, lm_device, num_codebooks)
            prev = np.zeros((num_codebooks,), np.int64)
            for t in range(frame_length):
                p = lm_step(prev)
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
                prev = 1 + frame[0, :, t]
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
    out = np.moveaxis(wav[0], -1, 0)[:, :audio_length]
    if return_frames:
        return out, model.sample_rate, frames
    return out, model.sample_rate


def compress(model, variables, wav, use_lm: bool = False, lm=None, lm_vars=None,
             lm_device: str = "auto") -> bytes:
    fo = io.BytesIO()
    compress_to_file(model, variables, wav, fo, use_lm=use_lm, lm=lm, lm_vars=lm_vars,
                     lm_device=lm_device)
    return fo.getvalue()


def decompress(compressed: bytes, variables=None, model=None, lm=None, lm_vars=None,
               lm_device: str = "auto", return_frames: bool = False):
    fo = io.BytesIO(compressed)
    return decompress_from_file(fo, variables=variables, model=model, lm=lm,
                                lm_vars=lm_vars, lm_device=lm_device,
                                return_frames=return_frames)
