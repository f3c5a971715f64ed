"""Short-Time Objective Intelligibility (STOI) — pure NumPy/scipy.

The reference imports pesq at srcs/sample.py:11-12 (unused) — the intent is a
perceptual metric next to SNR.  pesq/ViSQOL are not installed here; STOI
(Taal, Hendriks, Heusdens, Jensen, ICASSP 2011) needs nothing beyond scipy
and correlates with subjective intelligibility of processed speech, which is
the axis the de-quantization claim lives on.

Implemented from the paper spec (and numerically cross-checked against the
published MATLAB/pystoi constants): 10 kHz analysis rate, 256-sample Hann
frames with 50% overlap zero-padded to a 512 FFT, 15 one-third-octave bands
from 150 Hz, 384 ms (N=30 frame) analysis segments, -15 dB SDR clipping,
40 dB energy VAD on the clean signal.

Scores: ~1.0 for transparent processing, ~0.0-0.2 for uncorrelated noise.
"""

import numpy as np
from scipy.signal import resample_poly

FS = 10000          # analysis sample rate (Hz)
N_FRAME = 256       # frame length at FS (25.6 ms)
NFFT = 512          # zero-padded FFT size
NUM_BANDS = 15      # one-third-octave bands
MIN_FREQ = 150.0    # centre frequency of the lowest band (Hz)
N_SEG = 30          # frames per analysis segment (384 ms)
BETA = -15.0        # lower SDR clipping bound (dB)
DYN_RANGE = 40.0    # VAD: keep frames within this of the loudest (dB)
EPS = np.finfo(np.float64).eps


def _third_octave_matrix():
    """(NUM_BANDS, NFFT//2 + 1) 0/1 matrix pooling FFT bins into bands."""
    f = np.linspace(0.0, FS / 2.0, NFFT // 2 + 1)
    k = np.arange(NUM_BANDS)
    cf = MIN_FREQ * 2.0 ** (k / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((NUM_BANDS, f.size))
    for i in range(NUM_BANDS):
        # nearest-bin band edges (matches the published implementation)
        lo_i = int(np.argmin((f - lo[i]) ** 2))
        hi_i = int(np.argmin((f - hi[i]) ** 2))
        obm[i, lo_i:hi_i] = 1.0
    return obm


def _frame(x, frame_len, hop):
    n = 1 + max(0, (x.size - frame_len)) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _remove_silent_frames(x, y, dyn_range=DYN_RANGE,
                          frame_len=N_FRAME, hop=N_FRAME // 2):
    """Drop frames of x (and the same frames of y) more than dyn_range dB
    below the loudest frame of x, reconstructing by windowed overlap-add."""
    w = np.hanning(frame_len + 2)[1:-1]
    xf = _frame(x, frame_len, hop) * w
    yf = _frame(y, frame_len, hop) * w
    energies = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + EPS)
    mask = energies > (np.max(energies) - dyn_range)
    xf, yf = xf[mask], yf[mask]
    n = xf.shape[0]
    if n == 0:
        return np.zeros(0), np.zeros(0)
    out_len = frame_len + (n - 1) * hop
    x_out = np.zeros(out_len)
    y_out = np.zeros(out_len)
    for i in range(n):
        s = i * hop
        x_out[s:s + frame_len] += xf[i]
        y_out[s:s + frame_len] += yf[i]
    return x_out, y_out


def _band_spectrogram(x, obm):
    """(NUM_BANDS, M) one-third-octave band magnitudes of x."""
    w = np.hanning(N_FRAME + 2)[1:-1]
    frames = _frame(x, N_FRAME, N_FRAME // 2) * w
    spec = np.fft.rfft(frames, n=NFFT, axis=1)          # (M, NFFT//2+1)
    power = (spec.real ** 2 + spec.imag ** 2)
    return np.sqrt(obm @ power.T)                        # (bands, M)


def stoi(clean, degraded, fs=16000):
    """STOI of `degraded` against `clean`; 1-D arrays at sample rate fs.

    Returns a float in ~[0, 1] (not strictly bounded).  Raises ValueError if
    the (post-VAD) signal is shorter than one 384 ms analysis segment.
    """
    clean = np.asarray(clean, np.float64).reshape(-1)
    degraded = np.asarray(degraded, np.float64).reshape(-1)
    if clean.shape != degraded.shape:
        raise ValueError("clean/degraded length mismatch")
    if fs != FS:
        clean = resample_poly(clean, FS, fs)
        degraded = resample_poly(degraded, FS, fs)

    clean, degraded = _remove_silent_frames(clean, degraded)

    obm = _third_octave_matrix()
    X = _band_spectrogram(clean, obm)
    Y = _band_spectrogram(degraded, obm)
    m = X.shape[1]
    if m < N_SEG:
        raise ValueError(
            f"signal too short for STOI: {m} frames < {N_SEG} "
            "(need >= ~0.4 s of active speech)")

    # sliding (bands, N_SEG) segments ending at frame j, j = N_SEG-1 .. m-1
    n_seg = m - N_SEG + 1
    sx = np.lib.stride_tricks.sliding_window_view(X, N_SEG, axis=1)  # (B, n_seg, N)
    sy = np.lib.stride_tricks.sliding_window_view(Y, N_SEG, axis=1)

    # per-band energy normalization of the degraded segment
    alpha = (np.linalg.norm(sx, axis=2, keepdims=True)
             / (np.linalg.norm(sy, axis=2, keepdims=True) + EPS))
    sy = sy * alpha
    # clip at -15 dB SDR so destroyed time-frequency units saturate
    sy = np.minimum(sy, sx * (1.0 + 10.0 ** (-BETA / 20.0)))

    sx = sx - sx.mean(axis=2, keepdims=True)
    sy = sy - sy.mean(axis=2, keepdims=True)
    num = np.sum(sx * sy, axis=2)
    den = (np.linalg.norm(sx, axis=2) * np.linalg.norm(sy, axis=2) + EPS)
    return float(np.mean(num / den))


def stoi_batch(clean, degraded, fs=16000):
    """Mean STOI over a batch; inputs (B, L).  Clips too short for a full
    analysis segment are skipped; returns nan if every clip is skipped."""
    vals = []
    for c, d in zip(np.asarray(clean), np.asarray(degraded)):
        try:
            vals.append(stoi(c, d, fs))
        except ValueError:
            continue
    return float(np.mean(vals)) if vals else float("nan")
