"""DNS-style pre-chunked dataset (reference srcs/dataset.py `EnCodec_data`):
per-speaker folders of 5 s chunk files; random chunk + random crop, /32768
PCM normalize, optional two-speaker mixing.

Chunks are stored either as torch `.pth` (reference format, loaded via torch
when available) or `.npy`.
"""

from __future__ import annotations

import glob
import typing as tp

import numpy as np


def _load_chunk(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import torch  # torch cpu is available in this image

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t, dtype=np.float32)


class EnCodecData:
    """`stable=True` reproduces the reference's dataset_stable.py variant:
    std-normalized segments, and __getitem__ returns (seg, seg_id)."""

    def __init__(
        self,
        path: str,
        task: str = "train",
        seq_len_p_sec: float = 5.0,
        sample_rate: int = 16000,
        multi: bool = False,
        n_spks: int = 0,
        stable: bool = False,
    ):
        self.stable = stable
        self.spks = sorted(glob.glob(path))
        if n_spks:
            self.spks = self.spks[:n_spks]
        if not self.spks:
            raise FileNotFoundError(f"no speaker folders under {path}")
        self.task = task
        self.seq_len_p_sec = seq_len_p_sec
        self.sample_rate = sample_rate
        self.multi = multi

    def __len__(self) -> int:
        return len(self.spks)

    def get_seq(
        self, idx: int, seg_id: tp.Optional[int] = None, rng: tp.Optional[np.random.Generator] = None
    ) -> tp.Tuple[np.ndarray, int]:
        rng = rng or np.random.default_rng(idx)
        seg_l = sorted(glob.glob(self.spks[idx] + "/*.pth")) or sorted(
            glob.glob(self.spks[idx] + "/*.npy")
        )
        train_num = len(seg_l) - 2
        if self.task == "train":
            seg_id = int(rng.integers(0, train_num)) if seg_id is None else min(seg_id, train_num)
        elif self.task == "valid":
            seg_id = -1 if seg_id is None else -2
        else:
            raise ValueError("task can only be train or valid")
        seg = _load_chunk(seg_l[seg_id]).astype(np.float32)
        if self.stable:
            std = np.std(seg)
            if not np.isclose(std, 0):
                seg = seg / std * 32768.0 / 152.0  # data_max contract (dataset.py:38)
        if self.seq_len_p_sec < 5:
            seq_length = int(self.seq_len_p_sec * self.sample_rate)
            if self.task == "valid":
                seg = seg[:seq_length]
            else:
                while True:
                    loc = int(rng.integers(0, len(seg) - seq_length))
                    sel = seg[loc : loc + seq_length]
                    if not np.isclose(np.std(sel), 0):
                        seg = sel
                        break
        return seg / 32768.0, seg_id

    def __getitem__(self, idx: int, rng: tp.Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(idx)
        if self.multi:
            seq1, seg_id = self.get_seq(idx, None, rng)
            seq2, _ = self.get_seq((idx + 1) % len(self), seg_id, rng)
            return (seq1 + seq2).astype(np.float32)
        seq, seg_id = self.get_seq(idx, None, rng)
        if self.stable:
            return seq.astype(np.float32), seg_id
        return seq.astype(np.float32)
