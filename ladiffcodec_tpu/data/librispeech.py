"""LibriSpeech segment dataset + a host-side batch pipeline for JAX.

TPU-native counterpart of reference srcs/dataset_libri.py + the torch
DataLoader wiring (srcs/train.py:322-336).  Same semantics:
  * train: ``{root}/train-clean-100/*/*/*.wav`` (first 10k files);
    valid/eval: ``dev-clean`` (dataset_libri.py:31-36);
  * per item: read wav, peak-normalize, skip too-short/silent files by
    walking forward, draw a random fixed-length crop rejecting silent crops
    (dataset_libri.py:48-91);
  * eval: deterministic prefix crop.

Instead of torch worker processes the pipeline is a `ThreadPoolExecutor`
prefetcher producing ready (B, L, 1) numpy batches, double-buffered ahead of
the device step (pure-numpy decode releases the GIL in the libc reads, and a
TPU step is long enough to hide the host work).
"""

from __future__ import annotations

import glob
import os
import queue

import typing as tp
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .audio_io import read_wav


class DatasetLibri:
    """Indexable segment source (reference Dataset_Libri)."""

    def __init__(
        self,
        task: str = "train",
        seq_len_p_sec: float = 1.0,
        data_folder_path: str = "",
        sample_rate: int = 16000,
        max_files: int = 10000,
    ):
        self.task = task
        self.seq_len_p_sec = seq_len_p_sec
        self.sample_rate = sample_rate
        if task == "train":
            pattern = os.path.join(data_folder_path, "train-clean-100", "*", "*", "*.wav")
        elif task in ("valid", "eval"):
            pattern = os.path.join(data_folder_path, "dev-clean", "*", "*", "*.wav")
        else:
            raise ValueError(task)
        self.files = sorted(glob.glob(pattern))[:max_files]
        if not self.files:
            raise FileNotFoundError(f"no wav files under {pattern}")
        self._cache: tp.Dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.files)

    @staticmethod
    def _normalize(x: np.ndarray) -> np.ndarray:
        return x / (np.max(np.abs(x)) + 1e-20)

    def _load(self, idx: int) -> np.ndarray:
        """Decoded+normalized mono audio for file `idx`, RAM-cached.

        On this 1-core host the 960-file corpus costs ~2-4 s of wav decode
        per epoch — enough to starve the TPU dispatch loop.  The decoded
        corpus is ~250 MB; cache it (reference Dataset_Libri re-reads every
        item, dataset_libri.py:66-74).
        """
        idx = idx % len(self)
        hit = self._cache.get(idx)
        if hit is None:
            audio, _sr = read_wav(self.files[idx])
            hit = self._normalize(audio[0]).astype(np.float32)
            self._cache[idx] = hit
        return hit

    def __getitem__(self, idx: int, rng: tp.Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng(idx)
        seq_length = int(self.seq_len_p_sec * self.sample_rate)
        x = self._load(idx)
        if self.task == "eval":
            return x[:seq_length].astype(np.float32)
        # skip-ahead on short/silent files (reference dataset_libri.py:76-80)
        tries = 0
        while len(x) < seq_length or np.isclose(np.std(x), 0):
            idx = (idx + 1) % len(self)
            x = self._load(idx)
            tries += 1
            if tries > len(self):
                raise RuntimeError("no usable file found")
        # random crop rejecting silent segments (dataset_libri.py:82-91)
        while True:
            loc = 0 if len(x) == seq_length else int(rng.integers(0, len(x) - seq_length))
            seg = x[loc : loc + seq_length]
            if not np.isclose(np.std(seg), 0):
                return seg.astype(np.float32)


class BatchLoader:
    """Threaded prefetching batcher: yields (B, L, 1) float32 numpy arrays.

    `shard_index/shard_count` split the file list across hosts for
    data-parallel training (each host feeds its own mesh slice).
    """

    def __init__(
        self,
        dataset: DatasetLibri,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        shard_index: int = 0,
        shard_count: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.indices = np.arange(shard_index, len(dataset), shard_count)
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = self.indices.copy()
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size)
        ]

        def load_batch(idxs):
            segs = [
                self.dataset.__getitem__(int(i), np.random.default_rng((self.seed, self._epoch, int(i))))
                for i in idxs
            ]
            return np.stack(segs)[..., None]  # (B, L, 1)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures: "queue.Queue" = queue.Queue()
            it = iter(batches)
            # fill the pipeline
            for _ in range(self.prefetch + 1):
                try:
                    futures.put(pool.submit(load_batch, next(it)))
                except StopIteration:
                    break
            while not futures.empty():
                f = futures.get()
                try:
                    futures.put(pool.submit(load_batch, next(it)))
                except StopIteration:
                    pass
                yield f.result()
