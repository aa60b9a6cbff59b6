"""LM pretraining data pipeline: tokenized mmap chunks + stateful samplers.

Re-design of `moe_pretrain_model/framework/dataset/text/
chunked_setencepiece_lm_dataset.py` (stream shards -> train vocab ->
tokenize to uint16 mmap chunks -> fixed `unroll_len+1` windows) and
`framework/loader/sampler.py` (checkpointable sequential multibatch
sampler, seeded infinite sampler).

Differences from the reference, by design:
- tokenizer: HF `tokenizers` (BPE) instead of SentencePiece (not in the
  image); the vocab-train-then-tokenize flow is preserved.
- no per-rank work slicing: batches are *global*; the mesh shards them
  (parallel/mesh.batch_sharding), replacing DatasetSplitter.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

TOKEN_DTYPE = np.uint16


class TokenChunkDataset:
    """Fixed-window views over one or more uint16 token mmap chunks.

    Layout mirrors the reference's `{name}/tokenized/...bin` chunks
    (chunked_setencepiece_lm_dataset.py:218-301): each chunk is a flat
    uint16 array; windows of `unroll_len + 1` tokens are cut per chunk
    (no window crosses a chunk boundary).
    """

    def __init__(self, chunk_paths: Sequence[os.PathLike], unroll_len: int):
        self.unroll_len = unroll_len
        self.window = unroll_len + 1
        self.chunks: List[np.memmap] = []
        self.cum_windows = [0]
        for p in chunk_paths:
            arr = np.memmap(p, dtype=TOKEN_DTYPE, mode="r")
            self.chunks.append(arr)
            self.cum_windows.append(
                self.cum_windows[-1] + len(arr) // self.window)
        if self.cum_windows[-1] == 0:
            raise ValueError("no complete windows in the given chunks")

    def __len__(self) -> int:
        return self.cum_windows[-1]

    def __getitem__(self, i: int) -> np.ndarray:
        if not 0 <= i < len(self):
            raise IndexError(i)
        ci = int(np.searchsorted(self.cum_windows, i, side="right")) - 1
        off = (i - self.cum_windows[ci]) * self.window
        return np.asarray(self.chunks[ci][off:off + self.window],
                          dtype=np.int32)

    def batch(self, indices: np.ndarray) -> np.ndarray:
        return np.stack([self[int(i)] for i in indices])


class SyntheticLMDataset:
    """Deterministic synthetic corpus (arithmetic token sequences) for
    smoke tests and offline benchmarking — stands in for the streaming
    C4/SlimPajama/peS2o sets when there is no network."""

    def __init__(self, vocab_size: int, unroll_len: int,
                 n_windows: int = 65536, seed: int = 0):
        self.vocab_size = vocab_size
        self.unroll_len = unroll_len
        self.n_windows = n_windows
        self.seed = seed

    def __len__(self) -> int:
        return self.n_windows

    def __getitem__(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1_000_003 + i)
        start = rng.integers(0, self.vocab_size)
        stride = rng.integers(1, 7)
        seq = (start + stride * np.arange(self.unroll_len + 1))
        return (seq % self.vocab_size).astype(np.int32)

    def batch(self, indices: np.ndarray) -> np.ndarray:
        return np.stack([self[int(i)] for i in indices])


@dataclasses.dataclass
class SequentialMultibatchSampler:
    """Checkpointable sequential sampler: batch lane b walks its own
    contiguous stripe of the dataset (framework/loader/sampler.py
    `MultibatchSequentialSampler` semantics — deterministic, resumable).
    """

    n_items: int
    batch_size: int
    pos: int = 0

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        stripe = self.n_items // self.batch_size
        if stripe == 0:
            raise ValueError("dataset smaller than batch size")
        offsets = np.arange(self.batch_size) * stripe
        idx = offsets + (self.pos % stripe)
        self.pos += 1
        return idx

    def state_dict(self) -> Dict:
        return {"pos": self.pos}

    def load_state_dict(self, d: Dict) -> None:
        self.pos = int(d["pos"])


@dataclasses.dataclass
class InfiniteRandomSampler:
    """Seeded random-with-replacement sampler (framework/loader/sampler.py
    `InfiniteSampler` role), checkpointable via the draw counter."""

    n_items: int
    batch_size: int
    seed: int = 0
    pos: int = 0

    def __next__(self) -> np.ndarray:
        rng = np.random.default_rng((self.seed, self.pos))
        self.pos += 1
        return rng.integers(0, self.n_items, size=self.batch_size)

    def __iter__(self):
        return self

    def state_dict(self) -> Dict:
        return {"pos": self.pos, "seed": self.seed}

    def load_state_dict(self, d: Dict) -> None:
        self.pos = int(d["pos"])
        self.seed = int(d["seed"])


# ---------------------------------------------------------------------------
# Tokenization (vocab train -> mmap chunks)
# ---------------------------------------------------------------------------

def train_tokenizer(texts: Iterator[str], vocab_size: int,
                    save_path: os.PathLike):
    """Train a byte-level BPE vocab on an iterator of documents (the role of
    the reference's SentencePiece training on the first shards,
    chunked_setencepiece_lm_dataset.py:38-130)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<eos>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(texts, trainer)
    tok.save(str(save_path))
    return tok


def load_tokenizer(path: os.PathLike):
    from tokenizers import Tokenizer
    return Tokenizer.from_file(str(path))


def tokenize_to_chunks(texts: Iterator[str], tokenizer, out_dir: os.PathLike,
                       chunk_tokens: int = 2**24,
                       eos_id: int = 0) -> List[Path]:
    """Tokenize documents into flat uint16 chunk files, one <eos> between
    documents (the mmap-chunk writer role,
    chunked_setencepiece_lm_dataset.py:218-301)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    buf: List[int] = []
    paths: List[Path] = []

    def flush():
        if not buf:
            return
        p = out_dir / f"chunk_{len(paths):05d}.bin"
        np.asarray(buf, dtype=TOKEN_DTYPE).tofile(p)
        paths.append(p)
        buf.clear()

    for doc in texts:
        ids = tokenizer.encode(doc).ids
        buf.extend(ids)
        buf.append(eos_id)
        if len(buf) >= chunk_tokens:
            flush()
    flush()
    manifest = {"chunks": [p.name for p in paths]}
    (out_dir / "manifest.json").write_text(json.dumps(manifest))
    return paths


def open_chunk_dir(d: os.PathLike, unroll_len: int) -> TokenChunkDataset:
    d = Path(d)
    manifest = json.loads((d / "manifest.json").read_text())
    return TokenChunkDataset([d / name for name in manifest["chunks"]],
                             unroll_len)
