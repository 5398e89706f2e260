"""Evaluation data + tokenizers.

WikiText-2 via `datasets` when available (reference evaluation/metrics.py:121);
a deterministic synthetic corpus otherwise (this environment has no network).
A byte-level tokenizer backs random-init models so the full harness runs
offline end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np

_FALLBACK_SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "In the beginning, there was nothing. Then there was light.",
    "Science is the systematic study of the natural world.",
    "A paged key value cache stores attention context in fixed size blocks.",
    "Error correcting codes add parity bits so corrupted data can be repaired.",
    "The transformer architecture relies on attention instead of recurrence.",
    "Quantization maps floating point values onto a small set of integers.",
    "Bit flips in memory can silently corrupt the state of a running program.",
    "The Golay code corrects up to three errors in every codeword.",
    "Perplexity measures how well a language model predicts held out text.",
    "Hardware reliability degrades as process nodes shrink and voltage drops.",
    "Interpolation recovers a damaged value from its temporal neighbors.",
]


def _hub_reachable(timeout: float = 2.0) -> bool:
    import socket

    try:
        socket.setdefaulttimeout(timeout)
        socket.create_connection(("huggingface.co", 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def load_wikitext2_test(max_samples: int = 100, min_chars: int = 50):
    """WikiText-2 test split when reachable; synthetic fallback otherwise
    (reference metrics.py:121-133). Probes connectivity first so offline
    environments don't stall in the hub's retry loop."""
    import os

    offline = os.environ.get("HF_DATASETS_OFFLINE") == "1" or not _hub_reachable()
    try:
        if offline:
            os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from datasets import load_dataset

        dataset = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        texts = [t for t in dataset["text"] if len(t.strip()) > min_chars]
        return texts[:max_samples]
    except Exception:
        return synthetic_corpus(max_samples)


def synthetic_corpus(n_texts: int = 20, sentences_per_text: int = 12, seed: int = 0):
    """Deterministic pseudo-texts for offline runs."""
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_texts):
        idx = rng.integers(0, len(_FALLBACK_SENTENCES), size=sentences_per_text)
        texts.append(" ".join(_FALLBACK_SENTENCES[i] for i in idx))
    return texts


class ByteTokenizer:
    """UTF-8 byte tokenizer (vocab 256) for random-init tiny models."""

    vocab_size = 256
    pad_token_id = 0
    eos_token_id = 0

    def encode(self, text: str, max_length: int | None = None):
        ids = list(text.encode("utf-8"))
        if max_length is not None:
            ids = ids[:max_length]
        return ids

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="replace")

    def __call__(self, text, truncation=False, max_length=None, **kw):
        return {"input_ids": self.encode(text, max_length if truncation else None)}


def get_tokenizer(model_name: str, hf_id: str | None):
    """HF tokenizer when available; byte tokenizer otherwise."""
    if hf_id is not None:
        try:
            import transformers

            return transformers.AutoTokenizer.from_pretrained(hf_id)
        except Exception:
            pass
    return ByteTokenizer()


def tokenize(tokenizer, text: str, max_length: int | None = None) -> np.ndarray:
    """Uniform [1, S] int32 ids from either tokenizer flavor."""
    if isinstance(tokenizer, ByteTokenizer):
        ids = tokenizer.encode(text, max_length)
    else:
        out = tokenizer(text, truncation=max_length is not None, max_length=max_length)
        ids = out["input_ids"]
    return np.asarray(ids, dtype=np.int32)[None, :]


def pad_to_bucket(ids: np.ndarray, bucket: int = 32, pad_id: int = 0):
    """Pad [1, S] ids up to a multiple of `bucket` so jitted forwards compile
    once per bucket instead of once per text length.

    Returns (padded_ids, labels, true_len): padded label positions are -100
    so the CE math is unchanged; KV statistics include the (zero-embedding)
    padded tail - a <bucket-token accounting delta per text vs exact-length
    processing, noted in the results JSON.
    """
    L = ids.shape[1]
    target = -(-L // bucket) * bucket
    padded = np.full((ids.shape[0], target), pad_id, dtype=np.int32)
    padded[:, :L] = ids
    labels = np.full_like(padded, -100)
    labels[:, :L] = ids
    return padded, labels, L
