"""Shared test helpers: a deterministic fake tokenizer and tiny-model builders."""
from __future__ import annotations

from typing import List

import numpy as np


class FakeTokenizer:
    """Hash-bucket word tokenizer for tests that don't need a real vocab.

    Deterministic, reversible enough for round-trip assertions on counts.
    Token ids land in [10, vocab_limit) so they never collide with the
    <ts> placeholder ids used by tiny configs (>= 500 by default).
    """

    def __init__(self, vocab_limit: int = 400):
        self.vocab_limit = vocab_limit
        self.pad_token_id = 0
        self.eos_token_id = 1

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        # Character-pair tokenization: stable and boundary-insensitive enough.
        out = []
        for word in text.split():
            h = 2166136261
            for c in word:
                h = (h ^ ord(c)) * 16777619 & 0xFFFFFFFF
            out.append(10 + h % (self.vocab_limit - 10))
        return out

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids)


def random_series(rng: np.random.Generator, length: int, scale: float = 10.0):
    return rng.normal(0.0, scale, size=length).cumsum()
