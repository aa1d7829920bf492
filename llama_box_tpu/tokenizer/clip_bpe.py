"""CLIP text-encoder BPE tokenizer (Stable Diffusion conditioning).

The reference gets this from stable-diffusion.cpp's embedded vocab; GGUF SD
checkpoints don't carry a tokenizer, so we load the standard CLIP
vocab.json + merges.txt from a user-supplied path (--clip-vocab). Semantics:
lowercase, whitespace/punctuation pre-tokenization, byte-pair merges with
'</w>' end-of-word markers, <|startoftext|>/<|endoftext|> framing, pad to
77 tokens.
"""

from __future__ import annotations

import gzip
import json
import re

_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
    r"[a-z]+|[0-9]|[^\sa-z0-9]+", re.IGNORECASE)


class CLIPTokenizer:
    def __init__(self, vocab: dict[str, int], merges: list[str],
                 context_length: int = 77):
        self.vocab = vocab
        self.ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.context_length = context_length
        self.sot = vocab.get("<|startoftext|>", 49406)
        self.eot = vocab.get("<|endoftext|>", 49407)
        self._cache: dict[str, list[int]] = {}

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str | None = None):
        opener = gzip.open if vocab_path.endswith(".gz") else open
        with opener(vocab_path, "rt", encoding="utf-8") as f:
            vocab = json.load(f)
        merges: list[str] = []
        if merges_path:
            opener = gzip.open if merges_path.endswith(".gz") else open
            with opener(merges_path, "rt", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    merges.append(line)
        return cls(vocab, merges)

    def _bpe(self, word: str) -> list[str]:
        pieces = list(word[:-1]) + [word[-1] + "</w>"]
        while len(pieces) > 1:
            best = None
            best_rank = None
            for i in range(len(pieces) - 1):
                r = self.ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            pieces[best:best + 2] = [pieces[best] + pieces[best + 1]]
        return pieces

    def encode_text(self, text: str) -> list[int]:
        out: list[int] = []
        for word in _PAT.findall(text.lower().strip()):
            if word in ("<|startoftext|>", "<|endoftext|>"):
                out.append(self.vocab.get(word, self.eot))
                continue
            if word in self._cache:
                out.extend(self._cache[word])
                continue
            ids = [self.vocab.get(p, self.eot) for p in self._bpe(word)]
            self._cache[word] = ids
            out.extend(ids)
        return out

    def __call__(self, prompt: str) -> list[int]:
        ids = [self.sot] + self.encode_text(prompt)[: self.context_length - 2] \
            + [self.eot]
        ids += [self.eot] * (self.context_length - len(ids))
        return ids


class HashTokenizer:
    """Degraded fallback when no CLIP vocab file is provided: deterministic
    hashing into the vocab range. Conditioning quality is meaningless, but
    the pipeline runs (a warning is logged at startup)."""

    def __init__(self, vocab_size: int = 49408, context_length: int = 77):
        self.vocab_size = vocab_size
        self.context_length = context_length

    def __call__(self, prompt: str) -> list[int]:
        from ..utils.text import fnv1a_64
        ids = [49406]
        for word in prompt.lower().split():
            ids.append(fnv1a_64(word.encode()) % (self.vocab_size - 2))
        ids = ids[: self.context_length - 1] + [49407]
        ids += [49407] * (self.context_length - len(ids))
        return ids
