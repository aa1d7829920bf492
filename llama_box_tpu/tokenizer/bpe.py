"""Byte-level BPE ('gpt2' model family) tokenizer.

Regex pre-tokenization + merge-rank BPE over the GPT-2 byte→unicode mapping.
Pre-tokenizer patterns are selected by the GGUF `tokenizer.ggml.pre` name the
same way llama.cpp dispatches on it (observable tokenizer behavior the
reference relies on; SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import functools

import regex as re

# regex pre-tokenizer patterns per `tokenizer.ggml.pre`
_PRE_GPT2 = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
_PRE_LLAMA3 = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)
_PRE_QWEN2 = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)
PRE_PATTERNS: dict[str, str] = {
    "default": _PRE_GPT2,
    "gpt2": _PRE_GPT2,
    "llama3": _PRE_LLAMA3,
    "llama-bpe": _PRE_LLAMA3,
    "llama-v3": _PRE_LLAMA3,
    "smaug-bpe": _PRE_LLAMA3,
    "falcon3": _PRE_LLAMA3,
    "qwen2": _PRE_QWEN2,
    "deepseek-v3": _PRE_QWEN2,
    "gpt-4o": _PRE_QWEN2,
    "deepseek-llm": _PRE_GPT2,
    "mpt": _PRE_GPT2,
    "olmo": _PRE_GPT2,
    "stablelm2": _PRE_QWEN2,
    "gpt-oss": _PRE_QWEN2,
}


@functools.lru_cache(maxsize=None)
def byte_to_unicode() -> dict[int, str]:
    """GPT-2 reversible byte→printable-unicode mapping."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
         list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


@functools.lru_cache(maxsize=None)
def unicode_to_byte() -> dict[str, int]:
    return {v: k for k, v in byte_to_unicode().items()}


class BPETokenizer:
    def __init__(self, vocab: list[str], merges: list[str], pre: str = "default"):
        self.vocab = vocab
        self.piece_to_id = {p: i for i, p in enumerate(vocab)}
        self.merge_ranks: dict[tuple[str, str], int] = {}
        for rank, m in enumerate(merges):
            a, sep, b = m.partition(" ")
            if sep:
                self.merge_ranks[(a, b)] = rank
        pattern = PRE_PATTERNS.get(pre, _PRE_GPT2)
        self.pre_re = re.compile(pattern)
        self.b2u = byte_to_unicode()
        self.u2b = unicode_to_byte()
        self._merges = [(m.partition(" ")[0], m.partition(" ")[2])
                        for m in merges if " " in m]

    def _native_handle(self):
        """Lazy native merge core (native/tokenizer_core.cpp lbox_bpe_*);
        None when the library is unavailable — the Python loop always
        works."""
        if not hasattr(self, "_nh"):
            self._nh = None
            try:
                import ctypes

                import numpy as np

                from ..gguf.native import get_lib
                lib = get_lib()
                if lib is not None and len(self.vocab) >= 1000:
                    venc = [p.encode("utf-8") for p in self.vocab]
                    vblob = b"".join(venc)
                    vlens = np.asarray([len(x) for x in venc], np.int32)
                    lenc = [a.encode("utf-8") for a, _ in self._merges]
                    renc = [b.encode("utf-8") for _, b in self._merges]
                    llens = np.asarray([len(x) for x in lenc], np.int32)
                    rlens = np.asarray([len(x) for x in renc], np.int32)
                    self._nh_lib = lib
                    self._nh = lib.lbox_bpe_new(
                        vblob, vlens.ctypes.data_as(ctypes.c_void_p),
                        len(venc),
                        b"".join(lenc),
                        llens.ctypes.data_as(ctypes.c_void_p),
                        b"".join(renc),
                        rlens.ctypes.data_as(ctypes.c_void_p),
                        len(lenc))
            except Exception:  # noqa: BLE001
                self._nh = None
        return self._nh

    def _bpe_word(self, word: str) -> list[str]:
        parts = list(word)
        if len(parts) <= 1:
            return parts
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.merge_ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                return parts
            parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        nh = self._native_handle()
        if nh is not None:
            import ctypes

            import numpy as np
            buf = np.empty(4096, np.int32)
            for piece in self.pre_re.findall(text):
                mapped = "".join(self.b2u[b] for b in piece.encode("utf-8"))
                data = mapped.encode("utf-8")
                if len(data) + 8 > buf.shape[0]:
                    buf = np.empty(len(data) + 8, np.int32)
                m = self._nh_lib.lbox_bpe_encode(
                    nh, data, len(data),
                    buf.ctypes.data_as(ctypes.c_void_p), buf.shape[0])
                if m < 0:
                    out.extend(self._encode_word_py(mapped))
                else:
                    out.extend(buf[:m].tolist())
            return out
        for piece in self.pre_re.findall(text):
            mapped = "".join(self.b2u[b] for b in piece.encode("utf-8"))
            for sub in self._bpe_word(mapped):
                tid = self.piece_to_id.get(sub)
                if tid is not None:
                    out.append(tid)
                else:
                    # unknown after merges: emit per-char ids where known
                    for ch in sub:
                        tid = self.piece_to_id.get(ch)
                        if tid is not None:
                            out.append(tid)
        return out

    def _encode_word_py(self, mapped: str) -> list[int]:
        out: list[int] = []
        for sub in self._bpe_word(mapped):
            tid = self.piece_to_id.get(sub)
            if tid is not None:
                out.append(tid)
            else:
                for ch in sub:
                    tid = self.piece_to_id.get(ch)
                    if tid is not None:
                        out.append(tid)
        return out

    def piece_bytes(self, token_id: int) -> bytes:
        piece = self.vocab[token_id]
        try:
            return bytes(self.u2b[ch] for ch in piece)
        except KeyError:
            return piece.encode("utf-8")
