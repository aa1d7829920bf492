"""SentencePiece-style (LLaMA 'llama' model) tokenizer.

Greedy bigram merging by vocab score over UTF-8 character symbols, with byte
fallback — the same algorithm family the reference gets from llama.cpp's SPM
tokenizer (consumed via z_utils.hpp:372-483 tokenize helpers). Implemented
from the SentencePiece BPE-inference description.
"""

from __future__ import annotations

import heapq

SPM_UNDERLINE = "▁"


class SPMTokenizer:
    def __init__(self, vocab: list[str], scores: list[float],
                 token_types: list[int], unk_id: int | None,
                 add_space_prefix: bool = True,
                 remove_extra_whitespaces: bool = False):
        self.vocab = vocab
        self.scores = scores
        self.token_types = token_types
        self.unk_id = unk_id
        self.add_space_prefix = add_space_prefix
        self.remove_extra_whitespaces = remove_extra_whitespaces
        self.piece_to_id = {p: i for i, p in enumerate(vocab)}
        # byte fallback table: "<0xNN>" pieces
        self.byte_pieces: dict[int, int] = {}
        for i, p in enumerate(vocab):
            if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
                try:
                    self.byte_pieces[int(p[3:5], 16)] = i
                except ValueError:
                    pass

    def _native_handle(self):
        if not hasattr(self, "_nh"):
            self._nh = None
            try:
                import ctypes

                import numpy as np

                from ..gguf.native import get_lib
                lib = get_lib()
                if lib is not None and len(self.vocab) >= 1000:
                    blob = b"".join(p.encode("utf-8") for p in self.vocab)
                    lens = np.asarray([len(p.encode("utf-8"))
                                       for p in self.vocab], np.int32)
                    scores = np.asarray(self.scores, np.float32)
                    self._nh_lib = lib
                    self._nh = lib.lbox_spm_new(
                        blob, lens.ctypes.data_as(ctypes.c_void_p),
                        scores.ctypes.data_as(ctypes.c_void_p),
                        len(self.vocab),
                        -1 if self.unk_id is None else self.unk_id)
            except Exception:  # noqa: BLE001 — python path always works
                self._nh = None
        return self._nh

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        if self.add_space_prefix:
            text = " " + text
        text = text.replace(" ", SPM_UNDERLINE)

        nh = self._native_handle()
        if nh is not None:
            import ctypes

            import numpy as np
            data = text.encode("utf-8")
            out = np.empty(len(data) + 8, np.int32)
            m = self._nh_lib.lbox_spm_encode(
                nh, data, len(data),
                out.ctypes.data_as(ctypes.c_void_p), out.shape[0])
            if m >= 0:
                return out[:m].tolist()

        # initial symbols: unicode characters
        symbols = list(text)
        n = len(symbols)
        if n == 0:
            return []
        # doubly-linked list over symbol slots; merged symbols concatenate
        prev = list(range(-1, n - 1))
        nxt = list(range(1, n + 1))
        nxt[-1] = -1
        alive = [True] * n

        heap: list[tuple[float, int, int, str]] = []

        def try_add(left: int) -> None:
            right = nxt[left]
            if right == -1:
                return
            merged = symbols[left] + symbols[right]
            tid = self.piece_to_id.get(merged)
            if tid is not None:
                # higher score = better; heapq is a min-heap so negate
                heapq.heappush(heap, (-self.scores[tid], left, right, merged))

        for i in range(n - 1):
            try_add(i)

        while heap:
            _, left, right, merged = heapq.heappop(heap)
            if not alive[left] or not alive[right]:
                continue
            if symbols[left] + symbols[right] != merged or nxt[left] != right:
                continue
            symbols[left] = merged
            alive[right] = False
            nxt[left] = nxt[right]
            if nxt[right] != -1:
                prev[nxt[right]] = left
            if prev[left] != -1:
                try_add(prev[left])
            try_add(left)

        out: list[int] = []
        i = 0
        while i != -1:
            if alive[i]:
                self._resegment(symbols[i], out)
            i = nxt[i]
        return out

    def _resegment(self, piece: str, out: list[int]) -> None:
        tid = self.piece_to_id.get(piece)
        if tid is not None:
            out.append(tid)
            return
        if len(piece) > 1:
            # try splitting back into known sub-pieces (rare path)
            for cut in range(1, len(piece)):
                a, b = piece[:cut], piece[cut:]
                if a in self.piece_to_id and b in self.piece_to_id:
                    out.append(self.piece_to_id[a])
                    out.append(self.piece_to_id[b])
                    return
        # byte fallback
        data = piece.encode("utf-8")
        for byte in data:
            bid = self.byte_pieces.get(byte)
            if bid is not None:
                out.append(bid)
            elif self.unk_id is not None:
                out.append(self.unk_id)

    def piece_bytes(self, token_id: int) -> bytes:
        piece = self.vocab[token_id]
        if len(piece) == 6 and piece.startswith("<0x") and piece.endswith(">"):
            try:
                return bytes([int(piece[3:5], 16)])
            except ValueError:
                pass
        return piece.replace(SPM_UNDERLINE, " ").encode("utf-8")
