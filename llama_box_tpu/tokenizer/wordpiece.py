"""WordPiece tokenizer (BERT-family GGUFs, tokenizer.ggml.model == "bert").

Greedy longest-match-first with "##" continuation pieces, basic whitespace +
punctuation pre-tokenization, optional lowercasing — the semantics llama.cpp
applies for bert vocabs (reference gets this via llama_vocab; our rerank
models need it for [CLS] q [SEP] d [SEP] inputs)."""

from __future__ import annotations

import unicodedata


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class WordPieceTokenizer:
    def __init__(self, vocab: list[str], unk_id: int | None = None,
                 lowercase: bool = True, max_word_chars: int = 100):
        self.vocab = vocab
        self.piece_to_id = {p: i for i, p in enumerate(vocab)}
        self.unk_id = unk_id if unk_id is not None else \
            self.piece_to_id.get("[UNK]", 0)
        self.lowercase = lowercase
        self.max_word_chars = max_word_chars

    def _pre_tokenize(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
            text = "".join(c for c in unicodedata.normalize("NFD", text)
                           if unicodedata.category(c) != "Mn")
        words: list[str] = []
        buf = []
        for ch in text:
            if ch.isspace():
                if buf:
                    words.append("".join(buf))
                    buf = []
            elif _is_punct(ch):
                if buf:
                    words.append("".join(buf))
                    buf = []
                words.append(ch)
            else:
                buf.append(ch)
        if buf:
            words.append("".join(buf))
        return words

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for word in self._pre_tokenize(text):
            if len(word) > self.max_word_chars:
                out.append(self.unk_id)
                continue
            start = 0
            pieces: list[int] = []
            ok = True
            while start < len(word):
                end = len(word)
                tid = None
                while end > start:
                    piece = word[start:end]
                    if start > 0:
                        piece = "##" + piece
                    tid = self.piece_to_id.get(piece)
                    if tid is not None:
                        break
                    end -= 1
                if tid is None:
                    ok = False
                    break
                pieces.append(tid)
                start = end
            out.extend(pieces if ok else [self.unk_id])
        return out

    def piece_bytes(self, token_id: int) -> bytes:
        piece = self.vocab[token_id]
        if piece.startswith("##"):
            return piece[2:].encode("utf-8")
        return (" " + piece).encode("utf-8")
