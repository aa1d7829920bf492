"""Unified tokenizer facade constructed from GGUF metadata.

Reproduces the observable tokenize/detokenize semantics the reference gets
from llama.cpp (special-token parsing, BOS/EOS insertion, byte fallback,
UTF-8-safe streaming detokenization; reference z_utils.hpp:372-483 and
SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import enum
from typing import TYPE_CHECKING

from .bpe import BPETokenizer
from .spm import SPMTokenizer, SPM_UNDERLINE
from .wordpiece import WordPieceTokenizer

if TYPE_CHECKING:
    from ..gguf.reader import GGUFFile


class TokenType(enum.IntEnum):
    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


def _meta_list(v):
    if v is None:
        return None
    if hasattr(v, "tolist"):
        return v.tolist()
    return list(v)


class Tokenizer:
    def __init__(
        self,
        model: str,
        vocab: list[str],
        scores: list[float] | None = None,
        token_types: list[int] | None = None,
        merges: list[str] | None = None,
        pre: str = "default",
        bos_id: int | None = None,
        eos_id: int | None = None,
        eot_id: int | None = None,
        eom_id: int | None = None,
        unk_id: int | None = None,
        sep_id: int | None = None,
        pad_id: int | None = None,
        cls_id: int | None = None,
        add_bos: bool = True,
        add_eos: bool = False,
        add_space_prefix: bool | None = None,
        chat_template: str | None = None,
    ):
        self.model = model
        self.vocab = vocab
        self.scores = scores or [0.0] * len(vocab)
        self.token_types = [TokenType(t) for t in (token_types or [1] * len(vocab))]
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.eot_id = eot_id
        self.eom_id = eom_id
        self.unk_id = unk_id
        self.sep_id = sep_id
        self.pad_id = pad_id
        self.cls_id = cls_id
        self.add_bos = add_bos
        self.add_eos = add_eos
        self.chat_template = chat_template
        self.piece_to_id = {p: i for i, p in enumerate(vocab)}

        if model == "llama":
            asp = True if add_space_prefix is None else add_space_prefix
            self._inner = SPMTokenizer(vocab, self.scores,
                                       [int(t) for t in self.token_types],
                                       unk_id, add_space_prefix=asp)
        elif model == "bert":
            self._inner = WordPieceTokenizer(vocab, unk_id)
        elif model in ("gpt2", "t5"):
            self._inner = BPETokenizer(vocab, merges or [], pre=pre)
        else:
            raise ValueError(f"unsupported tokenizer model {model!r}")

        # special tokens: CONTROL + USER_DEFINED, longest first for greedy scan
        self.special_ids = {
            i for i, t in enumerate(self.token_types)
            if t in (TokenType.CONTROL, TokenType.USER_DEFINED)
        }
        self._special_sorted = sorted(
            ((vocab[i], i) for i in self.special_ids if vocab[i]),
            key=lambda kv: -len(kv[0]),
        )
        # end-of-generation set
        self.eog_ids = {t for t in (eos_id, eot_id, eom_id) if t is not None}
        for piece in ("<|eot_id|>", "<|im_end|>", "<|end|>", "<end_of_turn>",
                      "<|endoftext|>", "<EOT>", "<|end_of_text|>", "<|return|>"):
            tid = self.piece_to_id.get(piece)
            if tid is not None and tid in self.special_ids:
                self.eog_ids.add(tid)

    # -- construction from GGUF ----------------------------------------------

    @classmethod
    def from_gguf(cls, g: "GGUFFile") -> "Tokenizer":
        md = g.metadata

        def get(key, default=None):
            return md.get(f"tokenizer.ggml.{key}", default)

        def opt_id(key):
            v = get(key)
            if v is None:
                return None
            v = int(v)
            return v if v >= 0 else None

        return cls(
            model=str(get("model", "llama")),
            vocab=_meta_list(get("tokens")) or [],
            scores=_meta_list(get("scores")),
            token_types=_meta_list(get("token_type")),
            merges=_meta_list(get("merges")),
            pre=str(get("pre", "default")),
            bos_id=opt_id("bos_token_id"),
            eos_id=opt_id("eos_token_id"),
            eot_id=opt_id("eot_token_id"),
            eom_id=opt_id("eom_token_id"),
            unk_id=opt_id("unknown_token_id"),
            sep_id=opt_id("seperator_token_id"),
            pad_id=opt_id("padding_token_id"),
            cls_id=opt_id("cls_token_id"),
            add_bos=bool(get("add_bos_token", True)),
            add_eos=bool(get("add_eos_token", False)),
            add_space_prefix=(None if get("add_space_prefix") is None
                              else bool(get("add_space_prefix"))),
            chat_template=md.get("tokenizer.chat_template"),
        )

    # -- encode ---------------------------------------------------------------

    @property
    def n_vocab(self) -> int:
        return len(self.vocab)

    def encode(self, text: str, add_special: bool = True,
               parse_special: bool = False) -> list[int]:
        out: list[int] = []
        if add_special and self.add_bos and self.bos_id is not None:
            out.append(self.bos_id)
        if parse_special and self._special_sorted:
            for frag, tid in self._split_on_specials(text):
                if tid is not None:
                    out.append(tid)
                elif frag:
                    out.extend(self._inner.encode(frag))
        elif text:
            out.extend(self._inner.encode(text))
        if add_special and self.add_eos and self.eos_id is not None:
            out.append(self.eos_id)
        return out

    def _split_on_specials(self, text: str):
        """Yield (fragment, None) and ("", token_id) in order."""
        pos = 0
        n = len(text)
        while pos < n:
            best = None
            best_at = n
            for piece, tid in self._special_sorted:
                at = text.find(piece, pos)
                if at != -1 and (at < best_at or
                                 (at == best_at and best is not None
                                  and len(piece) > len(best[0]))):
                    best = (piece, tid)
                    best_at = at
            if best is None:
                yield text[pos:], None
                return
            if best_at > pos:
                yield text[pos:best_at], None
            yield "", best[1]
            pos = best_at + len(best[0])

    # -- decode ---------------------------------------------------------------

    def token_bytes(self, token_id: int, render_special: bool = False) -> bytes:
        if token_id < 0 or token_id >= len(self.vocab):
            return b""
        ttype = self.token_types[token_id]
        if ttype == TokenType.CONTROL and not render_special:
            return b""
        if ttype == TokenType.BYTE:
            return self._inner.piece_bytes(token_id)
        if ttype == TokenType.USER_DEFINED:
            return self.vocab[token_id].encode("utf-8")
        return self._inner.piece_bytes(token_id)

    def decode(self, ids: list[int], render_special: bool = False,
               skip_leading_space: bool | None = None) -> str:
        data = b"".join(self.token_bytes(t, render_special) for t in ids)
        text = data.decode("utf-8", errors="replace")
        strip = (self.model == "llama") if skip_leading_space is None else skip_leading_space
        if strip and text.startswith(" "):
            # SPM adds a virtual leading space at encode time; drop it once if
            # the first content-bearing token is a ▁-prefixed piece.
            first = next((t for t in ids if t not in self.special_ids
                          and 0 <= t < len(self.vocab)), None)
            if first is not None and self.vocab[first].startswith(SPM_UNDERLINE):
                text = text[1:]
        return text

    def is_eog(self, token_id: int) -> bool:
        return token_id in self.eog_ids

    def is_control(self, token_id: int) -> bool:
        return (0 <= token_id < len(self.token_types)
                and self.token_types[token_id] == TokenType.CONTROL)
