"""Tokenizer semantics tests over handcrafted SPM and BPE vocabularies."""

from llama_box_tpu.tokenizer import Tokenizer, TokenType


def make_spm_tokenizer():
    # pieces with scores; higher score = preferred merge
    pieces = [
        ("<unk>", 0.0, TokenType.UNKNOWN),
        ("<s>", 0.0, TokenType.CONTROL),
        ("</s>", 0.0, TokenType.CONTROL),
        ("▁", -2.0, TokenType.NORMAL),
        ("h", -20.0, TokenType.NORMAL),
        ("e", -20.0, TokenType.NORMAL),
        ("l", -20.0, TokenType.NORMAL),
        ("o", -20.0, TokenType.NORMAL),
        ("w", -20.0, TokenType.NORMAL),
        ("r", -20.0, TokenType.NORMAL),
        ("d", -20.0, TokenType.NORMAL),
        ("▁h", -10.0, TokenType.NORMAL),
        ("▁he", -9.0, TokenType.NORMAL),
        ("▁hel", -8.0, TokenType.NORMAL),
        ("▁hell", -7.0, TokenType.NORMAL),
        ("▁hello", -5.0, TokenType.NORMAL),
        ("▁w", -10.0, TokenType.NORMAL),
        ("▁wo", -9.0, TokenType.NORMAL),
        ("▁wor", -8.0, TokenType.NORMAL),
        ("▁worl", -7.0, TokenType.NORMAL),
        ("▁world", -5.0, TokenType.NORMAL),
        ("<0xC3>", -30.0, TokenType.BYTE),
        ("<0xA9>", -30.0, TokenType.BYTE),
        ("<|im_end|>", 0.0, TokenType.CONTROL),
    ]
    vocab = [p for p, _, _ in pieces]
    return Tokenizer(
        model="llama",
        vocab=vocab,
        scores=[s for _, s, _ in pieces],
        token_types=[int(t) for _, _, t in pieces],
        bos_id=1, eos_id=2, unk_id=0, add_bos=True,
    ), vocab


def test_spm_encode_basic():
    tok, vocab = make_spm_tokenizer()
    ids = tok.encode("hello world")
    assert ids[0] == 1  # BOS
    assert [vocab[i] for i in ids[1:]] == ["▁hello", "▁world"]


def test_spm_decode_roundtrip():
    tok, _ = make_spm_tokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_spm_byte_fallback():
    tok, vocab = make_spm_tokenizer()
    ids = tok.encode("é", add_special=False)
    assert [vocab[i] for i in ids] == ["▁", "<0xC3>", "<0xA9>"]
    assert tok.decode(ids) == "é"


def test_spm_special_parsing():
    tok, vocab = make_spm_tokenizer()
    ids = tok.encode("hello<|im_end|>world", add_special=False, parse_special=True)
    pieces = [vocab[i] for i in ids]
    assert "<|im_end|>" in pieces
    # without parse_special the literal text is tokenized (here: byte fallback/unk)
    ids2 = tok.encode("hello<|im_end|>", add_special=False, parse_special=False)
    assert tok.piece_to_id["<|im_end|>"] not in ids2


def test_spm_control_hidden_in_decode():
    tok, _ = make_spm_tokenizer()
    ids = tok.encode("hello", add_special=True)
    assert tok.decode(ids) == "hello"
    assert tok.decode(ids, render_special=True).startswith("<s>")


def make_bpe_tokenizer():
    vocab = ["<|endoftext|>", "h", "e", "l", "o", "Ġ", "w", "r", "d",
             "he", "ll", "hell", "hello", "Ġw", "or", "ld", "Ġwor", "Ġworld", "!"]
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "o r", "l d",
              "Ġw or", "Ġwor ld"]
    types = [int(TokenType.CONTROL)] + [int(TokenType.NORMAL)] * (len(vocab) - 1)
    return Tokenizer(
        model="gpt2", vocab=vocab, merges=merges, token_types=types,
        bos_id=None, eos_id=0, add_bos=False, pre="gpt2",
    ), vocab


def test_bpe_encode():
    tok, vocab = make_bpe_tokenizer()
    ids = tok.encode("hello world")
    assert [vocab[i] for i in ids] == ["hello", "Ġworld"]


def test_bpe_decode_roundtrip():
    tok, _ = make_bpe_tokenizer()
    ids = tok.encode("hello world!")
    assert tok.decode(ids) == "hello world!"


def test_bpe_eog():
    tok, _ = make_bpe_tokenizer()
    assert tok.is_eog(0)
    assert not tok.is_eog(1)


def test_gguf_tokenizer_roundtrip(tmp_path):
    """Tokenizer built from a GGUF file's metadata."""
    import numpy as np
    from llama_box_tpu.gguf import GGUFWriter, GGUFFile

    tok_src, vocab = make_spm_tokenizer()
    path = str(tmp_path / "tok.gguf")
    w = GGUFWriter(path, architecture="llama")
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.array(tok_src.scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([int(t) for t in tok_src.token_types],
                                                   dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    w.write()
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    assert tok.encode("hello world") == tok_src.encode("hello world")
    assert tok.decode(tok.encode("hello world")) == "hello world"
