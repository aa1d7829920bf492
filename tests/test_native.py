"""Native C++ GGUF kernels must agree bit-for-bit with the numpy codecs."""

import numpy as np
import pytest

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.native import get_lib, native_dequant, native_repack
from llama_box_tpu.gguf.quants import _dequantize_np, quantize
from llama_box_tpu.gguf.repack import REPACKERS

FORMATS = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
           GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
           GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL]

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native kernels not built")


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_native_dequant_matches_numpy(fmt, rng):
    n = 2048
    x = rng.normal(scale=0.3, size=n).astype(np.float32)
    raw = quantize(fmt, x)
    want = _dequantize_np(fmt, raw, (n,))
    got = native_dequant(int(fmt), raw, n)
    assert got is not None
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_native_repack_matches_numpy(fmt, rng):
    n = 2048
    x = rng.normal(scale=0.3, size=n).astype(np.float32)
    raw = quantize(fmt, x)
    want = REPACKERS[fmt](raw, n)
    got = native_repack(int(fmt), raw, n)
    assert got is not None
    q, scales, mins, group, qbits = got
    np.testing.assert_array_equal(q, want.q)
    np.testing.assert_array_equal(scales, want.scales)
    assert group == want.group and qbits == want.qbits
    if want.mins is None:
        assert mins is None or not mins.any()
    else:
        np.testing.assert_array_equal(mins, want.mins)


def test_native_f16_dequant(rng):
    x = rng.normal(size=4096).astype(np.float16)
    got = native_dequant(1, x.tobytes(), 4096)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_native_spm_matches_python(rng):
    """Native SPM bigram merge must reproduce the Python tokenizer exactly
    on a synthetic vocab (forced past the size gate)."""
    import llama_box_tpu.tokenizer.spm as spm_mod
    from llama_box_tpu.tokenizer.spm import SPMTokenizer

    # synthetic vocab: chars + merges with varied scores + byte fallback
    pieces = ["<unk>", "▁", "a", "b", "c", "ab", "bc", "abc",
              "▁a", "▁ab", "▁abc"]
    pieces += [f"<0x{i:02X}>" for i in range(256)]
    pieces += [f"fill{i}" for i in range(1000)]  # pass the native size gate
    scores = [0.0] * len(pieces)
    scores[pieces.index("ab")] = -1.0
    scores[pieces.index("bc")] = -0.5
    scores[pieces.index("abc")] = -2.0
    scores[pieces.index("▁a")] = -0.7
    scores[pieces.index("▁ab")] = -1.5
    scores[pieces.index("▁abc")] = -3.0
    types = [2] + [1] * (len(pieces) - 1)

    tok_nat = SPMTokenizer(pieces, scores, types, unk_id=0)
    assert tok_nat._native_handle() is not None
    tok_py = SPMTokenizer(pieces, scores, types, unk_id=0)
    tok_py._nh = None  # force python path

    texts = ["abc", "abcabc", "a b c", "abcb ca", "日本 abc",
             "aaabbbccc", "", "xyz abc xyz"]
    for t in texts:
        assert tok_nat.encode(t) == tok_py.encode(t), t


def test_native_bpe_matches_python():
    """Native BPE merge core == Python loop on a synthetic gpt2-style
    vocab (forced past the >=1000-vocab native threshold)."""
    import numpy as np

    from llama_box_tpu.tokenizer.bpe import BPETokenizer, byte_to_unicode

    rng = np.random.default_rng(0)
    b2u = byte_to_unicode()
    base = [b2u[i] for i in range(256)]
    words = ["the", "he", "th", "er", "ing", "tion", "hello", "world",
             " t", " the", "lo", "ll", "llo", "wor", "ld", "orld"]
    vocab = base + words + [f"fill{i}" for i in range(1100)]
    merges = ["t h", "th e", "e r", "i n", "in g", "l l", "l o",
              "ll o", "w o", "wo r", "r l", "l d", "or ld", "Ġ t",
              "Ġt he"]
    tok_n = BPETokenizer(vocab, merges, pre="default")
    assert tok_n._native_handle() is not None
    tok_p = BPETokenizer(vocab, merges, pre="default")
    tok_p._nh = None   # force the Python path

    texts = ["the theller world", "hello world!", "  多语言 mixed tÃ©xt",
             "a" * 300, "th er ing llold", "", "\n\n  tabs\tand spaces"]
    for t in texts:
        assert tok_n.encode(t) == tok_p.encode(t), t
