import time

from llama_box_tpu.utils import (
    RatelimitTokenBucket,
    base64_decode,
    base64_encode,
    fnv1a_64,
    longest_common_prefix,
    utf8_is_valid,
    utf8_safe_split_point,
)


def test_base64_roundtrip():
    data = bytes(range(256))
    assert base64_decode(base64_encode(data)) == data
    # tolerate stripped padding
    assert base64_decode(base64_encode(b"ab").rstrip("=")) == b"ab"


def test_utf8_safe_split():
    s = "héllo 世界 🎉".encode("utf-8")
    for cut in range(len(s) + 1):
        prefix = s[:cut]
        n = utf8_safe_split_point(prefix)
        assert utf8_is_valid(prefix[:n])
        # nothing complete is held back: the dropped tail must be a partial seq
        assert cut - n <= 3


def test_utf8_safe_split_complete():
    s = "hello".encode()
    assert utf8_safe_split_point(s) == len(s)
    e = "🎉".encode()
    assert utf8_safe_split_point(e) == len(e)
    assert utf8_safe_split_point(e[:2]) == 0


def test_fnv1a_64_known_vectors():
    # public FNV-1a test vectors
    assert fnv1a_64(b"") == 0xCBF29CE484222325
    assert fnv1a_64(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a_64(b"foobar") == 0x85944171F73967E8


def test_lcp():
    assert longest_common_prefix([1, 2, 3], [1, 2, 4]) == 2
    assert longest_common_prefix([], [1]) == 0
    assert longest_common_prefix([5, 6], [5, 6]) == 2


def test_token_bucket():
    tb = RatelimitTokenBucket(capacity=2, rate=1000.0)
    assert tb.try_acquire()
    assert tb.try_acquire()
    ok = tb.try_acquire()
    if not ok:
        time.sleep(0.01)
        assert tb.try_acquire()


def test_perplexity_harness(tmp_path):
    """The perplexity script runs end-to-end on the tiny model and produces
    a finite ppl; quantized load gives a close value (BASELINE parity
    machinery)."""
    import io
    import sys
    import contextlib

    from .fixtures.make_tiny_model import write_tiny_model
    from llama_box_tpu.gguf.constants import GGMLType

    sys.path.insert(0, "scripts")
    try:
        import perplexity
    finally:
        sys.path.pop(0)

    mpath = str(tmp_path / "m.gguf")
    write_tiny_model(mpath, quant=GGMLType.Q4_K)
    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog " * 30)

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            perplexity.main(["-m", mpath, "-f", str(corpus), "--ctx", "32",
                             "--limit-windows", "3"] + extra)
        return float(buf.getvalue().strip())

    ppl_dense = run([])
    ppl_q = run(["--quantized"])
    assert ppl_dense > 0 and ppl_q > 0
    import math
    assert math.isfinite(ppl_dense) and math.isfinite(ppl_q)
    # identical math modulo bf16 rounding of the fused path
    assert abs(ppl_dense - ppl_q) / ppl_dense < 0.05
