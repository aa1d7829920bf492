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


def test_mrope_reduces_to_rope_for_text():
    """When all position streams are equal (text tokens), M-RoPE must equal
    plain neox RoPE."""
    import numpy as np
    import jax.numpy as jnp
    from llama_box_tpu.ops.rope import (RopeParams, apply_mrope, apply_rope,
                                        compute_rope_cache)

    rng = np.random.default_rng(0)
    B, T, H, D = 1, 6, 2, 32
    x = rng.normal(size=(B, T, H, D)).astype(np.float32)
    rp = RopeParams(head_dim=D, mode="neox")
    cos, sin = compute_rope_cache(rp, 64)
    pos = np.arange(T, dtype=np.int32)[None, :]
    want = apply_rope(jnp.asarray(x), jnp.asarray(pos), cos, sin, "neox")
    pos3 = np.stack([pos, pos, pos])  # [3, B, T] all equal
    got = apply_mrope(jnp.asarray(x), jnp.asarray(pos3), cos, sin,
                      sections=(4, 6, 6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_mrope_sections_rotate_independently():
    import numpy as np
    import jax.numpy as jnp
    from llama_box_tpu.ops.rope import RopeParams, apply_mrope, compute_rope_cache

    rng = np.random.default_rng(1)
    B, T, H, D = 1, 2, 1, 16
    x = rng.normal(size=(B, T, H, D)).astype(np.float32)
    cos, sin = compute_rope_cache(RopeParams(head_dim=D, mode="neox"), 64)
    base = np.zeros((3, B, T), np.int32)
    # change only the 'height' stream; only section-1 dims may differ
    p_a = base.copy()
    p_b = base.copy()
    p_b[1] += 5
    a = np.asarray(apply_mrope(jnp.asarray(x), jnp.asarray(p_a), cos, sin,
                               (3, 3, 2)))
    b = np.asarray(apply_mrope(jnp.asarray(x), jnp.asarray(p_b), cos, sin,
                               (3, 3, 2)))
    half = 8
    sec1 = list(range(3, 6)) + list(range(half + 3, half + 6))
    other = [i for i in range(D) if i not in sec1]
    np.testing.assert_allclose(a[..., other], b[..., other], atol=1e-6)
    assert np.abs(a[..., sec1] - b[..., sec1]).max() > 1e-3
