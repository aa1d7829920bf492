"""GGUF writer→reader round-trip tests."""

import numpy as np

from llama_box_tpu.gguf import GGMLType, GGUFFile, GGUFWriter


def test_gguf_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", "tiny-test")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.embedding_length", 64)
    w.add_kv("llama.attention.head_count", 4)
    w.add_kv("f32_scalar", 1.5)
    w.add_kv("neg", -7)
    w.add_kv("flag", True)
    w.add_kv("tokens", ["<s>", "</s>", "hello"])
    w.add_kv("scores", np.array([0.0, -1.0, -2.0], dtype=np.float32))
    w.add_kv("ids", [1, 2, 3])

    a = rng.standard_normal((64, 128)).astype(np.float32)
    b = rng.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor("a.weight", a, GGMLType.F32)
    w.add_tensor("b.weight", b, GGMLType.Q4_K)
    w.add_tensor("c.weight", a, GGMLType.F16)
    w.write()

    with GGUFFile(path) as g:
        assert g.architecture == "llama"
        assert g.metadata["general.name"] == "tiny-test"
        assert g.metadata["llama.block_count"] == 2
        assert g.arch_kv("embedding_length") == 64
        assert g.metadata["flag"] is True
        assert g.metadata["neg"] == -7
        assert g.metadata["tokens"] == ["<s>", "</s>", "hello"]
        np.testing.assert_allclose(np.asarray(g.metadata["scores"]),
                                   [0.0, -1.0, -2.0])
        assert list(g.metadata["ids"]) == [1, 2, 3]

        assert g.tensors["a.weight"].shape == (64, 128)
        np.testing.assert_allclose(g.tensor_f32("a.weight"), a)
        np.testing.assert_allclose(g.tensor_f32("c.weight"), a, atol=2e-3, rtol=1e-3)
        bq = g.tensor_f32("b.weight")
        assert bq.shape == (4, 256)
        assert np.abs(bq - b).max() / np.abs(b).max() < 0.06


def test_gguf_alignment(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path, architecture="llama")
    # odd-sized f16 tensor forces padding before the next tensor
    t1 = rng.standard_normal((3, 5)).astype(np.float32)
    t2 = rng.standard_normal((2, 32)).astype(np.float32)
    w.add_tensor("t1", t1, GGMLType.F16)
    w.add_tensor("t2", t2, GGMLType.Q8_0)
    w.write()
    with GGUFFile(path) as g:
        assert g.data_offset % g.alignment == 0
        assert g.tensors["t2"].offset % g.alignment == 0
        np.testing.assert_allclose(g.tensor_f32("t1"), t1, atol=2e-3, rtol=1e-2)
        assert np.abs(g.tensor_f32("t2") - t2).max() < 0.01


def test_kv_overrides(tmp_path):
    from llama_box_tpu.models import load_model
    from llama_box_tpu.models.loader import parse_kv_overrides
    from .fixtures.make_tiny_model import write_tiny_model

    ov = parse_kv_overrides(["llama.rope.freq_base=float:5000",
                             "general.name=str:patched",
                             "llama.context_length=int:999",
                             "x.flag=bool:true"])
    assert ov == {"llama.rope.freq_base": 5000.0, "general.name": "patched",
                  "llama.context_length": 999, "x.flag": True}

    path = str(tmp_path / "m.gguf")
    write_tiny_model(path)
    import jax.numpy as jnp
    cfg, _ = load_model(path, dtype=jnp.float32, metadata_overrides=ov)
    assert cfg.rope_freq_base == 5000.0
    assert cfg.n_ctx_train == 999
    assert cfg.name == "patched"

    import pytest as _pt
    with _pt.raises(ValueError):
        parse_kv_overrides(["broken"])
