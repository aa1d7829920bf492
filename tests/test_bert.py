"""BERT-family encoder tests: WordPiece tokenizer, tiny bert GGUF load,
rerank scoring through the engine + HTTP (reference model.patch 'new' arch
+ rerank exec §2.1 #17)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.bert import bert_forward, load_bert
from llama_box_tpu.server import Engine, EngineConfig, RerankTask
from llama_box_tpu.tokenizer import Tokenizer
from llama_box_tpu.tokenizer.wordpiece import WordPieceTokenizer

E, FF, LAYERS, HEADS = 32, 64, 2, 4


def test_wordpiece_basic():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world",
             "un", "##aff", "##able", ",", "!"]
    wp = WordPieceTokenizer(vocab, unk_id=1)
    assert wp.encode("hello world") == [4, 5]
    assert wp.encode("unaffable") == [6, 7, 8]
    assert wp.encode("hello, world!") == [4, 9, 5, 10]
    assert wp.encode("xyzzy") == [1]
    assert wp.encode("Hello WORLD") == [4, 5]  # lowercased


def build_vocab():
    base = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ["the", "quick", "brown", "fox", "dog", "cat", "run", "##s",
             "##ing", "a", "is", "fast", "slow", "good", "bad"]
    letters = [c for c in "abcdefghijklmnopqrstuvwxyz"]
    cont = ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    return base + words + letters + cont


def write_tiny_bert(path, seed=0, with_cls=True):
    rng = np.random.default_rng(seed)
    vocab = build_vocab()
    V = len(vocab)
    w = GGUFWriter(path, architecture="bert")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("bert.block_count", LAYERS)
    w.add_kv("bert.context_length", 128)
    w.add_kv("bert.embedding_length", E)
    w.add_kv("bert.feed_forward_length", FF)
    w.add_kv("bert.attention.head_count", HEADS)
    w.add_kv("bert.attention.layer_norm_epsilon", 1e-12)
    w.add_kv("bert.pooling_type", 4 if with_cls else 1)  # 4 = rank
    w.add_kv("bert.vocab_size", V)
    w.add_kv("tokenizer.ggml.model", "bert")
    w.add_kv("tokenizer.ggml.tokens", vocab)
    w.add_kv("tokenizer.ggml.scores", np.zeros(V, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([3] * 5 + [1] * (V - 5),
                                                   np.int32))
    w.add_kv("tokenizer.ggml.unknown_token_id", 1)
    w.add_kv("tokenizer.ggml.cls_token_id", 2)
    w.add_kv("tokenizer.ggml.seperator_token_id", 3)
    w.add_kv("tokenizer.ggml.add_bos_token", False)

    w.add_tensor("token_embd.weight", rand(V, E))
    w.add_tensor("token_types.weight", rand(2, E))
    w.add_tensor("position_embd.weight", rand(128, E))
    w.add_tensor("token_embd_norm.weight", 1.0 + rand(E))
    w.add_tensor("token_embd_norm.bias", rand(E))
    for i in range(LAYERS):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_q.weight", rand(E, E))
        w.add_tensor(p + "attn_q.bias", rand(E))
        w.add_tensor(p + "attn_k.weight", rand(E, E))
        w.add_tensor(p + "attn_k.bias", rand(E))
        w.add_tensor(p + "attn_v.weight", rand(E, E))
        w.add_tensor(p + "attn_v.bias", rand(E))
        w.add_tensor(p + "attn_output.weight", rand(E, E))
        w.add_tensor(p + "attn_output.bias", rand(E))
        w.add_tensor(p + "attn_output_norm.weight", 1.0 + rand(E))
        w.add_tensor(p + "attn_output_norm.bias", rand(E))
        w.add_tensor(p + "ffn_up.weight", rand(FF, E))
        w.add_tensor(p + "ffn_up.bias", rand(FF))
        w.add_tensor(p + "ffn_down.weight", rand(E, FF))
        w.add_tensor(p + "ffn_down.bias", rand(E))
        w.add_tensor(p + "layer_output_norm.weight", 1.0 + rand(E))
        w.add_tensor(p + "layer_output_norm.bias", rand(E))
    if with_cls:
        w.add_tensor("cls.weight", rand(E, E))
        w.add_tensor("cls.bias", rand(E))
        w.add_tensor("cls.output.weight", rand(1, E))
        w.add_tensor("cls.output.bias", rand(1))
    w.write()


@pytest.fixture(scope="module")
def bert_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "bert.gguf")
    write_tiny_bert(path)
    cfg, params = load_bert(path)
    from llama_box_tpu.gguf import GGUFFile
    with GGUFFile(path) as g:
        tok = Tokenizer.from_gguf(g)
    return cfg, params, tok


def test_bert_load_and_forward(bert_setup):
    cfg, params, tok = bert_setup
    assert cfg.pooling == "rank"
    ids = tok.encode("the quick brown fox", add_special=False)
    assert ids
    toks = np.zeros((2, 16), np.int32)
    toks[0, :len(ids)] = ids
    toks[1, :3] = ids[:3]
    lens = np.array([len(ids), 3], np.int32)
    emb = bert_forward(params, cfg, jnp.asarray(toks), jnp.asarray(lens),
                       pooling="mean")
    assert emb.shape == (2, E)
    assert np.isfinite(np.asarray(emb)).all()
    scores = bert_forward(params, cfg, jnp.asarray(toks), jnp.asarray(lens),
                          pooling="rank")
    assert scores.shape == (2,)
    # padding must not change results
    toks2 = np.zeros((2, 32), np.int32)
    toks2[:, :16] = toks
    emb2 = bert_forward(params, cfg, jnp.asarray(toks2), jnp.asarray(lens),
                        pooling="mean")
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb), rtol=1e-4,
                               atol=1e-5)


def test_bert_rerank_through_engine(bert_setup):
    cfg, params, tok = bert_setup
    eng = Engine(cfg, params, tok, EngineConfig(n_slots=1, n_ctx=256))
    eng.start()
    try:
        def pair(q, d):
            return ([tok.cls_id] + tok.encode(q, add_special=False)
                    + [tok.sep_id] + tok.encode(d, add_special=False)
                    + [tok.sep_id])

        docs = ["the quick brown fox", "a slow dog", "cat runs fast"]
        pairs = [pair("quick fox", d) for d in docs]
        pairs.append(pair("quick fox", "quick fox"))
        pairs.append(pair("quick fox", "unknown"))
        task = RerankTask(pairs, n_documents=3, normalize=True)
        eng.submit(task)
        kind, payload = task.result_q.get(timeout=60)
        if kind == "error":
            raise payload
        assert kind == "final"
        assert len(payload.scores) == 3
        assert all(0.0 <= s <= 1.0 for s in payload.scores)
    finally:
        eng.stop()
