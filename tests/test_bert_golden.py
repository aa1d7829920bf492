"""BERT-family transformers golden: the embeddings/rerank encoder
(learned positions, token types, post-LN blocks) against HF BertModel."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.bert import bert_forward, load_bert

torch = pytest.importorskip("torch")

E, H, L, FF, V, T = 64, 4, 2, 128, 96, 10


def test_bert_matches_transformers(tmp_path):
    from transformers import BertConfig, BertModel
    torch.manual_seed(0)
    hc = BertConfig(vocab_size=V, hidden_size=E, num_hidden_layers=L,
                    num_attention_heads=H, intermediate_size=FF,
                    hidden_act="gelu", layer_norm_eps=1e-5,
                    max_position_embeddings=64, type_vocab_size=2,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    hm = BertModel(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in hm.state_dict().items()}

    path = str(tmp_path / "bert.gguf")
    w = GGUFWriter(path, architecture="bert")
    for k, v in [("block_count", L), ("context_length", 64),
                 ("embedding_length", E), ("feed_forward_length", FF),
                 ("attention.head_count", H),
                 ("attention.layer_norm_epsilon", 1e-5),
                 ("vocab_size", V), ("pooling_type", 2)]:
        w.add_kv(f"bert.{k}", v)
    w.add_kv("tokenizer.ggml.model", "bert")
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(V)])
    w.add_kv("tokenizer.ggml.scores", np.zeros(V, np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.ones(V, np.int32))
    emb = "embeddings."
    w.add_tensor("token_embd.weight", st[emb + "word_embeddings.weight"])
    w.add_tensor("position_embd.weight",
                 st[emb + "position_embeddings.weight"])
    w.add_tensor("token_types.weight",
                 st[emb + "token_type_embeddings.weight"])
    w.add_tensor("token_embd_norm.weight", st[emb + "LayerNorm.weight"])
    w.add_tensor("token_embd_norm.bias", st[emb + "LayerNorm.bias"])
    for i in range(L):
        p = f"encoder.layer.{i}."
        o = f"blk.{i}."
        w.add_tensor(o + "attn_q.weight",
                     st[p + "attention.self.query.weight"])
        w.add_tensor(o + "attn_q.bias", st[p + "attention.self.query.bias"])
        w.add_tensor(o + "attn_k.weight",
                     st[p + "attention.self.key.weight"])
        w.add_tensor(o + "attn_k.bias", st[p + "attention.self.key.bias"])
        w.add_tensor(o + "attn_v.weight",
                     st[p + "attention.self.value.weight"])
        w.add_tensor(o + "attn_v.bias", st[p + "attention.self.value.bias"])
        w.add_tensor(o + "attn_output.weight",
                     st[p + "attention.output.dense.weight"])
        w.add_tensor(o + "attn_output.bias",
                     st[p + "attention.output.dense.bias"])
        w.add_tensor(o + "attn_output_norm.weight",
                     st[p + "attention.output.LayerNorm.weight"])
        w.add_tensor(o + "attn_output_norm.bias",
                     st[p + "attention.output.LayerNorm.bias"])
        w.add_tensor(o + "ffn_up.weight",
                     st[p + "intermediate.dense.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "intermediate.dense.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "output.dense.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "output.dense.bias"])
        w.add_tensor(o + "layer_output_norm.weight",
                     st[p + "output.LayerNorm.weight"])
        w.add_tensor(o + "layer_output_norm.bias",
                     st[p + "output.LayerNorm.bias"])
    w.write()

    cfg, params = load_bert(path)
    rng = np.random.default_rng(2)
    toks = rng.integers(3, V, (2, T)).astype(np.int32)
    lens = np.asarray([T, T - 3], np.int32)
    attn = (np.arange(T)[None, :] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        ref = hm(input_ids=torch.tensor(toks.astype(np.int64)),
                 attention_mask=torch.tensor(attn)
                 ).last_hidden_state.numpy()
    out = bert_forward(params, cfg, jnp.asarray(toks), jnp.asarray(lens),
                       pooling="cls")
    np.testing.assert_allclose(np.asarray(out), ref[:, 0],
                               atol=2e-4, rtol=1e-3)
    # mean pooling over the valid region matches too
    out_m = np.asarray(bert_forward(params, cfg, jnp.asarray(toks),
                                    jnp.asarray(lens), pooling="mean"))
    want = np.stack([ref[b, :lens[b]].mean(0) for b in range(2)])
    np.testing.assert_allclose(out_m, want, atol=2e-4, rtol=1e-3)
