"""Whisper-frontend + encoder transformers goldens: the log-mel
spectrogram against WhisperFeatureExtractor and the audio tower against
WhisperModel's encoder (conv stack, sinusoidal positions, pre-LN blocks).
The frontend golden caught real deviations (symmetric vs periodic Hann,
missing center padding, trailing frame)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.audio import (encode_audio_impl,
                                        load_audio_tower,
                                        log_mel_spectrogram)

torch = pytest.importorskip("torch")

E, H, L, FF, MELS = 64, 4, 2, 128, 80
MAXSRC = 64           # encoder positions; input frames = 2x


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=MELS)
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16000) * 0.2).astype(np.float32)  # 1s @ 16kHz
    ref = fe(wav, sampling_rate=16000,
             return_tensors="np")["input_features"][0].T  # [3000, 80]
    # HF pads to 30 s; pad ours identically so the max-normalization and
    # frame count line up
    wav_p = np.pad(wav, (0, 30 * 16000 - len(wav)))
    got = log_mel_spectrogram(wav_p, MELS)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_whisper_encoder_matches_transformers(tmp_path):
    from transformers import WhisperConfig, WhisperModel
    torch.manual_seed(0)
    hc = WhisperConfig(vocab_size=100, d_model=E, encoder_layers=L,
                       encoder_attention_heads=H, encoder_ffn_dim=FF,
                       decoder_layers=1, decoder_attention_heads=H,
                       decoder_ffn_dim=FF, num_mel_bins=MELS,
                       max_source_positions=MAXSRC, dropout=0.0,
                       activation_dropout=0.0, attention_dropout=0.0,
                       pad_token_id=0, bos_token_id=1, eos_token_id=2,
                       decoder_start_token_id=1)
    hm = WhisperModel(hc).eval()
    enc = hm.encoder
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in enc.state_dict().items()}

    path = str(tmp_path / "audio_mmproj.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.num_mel_bins", MELS)
    w.add_kv("clip.audio.embedding_length", E)
    w.add_kv("clip.audio.feed_forward_length", FF)
    w.add_kv("clip.audio.block_count", L)
    w.add_kv("clip.audio.attention.head_count", H)
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.audio.projection_dim", E)
    w.add_tensor("a.conv1d.1.weight", st["conv1.weight"])  # [E, mels, 3]
    w.add_tensor("a.conv1d.1.bias", st["conv1.bias"])
    w.add_tensor("a.conv1d.2.weight", st["conv2.weight"])
    w.add_tensor("a.conv1d.2.bias", st["conv2.bias"])
    w.add_tensor("a.position_embd.weight", st["embed_positions.weight"])
    w.add_tensor("a.post_ln.weight", st["layer_norm.weight"])
    w.add_tensor("a.post_ln.bias", st["layer_norm.bias"])
    for i in range(L):
        p = f"layers.{i}."
        o = f"a.blk.{i}."
        w.add_tensor(o + "ln1.weight", st[p + "self_attn_layer_norm.weight"])
        w.add_tensor(o + "ln1.bias", st[p + "self_attn_layer_norm.bias"])
        w.add_tensor(o + "attn_q.weight", st[p + "self_attn.q_proj.weight"])
        w.add_tensor(o + "attn_q.bias", st[p + "self_attn.q_proj.bias"])
        w.add_tensor(o + "attn_k.weight", st[p + "self_attn.k_proj.weight"])
        w.add_tensor(o + "attn_v.weight", st[p + "self_attn.v_proj.weight"])
        w.add_tensor(o + "attn_v.bias", st[p + "self_attn.v_proj.bias"])
        w.add_tensor(o + "attn_out.weight",
                     st[p + "self_attn.out_proj.weight"])
        w.add_tensor(o + "attn_out.bias", st[p + "self_attn.out_proj.bias"])
        w.add_tensor(o + "ln2.weight", st[p + "final_layer_norm.weight"])
        w.add_tensor(o + "ln2.bias", st[p + "final_layer_norm.bias"])
        w.add_tensor(o + "ffn_up.weight", st[p + "fc1.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "fc1.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "fc2.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "fc2.bias"])
    w.write()

    acfg, aparams = load_audio_tower(path)
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(2 * MAXSRC, MELS)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = enc(torch.tensor(mel.T[None])).last_hidden_state[0].numpy()
    out = np.asarray(encode_audio_impl(acfg, aparams, jnp.asarray(mel)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)


def test_qwen2a_encoder_matches_transformers(tmp_path):
    """qwen2-audio head: avg-pool pairs of frames BEFORE the final layer
    norm, then one linear projector (HF Qwen2AudioEncoder + MultiModal
    Projector; reference routes qwen2a via clip.patch
    PROJECTOR_TYPE_QWEN2A and scaffolds with <|audio_bos|>/<|audio_eos|>,
    httpserver.hpp:6000-6018)."""
    from transformers.models.qwen2_audio import Qwen2AudioEncoderConfig
    from transformers.models.qwen2_audio.modeling_qwen2_audio import (
        Qwen2AudioEncoder,
    )
    torch.manual_seed(1)
    PROJ = 48
    hc = Qwen2AudioEncoderConfig(
        d_model=E, encoder_layers=L, encoder_attention_heads=H,
        encoder_ffn_dim=FF, num_mel_bins=MELS, max_source_positions=MAXSRC,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0)
    enc = Qwen2AudioEncoder(hc).eval()
    st = {k: v.detach().to(torch.float32).numpy()
          for k, v in enc.state_dict().items()}
    proj_w = (np.random.default_rng(2).normal(size=(PROJ, E)) * 0.05
              ).astype(np.float32)
    proj_b = (np.random.default_rng(3).normal(size=PROJ) * 0.01
              ).astype(np.float32)

    path = str(tmp_path / "qwen2a_mmproj.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.projector_type", "qwen2a")
    w.add_kv("clip.audio.num_mel_bins", MELS)
    w.add_kv("clip.audio.embedding_length", E)
    w.add_kv("clip.audio.feed_forward_length", FF)
    w.add_kv("clip.audio.block_count", L)
    w.add_kv("clip.audio.attention.head_count", H)
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.audio.projection_dim", PROJ)
    w.add_tensor("a.conv1d.1.weight", st["conv1.weight"])
    w.add_tensor("a.conv1d.1.bias", st["conv1.bias"])
    w.add_tensor("a.conv1d.2.weight", st["conv2.weight"])
    w.add_tensor("a.conv1d.2.bias", st["conv2.bias"])
    w.add_tensor("a.position_embd.weight", st["embed_positions.weight"])
    w.add_tensor("a.post_ln.weight", st["layer_norm.weight"])
    w.add_tensor("a.post_ln.bias", st["layer_norm.bias"])
    w.add_tensor("mm.fc1.weight", proj_w)
    w.add_tensor("mm.fc1.bias", proj_b)
    for i in range(L):
        p = f"layers.{i}."
        o = f"a.blk.{i}."
        w.add_tensor(o + "ln1.weight", st[p + "self_attn_layer_norm.weight"])
        w.add_tensor(o + "ln1.bias", st[p + "self_attn_layer_norm.bias"])
        w.add_tensor(o + "attn_q.weight", st[p + "self_attn.q_proj.weight"])
        w.add_tensor(o + "attn_q.bias", st[p + "self_attn.q_proj.bias"])
        w.add_tensor(o + "attn_k.weight", st[p + "self_attn.k_proj.weight"])
        w.add_tensor(o + "attn_v.weight", st[p + "self_attn.v_proj.weight"])
        w.add_tensor(o + "attn_v.bias", st[p + "self_attn.v_proj.bias"])
        w.add_tensor(o + "attn_out.weight",
                     st[p + "self_attn.out_proj.weight"])
        w.add_tensor(o + "attn_out.bias", st[p + "self_attn.out_proj.bias"])
        w.add_tensor(o + "ln2.weight", st[p + "final_layer_norm.weight"])
        w.add_tensor(o + "ln2.bias", st[p + "final_layer_norm.bias"])
        w.add_tensor(o + "ffn_up.weight", st[p + "fc1.weight"])
        w.add_tensor(o + "ffn_up.bias", st[p + "fc1.bias"])
        w.add_tensor(o + "ffn_down.weight", st[p + "fc2.weight"])
        w.add_tensor(o + "ffn_down.bias", st[p + "fc2.bias"])
    w.write()

    acfg, aparams = load_audio_tower(path)
    assert acfg["proj_type"] == "qwen2a"
    rng = np.random.default_rng(4)
    mel = rng.normal(size=(2 * MAXSRC, MELS)).astype(np.float32) * 0.5
    with torch.no_grad():
        hid = enc(torch.tensor(mel.T[None])).last_hidden_state[0].numpy()
    ref = hid @ proj_w.T + proj_b
    out = np.asarray(encode_audio_impl(acfg, aparams, jnp.asarray(mel)))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=2e-3)


def test_audio_scaffolds_per_modality():
    """Audio markers get the audio tower's scaffold, image markers the
    vision arch's — in the same prompt (httpserver.hpp:5741-6054)."""
    from llama_box_tpu.server.multimodal import MTMD_MARKER, scaffold_prompt
    p = f"look {MTMD_MARKER} hear {MTMD_MARKER} ok"
    media = [("image", b"i"), ("audio", b"a")]
    out = scaffold_prompt(p, "qwen2vl", media=media, audio_family="qwen2a")
    assert out == (f"look <|vision_start|>{MTMD_MARKER}<|vision_end|> "
                   f"hear <|audio_bos|>{MTMD_MARKER}<|audio_eos|> ok")
    out = scaffold_prompt(p, "llama", media=media, audio_family="ultravox")
    assert out == (f"look {MTMD_MARKER} "
                   f"hear [BEGIN_AUDIO]{MTMD_MARKER} ok")
    # no media list: legacy behavior (vision wrap on every marker)
    out = scaffold_prompt(f"a {MTMD_MARKER} b", "internvl")
    assert out == f"a <img>{MTMD_MARKER}</img> b"
