"""Audio tower tests: WAV decode, mel frontend, tiny tower encode."""

import io
import wave

import numpy as np
import pytest
import jax.numpy as jnp

from llama_box_tpu.gguf.writer import GGUFWriter
from llama_box_tpu.models.audio import (
    SAMPLE_RATE, decode_wav, encode_audio, load_audio_tower,
    log_mel_spectrogram,
)

A_E, A_FF, A_LAYERS, A_HEADS, MELS, PROJ = 32, 64, 2, 4, 80, 64


def wav_bytes(seconds=0.5, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_decode_wav_and_resample():
    x = decode_wav(wav_bytes(0.25, sr=16000))
    assert abs(len(x) - 4000) < 4
    assert np.abs(x).max() <= 1.0
    x2 = decode_wav(wav_bytes(0.25, sr=8000))
    assert abs(len(x2) - 4000) < 8  # resampled to 16 kHz


def test_log_mel_shape():
    mel = log_mel_spectrogram(decode_wav(wav_bytes(0.5)), MELS)
    assert mel.shape[1] == MELS
    assert mel.shape[0] > 10
    assert np.isfinite(mel).all()
    # a 440 Hz tone concentrates energy in low mel bins
    assert mel[:, :20].mean() > mel[:, 60:].mean()


def write_tiny_audio_mmproj(path, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="clip")

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.num_mel_bins", MELS)
    w.add_kv("clip.audio.embedding_length", A_E)
    w.add_kv("clip.audio.feed_forward_length", A_FF)
    w.add_kv("clip.audio.block_count", A_LAYERS)
    w.add_kv("clip.audio.attention.head_count", A_HEADS)
    w.add_kv("clip.audio.projection_dim", PROJ)
    w.add_tensor("a.conv1d.1.weight", rand(A_E, MELS, 3))
    w.add_tensor("a.conv1d.1.bias", rand(A_E))
    w.add_tensor("a.conv1d.2.weight", rand(A_E, A_E, 3))
    w.add_tensor("a.conv1d.2.bias", rand(A_E))
    w.add_tensor("a.position_embd.weight", rand(1500, A_E))
    w.add_tensor("a.post_ln.weight", 1.0 + rand(A_E))
    w.add_tensor("a.post_ln.bias", rand(A_E))
    for i in range(A_LAYERS):
        p = f"a.blk.{i}."
        for nm, shape in [("ln1", (A_E,)), ("ln2", (A_E,))]:
            w.add_tensor(p + nm + ".weight", 1.0 + rand(*shape))
            w.add_tensor(p + nm + ".bias", rand(*shape))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(A_E, A_E))
            w.add_tensor(p + nm + ".bias", rand(A_E))
        w.add_tensor(p + "ffn_up.weight", rand(A_FF, A_E))
        w.add_tensor(p + "ffn_up.bias", rand(A_FF))
        w.add_tensor(p + "ffn_down.weight", rand(A_E, A_FF))
        w.add_tensor(p + "ffn_down.bias", rand(A_E))
    w.add_tensor("mm.a.0.weight", rand(PROJ, A_E))
    w.add_tensor("mm.a.0.bias", rand(PROJ))
    w.write()


def test_audio_tower_encode(tmp_path):
    path = str(tmp_path / "audio.gguf")
    write_tiny_audio_mmproj(path)
    cfg, params = load_audio_tower(path)
    assert cfg["n_mels"] == MELS
    emb = encode_audio(cfg, params, wav_bytes(0.3))
    assert emb.ndim == 2 and emb.shape[1] == PROJ
    assert np.isfinite(emb).all()
    # different audio -> different embeddings
    emb2 = encode_audio(cfg, params, wav_bytes(0.3, freq=880.0))
    assert not np.allclose(emb, emb2)
