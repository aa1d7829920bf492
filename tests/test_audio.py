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


# -- mp3 (platform mpg123 codec; fixtures built with platform lame) ----------

def _lame_encode(pcm_s16: np.ndarray, sr: int = 16000) -> bytes:
    import ctypes
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_mode", "lame_set_brate"):
        getattr(lame, f).argtypes = [ctypes.c_void_p, ctypes.c_int]
    lame.lame_init_params.argtypes = [ctypes.c_void_p]
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    lame.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int]
    lame.lame_close.argtypes = [ctypes.c_void_p]
    gf = lame.lame_init()
    lame.lame_set_in_samplerate(gf, sr)
    lame.lame_set_num_channels(gf, 1)
    lame.lame_set_mode(gf, 3)  # mono
    lame.lame_set_brate(gf, 64)
    assert lame.lame_init_params(gf) >= 0
    out = (ctypes.c_char * (len(pcm_s16) * 2 + 7200))()
    n1 = lame.lame_encode_buffer(gf, pcm_s16.ctypes.data,
                                 pcm_s16.ctypes.data, len(pcm_s16),
                                 out, len(out))
    data = bytes(out[:n1])
    n2 = lame.lame_encode_flush(gf, out, len(out))
    data += bytes(out[:n2])
    lame.lame_close(gf)
    return data


def _have_mp3():
    from llama_box_tpu.utils import mp3
    return mp3.available()


@pytest.mark.skipif(not _have_mp3(), reason="libmpg123 unavailable")
def test_mp3_decode_matches_wav_mel():
    """An mp3-encoded tone must land in the same mel bins as the wav path
    (reference parity: httpserver.hpp:1076-1078 accepts wav+mp3)."""
    from llama_box_tpu.utils.mp3 import looks_like_mp3

    t = np.arange(16000) / 16000.0
    pcm = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767).astype(np.int16)
    data = _lame_encode(pcm)
    assert looks_like_mp3(data) and not looks_like_mp3(b"RIFFxxxxWAVE")

    x_mp3 = decode_wav(data)                 # dispatches to the mp3 codec
    assert abs(len(x_mp3) - 16000) < 4000    # codec delay padding only
    # dominant frequency identical to the wav path
    wav_x = decode_wav(wav_bytes(1.0, freq=440.0))

    def peak_hz(x):
        seg = x[2000:10000]
        spec = np.abs(np.fft.rfft(seg))
        return np.fft.rfftfreq(len(seg), 1 / SAMPLE_RATE)[spec.argmax()]

    assert abs(peak_hz(x_mp3) - peak_hz(wav_x)) < 3.0

    # mel frames: the tone's dominant mel bin must agree frame-by-frame
    mel_mp3 = log_mel_spectrogram(x_mp3, MELS)
    mel_wav = log_mel_spectrogram(wav_x, MELS)
    bins_mp3 = np.bincount(mel_mp3[10:80].argmax(1)).argmax()
    bins_wav = np.bincount(mel_wav[10:80].argmax(1)).argmax()
    assert bins_mp3 == bins_wav


@pytest.mark.skipif(not _have_mp3(), reason="libmpg123 unavailable")
def test_mp3_id3_and_stereo():
    """ID3v2-tagged stereo mp3 decodes to mono (channel mean)."""
    t = np.arange(8000) / 16000.0
    pcm = (0.4 * np.sin(2 * np.pi * 220.0 * t) * 32767).astype(np.int16)
    data = _lame_encode(pcm)
    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x00" + data
    x = decode_wav(tagged)
    assert len(x) > 4000
    assert float(np.abs(x).max()) > 0.1


def test_mp3_unavailable_is_clear(monkeypatch):
    """Without the codec, mp3 input fails with an actionable message."""
    from llama_box_tpu.utils import mp3 as m
    monkeypatch.setattr(m, "_lib", None)
    monkeypatch.setattr(m, "_lib_err", "forced by test")
    with pytest.raises(ValueError, match="mpg123"):
        m.decode_mp3(b"\xff\xfb\x90\x00" + b"\x00" * 64)
