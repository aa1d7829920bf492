"""Whisper-style audio encoder (ultravox/qwen2-audio mmproj towers).

The reference gets audio via clip.patch's split vision/audio contexts
(`tokenize_audio`, z_multimodal.hpp:198-247). Here: WAV bytes -> log-mel
spectrogram (whisper frontend: 16 kHz, n_fft 400, hop 160) -> 2x strided
conv -> sinusoidal positions -> pre-LN transformer -> projector into the
LM embedding space. WAV parses natively; MP3 decodes through the platform
mpg123 codec (utils/mp3.py).
"""

from __future__ import annotations

import io
import math
import wave

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..utils.logging import SRV_INF

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def decode_wav(data: bytes) -> np.ndarray:
    """WAV or MP3 bytes -> mono f32 waveform at 16 kHz (naive resample).

    The reference accepts both formats (httpserver.hpp:1076-1078); mp3
    rides the platform mpg123 codec (utils/mp3.py)."""
    from ..utils import mp3
    if mp3.looks_like_mp3(data):
        x, sr = mp3.decode_mp3(data)
        if sr != SAMPLE_RATE:
            t = np.linspace(0, len(x) - 1,
                            int(len(x) * SAMPLE_RATE / sr))
            x = np.interp(t, np.arange(len(x)), x).astype(np.float32)
        return x
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(1 << (8 * width - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != SAMPLE_RATE:
        t = np.linspace(0, len(x) - 1, int(len(x) * SAMPLE_RATE / sr))
        x = np.interp(t, np.arange(len(x)), x).astype(np.float32)
    return x


def _mel_filterbank(n_mels: int) -> np.ndarray:
    """[n_mels, n_fft//2+1] whisper's exact mel filter matrix: SLANEY mel
    scale (linear below 1 kHz, log above) with slaney area normalization,
    continuous triangles on the fft bin frequencies (golden-checked
    against transformers WhisperFeatureExtractor — an earlier HTK-scale
    unnormalized bank deviated badly)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        m = 3.0 * f / 200.0
        logstep = 27.0 / np.log(6.4)
        return np.where(f >= 1000.0,
                        15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                        * logstep, m)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        logstep = np.log(6.4) / 27.0
        return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)),
                        f)

    n_freqs = N_FFT // 2 + 1
    fft_freqs = np.linspace(0.0, SAMPLE_RATE / 2.0, n_freqs)
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(SAMPLE_RATE / 2.0),
                       n_mels + 2)
    f_pts = mel_to_hz(mels)
    fdiff = np.diff(f_pts)
    slopes = f_pts[None, :] - fft_freqs[:, None]    # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))      # [n_freqs, n_mels]
    enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.T.astype(np.float32)


def log_mel_spectrogram(wav: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """[T_frames, n_mels] log-mel features — whisper's exact frontend:
    periodic Hann window, CENTERED frames (reflect padding n_fft/2), the
    trailing frame dropped, log10 clamp to (max - 8), (x+4)/4 scaling.
    Golden-checked against transformers WhisperFeatureExtractor."""
    n = np.arange(N_FFT)
    window = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))) \
        .astype(np.float32)                      # periodic hann
    pad = N_FFT // 2
    if len(wav) < 1:
        wav = np.zeros(HOP, np.float32)
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(wav) - N_FFT) // HOP
    frames = np.stack([wav[i * HOP:i * HOP + N_FFT]
                       for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames * window, axis=1)) ** 2
    spec = spec[:-1]                             # whisper drops the tail
    mel = spec @ _mel_filterbank(n_mels).T
    logmel = np.log10(np.maximum(mel, 1e-10))
    logmel = np.maximum(logmel, logmel.max() - 8.0)
    return ((logmel + 4.0) / 4.0).astype(np.float32)


def load_audio_tower(path: str, dtype=jnp.float32):
    """Load the audio branch of an mmproj GGUF ('a.' tensors)."""
    g = GGUFFile(path)
    md = g.metadata

    def kv(key, default=None):
        return md.get(f"clip.audio.{key}", md.get(f"clip.{key}", default))

    cfg = {
        "n_mels": int(kv("num_mel_bins", 80)),
        "n_embd": int(kv("embedding_length", 512)),
        "n_ff": int(kv("feed_forward_length", 2048)),
        "n_layers": int(kv("block_count", 6)),
        "n_heads": int(kv("attention.head_count", 8)),
        "eps": float(kv("attention.layer_norm_epsilon", 1e-5)),
        "proj_dim": int(kv("projection_dim", 2048)),
        # drives the audio prompt scaffold (reference clip_is_qwen2a /
        # clip_is_ultravox, httpserver.hpp:6000-6030)
        "proj_type": str(md.get("clip.projector_type", "")),
    }

    def t(name, transpose=False):
        if name not in g.tensors:
            return None
        x = g.tensor_f32(name)
        if transpose and x.ndim == 2:
            x = x.T
        return jnp.asarray(x, dtype)

    params = {
        "conv1_w": t("a.conv1d.1.weight"),   # [E, n_mels, 3]
        "conv1_b": t("a.conv1d.1.bias"),
        "conv2_w": t("a.conv1d.2.weight"),   # [E, E, 3]
        "conv2_b": t("a.conv1d.2.bias"),
        "pos_embd": t("a.position_embd.weight"),
        "post_ln": t("a.post_ln.weight"),
        "post_ln_b": t("a.post_ln.bias"),
    }
    layers = []
    for i in range(cfg["n_layers"]):
        p = f"a.blk.{i}."
        layers.append({
            "ln1": t(p + "ln1.weight"), "ln1_b": t(p + "ln1.bias"),
            "wq": t(p + "attn_q.weight", True), "bq": t(p + "attn_q.bias"),
            "wk": t(p + "attn_k.weight", True), "bk": t(p + "attn_k.bias"),
            "wv": t(p + "attn_v.weight", True), "bv": t(p + "attn_v.bias"),
            "wo": t(p + "attn_out.weight", True), "bo": t(p + "attn_out.bias"),
            "ln2": t(p + "ln2.weight"), "ln2_b": t(p + "ln2.bias"),
            "w_up": t(p + "ffn_up.weight", True), "b_up": t(p + "ffn_up.bias"),
            "w_down": t(p + "ffn_down.weight", True),
            "b_down": t(p + "ffn_down.bias"),
        })
    params["layers"] = {
        k: jnp.stack([l[k] for l in layers])
        for k in layers[0] if layers[0][k] is not None
    }
    for name in list(g.tensors):
        if name.startswith("mm.a.") or name.startswith("mm.audio") \
                or name.startswith("mm.fc"):
            params[name.replace(".", "_")] = t(
                name, transpose=name.endswith(".weight"))
    g.close()
    SRV_INF("load_audio", "audio tower: %d layers embd=%d mels=%d",
            cfg["n_layers"], cfg["n_embd"], cfg["n_mels"])
    return cfg, params


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * w + (b if b is not None else 0.0)


def _conv1d(x, w, b, stride):
    """x: [T, Cin]; w: [Cout, Cin, K] -> [T', Cout] (SAME-ish pad 1)."""
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        jnp.transpose(w, (2, 1, 0)).astype(jnp.float32),
        window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"))[0]
    return out + (b if b is not None else 0.0)


def encode_audio_impl(cfg: dict, params, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: [T_frames, n_mels] -> projected embeddings [N, proj_dim]."""
    E = cfg["n_embd"]
    H = cfg["n_heads"]
    D = E // H
    eps = cfg["eps"]

    x = jax.nn.gelu(_conv1d(mel, params["conv1_w"], params["conv1_b"], 1))
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2))
    n = x.shape[0]
    if params.get("pos_embd") is not None:
        x = x + params["pos_embd"][:n]

    def layer(x, lp):
        h = _ln(x, lp["ln1"], lp.get("ln1_b"), eps)
        q = (h @ lp["wq"] + lp.get("bq", 0.0)).reshape(-1, H, D)
        k = (h @ lp["wk"] + lp.get("bk", 0.0)).reshape(-1, H, D)
        v = (h @ lp["wv"] + lp.get("bv", 0.0)).reshape(-1, H, D)
        s = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum("hqk,khd->qhd", p, v).reshape(-1, E)
        x = x + (a @ lp["wo"] + lp.get("bo", 0.0))
        h = _ln(x, lp["ln2"], lp.get("ln2_b"), eps)
        h = jax.nn.gelu(h @ lp["w_up"] + lp.get("b_up", 0.0),
                        approximate=False)
        return x + (h @ lp["w_down"] + lp.get("b_down", 0.0)), None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    if cfg.get("proj_type") == "qwen2a":
        # qwen2-audio head (HF Qwen2AudioEncoder): avg-pool pairs of
        # frames BEFORE the final layer norm, then one linear projector
        # (reference routes qwen2a through clip.patch's audio context,
        # clip.patch PROJECTOR_TYPE_QWEN2A)
        n2 = (x.shape[0] // 2) * 2
        x = x[:n2].reshape(-1, 2, E).mean(axis=1)
        if params.get("post_ln") is not None:
            x = _ln(x, params["post_ln"], params.get("post_ln_b"), eps)
        w = params.get("mm_fc1_weight", params.get("mm_a_fc1_weight"))
        if w is not None:
            x = x @ w + params.get("mm_fc1_bias",
                                   params.get("mm_a_fc1_bias", 0.0))
        return x

    if params.get("post_ln") is not None:
        x = _ln(x, params["post_ln"], params.get("post_ln_b"), eps)

    # projector: stack-pool 8 frames then MLP (ultravox-style) if present;
    # plain MLP otherwise
    if "mm_a_0_weight" in params:
        x = x @ params["mm_a_0_weight"] + params.get("mm_a_0_bias", 0.0)
        if "mm_a_2_weight" in params:
            x = jax.nn.gelu(x, approximate=False)
            x = x @ params["mm_a_2_weight"] + params.get("mm_a_2_bias", 0.0)
    return x


def encode_audio(cfg: dict, params, wav_bytes: bytes) -> np.ndarray:
    wav = decode_wav(wav_bytes)
    mel = log_mel_spectrogram(wav, cfg["n_mels"])
    return np.asarray(encode_audio_impl(cfg, params, jnp.asarray(mel)))
