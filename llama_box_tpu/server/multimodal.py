"""Multimodal input pipeline: image fetch/decode, CLIP encode with a
projected-embedding LRU cache, and prompt-chunk construction.

Mirrors the reference's pipeline (SURVEY.md §2.1 #5, #11, #12):
- image_url parts: data-URI base64 or server-side HTTP fetch (15s timeout)
- `<MTMD/>` placeholder insertion in the chat prompt, split + interleave
- FNV-hash -> projected-embedding LRU cache (--max-projected-cache)
- negative "dummy tokens" standing in for image positions so the prefix
  cache can identify identical images (z_multimodal.hpp:90)
"""

from __future__ import annotations

import base64
import io
import re
import threading
from collections import OrderedDict

import numpy as np

from ..utils.logging import SRV_INF
from ..utils.text import fnv1a_64

MTMD_MARKER = "<MTMD/>"

_DATA_URI_RE = re.compile(r"^data:image/[a-zA-Z0-9.+-]+;base64,(.*)$", re.S)


def fetch_image_bytes(url: str, timeout: float = 15.0) -> bytes:
    """data-URI or remote HTTP fetch (the reference fetches server-side,
    httpserver.hpp:1027-1064)."""
    m = _DATA_URI_RE.match(url)
    if m:
        return base64.b64decode(m.group(1))
    if url.startswith("http://") or url.startswith("https://"):
        import requests
        r = requests.get(url, timeout=timeout)
        r.raise_for_status()
        return r.content
    # bare base64 (reference tolerates this)
    return base64.b64decode(url)


class MultimodalProcessor:
    """Owns the vision (and optional audio) towers; encodes media to
    LM-space embeddings with an LRU cache keyed by content FNV hash."""

    def __init__(self, clip_cfg, clip_params, max_cache: int = 8,
                 audio_cfg=None, audio_params=None):
        self.cfg = clip_cfg
        self.params = clip_params
        self.audio_cfg = audio_cfg
        self.audio_params = audio_params
        self.max_cache = max_cache
        self.max_image_size = 0   # --visual-max-image-size (0 = unlimited)
        self._cache: OrderedDict[int, np.ndarray] = OrderedDict()
        self._lock = threading.Lock()  # clip encode is mutex'd (ref :3385)

    @property
    def supports_audio(self) -> bool:
        return self.audio_cfg is not None

    @property
    def n_image_tokens(self) -> int:
        side = self.cfg.n_patches_side // max(self.cfg.merge_size, 1)
        return side * side

    def encode(self, image_bytes: bytes) -> tuple[np.ndarray, int]:
        """Returns (embeddings [N, proj_dim] f32, content hash)."""
        from PIL import Image

        from ..models.clip import encode_image, preprocess_image

        h = fnv1a_64(image_bytes)
        with self._lock:
            if h in self._cache:
                self._cache.move_to_end(h)
                return self._cache[h], h
        img = Image.open(io.BytesIO(image_bytes))
        if self.max_image_size > 0 and max(img.size) > self.max_image_size:
            img.thumbnail((self.max_image_size, self.max_image_size),
                          Image.BICUBIC)
        pixels = preprocess_image(img, self.cfg)
        with self._lock:
            if h not in self._cache:
                if "qwen2vl" in self.cfg.projector:
                    from ..models.clip import encode_image_qwen2vl
                    emb = np.asarray(encode_image_qwen2vl(
                        self.params, self.cfg, pixels))
                else:
                    emb = np.asarray(encode_image(self.params, self.cfg,
                                                  pixels))
                self._cache[h] = emb
                while len(self._cache) > self.max_cache:
                    self._cache.popitem(last=False)
                SRV_INF("multimodal", "encoded image hash=%x -> %d tokens",
                        h, emb.shape[0])
            return self._cache[h], h

    def encode_audio(self, audio_bytes: bytes) -> tuple[np.ndarray, int]:
        """WAV bytes -> (embeddings [N, proj] f32, content hash)."""
        if self.audio_cfg is None:
            raise ValueError("this server has no audio encoder loaded")
        from ..models.audio import encode_audio
        h = fnv1a_64(audio_bytes)
        with self._lock:
            if h in self._cache:
                self._cache.move_to_end(h)
                return self._cache[h], h
            emb = encode_audio(self.audio_cfg, self.audio_params, audio_bytes)
            self._cache[h] = emb
            while len(self._cache) > self.max_cache:
                self._cache.popitem(last=False)
        return emb, h

    def dummy_tokens(self, content_hash: int, n: int) -> list[int]:
        """Negative pseudo-token ids identifying this image in the prefix
        cache (z_multimodal.hpp:90)."""
        base = -(content_hash % (1 << 30)) - 2
        return [base - i for i in range(n)]


# per-model-family image scaffolds (reference scaffold tables,
# httpserver.hpp:5741-6054): the marker stays inside so the splitter still
# finds the embedding insertion point
_SCAFFOLDS = {
    "qwen2vl": "<|vision_start|>" + MTMD_MARKER + "<|vision_end|>",
    "qwen25vl": "<|vision_start|>" + MTMD_MARKER + "<|vision_end|>",
    "minicpmv": "<image>" + MTMD_MARKER + "</image>",
    "gemma3": "<start_of_image>" + MTMD_MARKER + "<end_of_image>",
    "internvl": "<img>" + MTMD_MARKER + "</img>",
    "smolvlm": "<fake_token_around_image><image>" + MTMD_MARKER
               + "<fake_token_around_image>",
}


def scaffold_prompt(prompt: str, arch: str) -> str:
    """Wrap each media marker in the model family's special tokens."""
    wrap = _SCAFFOLDS.get(arch)
    if not wrap:
        return prompt
    return prompt.replace(MTMD_MARKER, wrap)


def build_chunks_mrope(prompt: str, media: list, tokenizer, mp,
                       grids: list, add_special: bool = True):
    """Qwen2-VL variant: every chunk carries [3, n] (t, y, x) position
    streams; image grids compress the position space (published M-RoPE
    scheme). grids[i] = (h_tokens, w_tokens) per media item.
    Returns (flat_ids, chunks, mrope_delta) where chunks are
    ("tokens", ids, pos3) / ("embed", emb, dummies, pos3) and decode-time
    positions are kv_pos + mrope_delta."""
    media = [("image", m) if isinstance(m, (bytes, bytearray)) else m
             for m in media]
    parts = prompt.split(MTMD_MARKER)
    if len(parts) != len(media) + 1:
        raise ValueError(
            f"prompt has {len(parts) - 1} media markers for "
            f"{len(media)} media items")
    chunks = []
    flat: list[int] = []
    nxt = 0
    for i, part in enumerate(parts):
        ids = []
        if part:
            ids = tokenizer.encode(part, add_special=add_special and i == 0,
                                   parse_special=True)
        elif i == 0 and add_special and tokenizer.add_bos \
                and tokenizer.bos_id is not None:
            ids = [tokenizer.bos_id]
        if ids:
            n = len(ids)
            pos3 = np.tile(np.arange(nxt, nxt + n, dtype=np.int32), (3, 1))
            chunks.append(("tokens", ids, pos3))
            flat.extend(ids)
            nxt += n
        if i < len(media):
            kind, data = media[i]
            emb, h = (mp.encode_audio(data) if kind == "audio"
                      else mp.encode(data))
            n = emb.shape[0]
            gh, gw = grids[i] if i < len(grids) else (1, n)
            pos3 = np.zeros((3, n), np.int32)
            idx = np.arange(n)
            pos3[0] = nxt                      # temporal
            pos3[1] = nxt + idx // max(gw, 1)  # height
            pos3[2] = nxt + idx % max(gw, 1)   # width
            dummies = mp.dummy_tokens(h, n)
            chunks.append(("embed", emb, dummies, pos3))
            flat.extend(dummies)
            nxt += max(1, gh, gw)
    return flat, chunks, nxt - len(flat)


def build_chunks(prompt: str, media: list, tokenizer, mp,
                 add_special: bool = True):
    """Split the templated prompt on MTMD markers and interleave media
    embedding chunks. media: list of ("image"|"audio", bytes). Returns
    (flat_ids, chunks); chunks = ("tokens", ids) | ("embed", arr, dummies)."""
    # tolerate a bare list of image bytes (legacy call sites/tests)
    media = [("image", m) if isinstance(m, (bytes, bytearray)) else m
             for m in media]
    parts = prompt.split(MTMD_MARKER)
    if len(parts) != len(media) + 1:
        raise ValueError(
            f"prompt has {len(parts) - 1} media markers for "
            f"{len(media)} media items")
    chunks = []
    flat: list[int] = []
    for i, part in enumerate(parts):
        if part:
            ids = tokenizer.encode(part, add_special=add_special and i == 0,
                                   parse_special=True)
            if ids:
                chunks.append(("tokens", ids))
                flat.extend(ids)
        elif i == 0 and add_special and tokenizer.add_bos \
                and tokenizer.bos_id is not None:
            chunks.append(("tokens", [tokenizer.bos_id]))
            flat.append(tokenizer.bos_id)
        if i < len(media):
            kind, data = media[i]
            if kind == "audio":
                emb, h = mp.encode_audio(data)
            else:
                emb, h = mp.encode(data)
            dummies = mp.dummy_tokens(h, emb.shape[0])
            chunks.append(("embed", emb, dummies))
            flat.extend(dummies)
    return flat, chunks
