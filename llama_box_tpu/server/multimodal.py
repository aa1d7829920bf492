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
        self._grids: dict[int, tuple[int, int]] = {}  # qwen2vl token grids
        self._lock = threading.Lock()  # clip encode is mutex'd (ref :3385)

    def image_grid(self, h: int) -> tuple[int, int] | None:
        """(h_tokens, w_tokens) of a cached qwen2vl image (M-RoPE grid)."""
        return self._grids.get(h)

    @property
    def supports_audio(self) -> bool:
        return self.audio_cfg is not None

    @property
    def audio_family(self) -> str | None:
        """Audio tower family for prompt scaffolding: "qwen2a" (qwen2-
        audio) or "ultravox" (reference clip_is_qwen2a/clip_is_ultravox,
        httpserver.hpp:6000-6030)."""
        if self.audio_cfg is None:
            return None
        pt = self.audio_cfg.get("proj_type", "")
        if "qwen2a" in pt or "qwen2.5o" in pt:
            return "qwen2a"
        if "ultravox" in pt:
            return "ultravox"
        return None

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
        qwen2 = "qwen2" in self.cfg.projector
        pixtral = self.cfg.projector == "pixtral"
        if pixtral:
            # native-size rope-2D tower (reference clip.cpp pixtral branch)
            from ..models.clip import (encode_image_pixtral,
                                       pixtral_fit_resize,
                                       preprocess_image_native)
            W, H = pixtral_fit_resize(*img.size, self.cfg,
                                      self.max_image_size)
            pixels = preprocess_image_native(img, self.cfg, (W, H))
            P = self.cfg.patch_size
            gh, gw = H // P, W // P
        elif qwen2:                             # qwen2vl + qwen2.5vl
            # dynamic resolution: run the tower at the image's native
            # grid-quantized size (reference clip.patch max_image_size)
            from ..models.clip import (encode_image_qwen2vl,
                                       preprocess_image_native,
                                       qwen2vl_smart_resize)
            W, H = qwen2vl_smart_resize(*img.size, self.cfg,
                                        self.max_image_size)
            pixels = preprocess_image_native(img, self.cfg, (W, H))
            P = self.cfg.patch_size
            gh, gw = H // P, W // P
        else:
            pixels = preprocess_image(img, self.cfg)
        with self._lock:
            if h not in self._cache:
                if pixtral:
                    from ..models.clip import encode_image_pixtral
                    emb = np.asarray(encode_image_pixtral(
                        self.params, self.cfg, pixels, grid_hw=(gh, gw)))
                    self._grids[h] = (gh, gw)
                elif qwen2:
                    from ..models.clip import encode_image_qwen2vl
                    emb = np.asarray(encode_image_qwen2vl(
                        self.params, self.cfg, pixels, grid_hw=(gh, gw)))
                    m = max(self.cfg.merge_size, 1)
                    self._grids[h] = (gh // m, gw // m)
                else:
                    emb = np.asarray(encode_image(self.params, self.cfg,
                                                  pixels))
                self._cache[h] = emb
                while len(self._cache) > self.max_cache:
                    old_h, _ = self._cache.popitem(last=False)
                    self._grids.pop(old_h, None)
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

    @property
    def minicpmv_version(self) -> int:
        return getattr(self.cfg, "minicpmv_version", 0)

    @property
    def is_llama4(self) -> bool:
        return "llama4" in getattr(self.cfg, "projector", "")

    def encode_tiled_llama4(self, image_bytes: bytes):
        """Llama4 tiling: best-aspect grid of tile-sized crops + overview
        (reference llama4 branch httpserver.hpp:5846-5900 encodes each
        tile separately). Returns (embs [tile..., overview], (gx, gy), h)."""
        from PIL import Image

        h = fnv1a_64(image_bytes + b"/llama4")
        with self._lock:
            if h in self._cache:
                self._cache.move_to_end(h)
                embs, grid = self._cache[h]
                return embs, grid, h
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        tiles, grid = llama4_slice(img, tile=self.cfg.image_size)
        overview = img.resize((self.cfg.image_size, self.cfg.image_size),
                              Image.BICUBIC)
        embs = []
        for piece in tiles + [overview]:
            buf = io.BytesIO()
            piece.save(buf, format="PNG")
            emb, _ = self.encode(buf.getvalue())
            embs.append(emb)
        with self._lock:
            self._cache[h] = (embs, grid)
            while len(self._cache) > self.max_cache:
                self._cache.popitem(last=False)
        SRV_INF("multimodal", "llama4 tiled image hash=%x grid=%dx%d",
                h, grid[0], grid[1])
        return embs, grid, h

    def encode_sliced(self, image_bytes: bytes):
        """MiniCPM-V tiling: overview + best-grid tiles (llama.cpp uhd
        slicing; reference z_multimodal.hpp:105-131 encodes each entry).
        Returns (embs [overview, tile...], (gx, gy), content_hash)."""
        from PIL import Image

        h = fnv1a_64(image_bytes + b"/sliced")
        with self._lock:
            if h in self._cache:
                self._cache.move_to_end(h)
                embs, grid = self._cache[h]
                return embs, grid, h
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        overview, tiles, grid = minicpmv_slice(img)
        embs = []
        for piece in [overview] + tiles:
            buf = io.BytesIO()
            piece.save(buf, format="PNG")
            emb, _ = self.encode(buf.getvalue())
            embs.append(emb)
        with self._lock:
            self._cache[h] = (embs, grid)
            while len(self._cache) > self.max_cache:
                self._cache.popitem(last=False)
        SRV_INF("multimodal", "minicpmv sliced image hash=%x grid=%dx%d",
                h, grid[0], grid[1])
        return embs, grid, h

    def dummy_tokens(self, content_hash: int, n: int) -> list[int]:
        """Negative pseudo-token ids identifying this image in the prefix
        cache (z_multimodal.hpp:90)."""
        base = -(content_hash % (1 << 30)) - 2
        return [base - i for i in range(n)]


def _ensure_divide(length: float, patch: int) -> int:
    return max(int(round(length / patch)) * patch, patch)


def _best_resize(w: int, h: int, scale_res: int, patch: int,
                 allow_upscale: bool = False) -> tuple[int, int]:
    if w * h > scale_res * scale_res or allow_upscale:
        r = w / h
        w = scale_res * (r ** 0.5)
        h = scale_res / (r ** 0.5)
    return _ensure_divide(w, patch), _ensure_divide(h, patch)


def _best_grid(max_slice: int, multiple: int, log_ratio: float
               ) -> tuple[int, int]:
    import math
    best, best_err = (1, 1), float("inf")
    for m in (multiple - 1, multiple, multiple + 1):
        if m < 1 or m > max_slice:
            continue
        for gx in range(1, m + 1):
            if m % gx:
                continue
            gy = m // gx
            err = abs(log_ratio - math.log(gx / gy))
            if err < best_err:
                best, best_err = (gx, gy), err
    return best


def llama4_slice(img, tile: int = 336, max_tiles: int = 16):
    """Best-aspect grid of tile-size crops (llama4 vision tiling).
    Returns (tiles row-major [PIL], (gx, gy)); no tiles for small images
    (overview alone carries them)."""
    import math

    from PIL import Image
    W, H = img.size
    multiple = min(math.ceil(W * H / (tile * tile)), max_tiles)
    if multiple <= 1:
        return [], (0, 0)
    gx, gy = _best_grid(max_tiles, multiple, math.log(W / H))
    resized = img.resize((gx * tile, gy * tile), Image.BICUBIC)
    tiles = []
    for y in range(gy):
        for x in range(gx):
            tiles.append(resized.crop((x * tile, y * tile,
                                       (x + 1) * tile, (y + 1) * tile)))
    return tiles, (gx, gy)


def minicpmv_slice(img, scale_res: int = 448, patch: int = 14,
                   max_slice: int = 9):
    """LLaVA-UHD slicing (llama.cpp clip.cpp uhd_slice_image): returns
    (overview PIL, tiles row-major [PIL], grid (gx, gy)); grid (0, 0)
    when no slicing is needed."""
    import math

    from PIL import Image
    W, H = img.size
    multiple = min(math.ceil(W * H / (scale_res * scale_res)), max_slice)
    if multiple <= 1:
        w, h = _best_resize(W, H, scale_res, patch)
        return img.resize((w, h), Image.BICUBIC), [], (0, 0)
    gx, gy = _best_grid(max_slice, multiple, math.log(W / H))
    ow, oh = _best_resize(W, H, scale_res, patch, allow_upscale=True)
    overview = img.resize((ow, oh), Image.BICUBIC)
    # refine: grid-aligned resize, then split
    rw = _ensure_divide(W, gx)
    rh = _ensure_divide(H, gy)
    bw, bh = _best_resize(rw // gx, rh // gy, scale_res, patch,
                          allow_upscale=True)
    refine = img.resize((bw * gx, bh * gy), Image.BICUBIC)
    tiles = []
    for y in range(gy):
        for x in range(gx):
            tiles.append(refine.crop((x * bw, y * bh, (x + 1) * bw,
                                      (y + 1) * bh)))
    return overview, tiles, (gx, gy)


# per-model-family image scaffolds (reference scaffold tables,
# httpserver.hpp:5741-6054): the marker stays inside so the splitter still
# finds the embedding insertion point
_SCAFFOLDS = {
    "qwen2vl": "<|vision_start|>" + MTMD_MARKER + "<|vision_end|>",
    "qwen25vl": "<|vision_start|>" + MTMD_MARKER + "<|vision_end|>",
    # minicpmv composes its tiled scaffold in build_chunks directly
    "gemma3": "<start_of_image>" + MTMD_MARKER + "<end_of_image>",
    "internvl": "<img>" + MTMD_MARKER + "</img>",
    # llama4 composes its tiled scaffold in build_chunks directly
    "smolvlm": "<fake_token_around_image><global-img>" + MTMD_MARKER
               + "<fake_token_around_image>",
    "pixtral": MTMD_MARKER + "[IMG_END]",
}


# per-audio-tower scaffolds (reference httpserver.hpp:6000-6030):
# qwen2-audio wraps audio embeds in <|audio_bos|>/<|audio_eos|>;
# ultravox prefixes [BEGIN_AUDIO] with no closing token
_AUDIO_SCAFFOLDS = {
    "qwen2a": "<|audio_bos|>" + MTMD_MARKER + "<|audio_eos|>",
    "ultravox": "[BEGIN_AUDIO]" + MTMD_MARKER,
}


def scaffold_prompt(prompt: str, arch: str, media: list | None = None,
                    audio_family: str | None = None) -> str:
    """Wrap each media marker in the model family's special tokens.
    With `media` (list of (kind, bytes)), each marker is wrapped per its
    own modality: image markers get the vision arch scaffold, audio
    markers the audio tower family's (reference applies scaffolds chunk
    by chunk, httpserver.hpp:5741-6054)."""
    img_wrap = _SCAFFOLDS.get(arch) or MTMD_MARKER
    aud_wrap = _AUDIO_SCAFFOLDS.get(audio_family or "") or MTMD_MARKER
    if media is None:
        return prompt.replace(MTMD_MARKER, img_wrap)
    kinds = [m[0] if isinstance(m, tuple) else "image" for m in media]
    parts = prompt.split(MTMD_MARKER)
    if len(parts) != len(kinds) + 1:
        return prompt.replace(MTMD_MARKER, img_wrap)
    out = [parts[0]]
    for kind, part in zip(kinds, parts[1:]):
        out.append(aud_wrap if kind == "audio" else img_wrap)
        out.append(part)
    return "".join(out)


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
            # dynamic-resolution towers record the true token grid per
            # image; the caller-supplied grids are the fixed-size fallback
            g = (getattr(mp, "image_grid", lambda _h: None)(h)
                 if kind == "image" else None)
            gh, gw = g if g else (grids[i] if i < len(grids) else (1, n))
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
            elif getattr(mp, "minicpmv_version", 0) > 0:
                _minicpmv_chunks(data, tokenizer, mp, chunks, flat)
                continue
            elif getattr(mp, "is_llama4", False):
                _llama4_chunks(data, tokenizer, mp, chunks, flat)
                continue
            else:
                emb, h = mp.encode(data)
            dummies = mp.dummy_tokens(h, emb.shape[0])
            chunks.append(("embed", emb, dummies))
            flat.extend(dummies)
    return flat, chunks


def _llama4_chunks(data: bytes, tokenizer, mp, chunks: list,
                   flat: list) -> None:
    """Compose the llama4 tiled scaffold in place (reference
    httpserver.hpp:5846-5900):
      <|image_start|> t <|tile_x_separator|> t ... <|tile_y_separator|>
      (per row) ... <|image|> overview <|image_end|>"""

    def text(sv):
        ids = tokenizer.encode(sv, add_special=False, parse_special=True)
        if ids:
            chunks.append(("tokens", ids))
            flat.extend(ids)

    def embed(emb, salt):
        h2 = fnv1a_64(data + salt)
        dummies = mp.dummy_tokens(h2, emb.shape[0])
        chunks.append(("embed", emb, dummies))
        flat.extend(dummies)

    embs, (gx, gy), _h = mp.encode_tiled_llama4(data)
    text("<|image_start|>")
    if gx and gy:
        for y in range(gy):
            for x in range(gx):
                embed(embs[y * gx + x], b"/t%d" % (y * gx + x))
                if x != gx - 1:
                    text("<|tile_x_separator|>")
            text("<|tile_y_separator|>")
    text("<|image|>")
    embed(embs[-1], b"/ov")
    text("<|image_end|>")


def _minicpmv_chunks(data: bytes, tokenizer, mp, chunks: list,
                     flat: list) -> None:
    """Compose the MiniCPM-V tiled scaffold in place (reference
    httpserver.hpp:5768-5846):
      2.5:  <image>ov</image><slice><image>t</image>...\n...</slice>
      2.6+: <image>ov</image><slice>t</slice><slice>t</slice>\n..."""
    version = mp.minicpmv_version

    def text(sv):
        ids = tokenizer.encode(sv, add_special=False, parse_special=True)
        if ids:
            chunks.append(("tokens", ids))
            flat.extend(ids)

    def embed(emb, salt):
        h2 = fnv1a_64(data + salt)
        dummies = mp.dummy_tokens(h2, emb.shape[0])
        chunks.append(("embed", emb, dummies))
        flat.extend(dummies)

    embs, (gx, gy), _h = mp.encode_sliced(data)
    text("<image>")
    embed(embs[0], b"/ov")
    text("</image>")
    if gx and gy and len(embs) > 1:
        ifmt, ofmt = ("<image>", "</image>") if version < 3             else ("<slice>", "</slice>")
        if version < 3:
            text("<slice>")
        for y in range(gy):
            for x in range(gx):
                text(ifmt)
                embed(embs[1 + y * gx + x], b"/t%d" % (y * gx + x))
                text(ofmt)
            if y != gy - 1:
                text("\n")
        if version < 3:
            text("</slice>")
