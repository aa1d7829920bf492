"""MiniCPM-V: resampler projector, UHD tile slicing, scaffold chunks."""

import io

import numpy as np
import pytest
from PIL import Image

from llama_box_tpu.server.multimodal import (
    MTMD_MARKER, MultimodalProcessor, _best_grid, build_chunks,
    minicpmv_slice,
)


def test_best_grid_aspect():
    import math
    # wide image (4:1) with 4 slices -> 4x1 grid
    assert _best_grid(9, 4, math.log(4)) == (4, 1)
    # tall image -> 1x4
    assert _best_grid(9, 4, math.log(1 / 4)) == (1, 4)
    # square-ish with 4 -> 2x2
    assert _best_grid(9, 4, 0.0) == (2, 2)


def test_slice_small_image_no_tiles():
    img = Image.new("RGB", (300, 200), (10, 20, 30))
    overview, tiles, grid = minicpmv_slice(img)
    assert tiles == [] and grid == (0, 0)
    assert max(overview.size) <= 448 + 14


def test_slice_large_image_grid():
    img = Image.new("RGB", (1792, 896), (10, 20, 30))
    overview, tiles, grid = minicpmv_slice(img)
    gx, gy = grid
    assert gx * gy == len(tiles) and len(tiles) > 1
    assert gx > gy   # wide image slices more columns than rows
    # every tile has the same refined size
    assert len({t.size for t in tiles}) == 1


@pytest.fixture(scope="module")
def minicpmv_mp(tmp_path_factory):
    import jax.numpy as jnp  # noqa: F401

    from llama_box_tpu.models.clip import load_clip
    from tests.fixtures.make_tiny_mmproj import write_tiny_mmproj
    path = str(tmp_path_factory.mktemp("mm") / "mmproj.gguf")
    write_tiny_mmproj(path, resampler=True, minicpmv_version=3)
    ccfg, cparams = load_clip(path)
    assert ccfg.minicpmv_version == 3
    return MultimodalProcessor(ccfg, cparams)


def _png(size, color=(200, 30, 30)):
    img = Image.new("RGB", size, color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_resampler_outputs_query_count(minicpmv_mp):
    emb, h = minicpmv_mp.encode(_png((64, 64)))
    # 4 learned queries -> 4 projected tokens of LM width 64
    assert emb.shape == (4, 64)
    assert np.isfinite(emb).all()


def test_encode_sliced_grid(minicpmv_mp):
    embs, grid, h = minicpmv_mp.encode_sliced(_png((1792, 896)))
    gx, gy = grid
    assert len(embs) == 1 + gx * gy
    # cache hit returns the same object set
    embs2, grid2, h2 = minicpmv_mp.encode_sliced(_png((1792, 896)))
    assert h2 == h and grid2 == grid


class _Tok:
    add_bos = False
    bos_id = None

    def encode(self, s, add_special=False, parse_special=True):
        # one synthetic id per scaffold string, newline = 9
        table = {"<image>": [1], "</image>": [2], "<slice>": [3],
                 "</slice>": [4], "\n": [9]}
        return table.get(s, [7] * len(s.split()))


def test_build_chunks_minicpmv_v3_scaffold(minicpmv_mp):
    prompt = "describe " + MTMD_MARKER + " please"
    flat, chunks = build_chunks(prompt, [("image", _png((1792, 896)))],
                                _Tok(), minicpmv_mp, add_special=False)
    kinds = [c[0] for c in chunks]
    # text, <image>, ov-embed, </image>, then slice wraps
    assert kinds[0] == "tokens"
    embed_count = kinds.count("embed")
    embs, (gx, gy), _ = minicpmv_mp.encode_sliced(_png((1792, 896)))
    assert embed_count == 1 + gx * gy
    # v3 uses <slice>...</slice> per tile: ids 3 and 4 present
    all_ids = [i for c in chunks if c[0] == "tokens" for i in c[1]]
    assert 3 in all_ids and 4 in all_ids and 1 in all_ids and 2 in all_ids
    # newline rows: gy-1 newlines
    assert all_ids.count(9) == gy - 1


def test_build_chunks_minicpmv_v2_uses_image_tags(tmp_path):
    from llama_box_tpu.models.clip import load_clip
    from tests.fixtures.make_tiny_mmproj import write_tiny_mmproj
    path = str(tmp_path / "mm2.gguf")
    write_tiny_mmproj(path, resampler=True, minicpmv_version=2)
    ccfg, cparams = load_clip(path)
    mp = MultimodalProcessor(ccfg, cparams)
    flat, chunks = build_chunks(MTMD_MARKER, [("image", _png((1792, 896)))],
                                _Tok(), mp, add_special=False)
    all_ids = [i for c in chunks if c[0] == "tokens" for i in c[1]]
    # 2.5-style: tiles wrapped in <image></image> inside one <slice> block
    assert all_ids.count(3) == 1 and all_ids.count(4) == 1
    assert all_ids.count(1) > 1


def test_llama4_slice_grid():
    from llama_box_tpu.server.multimodal import llama4_slice
    img = Image.new("RGB", (1344, 672), (5, 5, 5))
    tiles, (gx, gy) = llama4_slice(img, tile=336, max_tiles=16)
    assert gx * gy == len(tiles) and gx > gy
    assert all(t.size == (336, 336) for t in tiles)
    # small image: overview only
    tiles2, grid2 = llama4_slice(Image.new("RGB", (200, 200)), tile=336)
    assert tiles2 == [] and grid2 == (0, 0)


def test_build_chunks_llama4_scaffold(tmp_path):
    from llama_box_tpu.models.clip import load_clip
    from tests.fixtures.make_tiny_mmproj import write_tiny_mmproj

    path = str(tmp_path / "mm.gguf")
    write_tiny_mmproj(path)

    # rewrite projector type to llama4 via metadata override: easiest is
    # monkeypatching the cfg after load
    import dataclasses
    ccfg, cparams = load_clip(path)
    ccfg = dataclasses.replace(ccfg, projector="llama4")
    mp = MultimodalProcessor(ccfg, cparams)
    assert mp.is_llama4

    class _Tok4:
        add_bos = False
        bos_id = None

        def encode(self, s, add_special=False, parse_special=True):
            table = {"<|image_start|>": [11], "<|image_end|>": [12],
                     "<|tile_x_separator|>": [13],
                     "<|tile_y_separator|>": [14], "<|image|>": [15]}
            return table.get(s, [7])

    big = _png((1344, 672), (80, 10, 10))
    flat, chunks = build_chunks(MTMD_MARKER, [("image", big)], _Tok4(), mp,
                                add_special=False)
    all_ids = [i for c in chunks if c[0] == "tokens" for i in c[1]]
    embeds = [c for c in chunks if c[0] == "embed"]
    from llama_box_tpu.server.multimodal import llama4_slice
    import io as _io
    img = Image.open(_io.BytesIO(big))
    _, (gx, gy) = llama4_slice(img, tile=mp.cfg.image_size)
    assert len(embeds) == gx * gy + 1
    assert all_ids.count(11) == 1 and all_ids.count(12) == 1
    assert all_ids.count(13) == (gx - 1) * gy
    assert all_ids.count(14) == gy
    assert all_ids.count(15) == 1
