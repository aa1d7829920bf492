"""Repacked (TPU structure-of-arrays) quant form must reconstruct EXACTLY the
same f32 values as the golden block dequantizers."""

import numpy as np
import pytest

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.quants import dequantize, quantize
from llama_box_tpu.gguf.repack import repack, dequantize_repacked

FORMATS = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
    GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL,
]


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_repack_matches_dequantize(fmt, rng):
    n = 1024
    x = rng.normal(scale=0.3, size=n).astype(np.float32)
    raw = quantize(fmt, x)
    golden = dequantize(fmt, raw, (n,))
    rt = repack(fmt, raw, n)
    assert rt is not None
    recon = dequantize_repacked(rt)
    np.testing.assert_array_equal(recon, golden.reshape(-1))
    if rt.qbits == 4:
        assert rt.q.min() >= 0 and rt.q.max() <= 15
    assert rt.q.shape[0] == n
    assert rt.scales.shape[0] == n // rt.group
