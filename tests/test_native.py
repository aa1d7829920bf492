"""Native C++ GGUF kernels must agree bit-for-bit with the numpy codecs."""

import numpy as np
import pytest

from llama_box_tpu.gguf.constants import GGMLType
from llama_box_tpu.gguf.native import get_lib, native_dequant, native_repack
from llama_box_tpu.gguf.quants import _dequantize_np, quantize
from llama_box_tpu.gguf.repack import REPACKERS

FORMATS = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
           GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
           GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL]

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native kernels not built")


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_native_dequant_matches_numpy(fmt, rng):
    n = 2048
    x = rng.normal(scale=0.3, size=n).astype(np.float32)
    raw = quantize(fmt, x)
    want = _dequantize_np(fmt, raw, (n,))
    got = native_dequant(int(fmt), raw, n)
    assert got is not None
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_native_repack_matches_numpy(fmt, rng):
    n = 2048
    x = rng.normal(scale=0.3, size=n).astype(np.float32)
    raw = quantize(fmt, x)
    want = REPACKERS[fmt](raw, n)
    got = native_repack(int(fmt), raw, n)
    assert got is not None
    q, scales, mins, group, qbits = got
    np.testing.assert_array_equal(q, want.q)
    np.testing.assert_array_equal(scales, want.scales)
    assert group == want.group and qbits == want.qbits
    if want.mins is None:
        assert mins is None or not mins.any()
    else:
        np.testing.assert_array_equal(mins, want.mins)


def test_native_f16_dequant(rng):
    x = rng.normal(size=4096).astype(np.float16)
    got = native_dequant(1, x.tobytes(), 4096)
    np.testing.assert_array_equal(got, x.astype(np.float32))
