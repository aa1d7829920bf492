"""Host text/bytes utilities.

Behavioral parity with reference llama-box/z_utils.hpp:
- base64 codecs (z_utils.hpp:156-241)
- UTF-8 validity + safe split point for streaming partial tokens
  (z_utils.hpp:243-315)
- FNV-1a 64-bit hash, used as the key of the projected-embedding cache and
  the RPC tensor dedup cache (z_utils.hpp:546-560)
- longest common prefix over token vectors, used by the prompt prefix cache
  (z_utils.hpp:515-543)
"""

from __future__ import annotations

import base64 as _b64
from typing import Sequence


def base64_encode(data: bytes) -> str:
    return _b64.b64encode(data).decode("ascii")


def base64_decode(text: str) -> bytes:
    # Tolerate missing padding like the reference's hand-rolled decoder.
    pad = (-len(text)) % 4
    return _b64.b64decode(text + "=" * pad)


def utf8_is_valid(data: bytes) -> bool:
    try:
        data.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def utf8_safe_split_point(data: bytes) -> int:
    """Largest n <= len(data) such that data[:n] is valid UTF-8.

    Streaming detokenization may cut a multi-byte codepoint in half; the
    server holds back the trailing partial bytes until the next token
    completes them (reference z_utils.hpp:282-315).
    """
    n = len(data)
    if n == 0:
        return 0
    # Walk back over trailing continuation bytes (at most 3) to find the
    # lead byte of the final sequence.
    k = n - 1
    back = 0
    while k >= 0 and back < 3 and (data[k] & 0xC0) == 0x80:
        k -= 1
        back += 1
    if k < 0:
        return n  # nothing but continuation bytes: not a partial sequence
    lead = data[k]
    if lead < 0x80:
        need = 1
    elif (lead >> 5) == 0b110:
        need = 2
    elif (lead >> 4) == 0b1110:
        need = 3
    elif (lead >> 3) == 0b11110:
        need = 4
    else:
        return n  # invalid lead byte: pass through as-is
    have = n - k
    return k if have < need else n


def fnv1a_64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def longest_common_prefix(a: Sequence[int], b: Sequence[int]) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i
