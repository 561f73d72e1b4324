"""Hypothesis fuzz for the PNG codec (functions/png.py): round-trip
bit-exactness over arbitrary shapes/contents, and the garbage contract —
a corrupted or truncated stream must raise (or, for pure pixel-data
damage that zlib happens to accept, still never crash the process),
NEVER silently return wrong-shaped output."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from erddap2agol_spark.functions.png import (
    decode_png,
    encode_png,
    resize_box,
    resize_nearest,
)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_bit_exact(h, w, c, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (h, w, c)
    np.testing.assert_array_equal(out, img)


@given(cut=st.integers(1, 200), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_truncation_never_returns_wrong_pixels(cut, seed):
    img = np.random.default_rng(seed).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = encode_png(img)
    cut = min(cut, len(blob) - 1)
    truncated = blob[: len(blob) - cut]
    try:
        out = decode_png(truncated)
    except ValueError:
        return  # the contract: loud, classified failure
    except Exception as e:  # zlib mid-stream damage surfaces as its own error
        assert "zlib" in type(e).__module__ or "Error" in type(e).__name__
        return
    # a cut small enough to leave IHDR+IDAT+IEND intact cannot exist
    # (IEND is the last 12 bytes), so reaching here means the decode
    # REPAIRED a truncated stream — only acceptable if bit-exact
    np.testing.assert_array_equal(out, img)


@given(
    junk=st.binary(min_size=0, max_size=64),
)
@settings(max_examples=40, deadline=None)
def test_garbage_bytes_raise(junk):
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + junk)


@given(
    h=st.integers(2, 16),
    w=st.integers(2, 16),
    th=st.integers(1, 8),
    tw=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_resize_nearest_samples_exact_pixels(h, w, th, tw, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    small = resize_nearest(img, tw, th)
    assert small.shape == (th, tw, 3)
    for y in range(th):
        for x in range(tw):
            np.testing.assert_array_equal(
                small[y, x], img[(y * h) // th, (x * w) // tw]
            )


def test_resize_box_rejects_non_integer_factors():
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="integer factors"):
        resize_box(img, 4, 4)
