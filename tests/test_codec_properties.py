"""Property-based codec tests (hypothesis): the PNG/GIF/JPEG decoders
round-trip ANY image the matching writer emits — random dimensions,
channel layouts, palettes, filter-type sequences, and pixel content —
not just the fixture shapes. Pure Python, no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gomrjob_spark.operators.multimodal import (
    decode_image,
    encode_gif,
    encode_jpeg_baseline,
    encode_png,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 16))


@settings(max_examples=40, deadline=None)
@given(
    dims,
    st.sampled_from([0, 2, 4, 6]),
    st.integers(0, 2**31 - 1),
    st.data(),
)
def test_png_roundtrips_any_image(wh, color_type, seed, data):
    w, h = wh
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.RandomState(seed % 2**31)
    pixels = rng.randint(0, 256, size=w * h * nch, dtype=np.uint8).tobytes()
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = decode_image(encode_png(pixels, w, h, color_type, filters=filters))
    assert (got["width"], got["height"], got["channels"]) == (w, h, nch)
    assert got["pixels"] == pixels


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(2, 64), st.integers(0, 2**31 - 1))
def test_gif_roundtrips_any_palette_image(wh, n_colors, seed):
    w, h = wh
    rng = np.random.RandomState(seed % 2**31)
    palette = rng.randint(0, 256, size=n_colors * 3, dtype=np.uint8).tobytes()
    indices = rng.randint(0, n_colors, size=w * h).astype(np.uint8).tobytes()
    got = decode_image(encode_gif(indices, w, h, palette))
    assert (got["width"], got["height"], got["channels"]) == (w, h, 3)
    want = b"".join(palette[i * 3 : i * 3 + 3] for i in indices)
    assert got["pixels"] == want


@settings(max_examples=25, deadline=None)
@given(dims, st.sampled_from([1, 3]), st.integers(0, 2**31 - 1), st.sampled_from([0, 3]))
def test_jpeg_decodes_within_rounding_any_image(wh, channels, seed, restart):
    w, h = wh
    rng = np.random.RandomState(seed % 2**31)
    arr = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
    payload = encode_jpeg_baseline(
        arr.tobytes(), w, h, channels=channels, restart_interval=restart
    )
    got = decode_image(payload)
    assert (got["width"], got["height"], got["channels"]) == (w, h, channels)
    dec = np.frombuffer(got["pixels"], dtype=np.uint8).reshape(h, w, channels)
    # gray: DCT float round-trip only (+/-1); color adds the YCbCr
    # forward/inverse rounding (+/-2)
    tol = 1 if channels == 1 else 2
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= tol
