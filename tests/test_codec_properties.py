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
    encode_jpeg_progressive,
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
@given(
    dims,
    st.sampled_from([0, 2, 4, 6]),
    st.integers(0, 2**31 - 1),
    st.booleans(),
)
def test_png_16bit_roundtrips_and_scales_exactly(wh, color_type, seed, interlace):
    """16-bit samples built as v*257 must decode back to exactly v: the
    decoder's round(v16*255/65535) is the exact inverse of the *257
    expansion, so the 8->16->8 trip is lossless at every depth/color."""
    w, h = wh
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.RandomState(seed % 2**31)
    px8 = rng.randint(0, 256, size=w * h * nch, dtype=np.uint8)
    px16 = (px8.astype(">u2") * 257).tobytes()
    got = decode_image(
        encode_png(px16, w, h, color_type, bit_depth=16, interlace=int(interlace))
    )
    assert (got["width"], got["height"], got["channels"]) == (w, h, nch)
    assert got["pixels"] == px8.tobytes()


@settings(max_examples=40, deadline=None)
@given(
    dims,
    st.sampled_from([1, 2, 4]),
    st.sampled_from([0, 3]),
    st.integers(0, 2**31 - 1),
    st.booleans(),
)
def test_png_sub8_depths_roundtrip(wh, depth, color_type, seed, interlace):
    """1/2/4-bit packed scanlines (gray scaled by 255/(2^d-1); palette
    raw indices through PLTE), interlaced or not, round-trip exactly."""
    w, h = wh
    rng = np.random.RandomState(seed % 2**31)
    n = 1 << depth
    idx = rng.randint(0, n, size=w * h).astype(np.uint8)
    if color_type == 0:
        vals = (idx * (255 // (n - 1))).astype(np.uint8)
        got = decode_image(
            encode_png(vals.tobytes(), w, h, 0, bit_depth=depth, interlace=int(interlace))
        )
        assert got["channels"] == 1 and got["pixels"] == vals.tobytes()
    else:
        pal = rng.randint(0, 256, size=n * 3, dtype=np.uint8).tobytes()
        got = decode_image(
            encode_png(
                idx.tobytes(), w, h, 3, bit_depth=depth, plte=pal,
                interlace=int(interlace),
            )
        )
        want = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
        assert got["channels"] == 3 and got["pixels"] == want


@settings(max_examples=40, deadline=None)
@given(
    dims,
    st.sampled_from([0, 2, 4, 6]),
    st.integers(0, 2**31 - 1),
    st.data(),
)
def test_png_adam7_equals_sequential(wh, color_type, seed, data):
    """The same pixels written Adam7 and non-interlaced decode
    identically — de-interlacing is a pure reordering. Filter types are
    drawn independently per scanline for both codings (Adam7 has the
    same total scanline count, split across up to 7 sub-images)."""
    w, h = wh
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.RandomState(seed % 2**31)
    pixels = rng.randint(0, 256, size=w * h * nch, dtype=np.uint8).tobytes()
    f_seq = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    plain = decode_image(encode_png(pixels, w, h, color_type, filters=f_seq))
    inter = decode_image(encode_png(pixels, w, h, color_type, interlace=1))
    assert plain["pixels"] == inter["pixels"] == pixels


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


@settings(max_examples=30, deadline=None)
@given(
    dims,
    st.sampled_from([1, 3]),
    st.integers(0, 2**31 - 1),
    st.sampled_from([0, 3]),
    st.sampled_from([(1, 1), (2, 2)]),
    st.integers(1, 2),
    st.integers(1, 2),
)
def test_jpeg_progressive_decodes_identical_to_baseline(
    wh, channels, seed, restart, sub, dc_al, ac_al
):
    """Progressive coding is a lossless reordering of the entropy layer:
    the SOF2 stream (spectral selection + successive approximation, EOB
    runs, correction bits, restart markers) must decode to byte-identical
    pixels as the baseline stream of the same image — so any divergence
    between the two decode paths, in either direction, fails here."""
    w, h = wh
    if channels == 1:
        sub = (1, 1)
    rng = np.random.RandomState(seed % 2**31)
    px = rng.randint(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    base = decode_image(
        encode_jpeg_baseline(
            px, w, h, channels=channels, restart_interval=restart, subsampling=sub
        )
    )
    prog = decode_image(
        encode_jpeg_progressive(
            px, w, h, channels=channels, restart_interval=restart,
            subsampling=sub, dc_al=dc_al, ac_al=ac_al,
        )
    )
    assert (prog["width"], prog["height"], prog["channels"]) == (w, h, channels)
    assert prog["pixels"] == base["pixels"]


def test_jpeg_progressive_single_band_and_deep_approximation():
    """Degenerate scan scripts: one band covering 1..63, and a 3-level
    successive approximation, still reproduce the baseline pixels."""
    rng = np.random.RandomState(11)
    w, h = 19, 13
    px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    base = decode_image(encode_jpeg_baseline(px, w, h, channels=3))
    one_band = decode_image(
        encode_jpeg_progressive(px, w, h, channels=3, bands=((1, 63),))
    )
    deep = decode_image(
        encode_jpeg_progressive(px, w, h, channels=3, dc_al=3, ac_al=3)
    )
    assert one_band["pixels"] == base["pixels"]
    assert deep["pixels"] == base["pixels"]


# ------------------------------------------------------- truncation paths
# Malformed/truncated payloads must raise the module's ValueError
# contract — never a raw IndexError from indexing past the buffer
# (ADVICE r5: sync_restart's stuffed-pair skip loop and the Adam7
# unfilter path validated only after decoding).


def _idat_raw_and_rebuild(payload: bytes, new_raw: bytes) -> bytes:
    """Reassemble a PNG payload with ``new_raw`` recompressed as its
    single IDAT chunk (our decoder ignores chunk CRCs)."""
    import zlib

    comp = zlib.compress(new_raw)
    out = bytearray(payload[:8])
    i, wrote = 8, False
    while i + 8 <= len(payload):
        clen = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        if ctype == b"IDAT":
            if not wrote:
                out += len(comp).to_bytes(4, "big") + b"IDAT" + comp + b"\x00" * 4
                wrote = True
        else:
            out += payload[i : i + 12 + clen]
        i += 12 + clen
    return bytes(out)


def test_png_adam7_truncated_idat_raises_valueerror():
    import zlib

    import pytest

    w, h = 16, 16
    px = bytes(range(256))
    payload = encode_png(px, w, h, 0, interlace=1)
    # extract the original filtered raster, chop bytes off the end, and
    # recompress — valid zlib, short raster
    idat = bytearray()
    i = 8
    while i + 8 <= len(payload):
        clen = int.from_bytes(payload[i : i + 4], "big")
        if payload[i + 4 : i + 8] == b"IDAT":
            idat += payload[i + 8 : i + 8 + clen]
        i += 12 + clen
    raw = zlib.decompress(bytes(idat))
    bad = _idat_raw_and_rebuild(payload, raw[:-7])
    with pytest.raises(ValueError, match="Adam7 raster size"):
        decode_image(bad)


def test_jpeg_truncated_before_restart_marker_raises_valueerror():
    import pytest

    rng = np.random.RandomState(0)
    w, h = 24, 24
    px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    payload = encode_jpeg_baseline(px, w, h, channels=3, restart_interval=1)
    sos = payload.find(b"\xff\xda")
    rst = payload.find(b"\xff\xd0", sos)
    assert rst > sos > 0
    with pytest.raises(ValueError):
        decode_image(payload[:rst])


def test_jpeg_truncated_mid_entropy_raises_valueerror():
    import pytest

    rng = np.random.RandomState(1)
    w, h = 24, 24
    px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    payload = encode_jpeg_baseline(px, w, h, channels=3)
    assert payload.endswith(b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_image(payload[:-8])
