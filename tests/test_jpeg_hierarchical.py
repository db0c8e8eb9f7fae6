"""Hierarchical JPEG (T.81 Annex J) codec gates: byte-identical
pyramid round-trips on arbitrary pixels across levels, channels, odd
dimensions, both entropy coders and restart cadences; the J.1.1.2
reference-expansion filter pinned by hand; and the named contract
raises (DCT differential frames, nonzero point transform)."""

from __future__ import annotations

import pytest

from gomrjob_spark.operators import multimodal as M


def _px(w, h, ch, salt):
    return bytes((salt * 31 + i * 13 + 7) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("arith", [True, False])
@pytest.mark.parametrize("levels", [1, 2, 3])
def test_roundtrip_levels_both_coders(arith, levels):
    w, h = 13, 9
    px = _px(w, h, 1, levels)
    enc = M.encode_jpeg_hierarchical(
        px, w, h, channels=1, levels=levels, arith=arith
    )
    d = M.decode_image(enc)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    assert d["pixels"] == px


@pytest.mark.parametrize("dims", [(1, 1), (2, 1), (3, 5), (16, 11), (7, 7)])
def test_roundtrip_odd_dims_rgb(dims):
    w, h = dims
    px = _px(w, h, 3, w + h)
    enc = M.encode_jpeg_hierarchical(px, w, h, channels=3, levels=2)
    assert M.decode_image(enc)["pixels"] == px


@pytest.mark.parametrize("arith", [True, False])
@pytest.mark.parametrize("ri", [1, 3])
def test_roundtrip_restart_cadences(arith, ri):
    w, h = 10, 6
    px = _px(w, h, 1, ri)
    enc = M.encode_jpeg_hierarchical(
        px, w, h, channels=1, levels=2, arith=arith, restart_interval=ri
    )
    assert M.decode_image(enc)["pixels"] == px


def test_upsample_filter_pinned_by_hand():
    # J.1.1.2: even samples copy, odd interpolate (a+b+1)>>1, edges
    # replicate — checked against a hand computation both directions
    up = M._jpeg_hier_upsample([[10, 20, 31]], 1, 0)
    assert up.tolist() == [[10, 15, 20, 26, 31, 31]]
    up = M._jpeg_hier_upsample([[10], [20]], 0, 1)
    assert up.tolist() == [[10], [15], [20], [20]]


def test_decimation_pyramid_is_what_decoder_reconstructs_from():
    # a 2-level stream really carries three frames: base + 2 diffs
    enc = M.encode_jpeg_hierarchical(_px(8, 8, 1, 3), 8, 8, levels=2)
    assert enc.count(b"\xff\xdf") == 2  # two EXP segments
    assert enc[2:4] == b"\xff\xde"  # DHP right after SOI
    assert enc.count(b"\xff\xcf") == 2 and enc.count(b"\xff\xcb") == 1


def test_dct_differential_frame_raises_named_contract():
    enc = bytearray(M.encode_jpeg_hierarchical(_px(4, 4, 1, 2), 4, 4, levels=1))
    i = enc.index(b"\xff\xcf")
    enc[i + 1] = 0xCD  # SOF13: differential arithmetic sequential DCT
    with pytest.raises(NotImplementedError, match="DCT-based"):
        M.decode_image(bytes(enc))


def test_nonzero_point_transform_raises_named_contract():
    enc = bytearray(M.encode_jpeg_hierarchical(_px(4, 4, 1, 2), 4, 4, levels=1))
    # first SOS: Ns=1 -> Al byte sits 5 bytes after the marker+len
    i = enc.index(b"\xff\xda")
    enc[i + 9] = 0x01  # Ah=0, Al=1
    with pytest.raises(NotImplementedError, match="point transform"):
        M.decode_image(bytes(enc))


def test_truncated_hierarchical_stream_fails_clean():
    enc = M.encode_jpeg_hierarchical(_px(8, 8, 1, 5), 8, 8, levels=2, arith=False)
    with pytest.raises((ValueError, EOFError)):
        M.decode_image(enc[: len(enc) // 2])


def test_levels_validation():
    with pytest.raises(ValueError, match="level"):
        M.encode_jpeg_hierarchical(b"\x00", 1, 1, levels=0)
