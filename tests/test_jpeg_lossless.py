"""Lossless JPEG (SOF3 Huffman / SOF11 arithmetic, T.81 Annex H) codec
gates: byte-identical round-trips on arbitrary (non-block-constant)
pixels across all seven predictors, both entropy coders, restart
cadences, interleave modes, and point transforms; plus the honest
hierarchical raise and truncation behavior."""

from __future__ import annotations

import random

import pytest

from gomrjob_spark.operators import multimodal as M


def _px(w, h, ch, salt):
    return bytes((salt * 31 + i * 13 + 7) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("arith", [True, False])
@pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_every_predictor(arith, pred):
    w, h = 13, 7
    px = _px(w, h, 1, pred)
    enc = M.encode_jpeg_lossless(px, w, h, channels=1, predictor=pred, arith=arith)
    d = M.decode_image(enc)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    assert d["pixels"] == px


@pytest.mark.parametrize("arith", [True, False])
@pytest.mark.parametrize("ri", [1, 3, 5])
def test_roundtrip_restart_cadences(arith, ri):
    w, h = 8, 8
    px = _px(w, h, 1, ri)
    enc = M.encode_jpeg_lossless(
        px, w, h, channels=1, predictor=4, restart_interval=ri, arith=arith
    )
    assert M.decode_image(enc)["pixels"] == px


@pytest.mark.parametrize("interleave", [True, False])
def test_roundtrip_three_channels_both_scan_layouts(interleave):
    w, h = 5, 3
    px = _px(w, h, 3, 9)
    enc = M.encode_jpeg_lossless(
        px, w, h, channels=3, predictor=5, interleave=interleave
    )
    d = M.decode_image(enc)
    assert d["channels"] == 3
    assert d["pixels"] == px  # lossless 3ch = components as-is (RGB)


def test_point_transform_truncates_then_rescales():
    w, h = 6, 4
    px = _px(w, h, 1, 3)
    enc = M.encode_jpeg_lossless(px, w, h, channels=1, point_transform=2)
    d = M.decode_image(enc)
    assert d["pixels"] == bytes((b >> 2) << 2 for b in px)


def test_random_noise_roundtrips_both_coders():
    rng = random.Random(7)
    for _ in range(12):
        w, h = rng.randint(1, 16), rng.randint(1, 16)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for arith in (True, False):
            enc = M.encode_jpeg_lossless(
                px, w, h, channels=1,
                predictor=rng.randint(1, 7),
                restart_interval=rng.choice([0, 2]),
                arith=arith,
            )
            assert M.decode_image(enc)["pixels"] == px


def test_arith_and_huffman_streams_differ_but_agree():
    w, h = 9, 5
    px = _px(w, h, 1, 1)
    a = M.encode_jpeg_lossless(px, w, h, channels=1, arith=True)
    b = M.encode_jpeg_lossless(px, w, h, channels=1, arith=False)
    assert a != b and a[3] == 0xCB and b[3] == 0xC3
    assert M.decode_image(a)["pixels"] == M.decode_image(b)["pixels"] == px


def test_hierarchical_sof_raises_named_contract():
    enc = bytearray(M.encode_jpeg_lossless(_px(4, 4, 1, 2), 4, 4, channels=1))
    i = enc.index(b"\xff\xcb")
    enc[i + 1] = 0xCE  # SOF14: differential arithmetic sequential
    with pytest.raises(NotImplementedError, match="hierarchical"):
        M.decode_image(bytes(enc))


def test_truncated_lossless_stream_fails_clean():
    enc = M.encode_jpeg_lossless(_px(8, 8, 1, 5), 8, 8, channels=1, arith=False)
    with pytest.raises((ValueError, EOFError)):
        M.decode_image(enc[: len(enc) // 2])


def test_bad_predictor_selector_rejected():
    with pytest.raises(ValueError, match="predictor"):
        M.encode_jpeg_lossless(b"\x00", 1, 1, channels=1, predictor=0)
