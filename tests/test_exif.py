"""EXIF/TIFF APP1 walk (operators/multimodal.py decode_exif +
insert_exif_app1). The driver gate pins the decode formulas; these pin
the closed loop on arbitrary parameters and every malformed-IFD raise
class a crawl actually serves up. Pure-Python — no Spark session."""

from __future__ import annotations

import struct

import pytest

from gomrjob_spark.operators import multimodal as M


def _jpeg() -> bytes:
    return M.encode_jpeg_baseline(bytes([100] * 64), 8, 8, channels=1)


@pytest.mark.parametrize("bo", ["II", "MM"])
@pytest.mark.parametrize(
    "params",
    [
        dict(width=1, height=1, orientation=1, xres=(1, 1), model="a", iso=50),
        dict(width=65535, height=4000, orientation=8, xres=(300, 7),
             model="longcameraname", iso=6400),
        dict(width=640, height=480, orientation=6, xres=(72, 1), model="",
             iso=100),
    ],
)
def test_roundtrip_both_endiannesses(bo, params):
    p = M.insert_exif_app1(_jpeg(), byte_order=bo, **params)
    got = M.decode_exif(p)
    assert got["byte_order"] == bo
    assert got["exif_w"] == params["width"]
    assert got["exif_h"] == params["height"]
    assert got["orientation"] == params["orientation"]
    assert (got["xres_num"], got["xres_den"]) == params["xres"]
    assert got["model"] == params["model"]
    assert got["iso"] == params["iso"]
    assert got["n_ifd0"] == 6


def test_app1_sits_after_soi_and_stream_still_decodes():
    """The splice must keep the JPEG decodable: EXIF is metadata, not
    image data."""
    base = _jpeg()
    p = M.insert_exif_app1(base, "II", 8, 8)
    assert p[:2] == b"\xff\xd8" and p[2:4] == b"\xff\xe1"
    assert M.decode_image(p)["width"] == 8
    assert M.decode_image(base) == M.decode_image(p)


def test_segment_length_is_big_endian_even_for_ii():
    """The classic trap: the APP1 marker LENGTH obeys the JPEG
    big-endian rule even when the TIFF inside is little-endian."""
    p = M.insert_exif_app1(_jpeg(), "II", 8, 8)
    (seglen,) = struct.unpack(">H", p[4:6])
    assert p[6:12] == b"Exif\x00\x00"
    assert 40 < seglen < 200


def _tiff_of(p: bytes) -> tuple[int, bytes]:
    """(offset of tiff start in payload, tiff bytes)."""
    (seglen,) = struct.unpack(">H", p[4:6])
    return 12, p[12:4 + seglen + 2]


def test_raise_on_bad_byte_order_mark():
    p = bytearray(M.insert_exif_app1(_jpeg(), "II", 8, 8))
    off, _ = _tiff_of(bytes(p))
    p[off:off + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        M.decode_exif(bytes(p))


def test_raise_on_bad_tiff_magic():
    p = bytearray(M.insert_exif_app1(_jpeg(), "II", 8, 8))
    off, _ = _tiff_of(bytes(p))
    p[off + 2:off + 4] = struct.pack("<H", 43)
    with pytest.raises(ValueError, match="magic"):
        M.decode_exif(bytes(p))


def test_raise_on_truncated_ifd():
    """Claim more entries than the segment holds."""
    p = bytearray(M.insert_exif_app1(_jpeg(), "II", 8, 8))
    off, _ = _tiff_of(bytes(p))
    p[off + 8:off + 10] = struct.pack("<H", 5000)
    with pytest.raises(ValueError, match="truncated IFD"):
        M.decode_exif(bytes(p))


def test_raise_on_value_offset_past_segment():
    """Point the RATIONAL XResolution's out-of-line value past the
    segment end (entry 5 of IFD0, value field at +8)."""
    p = bytearray(M.insert_exif_app1(_jpeg(), "II", 8, 8))
    off, _ = _tiff_of(bytes(p))
    entry5 = off + 8 + 2 + 4 * 12  # header(8) + count(2) + 4 entries
    assert struct.unpack("<H", p[entry5:entry5 + 2])[0] == 0x011A
    p[entry5 + 8:entry5 + 12] = struct.pack("<I", 1 << 20)
    with pytest.raises(ValueError, match="value offset past"):
        M.decode_exif(bytes(p))


def test_raise_on_ifd0_offset_past_segment():
    p = bytearray(M.insert_exif_app1(_jpeg(), "MM", 8, 8))
    off, _ = _tiff_of(bytes(p))
    p[off + 4:off + 8] = struct.pack(">I", 1 << 20)
    with pytest.raises(ValueError, match="IFD offset past"):
        M.decode_exif(bytes(p))


def test_raise_when_no_exif_before_sos():
    with pytest.raises(ValueError, match="no APP1 Exif"):
        M.decode_exif(_jpeg())


def test_raise_on_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        M.decode_exif(b"\x89PNG....")
    with pytest.raises(ValueError, match="SOI"):
        M.insert_exif_app1(b"\x89PNG....", "II")


def test_writer_rejects_bad_byte_order():
    with pytest.raises(ValueError, match="II/MM"):
        M.insert_exif_app1(_jpeg(), "LE")


# --------------------------- orientation normalization (dihedral group)


def test_orientation_group_structure():
    """The 8 TIFF orientations form the dihedral group D4: mirrors and
    the 180 rotation are self-inverse, rot90 CW and CCW invert each
    other, and the transforms land where they should on an asymmetric
    raster."""
    px, w, h = list(range(6)), 3, 2

    def ap(o, p=px, ww=w, hh=h):
        return M.apply_exif_orientation(p, ww, hh, o)

    for o in (2, 3, 4, 5, 7):  # involutions
        out, ow, oh = ap(o)
        back, bw, bh = M.apply_exif_orientation(out, ow, oh, o)
        assert (back, bw, bh) == (px, w, h)
    out6, ow, oh = ap(6)
    back, bw, bh = M.apply_exif_orientation(out6, ow, oh, 8)
    assert (back, bw, bh) == (px, w, h)
    # hand-checked: rot90 CW of [[0,1,2],[3,4,5]] is [[3,0],[4,1],[5,2]]
    assert out6 == [3, 0, 4, 1, 5, 2] and (ow, oh) == (2, 3)


def test_orientation_multichannel_moves_pixels_not_channels():
    """Channels travel with their pixel: RGB triples stay contiguous."""
    px = [1, 2, 3, 4, 5, 6]  # 2x1, RGB: pixels (1,2,3) and (4,5,6)
    out, ow, oh = M.apply_exif_orientation(px, 2, 1, 2, channels=3)
    assert out == [4, 5, 6, 1, 2, 3] and (ow, oh) == (2, 1)


def test_orientation_rejects_out_of_range():
    with pytest.raises(ValueError, match="1..8"):
        M.apply_exif_orientation([0], 1, 1, 0)
    with pytest.raises(ValueError, match="1..8"):
        M.apply_exif_orientation([0], 1, 1, 9)
