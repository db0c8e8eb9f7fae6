"""MP4 / ISO-BMFF container walk (sources/mp4.py): round-trip, decoy
immunity (fake box headers inside mdat junk gaps), the largesize /
size==0 box paths, stsc run expansion, v1 full-box times, and the
malformation raise matrix — the codec-family convention (writer twin
closes the loop, every documented ValueError class has a test)."""

from __future__ import annotations

import struct

import pytest

from gomrjob_spark.sources.mp4 import (
    _JUNK,
    _SAMPLE_DELTA,
    _TIMESCALE,
    _box,
    _full,
    encode_mp4,
    parse_mp4,
)

FRAMES = [bytes([i] * 64) for i in range(14)]  # 14 % 3 != 0: 2-run stsc


def test_roundtrip_plain():
    parsed = parse_mp4(encode_mp4(FRAMES, 8, 8))
    assert parsed["samples"] == FRAMES
    assert parsed["n_samples"] == 14
    assert parsed["n_chunks"] == 5  # ceil(14 / 3)
    assert (parsed["width"], parsed["height"]) == (8, 8)
    assert parsed["timescale"] == _TIMESCALE
    assert parsed["duration"] == 14 * _SAMPLE_DELTA


def test_roundtrip_exact_chunk_multiple_single_stsc_run():
    parsed = parse_mp4(encode_mp4(FRAMES[:12], 8, 8))
    assert parsed["samples"] == FRAMES[:12]
    assert parsed["n_chunks"] == 4


def test_sample_offsets_are_absolute_and_skip_junk_gaps():
    blob = encode_mp4(FRAMES, 8, 8)
    parsed = parse_mp4(blob)
    for i, off in enumerate(parsed["sample_offsets"]):
        # layout arithmetic: ftyp(24) + free(15) + mdat hdr(16), then
        # 15-byte junk + 3x64 samples per chunk
        assert off == 70 + 207 * (i // 3) + 64 * (i % 3)
        assert blob[off : off + 64] == FRAMES[i]


def test_fake_box_headers_inside_mdat_are_not_boxes():
    blob = encode_mp4(FRAMES, 8, 8)
    # the junk gap bytes ARE a fake 'moov' box header + 'mdat' fourcc
    assert blob.count(_JUNK) == 5
    parsed = parse_mp4(blob)
    assert len(parsed["samples"]) == 14  # magic-scanners see more moovs
    # and samples are NOT contiguous from the mdat payload start: the
    # first 15 payload bytes are junk a contiguity reader would emit
    assert parsed["sample_offsets"][0] != 55  # 24 + 15 + 16


def test_variable_sample_sizes():
    frames = [b"\x01\x02\x03", b"\x04" * 64, b"\x05" * 5, b"\x06" * 31]
    parsed = parse_mp4(encode_mp4(frames, 4, 4))
    assert parsed["samples"] == frames


def test_size_zero_box_extends_to_end_of_file():
    # a trailing size==0 'skip' box after moov is legal top-level
    blob = encode_mp4(FRAMES, 8, 8) + struct.pack(">I", 0) + b"skip" + b"x" * 9
    parsed = parse_mp4(blob)
    assert parsed["samples"] == FRAMES


def test_v1_timed_headers_parse():
    # hand-build a v1 mvhd (64-bit times) and splice it over the v0 one
    blob = encode_mp4(FRAMES[:3], 8, 8)
    v0 = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, 3 * _SAMPLE_DELTA)
        + struct.pack(">iHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    assert v0 in blob
    v1 = _full(
        b"mvhd",
        1,
        struct.pack(">QQI", 0, 0, _TIMESCALE)
        + struct.pack(">Q", 3 * _SAMPLE_DELTA)
        + v0[8 + 4 + 16 :],  # same tail after the v0 timed fields
    )
    # moov's declared size must absorb the 12 extra bytes
    moov_at = blob.rindex(b"moov") - 4
    moov_size = struct.unpack(">I", blob[moov_at : moov_at + 4])[0]
    patched = (
        blob[:moov_at]
        + struct.pack(">I", moov_size + len(v1) - len(v0))
        + blob[moov_at + 4 :].replace(v0, v1)
    )
    parsed = parse_mp4(patched)
    assert parsed["timescale"] == _TIMESCALE
    assert parsed["duration"] == 3 * _SAMPLE_DELTA


# ---- malformation raise matrix ----


def test_raise_on_missing_ftyp():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(_box(b"free", b"x") + encode_mp4(FRAMES, 8, 8))


def test_raise_on_invalid_box_size():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    blob[0:4] = struct.pack(">I", 7)  # ftyp size < 8
    with pytest.raises(ValueError, match="invalid size"):
        parse_mp4(bytes(blob))


def test_raise_on_box_running_past_parent():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    blob[0:4] = struct.pack(">I", len(blob) + 100)
    with pytest.raises(ValueError, match="past parent"):
        parse_mp4(bytes(blob))


def test_raise_on_truncated_largesize():
    blob = encode_mp4(FRAMES, 8, 8)
    cut = blob.index(b"mdat") + 6  # inside the u64 largesize field
    with pytest.raises(ValueError, match="largesize truncated|past parent"):
        parse_mp4(blob[:cut])


def test_raise_on_missing_moov():
    blob = encode_mp4(FRAMES, 8, 8)
    moov_at = blob.rindex(b"moov") - 4
    with pytest.raises(ValueError, match="missing moov"):
        parse_mp4(blob[:moov_at])


def test_raise_on_missing_mdat():
    blob = encode_mp4(FRAMES, 8, 8)
    mdat_at = blob.index(b"mdat") - 4
    moov_at = blob.rindex(b"moov") - 4
    with pytest.raises(ValueError, match="missing mdat"):
        parse_mp4(blob[:mdat_at] + blob[moov_at:])


def test_raise_on_non_vide_handler():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"vide")
    blob[at : at + 4] = b"soun"
    with pytest.raises(ValueError, match="not 'vide'"):
        parse_mp4(bytes(blob))


def test_raise_on_stts_stsz_disagreement():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stts") + 4 + 4  # version/flags, then entry_count
    # bump the single run's sample_count (entry_count +4, count +4)
    blob[at + 4 : at + 8] = struct.pack(">I", 15)
    with pytest.raises(ValueError, match="stts claims"):
        parse_mp4(bytes(blob))


def test_raise_on_stsc_not_covering_samples():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stsc") + 4 + 4  # entry_count position
    # first run: samples_per_chunk 3 -> 2 (first_chunk, SPC, desc)
    blob[at + 8 : at + 12] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="stsc/stco cover"):
        parse_mp4(bytes(blob))


def test_raise_on_stsc_first_chunk_out_of_range():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stsc") + 4 + 4
    blob[at + 4 : at + 8] = struct.pack(">I", 99)  # first_chunk
    with pytest.raises(ValueError, match="out of range"):
        parse_mp4(bytes(blob))


def test_raise_on_sample_outside_mdat():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stco") + 4 + 4 + 4  # first chunk offset
    blob[at : at + 4] = struct.pack(">I", len(blob) - 4)
    with pytest.raises(ValueError, match="outside mdat"):
        parse_mp4(bytes(blob))


def test_raise_on_tkhd_stsd_dimension_disagreement():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"tkhd") - 4
    size = struct.unpack(">I", blob[at : at + 4])[0]
    # width is the 8th-from-last..4th-from-last bytes of the box
    blob[at + size - 8 : at + size - 4] = struct.pack(">I", 9 << 16)
    with pytest.raises(ValueError, match="disagree"):
        parse_mp4(bytes(blob))


def test_raise_on_missing_index_table():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stco")
    blob[at : at + 4] = b"xxxx"  # stco vanishes from the stbl walk
    with pytest.raises(ValueError, match="missing stco"):
        parse_mp4(bytes(blob))


def test_raise_on_unsupported_fullbox_version():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"mvhd") + 4
    blob[at] = 3
    with pytest.raises(ValueError, match="version 3 unsupported"):
        parse_mp4(bytes(blob))


def test_raise_on_stsc_non_monotone_runs():
    """r13 advisor: non-monotone first_chunk runs could double-cover
    chunks (len(per_chunk) > n_chunks with equal sample sum), hitting
    IndexError instead of the contract's ValueError."""
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stsc") + 4 + 4  # entry_count position
    # second run (entries at at+4, 12 bytes each): first_chunk 5 -> 1
    blob[at + 16 : at + 20] = struct.pack(">I", 1)
    with pytest.raises(ValueError, match="not strictly increasing"):
        parse_mp4(bytes(blob))


def test_raise_on_stsc_runs_not_covering_all_chunks():
    blob = bytearray(encode_mp4(FRAMES, 8, 8))
    at = blob.index(b"stsc") + 4 + 4
    # first run starts at chunk 2: chunk 1 uncovered -> 4 of 5 chunks
    blob[at + 4 : at + 8] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="stsc runs cover"):
        parse_mp4(bytes(blob))


def test_stss_roundtrip_and_default():
    marked = [1, 4, 10]
    p = parse_mp4(encode_mp4(FRAMES, 8, 8, marked))
    assert p["sync_samples"] == marked
    assert p["samples"] == FRAMES  # sample walk untouched
    # no stss box -> spec default: sync_samples is None (all sync)
    assert parse_mp4(encode_mp4(FRAMES, 8, 8))["sync_samples"] is None


def test_stss_absent_keeps_bytes_identical():
    # the already-gated mp4 queries byte-depend on the writer layout
    assert encode_mp4(FRAMES, 8, 8) == encode_mp4(FRAMES, 8, 8, None)


def test_stss_writer_rejects_bad_lists():
    for bad in ([0, 2], [2, 2], [5, 3], [1, 99]):
        with pytest.raises(ValueError, match="strictly increasing"):
            encode_mp4(FRAMES, 8, 8, bad)


def test_raise_on_stss_non_monotone():
    blob = bytearray(encode_mp4(FRAMES, 8, 8, [2, 7]))
    at = blob.index(b"stss") + 4 + 4  # entry_count position
    blob[at + 4 : at + 8] = struct.pack(">I", 9)  # first entry 2 -> 9
    with pytest.raises(ValueError, match="stss sample numbers"):
        parse_mp4(bytes(blob))


def test_raise_on_stss_out_of_range():
    blob = bytearray(encode_mp4(FRAMES, 8, 8, [2, 7]))
    at = blob.index(b"stss") + 4 + 4
    blob[at + 8 : at + 12] = struct.pack(">I", 15)  # 15 > n=14
    with pytest.raises(ValueError, match="stss sample numbers"):
        parse_mp4(bytes(blob))


def test_keyframe_decoys_nonvacuous():
    """The gated query's two naive-reader failure modes must actually
    occur: sync samples that are NOT chunk starts, and chunk starts
    that are NOT sync (the period-4 vs period-3 misalignment)."""
    mid_chunk_sync = chunk_start_nonsync = 0
    for d in range(64):
        n = d % 8 + 12
        sync = {j for j in range(n) if j == 0 or (d * 3 + j * 5) % 4 == 0}
        for j in range(n):
            if j in sync and j % 3 != 0:
                mid_chunk_sync += 1
            if j % 3 == 0 and j not in sync:
                chunk_start_nonsync += 1
    assert mid_chunk_sync > 0 and chunk_start_nonsync > 0


def test_elst_roundtrip_and_byte_identity():
    p = parse_mp4(encode_mp4(FRAMES, 8, 8, None, 1024))
    assert p["edit"] == (14 * 512 - 1024, 1024)
    assert p["samples"] == FRAMES  # sample walk untouched by the edit
    assert parse_mp4(encode_mp4(FRAMES, 8, 8))["edit"] is None
    # absent edts keeps writer bytes identical (gated queries untouched)
    assert encode_mp4(FRAMES, 8, 8) == encode_mp4(FRAMES, 8, 8, None, None)


def test_elst_writer_rejects_out_of_range():
    with pytest.raises(ValueError, match="edit_media_time"):
        encode_mp4(FRAMES, 8, 8, None, 14 * 512)
    with pytest.raises(ValueError, match="edit_media_time"):
        encode_mp4(FRAMES, 8, 8, None, -1)


def test_raise_on_multi_entry_elst():
    blob = bytearray(encode_mp4(FRAMES, 8, 8, None, 512))
    at = blob.index(b"elst") + 4 + 4  # entry_count position
    blob[at : at + 4] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="entries unsupported"):
        parse_mp4(bytes(blob))


def test_raise_on_elst_empty_edit():
    blob = bytearray(encode_mp4(FRAMES, 8, 8, None, 512))
    at = blob.index(b"elst") + 4 + 4 + 4  # seg_dur, then media_time
    blob[at + 4 : at + 8] = struct.pack(">i", -1)
    with pytest.raises(ValueError, match="empty-edit"):
        parse_mp4(bytes(blob))


def test_raise_on_elst_rate():
    blob = bytearray(encode_mp4(FRAMES, 8, 8, None, 512))
    at = blob.index(b"elst") + 4 + 4 + 4 + 8  # rate position (v0)
    blob[at : at + 2] = struct.pack(">H", 2)
    with pytest.raises(ValueError, match="rate"):
        parse_mp4(bytes(blob))
