"""MP4 / ISO-BMFF container parsing — the real-world "video file ->
frames" format (ISO/IEC 14496-12).

RIFF/AVI (sources/riff.py) closed the container-walk class; this module
covers the format that actually dominates crawled video. The grammar is
the same length-delimited shape — every box is a big-endian u32 size +
fourcc (size == 1 switches to a u64 largesize, size == 0 runs to the
end of the enclosing scope) — but the payload story is different and
teaches the stronger lesson: frame bytes do NOT live in self-describing
chunks. ``mdat`` is an opaque blob, and the ONLY correct way to find a
sample is the ``stbl`` index tables: per-sample sizes from ``stsz``,
chunk starts from ``stco`` (absolute file offsets), and the
sample-to-chunk run map from ``stsc``. A reader that scans ``mdat`` for
magic bytes, or assumes samples are contiguous from the mdat payload
start, is wrong — the writer twin plants a fake box header INSIDE every
inter-chunk junk gap and offsets every chunk so both shortcuts break.

Layout written by :func:`encode_mp4` (the writer twin) and required by
:func:`parse_mp4` (the strict reader)::

    ftyp('isom')
    free   (7-byte decoy body)
    mdat   (LARGESIZE header — size==1 + u64, gating the 64-bit path;
            payload = per chunk: 15-byte junk gap that STARTS with a
            fake 'moov'/'mdat' box header, then the chunk's samples)
    moov
      mvhd (timescale, duration)
      trak
        tkhd (width/height as 16.16 fixed point)
        mdia
          mdhd (media timescale, duration)
          hdlr ('vide')
          minf
            stbl
              stsd ('raw ' visual sample entry: width/height u16)
              stts (one (count, delta) run)
              stsc (sample-to-chunk runs; short final chunk => 2 runs)
              stsz (per-sample sizes)
              stco (absolute chunk offsets)

Simplifications, documented per the jusText convention: one video
track, v0 full boxes from the writer (the reader also accepts v1 —
64-bit times — since real crawl files use both), no edts/udta, no
fragmented-MP4 (moof) support. Malformed containers raise ValueError
with a precise class, per the EXIF/WARC/RIFF codec convention
(tests/test_mp4.py holds the raise matrix).

Reference parity note: jehiah/gomrjob has no multimedia layer; this
module is part of the LLM-training-data surface the build brief adds
(SURVEY.md §2F extensions), closing the r12 verdict's "real crawl
video is overwhelmingly MP4" residual (next-round item #2).
"""

from __future__ import annotations

import struct

# fixed writer-twin dials (the oracle's offset arithmetic mirrors them)
_TIMESCALE = 12800
_SAMPLE_DELTA = 512
_SAMPLES_PER_CHUNK = 3
_JUNK = struct.pack(">I", 8) + b"moov" + b"mdatXYZ"  # 15 bytes, 2 fake magics


def _box(fourcc: bytes, body: bytes) -> bytes:
    """One box: big-endian u32 size (including header) + fourcc + body."""
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    """FullBox: version byte + 24-bit flags (0) before the body."""
    return _box(fourcc, bytes([version, 0, 0, 0]) + body)


def _box_large(fourcc: bytes, body: bytes) -> bytes:
    """Box with the size==1 / u64 largesize header (16-byte header)."""
    return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(body)) + body


def _matrix() -> bytes:
    """The identity display matrix (9 x s16.16 / s2.30 fixed point)."""
    return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    sync_samples: list[int] | None = None,
    edit_media_time: int | None = None,
) -> bytes:
    """Writer twin: frames -> a spec-shaped single-track ISO-BMFF file,
    mdat-before-moov (the non-faststart layout, so stco offsets are
    known when the tables are built). Samples group into chunks of
    :data:`_SAMPLES_PER_CHUNK`; every chunk is preceded inside mdat by
    a 15-byte junk gap whose bytes ARE a fake box header — legal
    padding that breaks magic-scanners and contiguity assumptions.
    The mdat box uses the largesize header so the 64-bit size path is
    always exercised.

    ``sync_samples`` (r14, the r13 verdict's item #8): 1-based sample
    numbers to mark as sync samples (keyframes) in an ``stss`` box
    (ISO/IEC 14496-12 §8.6.2). ``None`` omits the box — the spec's
    "every sample is sync" default — and keeps the emitted bytes
    IDENTICAL to the pre-stss writer, so the already-gated mp4 queries
    are untouched. Must be strictly increasing within [1, n].

    ``edit_media_time`` (r14, closing the stss/edts residual): media
    time units to SKIP at presentation start, written as a one-entry
    ``edts``/``elst`` (ISO/IEC 14496-12 §8.6.6 — how real encoders
    express priming/pre-roll: segment_duration = total - offset,
    media_time = offset, rate 1.0). ``None`` omits the box (bytes
    again identical to the pre-edts writer). Must lie in
    [0, n * sample_delta)."""
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    free = _box(b"free", b"\xdec0y!!\x00")
    payload = bytearray()
    chunk_offsets: list[int] = []
    mdat_payload_off = len(ftyp) + len(free) + 16  # largesize header
    for c in range(0, n, _SAMPLES_PER_CHUNK):
        payload += _JUNK
        chunk_offsets.append(mdat_payload_off + len(payload))
        for f in frames[c : c + _SAMPLES_PER_CHUNK]:
            payload += f
    mdat = _box_large(b"mdat", bytes(payload))

    duration = n * _SAMPLE_DELTA
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">iHH", 0x10000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8
        + _matrix()
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)  # track_id=1
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt_group, volume, rsvd
        + _matrix()
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"raw video\x00")
    sample_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi h/v resolution
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, predefined
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"raw ", sample_entry))
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, _SAMPLE_DELTA))
    if n % _SAMPLES_PER_CHUNK == 0:
        stsc_runs = [(1, _SAMPLES_PER_CHUNK, 1)]
    else:
        stsc_runs = [
            (1, _SAMPLES_PER_CHUNK, 1),
            (len(chunk_offsets), n % _SAMPLES_PER_CHUNK, 1),
        ]
    stsc = _full(
        b"stsc",
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(
        b"stsz",
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco",
        0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stss = b""
    if sync_samples is not None:
        ss = list(sync_samples)
        if any(s < 1 or s > n for s in ss) or any(
            b <= a for a, b in zip(ss, ss[1:])
        ):
            raise ValueError(
                "sync_samples must be strictly increasing within [1, n]"
            )
        stss = _full(
            b"stss",
            0,
            struct.pack(">I", len(ss))
            + b"".join(struct.pack(">I", s) for s in ss),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stss + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    edts = b""
    if edit_media_time is not None:
        if not 0 <= edit_media_time < duration:
            raise ValueError(
                f"edit_media_time {edit_media_time} outside [0, {duration})"
            )
        elst = _full(
            b"elst",
            0,
            struct.pack(">I", 1)
            + struct.pack(
                ">IiHH", duration - edit_media_time, edit_media_time, 1, 0
            ),
        )
        edts = _box(b"edts", elst)
    trak = _box(b"trak", tkhd + edts + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + free + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) walking declared sizes —
    u32, size==1 largesize, size==0 to-scope-end — never scanning."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"box header at {pos} runs past parent")
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        body_start = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"box {fourcc!r} at {pos} largesize truncated")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body_start = pos + 16
            if size < 16:
                raise ValueError(f"box {fourcc!r} at {pos} invalid largesize {size}")
        elif size == 0:
            size = end - pos  # box extends to the end of the scope
        elif size < 8:
            raise ValueError(f"box {fourcc!r} at {pos} invalid size {size}")
        body_end = pos + size
        if body_end > end:
            raise ValueError(f"box {fourcc!r} at {pos} runs past parent end")
        yield fourcc, body_start, body_end
        pos = body_end


def _full_header(data: bytes, bs: int, be: int, fourcc: bytes) -> tuple[int, int]:
    """(version, payload_start) of a FullBox; accepts v0 and v1."""
    if be - bs < 4:
        raise ValueError(f"{fourcc.decode('latin-1')} full-box header truncated")
    version = data[bs]
    if version > 1:
        raise ValueError(f"{fourcc.decode('latin-1')} version {version} unsupported")
    return version, bs + 4


def _timed_header(data: bytes, bs: int, be: int, fourcc: bytes) -> tuple[int, int, int]:
    """(timescale, duration, after) for mvhd/mdhd — v0 u32 / v1 u64 times."""
    version, p = _full_header(data, bs, be, fourcc)
    need = 16 if version == 0 else 28
    if be - p < need:
        raise ValueError(f"{fourcc.decode('latin-1')} body truncated")
    if version == 0:
        _, _, timescale, duration = struct.unpack(">IIII", data[p : p + 16])
        return timescale, duration, p + 16
    _, _, timescale = struct.unpack(">QQI", data[p : p + 20])
    duration = struct.unpack(">Q", data[p + 20 : p + 28])[0]
    return timescale, duration, p + 28


def parse_mp4(data: bytes) -> dict:
    """Strict table-walking ISO-BMFF parse -> {timescale, duration,
    width, height, n_samples, n_chunks, samples: [bytes],
    sample_offsets: [int]}. Samples are located EXCLUSIVELY by the
    stbl tables — stco chunk offsets (absolute), stsc run expansion,
    stsz per-sample sizes — and every byte range is validated to lie
    inside an mdat payload, so a single header-size slip anywhere in
    the file shifts an offset and fails the range check (the
    warc_cdx_index byte-accounting discipline). Raises ValueError on:
    a missing/first-box-not ftyp, an invalid or truncated box size, a
    box running past its parent, a missing moov/trak/mdia/minf/stbl
    or index table, a non-'vide' handler, stts totals disagreeing
    with stsz, stsc/stco runs not covering the sample count, a sample
    range outside mdat, or tkhd 16.16 dimensions disagreeing with the
    stsd sample entry."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (first box is not ftyp)")

    mdat_ranges: list[tuple[int, int]] = []
    moov_span = None
    for fourcc, bs, be in _walk(data, 0, len(data)):
        if fourcc == b"mdat":
            mdat_ranges.append((bs, be))
        elif fourcc == b"moov":
            moov_span = (bs, be)
    if moov_span is None:
        raise ValueError("missing moov box")
    if not mdat_ranges:
        raise ValueError("missing mdat box")

    timescale = duration = None
    tkhd_dims = None
    stbl_span = None
    handler = None
    edit = None  # (segment_duration, media_time) from a one-entry elst
    for fourcc, bs, be in _walk(data, *moov_span):
        if fourcc == b"mvhd":
            timescale, duration, _ = _timed_header(data, bs, be, b"mvhd")
        elif fourcc == b"trak":
            for f2, b2, e2 in _walk(data, bs, be):
                if f2 == b"edts":
                    for f2b, b2b, e2b in _walk(data, b2, e2):
                        if f2b != b"elst":
                            continue
                        version, p = _full_header(data, b2b, e2b, b"elst")
                        if e2b - p < 4:
                            raise ValueError("elst table truncated")
                        n_ed = struct.unpack(">I", data[p : p + 4])[0]
                        if n_ed != 1:
                            raise ValueError(
                                f"elst with {n_ed} entries unsupported "
                                "(single media edit only)"
                            )
                        esz = 12 if version == 0 else 20
                        if e2b - p - 4 < esz:
                            raise ValueError("elst entry truncated")
                        if version == 0:
                            seg_dur, media_t = struct.unpack(
                                ">Ii", data[p + 4 : p + 12]
                            )
                            rp = p + 12
                        else:
                            seg_dur, media_t = struct.unpack(
                                ">Qq", data[p + 4 : p + 20]
                            )
                            rp = p + 20
                        rate_i, rate_f = struct.unpack(
                            ">Hh", data[rp : rp + 4]
                        )
                        if (rate_i, rate_f) != (1, 0):
                            raise ValueError(
                                f"elst rate {rate_i}.{rate_f} unsupported"
                            )
                        if media_t < 0:
                            raise ValueError(
                                "empty-edit elst (media_time -1) unsupported"
                            )
                        edit = (int(seg_dur), int(media_t))
                elif f2 == b"tkhd":
                    version, p = _full_header(data, b2, e2, b"tkhd")
                    # width/height are the LAST 8 bytes of the body
                    if e2 - p < (80 if version == 0 else 92):
                        raise ValueError("tkhd body truncated")
                    w16, h16 = struct.unpack(">II", data[e2 - 8 : e2])
                    tkhd_dims = (w16 >> 16, h16 >> 16)
                elif f2 == b"mdia":
                    for f3, b3, e3 in _walk(data, b2, e2):
                        if f3 == b"hdlr":
                            _, p = _full_header(data, b3, e3, b"hdlr")
                            if e3 - p < 8:
                                raise ValueError("hdlr body truncated")
                            handler = data[p + 4 : p + 8]
                        elif f3 == b"minf":
                            for f4, b4, e4 in _walk(data, b3, e3):
                                if f4 == b"stbl":
                                    stbl_span = (b4, e4)
    if timescale is None:
        raise ValueError("missing mvhd header")
    if stbl_span is None:
        raise ValueError("missing trak/mdia/minf/stbl chain")
    if handler != b"vide":
        raise ValueError(f"handler {handler!r} is not 'vide'")

    tables: dict[bytes, tuple[int, int]] = {}
    stsd_dims = None
    for fourcc, bs, be in _walk(data, *stbl_span):
        if fourcc in (b"stts", b"stsc", b"stsz", b"stco", b"co64", b"stss"):
            tables[fourcc] = (bs, be)
        elif fourcc == b"stsd":
            _, p = _full_header(data, bs, be, b"stsd")
            if be - p < 4 or struct.unpack(">I", data[p : p + 4])[0] < 1:
                raise ValueError("stsd holds no sample entry")
            for _e, eb, ee in _walk(data, p + 4, be):
                if ee - eb < 28:
                    raise ValueError("stsd sample entry truncated")
                stsd_dims = struct.unpack(">HH", data[eb + 24 : eb + 28])
                break
    for needed in (b"stts", b"stsc", b"stsz"):
        if needed not in tables:
            raise ValueError(f"missing {needed.decode('latin-1')} table")
    if b"stco" not in tables and b"co64" not in tables:
        raise ValueError("missing stco table")
    if stsd_dims is None:
        raise ValueError("missing stsd sample description")
    if tkhd_dims is not None and tkhd_dims != stsd_dims:
        raise ValueError(
            f"tkhd dimensions {tkhd_dims} disagree with stsd {stsd_dims}"
        )

    def _u32s(span: tuple[int, int], name: str) -> list[int]:
        _, p = _full_header(data, *span, name.encode())
        if span[1] - p < 4:
            raise ValueError(f"{name} table truncated")
        cnt = struct.unpack(">I", data[p : p + 4])[0]
        return [p + 4, cnt]

    p, n_stts = _u32s(tables[b"stts"], "stts")
    if tables[b"stts"][1] - p < 8 * n_stts:
        raise ValueError("stts entries truncated")
    stts_total = sum(
        struct.unpack(">I", data[p + 8 * i : p + 8 * i + 4])[0] for i in range(n_stts)
    )

    szp = tables[b"stsz"][0]
    _, szbody = _full_header(data, *tables[b"stsz"], b"stsz")
    if tables[b"stsz"][1] - szbody < 8:
        raise ValueError("stsz table truncated")
    fixed_size, n_samples = struct.unpack(">II", data[szbody : szbody + 8])
    if fixed_size == 0:
        if tables[b"stsz"][1] - (szbody + 8) < 4 * n_samples:
            raise ValueError("stsz entries truncated")
        sizes = [
            struct.unpack(">I", data[szbody + 8 + 4 * i : szbody + 12 + 4 * i])[0]
            for i in range(n_samples)
        ]
    else:
        sizes = [fixed_size] * n_samples
    if stts_total != n_samples:
        raise ValueError(
            f"stts claims {stts_total} samples, stsz holds {n_samples}"
        )

    if b"stco" in tables:
        p, n_chunks = _u32s(tables[b"stco"], "stco")
        if tables[b"stco"][1] - p < 4 * n_chunks:
            raise ValueError("stco entries truncated")
        offsets = [
            struct.unpack(">I", data[p + 4 * i : p + 4 * i + 4])[0]
            for i in range(n_chunks)
        ]
    else:
        p, n_chunks = _u32s(tables[b"co64"], "co64")
        if tables[b"co64"][1] - p < 8 * n_chunks:
            raise ValueError("co64 entries truncated")
        offsets = [
            struct.unpack(">Q", data[p + 8 * i : p + 8 * i + 8])[0]
            for i in range(n_chunks)
        ]

    p, n_stsc = _u32s(tables[b"stsc"], "stsc")
    if tables[b"stsc"][1] - p < 12 * n_stsc:
        raise ValueError("stsc entries truncated")
    runs = [
        struct.unpack(">III", data[p + 12 * i : p + 12 * i + 12])
        for i in range(n_stsc)
    ]
    # expand stsc runs over the stco chunk list: run i covers chunks
    # [first_chunk_i, first_chunk_{i+1}) at samples_per_chunk_i each.
    # first_chunk must be STRICTLY increasing (ISO/IEC 14496-12 §8.7.4
    # orders entries by first_chunk) and the expansion must cover
    # exactly n_chunks — the r13 advisor's finding: a crafted
    # non-monotone run list can double-cover chunks so the sample loop
    # hits IndexError on offsets[ci] instead of the contract's
    # ValueError
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(runs):
        if first < 1 or first > n_chunks:
            raise ValueError(f"stsc run {i} first_chunk {first} out of range")
        if i + 1 < len(runs) and runs[i + 1][0] <= first:
            raise ValueError(
                f"stsc run {i + 1} first_chunk {runs[i + 1][0]} not "
                f"strictly increasing after {first}"
            )
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise ValueError(
            f"stsc runs cover {len(per_chunk)} chunks, stco holds {n_chunks}"
        )
    if sum(per_chunk) != n_samples:
        raise ValueError(
            f"stsc/stco cover {sum(per_chunk)} samples, stsz holds {n_samples}"
        )

    samples: list[bytes] = []
    sample_offsets: list[int] = []
    si = 0
    for ci, spc in enumerate(per_chunk):
        pos = offsets[ci]
        for _ in range(spc):
            size = sizes[si]
            if not any(bs <= pos and pos + size <= be for bs, be in mdat_ranges):
                raise ValueError(
                    f"sample {si} range [{pos}, {pos + size}) outside mdat"
                )
            samples.append(data[pos : pos + size])
            sample_offsets.append(pos)
            pos += size
            si += 1
    # stss sync-sample table (optional — absent means EVERY sample is
    # sync, ISO/IEC 14496-12 §8.6.2): 1-based sample numbers, required
    # strictly increasing and in range, else the walk would silently
    # mark phantom keyframes
    sync_samples: list[int] | None = None
    if b"stss" in tables:
        p, n_ss = _u32s(tables[b"stss"], "stss")
        if tables[b"stss"][1] - p < 4 * n_ss:
            raise ValueError("stss entries truncated")
        sync_samples = [
            struct.unpack(">I", data[p + 4 * i : p + 4 * i + 4])[0]
            for i in range(n_ss)
        ]
        if any(s < 1 or s > n_samples for s in sync_samples) or any(
            b <= a for a, b in zip(sync_samples, sync_samples[1:])
        ):
            raise ValueError(
                "stss sample numbers not strictly increasing in range"
            )
    return {
        "timescale": timescale,
        "duration": duration,
        "width": stsd_dims[0],
        "height": stsd_dims[1],
        "n_samples": n_samples,
        "n_chunks": n_chunks,
        "samples": samples,
        "sample_offsets": sample_offsets,
        "sync_samples": sync_samples,
        # (segment_duration, media_time) of the single elst media edit,
        # or None when the file has no edts — presentation starts at
        # media time 0 (§8.6.6: absent edit list = identity timeline)
        "edit": edit,
    }
