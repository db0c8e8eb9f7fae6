"""Fragmented MP4 (fMP4 / CMAF, ISO/IEC 14496-12 §8.8) — the OTHER
real-world ISO-BMFF layout.

Plain MP4 (sources/mp4.py) indexes every sample up front in ``stbl``;
DASH/HLS streaming video — a large share of crawled video — instead
ships an INIT segment (moov with an EMPTY sample table + ``mvex/trex``
defaults) followed by self-describing fragments: each ``moof`` carries
the sample map for exactly the samples in its companion ``mdat``
(``mfhd`` sequence number, ``tfhd`` track defaults, ``trun`` per-sample
sizes + a data offset RELATIVE TO THE MOOF START under the
default-base-is-moof flag). The walk lesson is the same one harder:
there is no global index to trust — a correct reader reconstructs
every sample's absolute position from moof_start + trun.data_offset +
the cumulative per-sample sizes, fragment by fragment, and validates
each range against the fragment's own mdat. The writer twin plants the
usual fake-box-header junk gap between a fragment's mdat start and its
first sample (data_offset skips it; a reader that assumes samples
start at the mdat payload reads junk) and keeps every moof size a pure
function of its sample count so a DuckDB oracle can recompute every
absolute offset arithmetically.

Box layout written by :func:`encode_mp4_fragmented` and required by
:func:`parse_mp4_fragmented`::

    ftyp('isom')                      24 bytes
    moov                              (constant size _INIT_MOOV_BYTES)
      mvhd (timescale, duration 0 — unknown up front, the fMP4 rule)
      mvex > trex (track 1 defaults)
      trak > tkhd + mdia(mdhd, hdlr 'vide', minf > stbl with EMPTY
        stsd-entry'd stts/stsc/stsz/stco — spec-required skeleton)
    per fragment f (samples n_f):
      moof                            68 + 4*n_f bytes
        mfhd (sequence_number = f+1)
        traf > tfhd (track 1, default-base-is-moof)
              trun (n_f, data_offset, per-sample sizes)
      mdat                            8 + len(junk) + sum(sizes)
        junk gap (15 bytes starting with a fake 'moov' box header)
        samples

Simplifications, documented per the module convention: one track, no
sidx/styp, no per-sample flags/durations in trun (sizes only — the
metadata this family gates), no multi-traf moofs. Malformations raise
ValueError with a precise class (tests/test_mp4frag.py)."""

from __future__ import annotations

import struct

from gomrjob_spark.sources.mp4 import (
    _JUNK,
    _SAMPLE_DELTA,
    _TIMESCALE,
    _box,
    _full,
    _full_header,
    _matrix,
    _timed_header,
    _walk,
)

_SAMPLES_PER_FRAGMENT = 4
#: tfhd flags: default-base-is-moof (0x020000); trun flags:
#: data-offset-present (0x000001) + sample-size-present (0x000200)
_TFHD_FLAGS = 0x020000
_TRUN_FLAGS = 0x000201


def _full_flags(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(
        fourcc,
        bytes([version]) + flags.to_bytes(3, "big") + body,
    )


def _init_segment(width: int, height: int) -> bytes:
    """ftyp + moov with empty sample tables and mvex/trex defaults —
    the CMAF init segment. Byte-constant for fixed (width, height), so
    the oracle embeds its length as a literal."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomcmfc")
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, 0)  # duration unknown
        + struct.pack(">iHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8
        + _matrix()
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    trex = _full(
        b"trex",
        0,
        struct.pack(">IIIII", 1, 1, _SAMPLE_DELTA, 0, 0x00010000),
    )
    mvex = _box(b"mvex", trex)
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _matrix()
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, 0) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"raw video\x00"
    )
    sample_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"raw ", sample_entry))
    stbl = _box(
        b"stbl",
        stsd
        + _full(b"stts", 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, struct.pack(">I", 0)),
    )
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + mvex + trak)
    return ftyp + moov


def encode_mp4_fragmented(
    frames: list[bytes], width: int, height: int
) -> bytes:
    """Writer twin: frames -> a CMAF-shaped fragmented MP4, samples
    grouped into moof+mdat fragments of :data:`_SAMPLES_PER_FRAGMENT`.
    Each fragment's mdat opens with the 15-byte fake-box-header junk
    gap; trun.data_offset (relative to the moof start, per
    default-base-is-moof) points PAST it at the first sample."""
    out = bytearray(_init_segment(width, height))
    for f0 in range(0, len(frames), _SAMPLES_PER_FRAGMENT):
        chunk = frames[f0 : f0 + _SAMPLES_PER_FRAGMENT]
        n = len(chunk)
        mfhd = _full(b"mfhd", 0, struct.pack(">I", f0 // _SAMPLES_PER_FRAGMENT + 1))
        tfhd = _full_flags(b"tfhd", 0, _TFHD_FLAGS, struct.pack(">I", 1))
        moof_size = 68 + 4 * n  # 8 + mfhd(16) + traf(8 + tfhd(16) + trun(20+4n))
        data_offset = moof_size + 8 + len(_JUNK)  # moof + mdat hdr + junk
        trun = _full_flags(
            b"trun",
            0,
            _TRUN_FLAGS,
            struct.pack(">Ii", n, data_offset)
            + b"".join(struct.pack(">I", len(fr)) for fr in chunk),
        )
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        if len(moof) != moof_size:
            raise ValueError(
                f"moof framing produced {len(moof)} bytes, expected "
                f"{moof_size}; the oracle's offset arithmetic would break"
            )
        mdat = _box(b"mdat", _JUNK + b"".join(chunk))
        out += moof + mdat
    return bytes(out)


def parse_mp4_fragmented(data: bytes) -> dict:
    """Strict fragment walk -> {timescale, width, height, n_fragments,
    n_samples, samples: [bytes], sample_offsets: [int],
    fragment_seqs: [int per sample]}. Every sample's absolute offset
    reconstructs from moof_start + trun.data_offset + cumulative trun
    sizes (default-base-is-moof), and every range is validated against
    the fragment's OWN mdat — a reader that scans mdat payloads or
    assumes contiguity from the mdat start reads the junk gap and
    fails the gate. Raises ValueError on: a missing ftyp/moov/mvex, a
    moof without a following mdat, a tfhd without default-base-is-moof
    (the only base this walk supports — raising beats silently guessing
    base-data-offset semantics), a trun without data-offset/sample-size
    fields, out-of-order mfhd sequence numbers, or a sample range
    outside its fragment's mdat."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (first box is not ftyp)")

    moov_span = None
    frags: list[tuple[int, int, int]] = []  # (moof_start, body_start, body_end)
    mdats: list[tuple[int, int]] = []
    order: list[tuple[str, int, int, int]] = []
    for fourcc, bs, be in _walk(data, 0, len(data)):
        if fourcc == b"moov":
            moov_span = (bs, be)
        elif fourcc == b"moof":
            order.append(("moof", bs - 8, bs, be))
        elif fourcc == b"mdat":
            order.append(("mdat", bs - 8, bs, be))
    if moov_span is None:
        raise ValueError("missing moov box")

    timescale = None
    width = height = None
    saw_mvex = False
    for fourcc, bs, be in _walk(data, *moov_span):
        if fourcc == b"mvhd":
            timescale, _, _ = _timed_header(data, bs, be, b"mvhd")
        elif fourcc == b"mvex":
            saw_mvex = True
        elif fourcc == b"trak":
            for f2, b2, e2 in _walk(data, bs, be):
                if f2 == b"tkhd":
                    version, p = _full_header(data, b2, e2, b"tkhd")
                    if e2 - p < (80 if version == 0 else 92):
                        raise ValueError("tkhd body truncated")
                    w16, h16 = struct.unpack(">II", data[e2 - 8 : e2])
                    width, height = w16 >> 16, h16 >> 16
    if timescale is None:
        raise ValueError("missing mvhd header")
    if not saw_mvex:
        raise ValueError("missing mvex box (not a fragmented stream)")

    samples: list[bytes] = []
    offsets: list[int] = []
    seqs: list[int] = []
    last_seq = 0
    i = 0
    while i < len(order):
        kind, start, bs, be = order[i]
        if kind != "moof":
            i += 1
            continue
        if i + 1 >= len(order) or order[i + 1][0] != "mdat":
            raise ValueError(f"moof at {start} has no companion mdat")
        mdat_bs, mdat_be = order[i + 1][2], order[i + 1][3]
        seq = None
        trun_info = None
        for f2, b2, e2 in _walk(data, bs, be):
            if f2 == b"mfhd":
                _, p = _full_header(data, b2, e2, b"mfhd")
                # bounds-check against the box end (r13 advisor): a
                # truncated mfhd body must raise the contract's
                # ValueError, not silently read the next box's bytes
                # as the sequence number
                if e2 - p < 4:
                    raise ValueError("mfhd truncated")
                seq = struct.unpack(">I", data[p : p + 4])[0]
            elif f2 == b"traf":
                for f3, b3, e3 in _walk(data, b2, e2):
                    if f3 == b"tfhd":
                        if e3 - b3 < 8:
                            raise ValueError("tfhd truncated")
                        flags = int.from_bytes(data[b3 + 1 : b3 + 4], "big")
                        if not flags & _TFHD_FLAGS:
                            raise ValueError(
                                "tfhd without default-base-is-moof is "
                                "unsupported (explicit base-data-offset "
                                "walks are not implemented)"
                            )
                    elif f3 == b"trun":
                        if e3 - b3 < 12:
                            raise ValueError("trun truncated")
                        flags = int.from_bytes(data[b3 + 1 : b3 + 4], "big")
                        if flags & 0x1 == 0 or flags & 0x200 == 0:
                            raise ValueError(
                                "trun lacks data-offset/sample-size fields"
                            )
                        p = b3 + 4
                        n, doff = struct.unpack(">Ii", data[p : p + 8])
                        p += 8
                        if e3 - p < 4 * n:
                            raise ValueError("trun sample sizes truncated")
                        sizes = [
                            struct.unpack(">I", data[p + 4 * j : p + 4 * j + 4])[0]
                            for j in range(n)
                        ]
                        trun_info = (doff, sizes)
        if seq is None or trun_info is None:
            raise ValueError(f"moof at {start} lacks mfhd or traf/trun")
        if seq != last_seq + 1:
            raise ValueError(
                f"mfhd sequence {seq} after {last_seq} (out of order)"
            )
        last_seq = seq
        doff, sizes = trun_info
        pos = start + doff
        for size in sizes:
            if not (mdat_bs <= pos and pos + size <= mdat_be):
                raise ValueError(
                    f"fragment {seq} sample range [{pos}, {pos + size}) "
                    "outside its mdat"
                )
            samples.append(data[pos : pos + size])
            offsets.append(pos)
            seqs.append(seq)
            pos += size
        i += 2
    if last_seq == 0:
        raise ValueError("no moof fragments in stream")
    return {
        "timescale": timescale,
        "width": width,
        "height": height,
        "n_fragments": last_seq,
        "n_samples": len(samples),
        "samples": samples,
        "sample_offsets": offsets,
        "fragment_seqs": seqs,
    }


#: init-segment length for the oracle's offset arithmetic (computed
#: once at import from the writer itself, asserted byte-constant)
INIT_SEGMENT_BYTES = len(_init_segment(8, 8))
