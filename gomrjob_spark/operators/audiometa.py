"""Compressed-audio METADATA walk — FLAC STREAMINFO without decode.

The audio family (operators/multimodal.py) decodes 16-bit-PCM WAV; a
real curation pipeline also receives COMPRESSED audio it will never
decode row-by-row, yet must still gate on duration / sample rate /
channel count. The metadata-class answer (the EXIF-walk analog the
r11 verdict ordered, next-round #5) is a header walk: FLAC files open
with the ``fLaC`` magic followed by length-delimited METADATA BLOCKS
(1 byte: last-flag bit + 7-bit type; u24 big-endian length; body),
the first of which MUST be STREAMINFO (type 0, 34 bytes) carrying the
stream's facts in BIT-PACKED fields — a 20-bit sample rate, 3-bit
channels-1, 5-bit bits-per-sample-1 and a 36-bit total-sample count
packed into 8 bytes — so a byte-aligned reader extracts garbage and
cannot pass the hash gate. Duration derives exactly as
``1000 * total_samples DIV sample_rate`` (fixed-point ms, the repo's
exactness device).

:func:`encode_flac_header` is the writer twin; :func:`parse_flac_header`
the strict reader. The registered query's fixture interleaves a PADDING
block, an APPLICATION block whose BODY contains a decoy ``fLaC`` magic
(a scanner that searches for the magic instead of walking block lengths
phantom-restarts and fails the gate), and trailing fake audio frames
that the walk must count but never enter.

Reference parity note: jehiah/gomrjob has no multimedia layer; this is
part of the LLM-training-data surface the brief adds (SURVEY.md §2F
extensions). Spec: the public FLAC format document (RFC 9639).
"""

from __future__ import annotations

import struct

#: metadata block types (RFC 9639 §8)
STREAMINFO, PADDING, APPLICATION = 0, 1, 2


def encode_streaminfo(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    md5_digest: bytes,
    min_blocksize: int = 1024,
    max_blocksize: int = 4096,
) -> bytes:
    """The 34-byte STREAMINFO body with the spec's bit packing."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    return (
        struct.pack(">HH", min_blocksize, max_blocksize)
        + b"\x00\x00\x00" * 2  # min/max framesize unknown (legal zeros)
        + struct.pack(">Q", packed)
        + md5_digest
    )


def _block(block_type: int, body: bytes, last: bool) -> bytes:
    return (
        bytes([(0x80 if last else 0) | block_type])
        + len(body).to_bytes(3, "big")
        + body
    )


def encode_flac_header(
    streaminfo: bytes, extra_blocks: list[tuple[int, bytes]], audio: bytes
) -> bytes:
    """Writer twin: magic + STREAMINFO + extra metadata blocks (the
    LAST one carries the last-metadata-block flag) + audio bytes."""
    blocks = [(STREAMINFO, streaminfo), *extra_blocks]
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        out += _block(btype, body, last=i == len(blocks) - 1)
    return bytes(out) + audio


def parse_flac_header(data: bytes) -> dict:
    """Strict metadata walk -> {sample_rate, channels, bits_per_sample,
    total_samples, duration_ms, md5_hex, min_blocksize, max_blocksize,
    n_meta_blocks, audio_bytes}. Raises ValueError with a precise class
    on: a missing ``fLaC`` magic, a first block that is not STREAMINFO,
    a STREAMINFO body that is not 34 bytes, a block running past the
    stream, a stream ending before the last-metadata-block flag, or a
    zero sample rate (division guard — a real file cannot carry one)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    n_blocks = 0
    info: dict | None = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("stream ended before last-metadata-block flag")
        head = data[pos]
        last, btype = bool(head & 0x80), head & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body_end = pos + 4 + length
        if body_end > len(data):
            raise ValueError(f"metadata block at {pos} runs past stream")
        if n_blocks == 0:
            if btype != STREAMINFO:
                raise ValueError(
                    f"first metadata block is type {btype}, not STREAMINFO"
                )
            if length != 34:
                raise ValueError(f"STREAMINFO is {length} bytes, not 34")
            body = data[pos + 4:body_end]
            min_bs, max_bs = struct.unpack(">HH", body[:4])
            packed = struct.unpack(">Q", body[10:18])[0]
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits_per_sample = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                raise ValueError("STREAMINFO carries a zero sample rate")
            info = {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "sample_rate": sample_rate,
                "channels": channels,
                "bits_per_sample": bits_per_sample,
                "total_samples": total_samples,
                "duration_ms": 1000 * total_samples // sample_rate,
                "md5_hex": body[18:34].hex(),
            }
        n_blocks += 1
        pos = body_end
        if last:
            break
    assert info is not None
    info["n_meta_blocks"] = n_blocks
    info["audio_bytes"] = len(data) - pos
    return info


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame-header walk — the other half of the
# compressed-audio metadata class. Like WARC/RIFF/FLAC it is
# length-delimited in disguise: each frame header (4 bytes, 11-bit
# sync) DECLARES the frame's byte length, so a correct reader jumps
# frame to frame — it never scans for sync bytes, because sync-looking
# bytes legally appear inside frame payloads AND inside the ID3v2 tag
# that prefixes most real files (whose size field is SYNCHSAFE: 4x
# 7-bit bytes, another bit-packing trap for byte-aligned readers).
# ---------------------------------------------------------------------------

#: MPEG1 Layer III bitrate table, kbit/s (index 1-14; 0=free, 15=bad)
MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
#: MPEG1 sample-rate table (2-bit index; 3 = reserved)
MP3_RATES = (44100, 48000, 32000)
#: samples per MPEG1 Layer III frame
MP3_SAMPLES_PER_FRAME = 1152


def mp3_frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """MPEG1 Layer III frame size in bytes: 144 * bitrate / rate + pad."""
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def encode_id3v2(body: bytes) -> bytes:
    """ID3v2.3 tag with the SYNCHSAFE size encoding (7 bits per byte)."""
    n = len(body)
    size = bytes([
        (n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F,
    ])
    return b"ID3\x03\x00\x00" + size + body


def encode_mp3(
    frames: list[tuple[int, int, int]], id3_body: bytes | None = None
) -> bytes:
    """Writer twin: (bitrate_idx, rate_idx, padding) triples -> an
    MPEG1 Layer III stream, optionally prefixed by an ID3v2 tag. Frame
    payloads are filled with 0xFF bytes — sync-looking garbage that a
    scanner would lock onto and a length-walker never reads."""
    out = bytearray()
    if id3_body is not None:
        out += encode_id3v2(id3_body)
    for br_idx, rate_idx, pad in frames:
        hdr = (
            (0x7FF << 21)          # sync
            | (0b11 << 19)         # MPEG1
            | (0b01 << 17)         # Layer III
            | (1 << 16)            # no CRC
            | (br_idx << 12)
            | (rate_idx << 10)
            | (pad << 9)
            | (0b11 << 6)          # mono channel mode
        )
        frame = bytearray(hdr.to_bytes(4, "big"))
        flen = mp3_frame_length(MP3_BITRATES[br_idx], MP3_RATES[rate_idx], pad)
        frame += b"\xff" * (flen - 4)  # sync-looking payload decoy
        out += frame
    return bytes(out)


def parse_mp3_header(data: bytes) -> dict:
    """Strict MPEG1-Layer-III metadata walk -> {n_frames, sample_rate,
    bitrate_kbps_avg (integer floor), duration_ms, id3_bytes,
    stream_bytes}. Skips one leading ID3v2 tag via its synchsafe size
    (never scanning), then jumps header to header by DECLARED frame
    length. Raises ValueError with a precise class on: a first frame
    without the 11-bit sync, a non-MPEG1-Layer-III header, a reserved
    bitrate (15) or sample-rate (3) index, a free-format bitrate (0 —
    length undeclared, a real decoder must scan; this metadata walk
    refuses), or a frame running past the stream."""
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("ID3v2 header truncated")
        sz = data[6:10]
        if any(b & 0x80 for b in sz):
            raise ValueError("ID3v2 size bytes are not synchsafe")
        id3_bytes = 10 + (
            (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
        )
        pos = id3_bytes
    n_frames = 0
    rate = None
    bitrate_sum = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError(f"frame header at {pos} truncated")
        hdr = int.from_bytes(data[pos:pos + 4], "big")
        if (hdr >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"no frame sync at offset {pos}")
        if (hdr >> 19) & 0b11 != 0b11 or (hdr >> 17) & 0b11 != 0b01:
            raise ValueError("not an MPEG1 Layer III frame")
        br_idx = (hdr >> 12) & 0xF
        rate_idx = (hdr >> 10) & 0b11
        pad = (hdr >> 9) & 1
        if br_idx == 15:
            raise ValueError("reserved bitrate index 15")
        if br_idx == 0:
            raise ValueError("free-format bitrate: length undeclared")
        if rate_idx == 3:
            raise ValueError("reserved sample-rate index 3")
        if rate is None:
            rate = MP3_RATES[rate_idx]
        elif MP3_RATES[rate_idx] != rate:
            # a mixed-rate stream would make duration_ms/sample_rate
            # silently wrong — raise like every other malformation
            # class (the r12 advisor's finding #2)
            raise ValueError(
                f"frame at {pos} switches sample rate to "
                f"{MP3_RATES[rate_idx]} Hz (stream opened at {rate} Hz)"
            )
        flen = mp3_frame_length(MP3_BITRATES[br_idx], MP3_RATES[rate_idx], pad)
        if pos + flen > len(data):
            raise ValueError(f"frame at {pos} runs past stream end")
        bitrate_sum += MP3_BITRATES[br_idx]
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG frames in stream")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "bitrate_kbps_avg": bitrate_sum // n_frames,
        "duration_ms": 1000 * n_frames * MP3_SAMPLES_PER_FRAME // rate,
        "id3_bytes": id3_bytes,
        "stream_bytes": len(data) - id3_bytes,
    }
