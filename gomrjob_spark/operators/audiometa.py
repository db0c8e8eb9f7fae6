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
