"""Byte-level BPE (operators/text.py byte_bpe_* — the GPT-2 family).

The driver hash gate pins Spark==DuckDB on the ASCII fixture; these
tests pin what the fixture cannot: the full 256-entry byte-to-unicode
table against the public GPT-2 algorithm, UTF-8 safety (multi-byte
characters split across symbols and rejoined by merges, byte-exact
round-trip), and the pretoken boundary rule (merges never cross)."""

from __future__ import annotations

import pyspark.sql.functions as F

from gomrjob_spark.operators import text


def _gpt2_bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 bytes_to_unicode() algorithm, verbatim."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), 256))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _decode_symbols(toks: list[str]) -> bytes:
    """Inverse of the byte mapping: strip 0x02 merge markers, map each
    stand-in character back to its byte."""
    inv = {v: k for k, v in _gpt2_bytes_to_unicode().items()}
    out = bytearray()
    for t in toks:
        for ch in t.replace("\x02", ""):
            out.append(inv[ch])
    return bytes(out)


def test_byte_table_matches_gpt2_for_all_256_bytes(spark):
    """Drive the Spark mapping expression over every byte value and
    compare with the reference algorithm."""
    rows = [(b, bytes([b]).hex().upper()) for b in range(256)]
    df = spark.createDataFrame(rows, "b int, _hx string")
    got = {
        r["b"]: r["sym"][0]
        for r in df.select(
            "b", text._byte_symbols_expr().alias("sym")
        ).collect()
    }
    ref = _gpt2_bytes_to_unicode()
    assert got == ref


def test_utf8_roundtrip_multibyte_split_across_merges(spark):
    """'é' is two UTF-8 bytes (C3 A9 -> 'Ã', '©'); a corpus dominated
    by 'é' runs must learn the (Ã, ©) merge — a merge spanning a
    character's byte boundary — and decoding the encoded symbols must
    reproduce the normalized text byte-for-byte."""
    docs = spark.createDataFrame(
        [(0, "ééé ééé ééé"), (1, "naïve café déjà"), (2, "日本語 テスト")],
        "doc_id long, text string",
    )
    merges = text.byte_bpe_train_merges(docs, n_merges=3)
    mrows = merges.collect()
    assert ("Ã", "©") in {(r["w1"], r["w2"]) for r in mrows}
    enc = {r["doc_id"]: r["toks"] for r in
           text.byte_bpe_apply(docs, merges).collect()}
    norm = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", text.normalized("text").alias("n")
        ).collect()
    }
    for i in (0, 1, 2):
        assert _decode_symbols(enc[i]) == norm[i].encode("utf-8")


def test_roundtrip_every_fixture_doc(spark):
    """Byte-exact round-trip over real fixture documents: decode of
    the encoded symbol stream == UTF-8 of the normalized text."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = text.byte_bpe_train_merges(docs, n_merges=3)
    enc = {r["doc_id"]: r["toks"] for r in
           text.byte_bpe_apply(docs, merges).collect()}
    for r in docs.select(
        "doc_id", text.normalized("text").alias("n")
    ).collect():
        assert _decode_symbols(enc[r["doc_id"]]) == r["n"].encode("utf-8")


def test_merges_never_cross_pretoken_boundary(spark):
    """The ONLY adjacent repetition in this corpus straddles the
    pretoken boundary ('b'+'Ġa'): no trainable pair may join them, and
    the symbol frame must keep one row per pretoken."""
    docs = spark.createDataFrame(
        [(0, "ab ab ab ab")], "doc_id long, text string"
    )
    frame = text._byte_symbol_frame(docs, "text", "doc_id").collect()
    assert sorted(r["toks"] for r in frame) == sorted(
        [["a", "b"]] + [["Ġ", "a", "b"]] * 3
    )
    merges = text.byte_bpe_train_merges(docs, n_merges=2).collect()
    pairs = {(r["w1"], r["w2"]) for r in merges}
    # 'b' is never followed by anything inside a pretoken
    assert all(not w1.endswith("b") for w1, _ in pairs)


def test_empty_and_null_text_encode_to_empty(spark):
    docs = spark.createDataFrame(
        [(0, "x y"), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = text.byte_bpe_train_merges(docs, n_merges=1)
    enc = {r["doc_id"]: r["toks"] for r in
           text.byte_bpe_apply(docs, merges).collect()}
    assert enc[1] == [] and enc[2] == []
    assert _decode_symbols(enc[0]) == b"x y"


def test_leading_space_is_part_of_the_token(spark):
    """The byte-level hallmark: ' world' and 'world' are different
    symbol sequences (Ġ-prefixed vs not) — the property that lets a
    decoder reconstruct spacing without a detokenizer."""
    docs = spark.createDataFrame(
        [(0, "world world")], "doc_id long, text string"
    )
    frame = sorted(
        text._byte_symbol_frame(docs, "text", "doc_id").collect(),
        key=lambda r: r["_pt_i"],
    )
    assert frame[0]["toks"][0] == "w"
    assert frame[1]["toks"][0] == "Ġ"


def test_weighted_round_loop_matches_instance_rows(spark):
    """r15 distinct-pretoken trainer device: a weighted symbol frame
    (distinct rows x multiplicity in _w) must learn exactly the merge
    table of the exploded instance frame — pair counts are weighted
    sums by distributivity, winners and folds identical."""
    from gomrjob_spark.operators.text import _bpe_round_loop

    arrays = [
        (["a", "b", "c"],),
        (["a", "b", "c"],),
        (["a", "b", "c"],),
        (["b", "c", "a"],),
        (["x", "y"],),
        (["x", "y"],),
    ]
    inst = spark.createDataFrame(arrays, "toks array<string>")
    got_inst = [
        (r["round"], r["w1"], r["w2"], r["n_pair"])
        for r in _bpe_round_loop(inst, 3).collect()
    ]
    from collections import Counter

    weighted_rows = [
        (list(k), int(w)) for k, w in Counter(tuple(a[0]) for a in arrays).items()
    ]
    wdf = spark.createDataFrame(weighted_rows, "toks array<string>, _w bigint")
    got_w = [
        (r["round"], r["w1"], r["w2"], r["n_pair"])
        for r in _bpe_round_loop(wdf, 3).collect()
    ]
    assert got_w == got_inst
    assert len(got_inst) == 3
