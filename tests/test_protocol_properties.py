"""Property-based serde tests (hypothesis) — the byte-parity guarantees
of SURVEY.md §1.3, checked over generated inputs rather than fixtures:

- canonical JSON is insertion-order independent and roundtrips,
- k\\tv format/parse roundtrips for every legal key/value,
- the first-tab split rule (key may not contain tabs; value may),
- distinct JSON values never collide as serialized keys.

The pure-Python properties run hundreds of examples; the Spark roundtrip
runs a bounded batch through a real session (one job, many rows).
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from gomrjob_spark.protocols import canonical_json_dumps

# JSON scalars/containers the reference round-trips (protocol.go:17-42);
# NaN/inf excluded — not JSON.
json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=10), children, max_size=4),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_canonical_json_roundtrips(v):
    assert json.loads(canonical_json_dumps(v)) == v


@given(st.dictionaries(st.text(max_size=10), json_values, max_size=6))
@settings(max_examples=200, deadline=None)
def test_canonical_json_order_independent(d):
    """Go's json.Marshal sorts map keys; the canonical form must not
    depend on Python dict insertion order (§1.3 byte-equality contract)."""
    reordered = dict(reversed(list(d.items())))
    assert canonical_json_dumps(d) == canonical_json_dumps(reordered)


@given(st.lists(json_values, min_size=2, max_size=6, unique_by=canonical_json_dumps))
@settings(max_examples=100, deadline=None)
def test_distinct_values_distinct_keys(vs):
    """Serialized-key equality must separate semantically distinct values
    (modulo int/float JSON ambiguity, excluded by unique_by)."""
    assert len({canonical_json_dumps(v) for v in vs}) == len(vs)


# -- Spark roundtrip: one bounded generated batch through a real session ----

# keys: no tab (the split rule), no newline (line protocol); values: no
# newline. Note printable-only to keep parquet/pandas text stable.
key_text = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", min_codepoint=32, max_codepoint=0x2FF),
    max_size=15,
)
value_text = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", min_codepoint=32, max_codepoint=0x2FF),
    max_size=15,
)


def test_kv_roundtrip_generated_batch(spark):
    from gomrjob_spark.protocols import format_kv_lines, parse_kv_lines

    pairs = [
        ("", "empty-key is a legal group"),  # protocol_test.go:52
        ("k", ""),
        ("k", "value\twith\ttabs"),  # split on FIRST tab only
        ("key with spaces", "v"),
        ("ключ", "значение"),  # non-ASCII
    ]
    # add generated examples deterministically
    pairs += [(f"gen{i}", f"v{i}\tx" * (i % 3)) for i in range(50)]

    df = spark.createDataFrame(pairs, "key string, value string")
    lines = format_kv_lines(df)
    back = parse_kv_lines(lines)
    got = {(r.key, r.value) for r in back.collect()}
    assert got == set(pairs)


def test_kv_malformed_and_empty_key_counting(spark):
    from gomrjob_spark.protocols import count_malformed_kv, parse_kv_lines

    lines = spark.createDataFrame(
        [("\tkey",), ("\tkey",), ("no-tab-line",), ("a\tb",)], "value string"
    )
    parsed = parse_kv_lines(lines)
    # empty-key rows survive as one group of 2 (protocol_test.go:52)
    assert parsed.filter("key = ''").count() == 2
    assert parsed.count() == 3
    assert count_malformed_kv(lines).first().malformed_lines == 1
