"""Distributed Bloom-filter runtime pre-filtering for big-big semi joins.

The 100 TB problem: a semi join whose dimension side is too large to
broadcast forces a full shuffle of the fact table — even when almost no
fact row matches. Engines solve it with a RUNTIME FILTER (Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled` does this inside
Catalyst for some shapes; Bloom 1970 is the public construction): the
dimension's key SET compresses into a fixed bit array that DOES fit in a
broadcast, the fact scan drops rows whose keys cannot be in the set, and
only probable matches reach the exact join. False positives are removed
by the exact join, so the RESULT is exactly the plain semi join — which
is why the registered query sits under the full DuckDB hash gate.

Build shape (:func:`bloom_build`): each dim key emits its k (word, bit)
positions; a partial-aggregated ``bit_or`` shuffle reduces them to one
row per 64-bit word — shuffle volume is k×|dim| tiny rows combined
map-side, never the key bytes. The sparse words then densify into ONE
array<bigint> row (map_from_entries + transform over the word index
sequence), broadcast like the IVF quantizer's broadcast path: constant
plan size, no driver-side literals, no py4j overhead.

Probe shape (:func:`bloom_semi_join`): the fact side cross-joins the
1-row filter (broadcast) and evaluates the k membership tests as
row-local codegen'd expressions; survivors flow into the ordinary exact
semi join. The fact table is never shuffled by the prefilter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int, seed: int) -> list[Column]:
    """The k bit positions of a key: independent xxhash64 streams per
    hash index (seeded), reduced mod num_bits. pmod keeps positions
    non-negative for negative hash values."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ONE-row DataFrame holding the dense Bloom filter as
    ``arr array<bigint>`` (num_bits/64 words). Distributed build: each
    key explodes to its k (word, mask) pairs, a partial-agg ``bit_or``
    shuffle reduces to at most num_bits/64 rows, and the sparse words
    densify via map lookup over the word-index sequence — the dim keys
    themselves never leave their tasks."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    words = num_bits // 64
    entries = []
    for pos in _positions(F.col(key_col), num_bits, num_hashes, seed):
        entries.append(
            F.struct(
                (pos / 64).cast("int").alias("word_idx"),
                # F.shiftleft only takes a Python-int bit count;
                # call_function passes the column form through to the
                # same SQL function
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
                ).alias("mask"),
            )
        )
    sparse = (
        dim.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.word_idx", "e.mask")
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda i: F.coalesce(F.try_element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
        ).alias("arr")
    )


def bloom_might_contain(
    key: Column,
    filter_arr: Column,
    num_bits: int,
    num_hashes: int = 3,
    seed: int = 42,
) -> Column:
    """Row-local membership test against a dense filter array column:
    every one of the key's k bits must be set. No false negatives by
    construction; false-positive rate ~ (1 - e^{-kn/m})^k."""
    cond = None
    for pos in _positions(key, num_bits, num_hashes, seed):
        word = F.try_element_at(filter_arr, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else (cond & test)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Semi join with a Bloom runtime pre-filter: EXACTLY equal to
    ``fact.join(dim, on, "left_semi")`` (the exact join removes the
    filter's false positives; the filter has no false negatives), but
    the shuffle into that join carries only fact rows whose key
    plausibly exists in ``dim``. Size ``num_bits`` ~ 10×|dim keys| for
    ~1% false positives; the broadcast is num_bits/8 bytes regardless
    of key width."""
    flt = bloom_build(dim, on, num_bits, num_hashes, seed)
    pre = (
        fact.crossJoin(F.broadcast(flt))
        .filter(bloom_might_contain(F.col(on), F.col("arr"), num_bits, num_hashes, seed))
        .drop("arr")
    )
    return pre.join(dim.select(on).distinct(), on, "left_semi")
