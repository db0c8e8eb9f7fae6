"""Randomized differential tests for the exact-algorithm operators:
prefix-filtered Jaccard join, SymSpell edit-1 join, and BPE training
each compared against an independent driver-side reference over
seeded random corpora (fixed seeds — deterministic CI, varied shapes:
heavy duplication, tiny alphabets, length skew)."""

from __future__ import annotations

import random
from fractions import Fraction

from pyspark.sql import Row

from gomrjob_spark.cache import release_scoped
from gomrjob_spark.operators.dedup import (
    jaccard_prefix_pairs,
    token_edit1_pairs,
    word_shingles,
)
from gomrjob_spark.operators.text import bpe_train_merges


def _rand_corpus(seed: int, n_docs: int, vocab: int, max_len: int) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for _ in range(n_docs):
        length = rng.randint(1, max_len)
        docs.append(" ".join(f"w{rng.randrange(vocab)}" for _ in range(length)))
    # inject near-dup twins: copy with one token changed
    for i in range(0, n_docs, 4):
        toks = docs[i].split()
        if len(toks) > 3:
            toks[rng.randrange(len(toks))] = "wx"
            docs.append(" ".join(toks))
    return docs


def test_prefix_jaccard_random_differential(spark):
    for seed, tn, td in [(11, 3, 5), (12, 4, 5), (13, 1, 2)]:
        texts = _rand_corpus(seed, 24, vocab=12, max_len=18)
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        sh = word_shingles(docs, 3).collect()
        sets: dict[int, set[str]] = {}
        for r in sh:
            sets.setdefault(r["doc_id"], set()).add(r["shingle"])
        ids = sorted(sets)
        want = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and Fraction(inter, union) >= Fraction(tn, td):
                    want.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_prefix_pairs(
                docs, n=3, threshold_num=tn, threshold_den=td
            ).collect()
        }
        release_scoped()
        assert got == want, f"seed={seed} t={tn}/{td}: " \
            f"missed={sorted(want - got)[:4]} spurious={sorted(got - want)[:4]}"


def test_token_edit1_random_differential(spark):
    def dist_le1(a, b):
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) <= 1
        if abs(len(a) - len(b)) != 1:
            return False
        mn = min(len(a), len(b))
        p = 0
        while p < mn and a[p] == b[p]:
            p += 1
        s = 0
        while s < mn and a[-1 - s] == b[-1 - s]:
            s += 1
        return p + s >= mn

    for seed in (21, 22):
        rng = random.Random(seed)
        arrays = [
            [f"t{rng.randrange(5)}" for _ in range(rng.randint(1, 6))]
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            [(i, a) for i, a in enumerate(arrays)],
            "doc_id int, toks array<string>",
        )
        got = {(r["id_a"], r["id_b"]) for r in token_edit1_pairs(df).collect()}
        release_scoped()
        want = {
            (i, j)
            for i in range(len(arrays))
            for j in range(i + 1, len(arrays))
            if dist_le1(arrays[i], arrays[j])
        }
        assert got == want, f"seed={seed}: missed={sorted(want - got)[:4]} " \
            f"spurious={sorted(got - want)[:4]}"


def _ref_bpe(texts: list[str], n_merges: int):
    """Independent reference BPE: greedy left-to-right non-overlap,
    (count desc, w1, w2) winner."""
    seqs = [t.split() for t in texts]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (w1, w2), n = best
        merges.append((w1, w2, n))
        merged = w1 + "\x02" + w2
        out_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == w1 and s[i + 1] == w2:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            out_seqs.append(out)
        seqs = out_seqs
    return merges


def test_bpe_random_differential(spark):
    for seed in (31, 32):
        rng = random.Random(seed)
        texts = [
            " ".join(rng.choice("abcde") for _ in range(rng.randint(2, 12)))
            for _ in range(20)
        ]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        got = [
            (r["w1"], r["w2"], r["n_pair"])
            for r in bpe_train_merges(docs, n_merges=4).collect()
        ]
        release_scoped()
        want = _ref_bpe(texts, 4)
        assert got == want, f"seed={seed}: {got} != {want}"
