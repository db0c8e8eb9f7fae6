"""Prefix-filtered exact Jaccard join: zero-miss differential vs
brute force, exact-boundary inclusion, and prune behavior."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Row

from gomrjob_spark.cache import release_scoped
from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators.dedup import jaccard_prefix_pairs, word_shingles


def _brute_pairs(spark, docs, tn, td):
    """Driver-side exact reference over the SAME shingle sets."""
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
                want.add((a, b, inter, len(sets[a]), len(sets[b])))
    return want


def test_prefix_join_matches_brute_force_on_real_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["id_a"], r["id_b"], r["n_common"], r["n_a"], r["n_b"])
        for r in jaccard_prefix_pairs(docs, n=3).collect()
    }
    release_scoped()
    want = _brute_pairs(spark, docs, 3, 5)
    assert want, "fixture must produce at least one qualifying pair"
    assert got == want, (
        f"missed={sorted(want - got)[:5]} spurious={sorted(got - want)[:5]}"
    )


def test_prefix_join_exact_boundary_pair_included(spark):
    # A: tokens t1..t6 -> shingles {s1..s4}; B shares s2,s3,s4 plus one
    # new shingle: |A|=|B|=4, i=3 -> J = 3/(4+4-3) = 3/5 EXACTLY.
    a = "t1 t2 t3 t4 t5 t6"
    b = "t2 t3 t4 t5 t6 t7"
    docs = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    rows = jaccard_prefix_pairs(docs, n=3).collect()
    release_scoped()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_common"]) == (1, 2, 3)
    assert r["jaccard"] == 3 / 5


def test_prefix_join_size_prune_excludes_disproportionate_docs(spark):
    # B contains all of A's shingles but is far larger: containment is
    # 1.0 yet Jaccard is small — the size prune must drop the pair
    # before verification, and the result must (correctly) be empty.
    a = "t1 t2 t3 t4"  # 2 shingles
    b = " ".join(f"t{i}" for i in range(1, 40))  # 37 shingles, superset
    docs = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    rows = jaccard_prefix_pairs(docs, n=3).collect()
    release_scoped()
    assert rows == []


def test_token_edit1_exact_semantics(spark):
    from pyspark.sql import functions as F

    from gomrjob_spark.operators.dedup import token_edit1_pairs

    rows = [
        (1, ["a", "b", "c"]),
        (2, ["a", "x", "c"]),      # substitution of 1 -> dist 1
        (3, ["a", "b"]),           # deletion of 1 -> dist 1
        (4, ["a", "b", "c", "d"]), # insertion on 1 -> dist 1
        (5, ["a", "b", "c"]),      # identical to 1 -> dist 0
        (6, ["x", "c"]),           # shares del-keys with nothing <=1
        (7, ["q", "r", "s"]),      # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id int, toks array<string>")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in token_edit1_pairs(df).collect()
    }
    release_scoped()
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 1
    assert got[(1, 4)] == 1
    assert got[(1, 5)] == 0
    assert got[(2, 5)] == 1
    assert got[(3, 5)] == 1
    assert got[(4, 5)] == 1
    # distance-2 pair sharing a delete key must be verified away:
    # [x,c] vs [a,b] etc never appear; and no pair involving 7
    assert not any(7 in k for k in got)
    # [a,x,c] vs [a,b] is distance 2 (sub + del): must be absent
    assert (2, 3) not in got


def test_token_edit1_matches_brute_force_on_real_titles(spark, sf_dir):
    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators import text
    from gomrjob_spark.operators.dedup import token_edit1_pairs

    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id", F.slice(text.tokens(text.normalized("text")), 1, 6).alias("toks")
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in token_edit1_pairs(titles).collect()
    }
    release_scoped()

    def dist_le1(a, b):
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b))
        if abs(len(a) - len(b)) != 1:
            return None
        mn = min(len(a), len(b))
        p = 0
        while p < mn and a[p] == b[p]:
            p += 1
        s = 0
        while s < mn and a[-1 - s] == b[-1 - s]:
            s += 1
        return 1 if p + s >= mn else None

    rows = titles.collect()
    want = set()
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            x, y = sorted([ra, rb], key=lambda r: r["doc_id"])
            d = dist_le1(x["toks"], y["toks"])
            if d is not None and d <= 1:
                want.add((x["doc_id"], y["doc_id"], d))
    assert want, "fixture must yield at least one pair"
    assert got == want


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.similarity import knn_bruteforce, knn_sq8

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(q, emb, k=5).collect()
    }
    sq = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_sq8(q, emb, k=5).collect()
    }
    release_scoped()
    recall = len(exact & sq) / len(exact)
    assert recall >= 0.7, f"SQ8 recall vs float cosine too low: {recall}"


def test_sq8_codes_bounded_and_deterministic(spark):
    from gomrjob_spark.operators.similarity import sq8_encode, sq8_stats

    df = spark.createDataFrame(
        [(i, [float(i), 0.5, -1.0 + i]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    stats = sq8_stats(df)
    a = sorted(sq8_encode(df, stats).collect(), key=lambda r: r["vec_id"])
    b = sorted(sq8_encode(df, stats).collect(), key=lambda r: r["vec_id"])
    assert [r["code"] for r in a] == [r["code"] for r in b]
    for r in a:
        assert all(0 <= c <= 255 for c in r["code"])
    # constant dimension encodes 0 for every row
    assert all(r["code"][1] == 0 for r in a)
    # extremes hit the rails
    assert a[0]["code"][0] == 0 and a[-1]["code"][0] == 255
