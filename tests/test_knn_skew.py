"""Exact kNN ring expansion + skew operators."""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.similarity import knn_cellring, knn_exact
from osmium_tool_spark.operators.skew import (
    broadcast_salted_join,
    detect_skew,
    salted_agg,
    salted_count_by,
)


def brute_knn(points, qid, k):
    q = next(p for p in points if p[0] == qid)
    scored = sorted(
        ((float(p[1] - q[1]) ** 2 + float(p[2] - q[2]) ** 2, p[0]) for p in points if p[0] != qid)
    )
    return [pid for _, pid in scored[:k]]


@pytest.fixture(scope="module")
def pts(spark):
    import random

    rng = random.Random(42)
    rows = [
        (i, rng.randint(-1_000_000_000, 1_000_000_000), rng.randint(-800_000_000, 800_000_000))
        for i in range(300)
    ]
    return rows, spark.createDataFrame(rows, "id long, lon long, lat long")


def test_knn_exact_matches_brute_force(spark, pts):
    rows, df = pts
    queries = df.filter(F.col("id") < 5)
    out = knn_exact(df, queries, res=5, k=4)
    got = {}
    for r in sorted(out.collect(), key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid in range(5):
        assert got[qid] == brute_knn(rows, qid, 4), f"query {qid}"


def test_knn_exact_supersets_block_bounded(spark, pts):
    rows, df = pts
    q = df.filter(F.col("id") == 0)
    block = {r.neighbor_id for r in knn_cellring(df, q, res=5, ring=1, k=4).collect()}
    exact = {r.neighbor_id for r in knn_exact(df, q, res=5, k=4).collect()}
    assert len(exact) == 4
    assert exact == set(brute_knn(rows, 0, 4))
    # the block-bounded result may be smaller/different; exact never is
    assert len(block) <= 4


@pytest.fixture(scope="module")
def skewed(spark):
    hot = [(i, "hot", float(i)) for i in range(10_000)]
    cold = [(10_000 + i, f"k{i % 50}", float(i)) for i in range(500)]
    return spark.createDataFrame(hot + cold, "id long, key string, v double")


def test_detect_skew(skewed):
    hotkeys = detect_skew(skewed, ["key"], threshold=10.0).collect()
    assert [r.key for r in hotkeys] == ["hot"]
    assert hotkeys[0].cnt == 10_000


def test_salted_count_matches_plain(skewed):
    plain = {r.key: r.cnt for r in skewed.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.key: r.cnt for r in salted_count_by(skewed, ["key"], "id").collect()}
    assert salted == plain


def test_salted_agg_matches_plain(skewed):
    plain = skewed.groupBy("key").agg(
        F.sum("v").alias("sum_v"), F.max("v").alias("max_v")
    ).collect()
    want = {r.key: (r.sum_v, r.max_v) for r in plain}
    got = {
        r.key: (r.sum_v, r.max_v)
        for r in salted_agg(skewed, ["key"], "id", {"v": "sum"}, n_salts=8)
        .join(
            salted_agg(skewed, ["key"], "id", {"v": "max"}, n_salts=8), on="key"
        )
        .collect()
    }
    for k, (s, m) in want.items():
        assert got[k][0] == pytest.approx(s) and got[k][1] == m


def test_broadcast_salted_join(spark, skewed):
    dim = spark.createDataFrame([("hot", 1), ("k1", 2)], "key string, tag int")
    out = broadcast_salted_join(skewed, dim, on="key", n_salts=4)
    counts = {r.key: r.cnt for r in out.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    assert counts["hot"] == 10_000 and counts["k1"] == 10


def test_knn_wraps_antimeridian_candidates(spark):
    """Candidate generation wraps at +/-180: a query on the east edge still
    sees the point on the west edge (only possible via cell-x wrap)."""
    df = spark.createDataFrame(
        [(1, 1_799_000_000, 0), (2, -1_799_000_000, 0), (3, 0, 0)],
        "id long, lon long, lat long",
    )
    out = knn_cellring(df, df.filter(F.col("id") == 1), res=6, ring=1, k=5)
    # ring-1 block of the easternmost cell includes the westernmost cell;
    # point 3 (middle of the world) is NOT in the block
    assert {r.neighbor_id for r in out.collect()} == {2}


def test_minhash_lsh_recall_against_exact(spark):
    """LSH recall check with bands tuned for the threshold (16 bands of
    2 rows): P(candidate at jaccard j) = 1-(1-j^2)^16, ~0.99 at j=0.5."""
    import random

    from osmium_tool_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(30)]
        rows.append((2 * i, " ".join(base)))
        mutated = list(base)
        for _ in range(rng.randint(0, 4)):     # light mutation -> high jaccard
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {(r.a, r.b) for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    # 32 perms in 16 bands of 2: high recall at the 0.5 threshold
    lsh = {(r.a, r.b) for r in
           minhash_lsh_pairs(docs, "doc_id", "text", num_perm=32, band_size=2,
                             threshold=0.5).collect()}
    assert lsh <= exact  # exact-Jaccard verification: no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact)} true pairs"
