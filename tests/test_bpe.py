"""Distributed BPE (operators/bpe.py): textbook-replica training
parity, merge-fold semantics, frequency-weighted pair counts,
train/encode consistency, validation."""

from collections import Counter

import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.operators.bpe import (
    END,
    apply_merge,
    best_pair,
    bpe_encode,
    merged_syms,
    pair_counts,
    train_bpe,
    word_freqs,
    word_symbols,
)

CORPUS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "a cat and a hat",
    "the hat on the cat",
    "fish eat fish",
] * 3


def py_merge_pass(syms, a, b):
    out, pend = [], None
    for s in syms:
        if pend is None:
            pend = s
        elif pend == a and s == b:
            out.append(a + b)
            pend = None
        else:
            out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


def py_train(corpus, n_merges):
    """Textbook BPE trainer (Sennrich 2016 fig. 1) with the engine's
    deterministic tie-break: max count, then smallest (a, b)."""
    freqs = Counter(w for line in corpus for w in line.split(" ") if w)
    symtab = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in freqs.items():
            syms = symtab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        symtab = {w: py_merge_pass(s, a, b) for w, s in symtab.items()}
    return merges, symtab


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_textbook_replica(spark):
    got = train_bpe(_docs(spark), n_merges=12)
    want, _ = py_train(CORPUS, 12)
    assert got == want


def test_merge_fold_cases(spark):
    cases = [
        (["a", "a", "a", "b"], "a", "a", ["aa", "a", "b"]),
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        (["x"], "a", "b", ["x"]),
        (["a", "b"], "a", "b", ["ab"]),
        (["b", "a"], "a", "b", ["b", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, *_rest) in enumerate(cases)],
                               "i long, syms array<string>")
    for i, (syms, a, b, want) in enumerate(cases):
        [r] = df.filter(F.col("i") == i).select(
            merged_syms(F.col("syms"), a, b).alias("m")
        ).collect()
        assert list(r.m) == want == py_merge_pass(syms, a, b), (syms, a, b)


def test_pair_counts_weighted(spark):
    symtab = word_symbols(word_freqs(_docs(spark)))
    got = {(r.a, r.b): r.cnt for r in pair_counts(symtab).collect()}
    freqs = Counter(w for line in CORPUS for w in line.split(" ") if w)
    want = Counter()
    for w, f in freqs.items():
        syms = list(w) + [END]
        for i in range(len(syms) - 1):
            want[(syms[i], syms[i + 1])] += f
    assert got == dict(want)


def test_best_pair_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("zz", 5, ["z", "z"]), ("ay", 5, ["a", "y"])],
        "word string, freq long, syms array<string>",
    )
    assert best_pair(pair_counts(df))[:2] == ("a", "y")  # tie -> smallest (a, b)


def test_encode_consistent_with_training(spark):
    """For every word seen in training, bpe_encode reproduces the final
    training symbol table (greedy rank order == training merge order)."""
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=15)
    _, symtab = py_train(CORPUS, 15)
    enc = bpe_encode(docs, merges)
    rows = {r.doc_id: list(r.tokens) for r in enc.collect()}
    for i, line in enumerate(CORPUS):
        want = [t for w in line.split(" ") if w for t in symtab[w]]
        assert rows[i] == want, (i, line)


def test_encode_unseen_and_empty(spark):
    df = spark.createDataFrame([(1, "zzz unseen"), (2, "")],
                               "doc_id long, text string")
    merges = [("t", "h"), ("z", "z")]
    rows = {r.doc_id: list(r.tokens) for r in bpe_encode(df, merges).collect()}
    assert rows[1] == ["zz", "z", END, "u", "n", "s", "e", "e", "n", END]
    assert rows[2] == []


def test_apply_merge_roundtrip(spark):
    symtab = word_symbols(word_freqs(_docs(spark)))
    after = apply_merge(symtab, "t", "h")
    got = {r.word: list(r.syms) for r in after.collect()}
    assert got["the"] == ["th", "e", END]
    assert got["hat"] == ["h", "a", "t", END]  # no 'th' adjacency here


def test_validation(spark):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(_docs(spark), n_merges=0)
