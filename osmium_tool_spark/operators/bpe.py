"""Distributed byte-pair-encoding: vocabulary training + tokenization
(Sennrich, Haddow & Birch 2016, "Neural machine translation of rare
words with subword units" — the public BPE algorithm every modern LLM
tokenizer family descends from).

The 100 TB shape (and why this is NOT per-round corpus scans): the
corpus is touched exactly TWICE —

  1. `word_freqs`: ONE explode + hash-agg reduces 10^12 rows of text to
     the (word, freq) vocabulary table — vocab-sized (heaps smaller than
     the corpus; Heaps' law), partial map-side sums do the compression.
  2. `bpe_encode`: after training, ONE embarrassingly-parallel
     Arrow-batched pass applies the learned merge list (broadcast as
     plain data, greedily rank-ordered) to every document.

Everything between — `pair_counts`, `apply_merge`, the `train_bpe`
loop — iterates on the VOCAB table only: each merge round is a
hash-agg over frequency-weighted adjacent symbol pairs plus a codegen
fold that rewrites the symbol arrays, with localCheckpoint lineage
truncation every few rounds (the dup_clusters / getid-closure pattern).
Driver state is one (pair, count) row per round — never the table.

Determinism: the best pair maximizes (count, then lexicographically
smallest (a, b)) — a total order, so training is bit-reproducible
across partitionings and engines; `apply_merge`'s left-to-right
non-overlapping pass is a sequential fold with the same semantics as
the reference implementation (pytest pins a pure-python replica).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich 2016 §3.2)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-scale stage of
    training. Whitespace tokens, empties dropped."""
    return (
        docs.select(
            F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def word_symbols(vocab: DataFrame) -> DataFrame:
    """Initial symbol table: (word, freq, syms) with syms = the word's
    characters plus the end-of-word marker."""
    return vocab.select(
        "word",
        "freq",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
            F.array(F.lit(END)),
        ).alias("syms"),
    )


def pair_counts(symtab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol table:
    (a, b, cnt). One explode + one hash-agg on the vocab-sized frame.

    Within one word, overlapping occurrences count per position
    (reference behavior: collections.Counter over zip(syms, syms[1:]))."""
    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    pairs = symtab.filter(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def best_pair(counts: DataFrame) -> tuple[str, str, int] | None:
    """The merge the round learns: max count, ties to the
    lexicographically smallest (a, b) — a total order, deterministic
    across partitionings. One tiny all-reduce (the counts frame is
    pair-vocabulary-sized)."""
    row = counts.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
    if not row:
        return None
    return row[0].a, row[0].b, row[0].cnt


def merged_syms(syms: Column, a: str, b: str) -> Column:
    """One left-to-right non-overlapping merge pass of (a, b) -> a+b
    over a symbol array, as a codegen fold (sequential dependency: in
    "aaa" with pair (a,a) only the first two merge — positional marking
    can't express that, a fold can). State: (out, pend) where pend is
    the one symbol the pass has read but not yet emitted."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        take = acc["pend"].isNotNull() & (acc["pend"] == a) & (s == b)
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                take,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, init, step, finish)


def apply_merge(symtab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite the symbol table with one learned merge — a pure
    projection over the vocab-sized frame, zero shuffle."""
    return symtab.select("word", "freq", merged_syms(F.col("syms"), a, b).alias("syms"))


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges. The corpus is scanned ONCE
    (word_freqs); every round after that runs on the vocab table:
    pair_counts agg -> one-row collect -> apply_merge projection,
    localCheckpointing every `checkpoint_every` rounds so the lineage
    (and the codegen'd fold stack) stays bounded — the iterative-plan
    discipline of the CC/getid loops. Stops early when no pair repeats.
    Returns the merge list in learned order (the tokenizer artifact)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    symtab = word_symbols(word_freqs(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = best_pair(pair_counts(symtab))
        if best is None or best[2] < 2:
            break
        a, b, _ = best
        merges.append((a, b))
        symtab = apply_merge(symtab, a, b)
        if (r + 1) % checkpoint_every == 0:
            symtab = symtab.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: ONE Arrow-batched
    mapInPandas pass (embarrassingly parallel, zero shuffle). The merge
    list is captured as PLAIN DATA in the closure (never package
    classes — local[N] executors don't share the repo path) and applied
    greedily in rank order per word, with a per-batch word cache (Zipf
    makes the cache hit rate high). Returns (id, tokens)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    end = END

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [end]
        while len(syms) >= 2:
            pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
            ranked = [(ranks[p], p) for p in pairs if p in ranks]
            if not ranked:
                break
            _, (a, b) = min(ranked)
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
            syms = out
        cache[word] = syms
        return syms

    def kernel(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            toks = [
                [
                    t
                    for w in (txt.split(" ") if txt else [])
                    if w
                    for t in encode_word(w, cache)
                ]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, tokens array<string>"
    )
