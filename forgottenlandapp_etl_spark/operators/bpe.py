"""BPE tokenizer training (Sennrich et al. 2016) as a distributed operator.

The key scale insight: BPE trains on the WORD-FREQUENCY TABLE, not the
corpus — one corpus pass builds (word, freq), and every merge round then
touches only the vocabulary relation (≤ millions of rows at any corpus
size). That is why byte-pair training is tractable at 100 TB: the corpus
is read once; the k merge rounds iterate over vocab-sized data exactly the
way ``connected_components`` iterates over its label relation
(localCheckpoint per round to cut lineage, one driver-side scalar — the
argmax pair — per round).

The merge itself is a JVM-side array fold (``F.aggregate`` with a
struct accumulator): greedy left-to-right non-overlapping replacement of
the chosen pair inside every word, matching the reference algorithm
exactly — a run ``aaa`` under pair (a,a) becomes ``[aa, a]``, and the
freshly merged symbol does not immediately re-merge with the next element.
No Python touches per-word data.

Tiebreak: rounds pick the pair with (max total frequency, then
lexicographic smallest left, then right) — fully deterministic, so the
learned merge table is reproducible and golden-testable against a pure
Python reference (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the relation BPE actually trains on."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Adjacent-symbol pair totals weighted by word frequency: explode the
    (n−1) index positions, one map-side-combinable SUM shuffle."""
    s = F.col(syms_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("left_sym"),
            F.element_at(s, i + 1).alias("right_sym"),
        ),
    )
    return (
        vocab.where(F.size(s) >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("freq").alias("n"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) inside a
    symbol array — the BPE merge step as a struct-accumulator fold."""
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(False).alias("merged"),
    )

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc["arr"], -1)
        can = (
            (~acc["merged"])
            & (F.size(acc["arr"]) > 0)
            & (last == F.lit(left))
            & (x == F.lit(right))
        )
        merged_arr = F.concat(
            F.slice(acc["arr"], F.lit(1), F.size(acc["arr"]) - 1),
            F.array(F.concat(last, x)),
        )
        return F.when(
            can,
            F.struct(merged_arr.alias("arr"), F.lit(True).alias("merged")),
        ).otherwise(
            F.struct(
                F.concat(acc["arr"], F.array(x)).alias("arr"),
                F.lit(False).alias("merged"),
            )
        )

    return F.aggregate(syms, init, step, lambda acc: acc["arr"])


def _train_merges_local(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Sequential BPE over a driver-held (word, freq) dict — the identical
    algorithm, tiebreak, and greedy non-overlap convention as the
    distributed tier (both are pinned equal to each other and to the
    test-suite reference by tests/test_extensions.py)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freq.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + f
    merges: list[tuple[int, str, str, int]] = []
    for it in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, left, right, n))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + f
        vocab = new_vocab
    return merges


def train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    driver_vocab_limit: int = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus' word-frequency table.

    Returns [(iteration, left_sym, right_sym, pair_count), …]. One corpus
    pass builds the vocab; training then runs TWO-TIER by the vocabulary's
    MEASURED size (the SCALE.md rule-8 discipline, same as PageRank /
    connected components): at or below ``driver_vocab_limit`` distinct
    words the k merge rounds run sequentially on the driver-collected
    (word, freq) dict — the relation is vocab-sized by construction, the
    rounds are pure dict arithmetic, and the k×3 Spark jobs of the
    distributed loop (~1.5 s of pure scheduling at any data size) drop to
    one collect. Above the limit, each round is a vocab-sized aggregate +
    argmax (driver scalar, like the components convergence probe) + fold
    rewrite, localCheckpointed to keep lineage flat across rounds. Both
    tiers are asserted equal (tests/test_extensions.py); 0 disables the
    driver tier."""
    base = word_vocab(df, text_col).localCheckpoint(eager=True)
    if driver_vocab_limit and base.count() <= driver_vocab_limit:
        return _train_merges_local(
            {r["word"]: r["freq"] for r in base.collect()}, n_merges
        )
    vocab = base.select(F.split(F.col("word"), "").alias("syms"), "freq")
    merges: list[tuple[int, str, str, int]] = []
    for it in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("left_sym"), F.asc("right_sym"))
            .first()
        )
        if top is None:
            break
        merges.append((it, top.left_sym, top.right_sym, top.n))
        vocab = vocab.withColumn(
            "syms", merge_pair(F.col("syms"), top.left_sym, top.right_sym)
        ).localCheckpoint(eager=True)
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: char-split every word, apply the
    merges in training order (the BPE inference rule), return one row per
    document with its BPE token array and count. Narrow per-row math —
    the merge table is baked into the plan (it is tiny by construction)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    syms_per_word = F.transform(
        words, lambda w: F.split(w, "")
    )
    def _merge_step(left: str, right: str):
        # real closure (not default args): PySpark reads the lambda's arity
        # to decide how many lambda variables to bind
        return lambda s: merge_pair(s, left, right)

    col = syms_per_word
    for _, left, right, _ in merges:
        col = F.transform(col, _merge_step(left, right))
    toks = F.flatten(col)
    return df.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    )
