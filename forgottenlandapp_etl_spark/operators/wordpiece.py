"""WordPiece tokenizer inference (greedy longest-match-first encoding).

The second tokenizer family next to the BPE tier (operators/bpe.py): BERT's
WordPiece encodes a word by repeatedly taking the LONGEST vocab piece that
prefixes the remaining suffix, marking non-initial pieces with ``##``
(Devlin et al. 2018; Song et al. 2021 "Fast WordPiece Tokenization"
describes the same greedy longest-match loop this module distributes).

Execution shape — the production one:

- **Vocab build**: one explode of distinct words into (is_initial, piece)
  substring candidates weighted by corpus word frequency, a bounded top-K
  (TakeOrderedAndProject — the candidate space is alphabet-bounded, never
  corpus-sized), unioned with every single character so encoding always
  terminates.
- **Encode**: the vocab is model-sized by construction (``VOCAB_TOP`` +
  alphabet), so it ships to executors as literal membership sets inside a
  pure Column expression — zero joins, zero shuffles, exactly how a real
  tokenizer broadcasts its vocab file. The greedy loop unrolls
  ``max_word_len`` times; each step is a no-op for finished words. Words
  longer than the unroll bound are marked ``<OVERFLOW>`` / ``n_tokens=-1``
  deterministically on BOTH engines rather than silently mis-encoded.

Everything is integer/string math, so the trained vocab AND every encoded
word are hash-exact against the DuckDB oracle (which unrolls the same
greedy steps as generated non-recursive CTEs — one source of truth for the
constants below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: longest piece considered during vocab building and matching
MAX_PIECE = 4
#: vocab entries kept by weight before the forced single-character union
VOCAB_TOP = 48
#: greedy-loop unroll bound; words longer than this encode as <OVERFLOW>
MAX_WORD_LEN = 8
#: deterministic overflow markers (identical in the oracle SQL)
OVERFLOW_TEXT = "<OVERFLOW>"
OVERFLOW_NTOKS = -1


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct corpus words with occurrence counts: (word, wcount)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def wordpiece_vocab(
    words: DataFrame, max_piece: int = MAX_PIECE, vocab_top: int = VOCAB_TOP
) -> DataFrame:
    """Frequency-weighted piece vocabulary: (is_initial, piece).

    Candidates are every substring of length 1..max_piece of every word,
    split into word-initial (start position 1) and continuation pieces,
    weighted by the word's corpus count summed over occurrences. The top
    ``vocab_top`` by (weight DESC, is_initial DESC, piece ASC) — a total
    order, so ties are deterministic — are kept, then all single
    characters are unioned in so greedy matching can always advance.

    Zero-length words (empty tokens from delimiter runs) are excluded
    BEFORE candidate generation: Spark's ``sequence(1, 0)`` silently
    steps DESCENDING to [1, 0] (DuckDB's generate_series(1,0) is empty),
    which would mint phantom empty-string pieces weighted by the empty
    tokens' frequency — heavy enough to steal top-K slots (caught by the
    seed-101 fuzz corpus).
    """
    w = F.col("word")
    words = words.where(F.length(w) > 0)
    starts = F.sequence(F.lit(1), F.length(w))
    cands = F.flatten(
        F.transform(
            starts,
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece), F.length(w) - s + 1)
                ),
                lambda l: F.struct(
                    (s == 1).alias("is_initial"), w.substr(s, l).alias("piece")
                ),
            ),
        )
    )
    from pyspark import StorageLevel

    # persisted: the candidate relation feeds both the top-k sort and the
    # singles branch — one substring-explosion aggregation pass, not two.
    # Every caller immediately collects the (model-sized) result, so the
    # eager localCheckpoint pins it and releases the candidate cache here.
    pieces = (
        words.select(F.col("wcount"), F.explode(cands).alias("c"))
        .select("wcount", "c.is_initial", "c.piece")
        .groupBy("is_initial", "piece")
        .agg(F.sum("wcount").alias("weight"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = (
        pieces.orderBy(
            F.col("weight").desc(), F.col("is_initial").desc(), F.col("piece")
        )
        .limit(vocab_top)
        .select("is_initial", "piece")
    )
    singles = pieces.where(F.length("piece") == 1).select("is_initial", "piece")
    out = top.unionAll(singles).distinct().localCheckpoint(eager=True)
    pieces.unpersist()
    return out


def collect_vocab(vocab: DataFrame) -> dict[tuple[bool, int], list[str]]:
    """Materialize the model-sized vocab as {(is_initial, len): pieces}.

    The collect is bounded by VOCAB_TOP + 2×alphabet rows — model-sized by
    construction (same discipline as the BPE tier's vocab collect,
    operators/bpe.py), never corpus-proportional.
    """
    sets: dict[tuple[bool, int], list[str]] = {}
    for row in vocab.collect():
        sets.setdefault((bool(row["is_initial"]), len(row["piece"])), []).append(
            row["piece"]
        )
    return {k: sorted(v) for k, v in sets.items()}


def _member(sets, is_initial: bool, length: int, sub: Column) -> Column:
    pieces = sets.get((is_initial, length), [])
    if not pieces:
        return F.lit(False)
    return sub.isin(*pieces)


def encode_words(
    words: DataFrame,
    sets: dict[tuple[bool, int], list[str]],
    max_piece: int = MAX_PIECE,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Greedy longest-match encode of every distinct word.

    Two-phase, all pure Column expressions over the literal vocab sets:

    1. **Per-position jump table**: the greedy choice at position p is
       path-INDEPENDENT — initial pieces apply only at p=1, continuation
       pieces everywhere else — so each position's longest match is one
       ``transform`` over the word, no loop dependency. Membership sets
       are length-homogeneous, so a truncated end-of-word substring can
       never false-match a longer piece.
    2. **Chain fold**: a runtime ``aggregate`` over ``max_word_len`` steps
       follows the jump chain (pos → pos + jump[pos]), concatenating
       pieces. A runtime fold, NOT an unrolled column loop — unrolling
       would re-inline each step's ``pos`` expression into the next
       (CollapseProject) for exponential plan growth; the fold keeps the
       plan constant-size at any ``max_word_len``.

    Emits (word, wcount, n_tokens, encoded) with continuation pieces
    ``##``-prefixed; words needing more than ``max_word_len`` steps are
    marked ``<OVERFLOW>`` deterministically (the oracle applies the same
    bound).
    """
    w = F.col("word")

    def jump_at(p):
        initial = p == F.lit(1)
        chosen = F.lit(1)
        for length in range(2, max_piece + 1):
            sub = w.substr(p, F.lit(length))
            hit = F.when(initial, _member(sets, True, length, sub)).otherwise(
                _member(sets, False, length, sub)
            )
            chosen = F.when(hit, F.lit(length)).otherwise(chosen)
        return chosen

    steps = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda p: F.struct(
            jump_at(p).alias("jump"),
            F.concat(
                F.when(p == F.lit(1), F.lit("")).otherwise(F.lit("##")),
                w.substr(p, jump_at(p)),
            ).alias("piece"),
        ),
    )
    st = words.select(
        "word",
        F.col("wcount").cast("long").alias("wcount"),
        steps.alias("steps"),
    )

    def fold(acc, _):
        active = acc["pos"] <= F.length(w)
        # clamp the lookup: element_at past the array end would raise
        # under ANSI mode; the clamped value is only read when active
        jp = F.element_at(F.col("steps"), F.least(acc["pos"], F.length(w)))
        return F.when(
            active,
            F.struct(
                (acc["pos"] + jp["jump"]).alias("pos"),
                F.concat(
                    acc["enc"],
                    F.when(acc["pos"] == F.lit(1), F.lit("")).otherwise(
                        F.lit(" ")
                    ),
                    jp["piece"],
                ).alias("enc"),
                (acc["ntoks"] + 1).alias("ntoks"),
            ),
        ).otherwise(acc)

    init = F.struct(
        F.lit(1).alias("pos"), F.lit("").alias("enc"), F.lit(0).alias("ntoks")
    )
    res = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), init, fold
    ).alias("res")
    st = st.select("word", "wcount", res)
    overflow = F.col("res.pos") <= F.length("word")
    return st.select(
        "word",
        "wcount",
        F.when(overflow, F.lit(OVERFLOW_NTOKS))
        .otherwise(F.col("res.ntoks"))
        .cast("long")
        .alias("n_tokens"),
        F.when(overflow, F.lit(OVERFLOW_TEXT))
        .otherwise(F.col("res.enc"))
        .alias("encoded"),
    )


def corpus_fertility(
    df: DataFrame,
    sets: dict[tuple[bool, int], list[str]],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group tokenizer fertility (tokens/word — the metric tokenizer
    papers report to compare vocab quality across domains/languages).

    The production shape end-to-end: count (group, word) occurrences (one
    partial-agg shuffle), encode only the DISTINCT words against the
    broadcast vocab (the encode cost is vocabulary-sized, not
    corpus-sized), then join the per-word token counts back to the
    occurrence counts on the word key. Words that overflowed the encode
    bound are counted separately and excluded from the fertility ratio —
    deterministically on both engines, never silently folded in. All
    integer math; ``fertility_fp`` is tokens-per-word ×10^6 via `div`.
    """
    occ = df.select(
        F.col(group_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    pc = occ.groupBy(group_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    words = pc.groupBy("word").agg(F.sum("cnt").alias("wcount"))
    enc = encode_words(words, sets).select("word", "n_tokens")
    ov = F.col("n_tokens") < 0
    j = pc.join(enc, "word")
    agg = j.groupBy(group_col).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.when(ov, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_overflow_words"),
        F.sum(F.when(~ov, F.col("cnt") * F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_tokens_total"),
        F.sum(
            F.when(~ov, F.col("cnt") * F.length("word")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_chars_total"),
    )
    return agg.select(
        group_col,
        "n_words",
        "n_overflow_words",
        "n_tokens_total",
        "n_chars_total",
        F.expr(
            "(n_tokens_total * 1000000)"
            " div greatest(1, n_words - n_overflow_words)"
        ).alias("fertility_fp"),
    )
