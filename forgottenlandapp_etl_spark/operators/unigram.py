"""Unigram-LM tokenizer (SentencePiece-style Viterbi segmentation) — the
third tokenizer family next to BPE (operators/bpe.py) and WordPiece
(operators/wordpiece.py), closing the r9 VERDICT's first extension gap.

Kudo 2018 ("Subword Regularization") segments a word on the lattice of all
vocab pieces, picking the path that maximizes the unigram likelihood
Σ log p(piece); training seeds a large candidate vocab from frequent
substrings and hard-EM refits piece probabilities from the Viterbi
segmentations. This module keeps exactly that structure — lattice DP over
every split point (NOT WordPiece's greedy longest-match), seed-by-frequency,
E-step usage refit — but replaces the float log-probabilities with an
exact-integer score so every output is hash-reproducible cross-engine (the
same discipline as the exact-integer Kneser-Ney LM in operators/text.py:
float log-likelihoods cannot be compared between engines; their ORDER can):

- each vocab piece gets an integer RANK (1 = heaviest) under the total
  order (weight DESC, piece ASC) — the rank is a quantized stand-in for
  −log p, monotone in the seed frequency;
- Viterbi minimizes ``n_pieces·RANK_SCALE + Σ rank(piece)`` — fewest
  pieces first (the dominant term of any unigram optimum, since every
  piece costs ≥ one unit of log-likelihood), then the most frequent
  pieces, then the lexicographically smallest piece sequence. A total
  order, so the argmax segmentation is deterministic on both engines.

Execution shape — the production one:

- **Seed vocab**: one explode of distinct words into substring candidates
  (length ≤ MAX_PIECE) weighted by corpus word frequency, a bounded top-K
  (TakeOrderedAndProject over an alphabet-bounded candidate space), union
  all single characters so the lattice always has a path.
- **Encode**: the ranked vocab is model-sized by construction
  (VOCAB_TOP + alphabet) and ships to executors as ONE literal map inside
  a pure Column expression — zero joins, zero shuffles, how a real
  tokenizer broadcasts its model file. The Viterbi DP is a runtime
  ``F.aggregate`` fold over the word's positions carrying the last
  MAX_PIECE dp states — a fold, never an unrolled column loop (the
  analyzer re-inlines unrolled self-referencing steps exponentially; see
  wordpiece.encode_words), so the plan is constant-size at any word
  length and there is NO overflow bound: a 200-char word just runs 200
  fold steps.
- **Train (hard-EM E-step)**: Viterbi-encode the distinct words, explode
  the chosen pieces, and sum corpus-frequency-weighted usage per piece —
  the expected counts an M-step would renormalize; pieces with zero usage
  are the ones SentencePiece's pruning round drops.

Everything is integer/string math: the dp state is a fixed-width
zero-padded integer key concatenated with the running piece string, so the
cross-engine ``LEAST`` over candidate states compares (key, pieces)
lexicographically — identical binary UTF-8 string comparison in Spark and
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .wordpiece import word_counts  # same corpus word-count front end

#: longest piece considered during seeding and matching
MAX_PIECE = 4
#: seed vocab entries kept by weight before the forced single-char union
VOCAB_TOP = 48
#: key = n_pieces * RANK_SCALE + Σ ranks; must exceed any possible rank sum
#: (≤ max word length × vocab size). ENFORCED per word in encode_words via
#: assert_true(len(word) * |vocab| < RANK_SCALE) — a large-alphabet corpus
#: (CJK singles) or very long words fail loudly instead of silently
#: bleeding rank sum into the n_pieces term of the dp key.
RANK_SCALE = 1_000_000
#: zero-padded key width; keys stay < 10^12 for any realistic word length
KEY_WIDTH = 12
#: losing/invalid dp state: sorts after every real "<12 digits>|pieces"
#: state (real keys are zero-padded and start with '0')
SENTINEL = "9" * KEY_WIDTH + "|~"


def unigram_pieces(words: DataFrame, max_piece: int = MAX_PIECE) -> DataFrame:
    """Position-independent substring candidates: (piece, weight).

    Every substring of length 1..max_piece of every distinct word,
    weighted by the word's corpus count summed over occurrences (a piece
    occurring twice inside one word counts twice — the lattice can use it
    at both positions). Zero-length words are excluded BEFORE candidate
    generation: Spark's ``sequence(1, 0)`` steps DESCENDING (the r9
    phantom-piece hazard; DuckDB's generate_series(1,0) is empty).
    """
    w = F.col("word")
    words = words.where(F.length(w) > 0)
    cands = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece), F.length(w) - s + 1)
                ),
                lambda l: w.substr(s, l),
            ),
        )
    )
    return (
        words.select(F.col("wcount"), F.explode(cands).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("weight"))
    )


def seed_vocab_ranks(
    words: DataFrame,
    max_piece: int = MAX_PIECE,
    vocab_top: int = VOCAB_TOP,
) -> dict[str, int]:
    """Ranked seed vocab as {piece: rank}, rank 1 = heaviest.

    Top ``vocab_top`` candidates by (weight DESC, piece ASC) — a total
    order, ties deterministic — unioned with every single character so
    Viterbi always has a path, then ranked by the SAME total order over
    the union. The collect is bounded by vocab_top + alphabet rows —
    model-sized by construction (the wordpiece/bpe vocab-collect
    discipline), never corpus-proportional.
    """
    from pyspark import StorageLevel

    # the candidate relation feeds BOTH the top-k sort and the singles
    # union branch — persist it so the substring explosion + aggregation
    # (the corpus-derived heavy pass of the training) runs once, not twice
    # per call (guide §5: reuse beats recompute when the input is reused)
    pieces = unigram_pieces(words, max_piece).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    top = pieces.orderBy(F.col("weight").desc(), F.col("piece")).limit(
        vocab_top
    )
    singles = pieces.where(F.length("piece") == 1)
    vocab = top.unionAll(singles).groupBy("piece").agg(
        F.max("weight").alias("weight")
    )
    rows = vocab.collect()
    pieces.unpersist()
    ordered = sorted(rows, key=lambda r: (-r["weight"], r["piece"]))
    return {r["piece"]: i + 1 for i, r in enumerate(ordered)}


def _rank_map(ranks: dict[str, int]) -> Column:
    """The model file as one literal MAP expression (executor-broadcast
    inside the plan; ``try_element_at`` returns NULL for non-pieces —
    plain element_at THROWS under ANSI mode on a missing key)."""
    kv = []
    for p in sorted(ranks):
        kv.append(F.lit(p))
        kv.append(F.lit(ranks[p]))
    return F.create_map(*kv)


def encode_words(
    words: DataFrame,
    ranks: dict[str, int],
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Viterbi-encode every distinct word under the integer unigram score.

    One runtime ``aggregate`` fold over positions 1..len(word); the
    accumulator carries the dp states of the last ``max_piece`` positions
    as fixed-width ``key|pieces`` strings. At position p the candidate
    via a length-l piece extends the state at p−l; ``least`` picks the
    minimum (key, pieces) — fewest pieces, then smallest rank sum, then
    lexicographic. Emits (word, wcount, n_tokens, rank_sum, encoded).
    """
    w = F.col("word")
    rmap = _rank_map(ranks)
    init = F.struct(
        F.lit("0" * KEY_WIDTH + "|").alias("d0"),
        *[F.lit(SENTINEL).alias(f"d{i}") for i in range(1, max_piece)],
    )

    def fold(acc, np):
        cands = []
        for l in range(1, max_piece + 1):
            prev = acc[f"d{l - 1}"]
            piece = w.substr(np - F.lit(l) + 1, F.lit(l))
            r = F.try_element_at(rmap, piece)
            prev_key = F.substring(prev, 1, KEY_WIDTH).cast("long")
            prev_enc = F.substring(prev, KEY_WIDTH + 2, 1 << 30)
            key = prev_key + F.lit(RANK_SCALE) + r
            enc = F.concat(
                prev_enc,
                F.when(prev_enc == F.lit(""), F.lit("")).otherwise(F.lit(" ")),
                piece,
            )
            ok = (
                (np >= F.lit(l))
                & (F.substring(prev, 1, 1) != F.lit("9"))
                & r.isNotNull()
            )
            cands.append(
                F.when(
                    ok,
                    F.concat(
                        F.lpad(key.cast("string"), KEY_WIDTH, "0"),
                        F.lit("|"),
                        enc,
                    ),
                ).otherwise(F.lit(SENTINEL))
            )
        return F.struct(
            F.least(*cands).alias("d0"),
            *[acc[f"d{i - 1}"].alias(f"d{i}") for i in range(1, max_piece)],
        )

    res = F.aggregate(F.sequence(F.lit(1), F.length(w)), init, fold)["d0"]
    # RANK_SCALE invariant, ENFORCED (not just documented): rank_sum is
    # bounded by len(word) × |vocab| (every piece costs ≤ max rank =
    # len(ranks)); if that bound can reach RANK_SCALE the rank sum would
    # silently bleed into the n_pieces term of the dp key and reorder the
    # Viterbi argmax — both engines corrupt identically, so the oracle
    # stays green while the objective is no longer the documented one.
    # assert_true fails the JOB loudly instead; it returns NULL on pass,
    # so the coalesce(+0) keeps it un-prunable inside the wcount output.
    bound = F.length(w).cast("long") * F.lit(len(ranks))
    guard = F.assert_true(
        bound < F.lit(RANK_SCALE),
        F.concat_ws(
            " ",
            F.lit("unigram RANK_SCALE overflow: len(word)*|vocab| ="),
            bound.cast("string"),
            F.lit(f">= {RANK_SCALE}; raise RANK_SCALE/KEY_WIDTH"),
        ),
    )
    wcount_guarded = F.col("wcount").cast("long") + F.coalesce(
        guard.cast("long"), F.lit(0)
    )
    st = words.where(F.length(w) > 0).select(
        "word", wcount_guarded.alias("wcount"), res.alias("d")
    )
    key = F.substring("d", 1, KEY_WIDTH).cast("long")
    return st.select(
        "word",
        "wcount",
        (key / F.lit(RANK_SCALE)).cast("long").alias("n_tokens"),
        (key % F.lit(RANK_SCALE)).cast("long").alias("rank_sum"),
        F.substring("d", KEY_WIDTH + 2, 1 << 30).alias("encoded"),
    )


#: default segmentation count for the n-best Viterbi enumeration
N_BEST = 3


def encode_words_nbest(
    words: DataFrame,
    ranks: dict[str, int],
    n_best: int = N_BEST,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Deterministic n-best Viterbi: the top ``n_best`` segmentations of
    every distinct word under the SAME exact-integer total order the
    1-best encode minimizes (fewest pieces, then rank sum, then
    lexicographic piece sequence).

    This is subword regularization's enumeration (Kudo 2018 samples from
    the n-best lattice at train time) WITHOUT the sampling — the top-n
    paths under a total order are hash-exact cross-engine, so the entry
    stays oracle-paired where a sampled segmentation could not be.

    Exactness: the k-th best path to position p extends one of the top-k
    states at p−l — appending the same (piece, rank) to two segmentations
    of the same prefix preserves their strict order (equal key deltas;
    and no segmentation of a prefix is a string-prefix of another, since
    stripping separators must reproduce the identical prefix text) — so
    per-position top-n lists suffice for the global top-n.

    Mechanics: the dp state per position is an ARRAY of ``n_best``
    ``key|pieces`` strings (SENTINEL-padded); each fold step extends all
    ``max_piece × n_best`` predecessors, ``array_sort``s (binary UTF-8 —
    the same LEAST order as 1-best) and keeps the first ``n_best``.
    Emits one row per real (non-sentinel) path:
    (word, wcount, best_rank 1..n, n_tokens, rank_sum, encoded).
    """
    w = F.col("word")
    rmap = _rank_map(ranks)
    init = F.struct(
        F.concat(
            F.array(F.lit("0" * KEY_WIDTH + "|")),
            F.array_repeat(F.lit(SENTINEL), n_best - 1),
        ).alias("d0"),
        *[
            F.array_repeat(F.lit(SENTINEL), n_best).alias(f"d{i}")
            for i in range(1, max_piece)
        ],
    )

    def make_ext(l, piece, r, np):
        # closure factory: pyspark counts a lambda's parameters to bind
        # the higher-order function, so captures must NOT be defaults
        def ext(prev):
            prev_key = F.substring(prev, 1, KEY_WIDTH).cast("long")
            prev_enc = F.substring(prev, KEY_WIDTH + 2, 1 << 30)
            key = prev_key + F.lit(RANK_SCALE) + r
            enc = F.concat(
                prev_enc,
                F.when(prev_enc == F.lit(""), F.lit("")).otherwise(
                    F.lit(" ")
                ),
                piece,
            )
            ok = (
                (np >= F.lit(l))
                & (F.substring(prev, 1, 1) != F.lit("9"))
                & r.isNotNull()
            )
            return F.when(
                ok,
                F.concat(
                    F.lpad(key.cast("string"), KEY_WIDTH, "0"),
                    F.lit("|"),
                    enc,
                ),
            ).otherwise(F.lit(SENTINEL))

        return ext

    def fold(acc, np):
        per_len = []
        for l in range(1, max_piece + 1):
            piece = w.substr(np - F.lit(l) + 1, F.lit(l))
            r = F.try_element_at(rmap, piece)
            per_len.append(
                F.transform(acc[f"d{l - 1}"], make_ext(l, piece, r, np))
            )
        allc = F.array_sort(F.concat(*per_len))
        return F.struct(
            F.slice(allc, 1, n_best).alias("d0"),
            *[acc[f"d{i - 1}"].alias(f"d{i}") for i in range(1, max_piece)],
        )

    res = F.aggregate(F.sequence(F.lit(1), F.length(w)), init, fold)["d0"]
    # same enforced RANK_SCALE invariant as the 1-best encode
    bound = F.length(w).cast("long") * F.lit(len(ranks))
    guard = F.assert_true(
        bound < F.lit(RANK_SCALE),
        F.concat_ws(
            " ",
            F.lit("unigram RANK_SCALE overflow: len(word)*|vocab| ="),
            bound.cast("string"),
            F.lit(f">= {RANK_SCALE}; raise RANK_SCALE/KEY_WIDTH"),
        ),
    )
    wcount_guarded = F.col("wcount").cast("long") + F.coalesce(
        guard.cast("long"), F.lit(0)
    )
    st = words.where(F.length(w) > 0).select(
        "word", wcount_guarded.alias("wcount"), res.alias("ds")
    )
    ex = st.select(
        "word", "wcount", F.posexplode("ds").alias("pos", "d")
    ).where(F.substring("d", 1, 1) != F.lit("9"))
    key = F.substring("d", 1, KEY_WIDTH).cast("long")
    return ex.select(
        "word",
        "wcount",
        (F.col("pos") + 1).cast("long").alias("best_rank"),
        (key / F.lit(RANK_SCALE)).cast("long").alias("n_tokens"),
        (key % F.lit(RANK_SCALE)).cast("long").alias("rank_sum"),
        F.substring("d", KEY_WIDTH + 2, 1 << 30).alias("encoded"),
    )


def piece_usage(
    words: DataFrame, ranks: dict[str, int], max_piece: int = MAX_PIECE
) -> DataFrame:
    """Hard-EM E-step usage: (piece, rnk, usage) — corpus-frequency-
    weighted counts of each seed piece in the Viterbi segmentations (the
    expected counts an M-step renormalizes). Pieces the optimal lattice
    never uses drop out — exactly SentencePiece's pruning signal. The
    encode is vocabulary-shaped (distinct words), the usage agg is one
    partial-agg shuffle on the piece key.
    """
    enc = encode_words(words, ranks, max_piece)
    used = enc.select(
        "wcount", F.explode(F.split("encoded", " ")).alias("piece")
    )
    usage = used.groupBy("piece").agg(F.sum("wcount").alias("usage"))
    rmap = _rank_map(ranks)
    return usage.select(
        "piece",
        F.try_element_at(rmap, F.col("piece")).cast("long").alias("rnk"),
        F.col("usage").cast("long").alias("usage"),
    )


def refit_ranks(
    words: DataFrame, ranks: dict[str, int], max_piece: int = MAX_PIECE
) -> dict[str, int]:
    """Hard-EM M-step: re-rank the vocab by E-step usage.

    The refit vocab is the USED pieces (nonzero expected count under the
    seed Viterbi) unioned with every single character — singles are never
    pruned, or some word would lose its lattice path (SentencePiece keeps
    them for the same reason). Ranks reassign under (usage DESC, piece
    ASC), unused singles ranking by usage 0. Both collects are
    vocab-sized — model-sized by construction, never corpus-sized.
    """
    usage = {
        r["piece"]: r["usage"]
        for r in piece_usage(words, ranks, max_piece).collect()
    }
    singles = {p for p in ranks if len(p) == 1}
    pieces = sorted(
        set(usage) | singles, key=lambda p: (-usage.get(p, 0), p)
    )
    return {p: i + 1 for i, p in enumerate(pieces)}


def corpus_fertility(
    df: DataFrame,
    ranks: dict[str, int],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group unigram fertility (tokens/word): count (group, word)
    occurrences, Viterbi-encode only the DISTINCT words against the
    literal model map (encode cost is vocabulary-sized, not corpus-sized),
    join token counts back on the word key. No overflow tier — the fold
    runs to any word length. Integer fixed-point ratio via ``div``.
    """
    occ = df.select(
        F.col(group_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.length("word") > 0)
    pc = occ.groupBy(group_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    words = pc.groupBy("word").agg(F.sum("cnt").alias("wcount"))
    enc = encode_words(words, ranks).select("word", "n_tokens")
    agg = pc.join(enc, "word").groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_tokens")).cast("long").alias(
            "n_tokens_total"
        ),
    )
    return agg.select(
        group_col,
        "n_words",
        "n_tokens_total",
        F.expr(
            "(n_tokens_total * 1000000) div greatest(1, n_words)"
        ).alias("fertility_fp"),
    )
