"""Byte-level tokenizer with byte-fallback — the no-OOV-by-construction
capability (r10 VERDICT gap 3) next to the char-level BPE / WordPiece /
Unigram families.

GPT-2's tokenizer (Radford et al. 2019) and SentencePiece's
``--byte_fallback`` mode operate on the UTF-8 BYTE sequence instead of
characters: the base alphabet is all 256 byte values, so EVERY string —
including scripts, emoji, or binary junk never seen in training — has a
lattice path by construction. There is no unknown token; the worst case
is one token per byte.

This module re-expresses that capability under the repo's exact-integer
Viterbi discipline (operators/unigram.py):

- a word is its UTF-8 byte sequence, carried as the UPPERCASE HEX string
  (``F.hex(F.encode(w, 'UTF-8'))`` — 2 chars per byte; DuckDB's
  ``hex(encode(w))`` produces the identical string, so every piece key,
  dp state and output token is byte-exact cross-engine);
- vocab pieces are byte n-grams (1..MAX_PIECE bytes) seeded by corpus
  frequency, UNIONED with all 256 single-byte values (weight 0 when the
  corpus never produced them) — the fallback alphabet that guarantees a
  path;
- encode is the same constant-plan-size runtime ``aggregate`` fold over
  BYTE positions, minimizing ``n_pieces·RANK_SCALE + Σ rank`` with
  lexicographic tie-break on the hex piece sequence, under the enforced
  RANK_SCALE overflow guard.

Output tokens are space-joined hex groups (e.g. ``"6865 6C6C6F"``);
un-hexing the concatenation reconstructs the exact UTF-8 bytes of the
word — the lossless round-trip the property tests pin, including for
words whose characters the training corpus never saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .unigram import KEY_WIDTH, RANK_SCALE, SENTINEL, _rank_map

#: longest piece considered, in BYTES (4 bytes ≈ one non-BMP codepoint)
MAX_PIECE_BYTES = 4
#: seed vocab entries kept by weight before the forced 256-byte union
BYTE_VOCAB_TOP = 48


def _hex_col(col):
    """UPPERCASE hex of the UTF-8 bytes — the cross-engine byte carrier
    (Spark ``hex(encode(...))`` ≡ DuckDB ``hex(encode(...))``)."""
    return F.hex(F.encode(col, "UTF-8"))


def byte_pieces(
    words: DataFrame, max_piece: int = MAX_PIECE_BYTES
) -> DataFrame:
    """Byte-n-gram candidates: (piece, weight) where piece is the hex of
    1..max_piece consecutive bytes and weight sums the corpus word count
    over every occurrence (same position-multiplicity as the char-level
    seeding — the lattice can use a piece at each position it occurs)."""
    w = F.col("word")
    words = words.where(F.length(w) > 0)
    hx = _hex_col(w)
    nb = (F.length(hx) / F.lit(2)).cast("int")
    cands = F.flatten(
        F.transform(
            F.sequence(F.lit(1), nb),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece), nb - s + 1)),
                lambda l: F.substring(hx, s * 2 - 1, l * 2),
            ),
        )
    )
    return (
        words.select(F.col("wcount"), F.explode(cands).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("weight"))
    )


def seed_byte_vocab_ranks(
    words: DataFrame,
    max_piece: int = MAX_PIECE_BYTES,
    vocab_top: int = BYTE_VOCAB_TOP,
) -> dict[str, int]:
    """Ranked byte vocab as {hex_piece: rank}, rank 1 = heaviest.

    Top ``vocab_top`` byte n-grams by (weight DESC, piece ASC) unioned
    with ALL 256 single-byte values — including bytes the corpus never
    produced (weight 0) — so every UTF-8 sequence has a lattice path:
    the byte-fallback / no-OOV guarantee, decided at VOCAB level, not
    per word. The collect is bounded by vocab_top + 256 rows —
    model-sized by construction."""
    from pyspark import StorageLevel

    spark = words.sparkSession
    # persisted: the candidate relation feeds both the top-k sort and the
    # all-bytes weight join — one byte-n-gram explosion pass, not two
    pieces = byte_pieces(words, max_piece).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    top = pieces.orderBy(F.col("weight").desc(), F.col("piece")).limit(
        vocab_top
    )
    all_bytes = spark.range(256).select(
        F.format_string("%02X", F.col("id")).alias("piece"),
        F.lit(0).cast("long").alias("weight"),
    )
    vocab = (
        top.unionAll(
            # corpus weight for present bytes, 0 for never-seen ones
            all_bytes.alias("b")
            .join(pieces.alias("p"), "piece", "left")
            .select("piece", F.coalesce("p.weight", "b.weight").alias("weight"))
        )
        .groupBy("piece")
        .agg(F.max("weight").alias("weight"))
    )
    rows = vocab.collect()
    pieces.unpersist()
    ordered = sorted(rows, key=lambda r: (-r["weight"], r["piece"]))
    return {r["piece"]: i + 1 for i, r in enumerate(ordered)}


def encode_words_bytes(
    words: DataFrame,
    ranks: dict[str, int],
    max_piece: int = MAX_PIECE_BYTES,
) -> DataFrame:
    """Viterbi-encode every distinct word over its UTF-8 BYTE lattice.

    Identical machinery to unigram.encode_words — the fold carries the
    dp states of the last ``max_piece`` BYTE positions as fixed-width
    ``key|pieces`` strings; candidates extract hex pieces with stride-2
    substrings — so the plan stays constant-size at any word length.
    Because the vocab contains all 256 single bytes, the fold can never
    dead-end: every word encodes (no overflow tier, no unknown token).
    Emits (word, wcount, n_tokens, rank_sum, encoded) with ``encoded``
    the space-joined hex piece groups."""
    w = F.col("word")
    rmap = _rank_map(ranks)
    hx = _hex_col(w)
    init = F.struct(
        F.lit("0" * KEY_WIDTH + "|").alias("d0"),
        *[F.lit(SENTINEL).alias(f"d{i}") for i in range(1, max_piece)],
    )

    def fold(acc, np):
        cands = []
        for l in range(1, max_piece + 1):
            prev = acc[f"d{l - 1}"]
            piece = F.substring(hx, np * 2 - F.lit(2 * l - 1), 2 * l)
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

    nb = (F.length(hx) / F.lit(2)).cast("int")
    res = F.aggregate(F.sequence(F.lit(1), nb), init, fold)["d0"]
    # enforced RANK_SCALE invariant (operators/unigram.py discipline):
    # rank_sum ≤ n_bytes × |vocab|; fail the job loudly before the rank
    # sum can bleed into the n_pieces term of the dp key
    bound = nb.cast("long") * F.lit(len(ranks))
    guard = F.assert_true(
        bound < F.lit(RANK_SCALE),
        F.concat_ws(
            " ",
            F.lit("bytelevel RANK_SCALE overflow: n_bytes*|vocab| ="),
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
