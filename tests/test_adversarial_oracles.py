"""Fixture-blind-spot hunting for the documents-family oracles.

Round-5 review lesson: the BPE encode oracle was WRONG for ordinary words
('stack' tokenized across a symbol boundary) yet hash-passed every gate,
because the fixture corpus happens to contain no hazard word. The gate
proves Spark == oracle ON THE FIXTURE; this module re-proves it on a
crafted corpus packed with the edge shapes synthetic fixtures avoid —
empty/whitespace-only text, double-space empty tokens, unicode,
punctuation, single-char and 200-char words, same-symbol runs, exact and
near duplicates, boundary-hazard words — for every registry entry whose
plan and oracle read only the documents table.

A divergence here is a REAL bug in either the plan or the oracle even
though the driver gate is green.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from forgottenlandapp_etl_spark.plans.registry import ORACLE, QUERIES

from .oracle import compare

TEXTS = [
    "stack stand most winner stage",        # BPE boundary-hazard words
    "station tastata start",                # repeated hazards in one word
    "aaaa aaaaa aa a",                      # same-symbol runs
    "the the the the the",                  # heavy token repetition
    "héllo wörld 中文 слова",               # non-ASCII
    "end. end, end! (end) \"end\"",         # punctuation variants
    "x",                                    # single 1-char token
    "",                                     # empty document
    " ",                                    # whitespace-only (empty tokens)
    "a  b",                                 # double space -> empty token
    "tab\tinside and trailing ",            # tab is NOT a delimiter
    "0 123 -45 6.78 1e9",                   # numeric-looking tokens
    "Mixed CASE case Case mIxEd",           # casing
    "w" * 200,                              # one 200-char word
    " ".join(f"tok{i % 17}" for i in range(200)),  # long doc, cyclic vocab
    "shared prefix words here",             # near-dup cluster (a)
    "shared prefix words there",            # near-dup cluster (b)
    "shared prefix words here",             # exact duplicate of (a)
    "wholly distinct content now",
    "the quick brown fox jumps over the lazy dog",
    # line-aware hazards for the Gopher/C4 rule batteries (round 9): every
    # branch of both filters must fire somewhere in this corpus
    "First line ends well.\nsecond line no punct\n- bullet line starts\n"
    "trailing dots line...\nShort.",        # mixed multi-line
    "- b1\n- b2\n- b3\n- b4",               # >90% bullet lines
    "one...\ntwo...\nthree...",             # >30% ellipsis-ended lines
    "code has a { curly } brace in it.",     # C4 page-level brace drop
    "Please enable javascript to continue.", # C4 javascript line drop
    "standard lorem ipsum filler text here.",  # C4 lorem-ipsum page drop
    'He said "stop" and left!\nIs that so?\nQuote ends "here"',  # terminal variants
    "### ## # hash heavy #### #",            # symbol-to-word ratio breach
    " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"] * 8
    ),                                        # 64 words, all 8 Gopher stopwords
    "tab\tand\nnewline mix \f formfeed \r carriage",  # every WS_CLASS delimiter
    # newline-unit line-dedup hazards (r10): empty line, TRAILING newline
    # (the trailing empty line must survive the split), and a line shared
    # across two docs so the cross-doc drop rule fires on newline units
    "alpha line here\n\nbeta line there\n",
    "alpha line here\nwholly unique gamma line",
    "\n\n",                                  # empty lines only
]

#: every registry entry whose Spark plan AND oracle read only `documents`
#: (curated: entries touching events/lineitem/embeddings can't run on the
#: documents-only adversarial dir)
DOC_ONLY_ENTRIES = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_levenshtein",
    "dedup_substring",
    "dedup_substring_trim",
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_components",
    "text_stats",
    "text_quality",
    "text_fingerprint",
    "text_token_count",
    "text_winnow_fingerprint",
    "text_vocab_topk",
    "text_length_histogram",
    "text_chunk_overlap",
    "text_repetition",
    "text_bm25_topk",
    "quality_bigram_lm",
    "quality_linear_score",
    "bpe_pair_counts",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "pipeline_train_val_split",
    "pipeline_leakage_safe_split",
    "pii_redact",
    "c9_posexplode_tokens",
    "mm_frame_dedup",
    "mm_frame_index",
    "mm_media_features",
    "pipeline_clean_corpus",
    "pipeline_dedup_corpus",
    "decontaminate",
    "decontaminate_bloom",
    "dq_outlier_iqr",
    "pipeline_curriculum_phases",
    "text_lang_id",
    "sample_stratified",
    "sample_pps_systematic",
    "pipeline_training_ready",
    "sketch_count_min",
    "mix_diversity_gini",
    "mix_temperature_sample",
    "pipeline_pack_sequences",
    "pipeline_pack_ffd",
    "text_udtf_chunks",
    "text_span_corruption",
    "graph_triangles",
    "graph_kcore",
    "pii_k_anonymity",
    "src_orc_roundtrip",
    "src_csv_roundtrip",
    "pipeline_dsir_select",
    "pipeline_rag_index",
    "sample_stratified_cap",
    # round 9: published quality-rule batteries + domain mixing weights
    "quality_gopher_rules",
    "quality_c4_rules",
    "mix_domain_weights",
    # round 9: curation tier (line dedup's re-lining + string_agg ordering,
    # URL canonicalization regexes, integer epoch arithmetic, triplet
    # offset/anti-join logic, and the streaming LSH index — all string- or
    # boundary-sensitive oracles, so they run on the hazard corpus too)
    "dedup_lines",
    "dedup_lines_newline",
    "dedup_url_canonical",
    "mix_epoch_upsample",
    "pairs_contrastive_mining",
    "stream_neardup_lsh",
    "stream_neardup_lsh_bucketed",
    # round 9b: the WordPiece greedy loop (the 200-char word exercises the
    # <OVERFLOW> bound the fixture never reaches; empty/whitespace docs
    # exercise zero-length words; unicode exercises char-based substr),
    # the normalization pipeline (multi-line + unicode + tab corpora), the
    # suffix-chain blocklist, and the rank-selection calibration (the
    # duplicate texts force n_chars ties onto the doc_id tiebreak)
    "tok_wordpiece_encode",
    "text_normalize",
    "filter_domain_blocklist",
    "quality_domain_calibrated",
    # round 9b (continued): fertility exercises the overflow-exclusion
    # accounting via the 200-char word; the perplexity tertiles hit
    # score ties (duplicate texts) and 1-2 doc sources (degenerate
    # tertile boundaries)
    "tok_wordpiece_fertility",
    "quality_perplexity_buckets",
    # round 10: the Unigram-LM family — the Viterbi lattice must agree
    # with the recursive-CTE oracle on empty tokens, unicode pieces, the
    # 200-char word (200 fold steps vs 200 recursion rounds), same-symbol
    # runs (heavy lattice ties -> the lexicographic tie-break), and the
    # cross-family fertility accounting (overflow-excluded wordpiece vs
    # unbounded unigram on the same occurrence relation)
    "tok_unigram_encode",
    "tok_unigram_train",
    "tok_unigram_refit_encode",
    "tok_fertility_compare",
    # round 11: the n-best enumeration must stay exact on hazard words
    # (unicode multi-byte, 200-char, same-symbol runs), and the byte
    # lattice must segment EVERY document byte-exactly — non-ASCII words
    # exercise the fallback alphabet the even-doc training never saw
    "tok_unigram_nbest",
    "tok_byte_encode",
    # round 10: the datasheet's dup attribution must count the exact
    # duplicates in this corpus and its token counts must skip the
    # empty-token hazard rows; the streaming form must agree with the
    # same batch oracle even when the adversarial twins land in
    # different micro-batches
    "dq_corpus_datasheet",
    "stream_corpus_datasheet",
    # round 9b: Kneser-Ney hits the same boundary shapes as the Laplace
    # tier (empty/1-token docs -> (0,0); corpus-unique bigrams now take
    # the continuation-probability path instead of the 1/1 trap)
    "quality_kneser_ney_lm",
    # round 9b: the sketch-accuracy histogram on hazard corpora — exact
    # duplicates give error decile 0 (est 1.0, true 1.0), near-dups and
    # hash collisions fill the tail; zero-common candidates keep c=0
    "dedup_minhash_error_hist",
    # round 11: PMI collocations — the hazard corpus exercises the empty
    # tokens dropped from the bigram relation, the min-count floor (the
    # "the the" run and cyclic tok{i} vocab clear it; hapax pairs don't),
    # and pmi_fp ties broken by the (w1, w2) lexicographic order
    "text_collocations_pmi",
    # round 11: content-defined chunking — the hazard corpus exercises
    # empty docs (one zero-length chunk each, md5('') group), docs shorter
    # than the window (single whole-doc chunk), exact duplicates (full
    # dup_chars), the near-dup cluster (partial chunk sharing), and
    # non-ASCII text (char-based substr/length on both engines)
    "dedup_cdc_chunks",
    # round 11: coverage curve — empty-token exclusion, non-ASCII types,
    # count ties broken by token string, checkpoints past the type count
    "tok_coverage_curve",
    # round 11: scene cuts — empty docs (no frames), sub-16-byte tail
    # frames, non-ASCII payloads through the hex carrier, single-frame
    # media (LAG sees NULL -> no cut, one scene)
    "mm_scene_cuts",
    # round 11: RAKE — stopword runs (all-stopword docs yield no phrase),
    # empty-token breakers, repeated phrases across docs, phrase-text
    # grouping with score ties broken lexicographically
    "text_rake_keywords",
    # round 11: BFS keeper distances — exact-dup clusters (dense, dist 1),
    # the near-dup chain cluster, singletons absent from the graph
    "graph_bfs_distances",
    # round 11: ngram novelty — sub-3-token docs (zero ngrams, zero-safe
    # ratio), exact duplicates (later copy scores 0), the near-dup pair
    # (partial novelty), shared-shingle min-doc ties
    "text_ngram_novelty",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_docs")
    pd.DataFrame(
        {
            "doc_id": range(len(TEXTS)),
            "text": TEXTS,
            # NULL lang is a standing hazard class (r10 ADVICE: the
            # streaming datasheet diverged on it and no fixture could
            # catch it): every third doc is unidentified, so any entry
            # that counts/ranks/stratifies by lang must state its NULL
            # rule identically on both sides (Spark sorts NULLS FIRST on
            # ASC, DuckDB NULLS LAST — a bare ORDER BY lang diverges)
            # period-4 against the period-3 source so every source sees
            # a MIX of identified and NULL langs (incl. en/de ties)
            "lang": [
                [None, "en", "de", "en"][i % 4] for i in range(len(TEXTS))
            ],
            "source": [f"s{i % 3}" for i in range(len(TEXTS))],
            "n_chars": [len(t) for t in TEXTS],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{adv_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ONLY_ENTRIES)
def test_entry_matches_oracle_on_adversarial_corpus(spark, adv_dir, adv_con, name):
    assert name in ORACLE, f"{name} has no oracle — belongs in a property test"
    got = QUERIES[name](spark, adv_dir)
    want = adv_con.execute(ORACLE[name]).fetchdf()
    compare(got, want, name=f"{name}@adversarial")


# ---------------------------------------------------------------------------
# events family: ties, boundary timestamps, NULLs, degenerate groups
# ---------------------------------------------------------------------------

def _adv_events():
    """Hazard shapes the synthetic fixture avoids: identical (user, ts)
    pairs (window-tiebreak stress), events EXACTLY at the 30-min session
    gap and at midnight day boundaries, NULL value/props, negative and
    huge values, a single-event user, an event-type with one row, and
    interleaved error→click pairs exactly at the 2-hour join band edge."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 2, 1, 0, 0, 0)
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # (a) same (user, ts) twice with different event_ids — any window
    # ordered without a unique tiebreak diverges here
    add(t0, 1, "click", 1.0, '{"k": 1}')
    add(t0, 1, "click", 2.0, '{"k": 2}')
    # (b) session-gap boundary: events exactly 30:00 apart (gap) and
    # 29:59.999999 apart (merge)
    add(t0, 2, "view", 1.0, '{"k": 3}')
    add(t0 + dt.timedelta(minutes=30), 2, "view", 1.0, '{"k": 4}')
    add(t0 + dt.timedelta(minutes=59, seconds=59, microseconds=999999), 2, "view", 1.0, None)
    # (c) midnight day boundary: 23:59:59.999999 vs 00:00:00
    add(dt.datetime(2024, 2, 2, 23, 59, 59, 999999), 3, "error", 5.0, '{"k": 5}')
    add(dt.datetime(2024, 2, 3, 0, 0, 0), 3, "click", 5.0, '{"k": 6}')
    # (d) 2-hour interval-join band edge: click exactly error_ts + 2h,
    # and one at +2h +1us (outside)
    err_ts = dt.datetime(2024, 2, 4, 6, 0, 0)
    add(err_ts, 4, "error", 1.0, '{"k": 7}')
    add(err_ts + dt.timedelta(hours=2), 4, "click", 1.0, '{"k": 8}')
    add(err_ts + dt.timedelta(hours=2, microseconds=1), 4, "click", 1.0, '{"k": 9}')
    # (e) NULL value and NULL/odd props
    add(t0 + dt.timedelta(hours=1), 5, "purchase", None, None)
    add(t0 + dt.timedelta(hours=2), 5, "purchase", 0.0, "{}")
    add(t0 + dt.timedelta(hours=3), 5, "purchase", -7.25, '{"k": -1}')
    # (f) extreme values — int32-safe: the reference's "level"
    # semantics CAST value to INT in both engines, so beyond ±2^31 both
    # raise identically and nothing is compared
    add(t0 + dt.timedelta(hours=4), 6, "signup", 1e9, '{"k": 0}')
    add(t0 + dt.timedelta(hours=5), 6, "signup", -1e9, '{"k": 0}')
    # (g) single-event user and single-row event type
    add(t0 + dt.timedelta(days=2), 7, "view", 3.5, '{"k": 10}')
    # (h) a burst: 20 events in one minute for one user (dense session)
    for i in range(20):
        add(t0 + dt.timedelta(days=3, seconds=3 * i), 8, "click", float(i), '{"k": %d}' % i)
    # (i) interleaved error/click ladder across users
    for i in range(10):
        u = 9 + (i % 2)
        add(t0 + dt.timedelta(days=4, minutes=11 * i), u,
            "error" if i % 3 == 0 else "click", float(i % 5), '{"k": %d}' % i)
    # (j) NULL event time (r6 ADVICE: the fixtures carried none, so an
    # oracle missing its `ts IS NOT NULL` guard hash-passed by luck while
    # Spark's session_window dropped the row silently)
    add(None, 11, "purchase", 10.0, None)
    add(None, 11, "click", 1.0, None)
    # (k) last-touch attribution 7-day horizon: click EXACTLY 7 days
    # before its purchase (attributes) vs 7 days + 1us (unattributed)
    b12 = dt.datetime(2024, 3, 8, 12, 0, 0)
    add(b12 - dt.timedelta(days=7), 12, "click", 0.0, None)
    add(b12, 12, "purchase", 3.0, None)
    b13 = dt.datetime(2024, 3, 20, 12, 0, 0)
    add(b13 - dt.timedelta(days=7, microseconds=1), 13, "click", 0.0, None)
    add(b13, 13, "purchase", 4.0, None)
    # (l) same-instant click/purchase: the (ts, event_id) total order
    # decides — purchase-before-click stays unattributed, click-before-
    # purchase attributes
    b14 = dt.datetime(2024, 3, 25, 9, 0, 0)
    add(b14, 14, "purchase", 5.0, None)
    add(b14, 14, "click", 0.0, None)
    add(b14, 15, "click", 0.0, None)
    add(b14, 15, "purchase", 6.0, None)
    # (m) DST-transition straddles (r9 VERDICT): wall times on opposite
    # sides of Europe/Berlin's 2024-03-31 02:00 spring-forward (01:30 /
    # 03:30 — the gapped hour between them) and inside the 2024-10-27
    # fall-back overlap (02:30 occurs TWICE in local Berlin time). Under a
    # DST session zone, any epoch derived via an NTZ→TZ cast shifts these
    # rows by different offsets; the zone-free dates.epoch_us path and the
    # zone-less DuckDB oracle agree for them under ANY session zone.
    add(dt.datetime(2024, 3, 31, 1, 30, 0), 16, "view", 1.0, None)
    add(dt.datetime(2024, 3, 31, 3, 30, 0), 16, "view", 2.0, None)
    add(dt.datetime(2024, 3, 31, 2, 30, 0), 16, "view", 9.0, None)  # in the gap
    add(dt.datetime(2024, 10, 27, 2, 30, 0), 17, "view", 3.0, None)  # ambiguous
    add(dt.datetime(2024, 10, 27, 1, 30, 0), 17, "view", 4.0, None)
    add(dt.datetime(2024, 10, 27, 3, 30, 0), 17, "view", 5.0, None)
    return rows


@pytest.fixture(scope="module")
def adv_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adversarial_events")
    rows = _adv_events()
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_events_con(adv_events_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{adv_events_dir}/events.parquet'"
    )
    yield con
    con.close()


#: every registry entry whose Spark plan AND oracle read only `events`
EVENTS_ONLY_ENTRIES = [
    "a1_range_sum",
    "a3_last_value_wins",
    "a5_poll_minutes",
    "agg_array_agg_sorted",
    "agg_corr_stats",
    "agg_distinct_count",
    "agg_funnel_steps",
    "agg_mode",
    "agg_percentile",
    "agg_pivot",
    "agg_retention_cohorts",
    "agg_session_windows",
    "agg_time_bucket_gapfill",
    "agg_time_bucket_interp",
    "c5_try_int",
    "c7_json_extract",
    "c7b_variant_extract",
    "dq_anomaly_mad",
    "dq_uniqueness",
    "dq_drift_histogram",
    "dq_profile_events",
    "sketch_cms_daily_merge",
    "sketch_hll_exact_daily_merge",
    "sketch_kmv_intersection",
    "sketch_quantile_histogram",
    "e3_daily_online_time",
    "e3_period_online_time",
    "f1_min_value_filter",
    "f6_typeguard_projection",
    "j1_snapshot_diff",
    # j3_accumulating_merge: oracle is events-only but the Spark plan also
    # reads the region dimension — cannot run on the events-only dir
    "j4_period_rollup",
    "j7_asof_join",
    "j8_range_join",
    "scd2_intervals",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    # sql_daily_rollup: register_views registers the FULL catalog (all ten
    # tables) before its spark.sql — cannot run on the events-only dir
    "src_jsonl_roundtrip",
    "stream_cdc_apply",
    # round 11: streaming SCD2 — NULL-ts drop rule, (ts, event_id) tie
    # runs, single-event users, out-of-order file slices re-segmented by
    # the affected-key recomputation
    "stream_scd2_apply",
    "stream_daily_counts",
    "stream_dedup_keys",
    "stream_ivm_rollup",
    "stream_distinct_hll",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_stream_join",
    "stream_stream_left_join",
    "w2_level_rank",
    "w3_multikey_rank",
    "agg_markov_transitions",
    "wx_ewma",
    "wx_lag_delta",
    "wx_streak_lengths",
    "wx_last_nonnull",
    "wx_moving_sum",
    "wx_range_frame",
    # round 9: time-weighted average (LOCF / TWAP)
    "wx_time_weighted_avg",
    "wx_rolling_median",
    "agg_bounce_rate",
    # sql_lateral_topk: register_views registers the FULL catalog before
    # its spark.sql — cannot run on the events-only dir (sql_daily_rollup
    # has the same exclusion)
    "agg_ols_slope",
    "agg_attribution_last_touch",
    # round 9b: freshness SLA on a corpus with NULL event times (explicit
    # drop rule on both sides) and a single-event rare type
    "dq_event_freshness",
]


@pytest.mark.parametrize("name", EVENTS_ONLY_ENTRIES)
def test_events_entry_matches_oracle_on_adversarial_corpus(
    spark, adv_events_dir, adv_events_con, name
):
    got = QUERIES[name](spark, adv_events_dir)
    want = adv_events_con.execute(ORACLE[name]).fetchdf()
    compare(got, want, name=f"{name}@adversarial-events")


@pytest.mark.parametrize(
    "name", ["dq_event_freshness", "wx_range_frame", "wx_time_weighted_avg"]
)
def test_epoch_entries_zone_independent(
    spark, adv_events_dir, adv_events_con, name
):
    """The r9 DST hazard, pinned: every entry deriving epochs/gaps from the
    (possibly NTZ) event time must match the zone-less oracle even when
    the session zone is a DST zone. The corpus's (m) rows straddle both
    Berlin 2024 transitions — an NTZ→TZ-cast epoch shifts them by
    different offsets (measured 3600 s error across spring-forward) while
    the field-based dates.epoch_us path never consults the zone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
        got = QUERIES[name](spark, adv_events_dir)
        want = adv_events_con.execute(ORACLE[name]).fetchdf()
        compare(got, want, name=f"{name}@adversarial-events-berlin")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_gapfill_and_interp_branches_fire_on_gaps(spark, adv_events_dir):
    """The sf fixtures are gap-FREE (every (event_type, day) observed), so
    their hash-PASS proves only the observed branch. This corpus has real
    per-type day gaps; assert the fill branches actually execute: zero-
    filled rows exist, locf carries a value across them, and at least one
    gap day gets a bracketed linear interpolation strictly between its
    neighbors' daily sums."""
    gf = {
        (r["event_type"], r["day"]): r
        for r in QUERIES["agg_time_bucket_gapfill"](spark, adv_events_dir).collect()
    }
    gaps = [r for r in gf.values() if r["gap_filled"] == 1]
    assert gaps, "adversarial corpus must contain per-type day gaps"
    assert all(r["n_events"] == 0 for r in gaps)
    assert any(r["value_locf"] is not None for r in gaps), "locf never carried"
    it = {
        (r["event_type"], r["day"]): r
        for r in QUERIES["agg_time_bucket_interp"](spark, adv_events_dir).collect()
    }
    assert set(it) == set(gf), "both fills densify the identical calendar"
    bracketed = [
        r
        for k, r in it.items()
        if gf[k]["gap_filled"] == 1 and r["value_interp"] is not None
    ]
    assert bracketed, "no gap day had observations on both sides"
    # clicks have a known ladder: interpolated values sit within the
    # per-type observed min/max envelope (linear blends cannot overshoot)
    by_type: dict = {}
    for k, r in it.items():
        if gf[k]["gap_filled"] == 0 and r["value_interp"] is not None:
            lo, hi = by_type.get(k[0], (float("inf"), float("-inf")))
            by_type[k[0]] = (min(lo, r["value_interp"]), max(hi, r["value_interp"]))
    for r in bracketed:
        lo, hi = by_type[r["event_type"]]
        assert lo <= r["value_interp"] <= hi


# ---------------------------------------------------------------------------
# embeddings family: zero vectors, duplicates, collinear pairs, extremes
# ---------------------------------------------------------------------------

def _adv_embeddings(dim=64):
    """Hazard shapes for the similarity tier: the all-zero vector (norm 0
    — cosine's divide-by-zero), exact duplicate vectors (top-k tiebreak
    stress), a collinear pair (cosine exactly 1 at different magnitudes),
    sign-flipped pairs (cosine exactly -1), tiny and large magnitudes
    (quantization scale stress), one-hot vectors, and a cluster of
    near-identical vectors (near-dup recall edge)."""
    import math

    vecs = []

    def add(v, label):
        vecs.append((len(vecs), [float(x) for x in v], label))

    add([0.0] * dim, 0)                                  # zero vector
    add([1.0] + [0.0] * (dim - 1), 1)                    # one-hot
    add([1.0] + [0.0] * (dim - 1), 1)                    # exact duplicate
    add([2.5] + [0.0] * (dim - 1), 2)                    # collinear (cos=1)
    add([-1.0] + [0.0] * (dim - 1), 2)                   # sign-flip (cos=-1)
    add([1e-6] * dim, 3)                                 # tiny magnitude
    add([100.0] * dim, 3)                                # large magnitude
    add([(-1.0) ** i for i in range(dim)], 4)            # alternating signs
    # near-identical cluster
    base = [math.sin(i * 0.1) for i in range(dim)]
    for j in range(4):
        add([x + (1e-4 * j) for x in base], 5)
    # a spread of deterministic pseudo-random vectors
    for s in range(40):
        add([math.cos(0.37 * s * (i + 1)) for i in range(dim)], s % 10)
    return vecs


@pytest.fixture(scope="module")
def adv_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adversarial_embeddings")
    rows = _adv_embeddings()
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_emb_con(adv_emb_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{adv_emb_dir}/embeddings.parquet'"
    )
    yield con
    con.close()


EMB_ONLY_ENTRIES = [
    "sim_bruteforce_topk",
    "emb_quantize_int8",
    "sim_quantized_topk",
    "sim_rp_lsh_topk",
    "sim_ivf_topk",
    "emb_near_dup_pairs",
    "emb_near_dup_rhp",
    "emb_random_projection",
    "emb_near_dup_bucketed",
    "emb_centroid_per_label",
    "emb_kmeans_exact",
    "sim_ivf_exact_topk",
    "sim_ivfpq_topk",
    "dedup_semantic",
    "emb_power_iteration",
    "emb_power_top2",
    # round 8: the production-sized LSH geometries and the two-pass union
    "emb_near_dup_rhp_sized",
    "emb_near_dup_rhp_multipass",
    "sim_rp_lsh_topk_sized",
    # round 9: two-stage IVF + int8 shortlist + exact re-rank
    "sim_ivf_rerank",
    # round 9b: recall@5 histogram (zero vectors force NULL cosines into
    # the exact ranking and all-zero int8 codes into the approximate one —
    # both engines must agree on the resulting id sets, not just scores)
    "sim_ann_recall_eval",
    # round 9b: dimension truncation meets zero vectors (a full vector
    # whose first 16 dims are all zero gets a NULL truncated cosine even
    # though the full cosine is defined — both engines must agree)
    "sim_matryoshka_recall",
    # round 11: the embedding DQ screen — zero vectors land in the
    # (dim, 0) bucket with n_zero counted, and the adversarial corpus's
    # hazard vectors exercise the floor-bucket boundary
    "dq_embedding_norms",
]


@pytest.mark.parametrize("name", EMB_ONLY_ENTRIES)
def test_emb_entry_matches_oracle_on_adversarial_corpus(
    spark, adv_emb_dir, adv_emb_con, name
):
    got = QUERIES[name](spark, adv_emb_dir)
    want = adv_emb_con.execute(ORACLE[name]).fetchdf()
    compare(got, want, name=f"{name}@adversarial-embeddings")


def test_sized_rhp_recalls_true_near_duplicates(spark, adv_emb_dir):
    """The production geometry must actually CATCH near-dups, not just
    hash-match on tail pairs: the corpus's near-identical cluster (ids
    8-11, cos ≈ 1 — verified offline that the sign bits agree on every
    plane, so every 16-bit band collides) and the exact-duplicate /
    collinear trio (ids 1, 2, 3) must all be emitted by the sized single
    pass; the multipass union must contain the single pass."""
    single = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["emb_near_dup_rhp_sized"](spark, adv_emb_dir).collect()
    }
    cluster = {8, 9, 10, 11}
    for a in sorted(cluster):
        for b in sorted(cluster):
            if a < b:
                assert (a, b) in single, f"missed near-identical pair ({a},{b})"
    for pair in [(1, 2), (1, 3), (2, 3)]:
        assert pair in single, f"missed exact/collinear pair {pair}"
    multi = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["emb_near_dup_rhp_multipass"](spark, adv_emb_dir).collect()
    }
    assert single <= multi


# ---------------------------------------------------------------------------
# degenerate source groups for the IQR outlier gate: a single-document
# source (q1 = q3 = the one value; both fences collapse onto it, nothing
# is flagged) and a constant-length source (IQR = 0; same collapse).
# Neither shape exists in the fixture or the fuzz corpora above.

@pytest.fixture(scope="module")
def degenerate_sources_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sources")
    texts = (
        ["one lonely document here"]                      # source 'solo': 1 doc
        + ["same same same"] * 7                           # 'const': IQR = 0
        + [" ".join(["w"] * k) for k in (1, 2, 3, 40)]     # 'spread': real IQR + outlier
    )
    sources = ["solo"] + ["const"] * 7 + ["spread"] * 4
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_outlier_iqr_degenerate_sources(spark, degenerate_sources_dir):
    from forgottenlandapp_etl_spark.plans.registry import ORACLE, QUERIES

    d = degenerate_sources_dir
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    try:
        got = QUERIES["dq_outlier_iqr"](spark, d)
        want = con.execute(ORACLE["dq_outlier_iqr"]).fetchdf()
        compare(got, want, name="dq_outlier_iqr@degenerate")
        rows = {r["source"]: r for r in got.collect()}
        assert rows["solo"]["q1"] == rows["solo"]["q3"]
        assert rows["solo"]["n_low"] == rows["solo"]["n_high"] == 0
        assert rows["const"]["q1"] == rows["const"]["q3"]
        assert rows["const"]["n_low"] == rows["const"]["n_high"] == 0
        assert rows["spread"]["n_high"] >= 1  # the 40-token doc is fenced
    finally:
        con.close()


# seeded fuzz corpora: randomized shapes, deterministic seeds
# ---------------------------------------------------------------------------

def _fuzz_texts(seed, n=100):
    """Random documents over a hazard-rich vocabulary (BPE boundary
    fragments, unicode, punctuation, digits), with empty docs, repeated
    docs, and double-space empty tokens sprinkled in — deterministic per
    seed so failures reproduce."""
    import random

    rng = random.Random(seed)
    vocab = (
        "sta ta st a stack the quick brown érable 中文 x1 9.5 end. (p) "
        "merge mer er in ow aaaa aa w" .split()
    )
    texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            texts.append("")
        elif r < 0.10 and texts:
            texts.append(rng.choice(texts))  # exact duplicate
        else:
            sep = "  " if rng.random() < 0.1 else " "
            texts.append(sep.join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
    return texts


def _fuzz_events(seed, n=400):
    """Random events at microsecond resolution over a 10-day window:
    clustered users (ties likely), NULL values/props, a rare event type."""
    import datetime as dt
    import random

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    types = ["click", "view", "error", "purchase", "signup", "rare"]
    rows = []
    for i in range(n):
        ts = t0 + dt.timedelta(
            seconds=rng.randint(0, 10 * 86400), microseconds=rng.randint(0, 999999)
        )
        rows.append(
            (
                i,
                ts,
                rng.randint(1, 20),
                rng.choices(types, weights=[30, 30, 20, 10, 9, 1])[0],
                None if rng.random() < 0.1 else round(rng.uniform(-100, 100), 2),
                None if rng.random() < 0.1 else '{"k": %d}' % rng.randint(-5, 99),
            )
        )
    return rows


@pytest.fixture(scope="module", params=[101, 202])
def fuzz_docs_setup(tmp_path_factory, request):
    d = tmp_path_factory.mktemp(f"fuzz_docs_{request.param}")
    texts = _fuzz_texts(request.param)
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    yield str(d), con
    con.close()


@pytest.fixture(scope="module", params=[303, 404])
def fuzz_events_setup(tmp_path_factory, request):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp(f"fuzz_events_{request.param}")
    rows = _fuzz_events(request.param)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", DOC_ONLY_ENTRIES)
def test_doc_entry_matches_oracle_on_fuzz_corpus(spark, fuzz_docs_setup, name):
    d, con = fuzz_docs_setup
    compare(QUERIES[name](spark, d), con.execute(ORACLE[name]).fetchdf(),
            name=f"{name}@fuzz-docs")


@pytest.mark.parametrize("name", EVENTS_ONLY_ENTRIES)
def test_events_entry_matches_oracle_on_fuzz_corpus(spark, fuzz_events_setup, name):
    d, con = fuzz_events_setup
    compare(QUERIES[name](spark, d), con.execute(ORACLE[name]).fetchdf(),
            name=f"{name}@fuzz-events")


def _fuzz_embeddings(seed, n=60, dim=64):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            v = [0.0] * dim                      # zero vector
        elif r < 0.12 and rows:
            v = list(rng.choice(rows)[1])        # exact duplicate
        else:
            mag = 10.0 ** rng.uniform(-4, 3)     # magnitude spread
            v = [rng.uniform(-1, 1) * mag for _ in range(dim)]
        rows.append((i, v, rng.randint(0, 9)))
    return rows


@pytest.fixture(scope="module", params=[505, 606])
def fuzz_emb_setup(tmp_path_factory, request):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp(f"fuzz_emb_{request.param}")
    rows = _fuzz_embeddings(request.param)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", EMB_ONLY_ENTRIES)
def test_emb_entry_matches_oracle_on_fuzz_corpus(spark, fuzz_emb_setup, name):
    d, con = fuzz_emb_setup
    compare(QUERIES[name](spark, d), con.execute(ORACLE[name]).fetchdf(),
            name=f"{name}@fuzz-embeddings")


def test_cdc_apply_drops_null_event_times(spark, tmp_path):
    """NULL-ts changelog rows have no place in the (ts, event_id) order:
    both the Spark plan and the oracle must DROP them — a hazard the shared
    adversarial corpus can't carry (adding NULL ts there would perturb
    every other events entry)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "cdc_null_ts"
    d.mkdir()
    ts = pa.array(
        [None, 1706745600000000, 1706745601000000, None, 1706745602000000],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": ts,
                "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
                "event_type": pa.array(
                    ["click", "view", "error", "purchase", "click"], pa.string()
                ),
                "value": pa.array([9.9, 1.5, 2.0, 3.0, None], pa.float64()),
                "props": pa.array([None] * 5, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = QUERIES["stream_cdc_apply"](spark, str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.execute(ORACLE["stream_cdc_apply"]).fetchdf()
    con.close()
    compare(got, want, name="stream_cdc_apply@null-ts")
    rows = {r["user_id"]: r for r in got.collect()}
    # user 1: NULL-ts event 1 dropped, view (event 2) wins; user 2's only
    # timed op is the tombstone (absent); user 3: NULL-ts purchase dropped,
    # NULL-value click wins and carries a NULL payload
    assert set(rows) == {1, 3}
    assert rows[1]["last_event_id"] == 2 and rows[1]["value_cents"] == 150
    assert rows[3]["last_event_id"] == 5 and rows[3]["value_cents"] is None


def test_containment_catches_subset_docs_jaccard_misses(spark, tmp_path):
    """The directional tier's reason to exist: a short document fully
    quoted inside a much longer one has containment(short→long) = 1.0
    while its Jaccard stays far below the 0.8 near-dup cut — so the
    symmetric tier misses the pair entirely and the containment tier
    reports exactly the quoted direction."""
    import duckdb

    quoted = "alpha beta gamma delta epsilon"
    host = quoted + " " + " ".join(f"filler{i}" for i in range(40))
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [quoted, host, "wholly unrelated content here now"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(quoted), len(host), 33],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    d = str(tmp_path)
    got = {(r["src_id"], r["dst_id"]): r for r in
           QUERIES["dedup_containment"](spark, d).collect()}
    assert (1, 2) in got and got[(1, 2)]["containment"] == 1.0
    assert (2, 1) not in got  # host is NOT contained in the quote
    jac = QUERIES["dedup_ngram_jaccard"](spark, d).collect()
    assert not jac, "Jaccard >= 0.8 must NOT fire on the quoted pair"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    compare(QUERIES["dedup_containment"](spark, d),
            con.execute(ORACLE["dedup_containment"]).fetchdf(),
            name="dedup_containment@subset")
    con.close()


def test_funnel_strict_ordering_semantics(spark, tmp_path):
    """Pin the funnel's order rule by value: a step counts only when it
    sits strictly AFTER the previous step in the (ts, event_id) order —
    so a click sharing a timestamp with its view converts only if its
    event_id is higher, and a click that precedes the user's first view
    never converts."""
    import datetime as dt
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # user 1: view then click at the SAME ts, click has higher eid ->
        # converts (row order breaks the tie); then purchase -> full funnel
        (1, t0, 1, "view"), (2, t0, 1, "click"),
        (3, t0 + dt.timedelta(minutes=1), 1, "purchase"),
        # user 2: click BEFORE any view -> step 2 never fires even though
        # both event types exist
        (4, t0, 2, "click"), (5, t0 + dt.timedelta(minutes=1), 2, "view"),
        # user 3: same-ts pair but the VIEW has the higher event_id ->
        # the click sits before it in row order and must NOT convert
        (6, t0, 3, "click"), (7, t0, 3, "view"),
        # user 4: view -> purchase -> click: the click converts step 2
        # (a view precedes it) but the purchase precedes the click in row
        # order, so step 3 must NOT fire
        (8, t0, 4, "view"), (9, t0 + dt.timedelta(minutes=1), 4, "purchase"),
        (10, t0 + dt.timedelta(minutes=2), 4, "click"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    d = str(tmp_path)
    got = {r["step"]: r["users"] for r in QUERIES["agg_funnel_steps"](spark, d).collect()}
    # users 1,2,3,4 all viewed; users 1 and 4 clicked after a view; only
    # user 1 purchased after such a click
    assert got == {"view": 4, "view>click": 2, "view>click>purchase": 1}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    compare(QUERIES["agg_funnel_steps"](spark, d),
            con.execute(ORACLE["agg_funnel_steps"]).fetchdf(),
            name="agg_funnel_steps@strictness")
    con.close()


# ---------------------------------------------------------------------------
# referential-integrity audit: the fixtures are FK-clean (orphan counts all
# zero), so the audit's counting arms need an injected-orphan proof
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def orphaned_star_dir(tmp_path_factory):
    """A tiny star schema with DELIBERATE violations: lineitems pointing at
    missing orders/parts/suppliers (some keys repeated — orphan ROWS, not
    keys, must be counted) and an order with a missing customer."""
    d = tmp_path_factory.mktemp("orphaned_star")
    pd.DataFrame({"o_orderkey": [1, 2, 3], "o_custkey": [10, 10, 99]}).to_parquet(
        d / "orders.parquet"
    )
    pd.DataFrame({"c_custkey": [10]}).to_parquet(d / "customer.parquet")
    pd.DataFrame({"p_partkey": [100, 101]}).to_parquet(d / "part.parquet")
    pd.DataFrame({"s_suppkey": [200]}).to_parquet(d / "supplier.parquet")
    pd.DataFrame(
        {
            # rows 0-2 clean; 3-4 orphan order (same missing key twice —
            # both ROWS must count); 5 orphan part; 6 orphan supplier
            "l_orderkey": [1, 2, 3, 7, 7, 1, 2],
            "l_partkey": [100, 101, 100, 100, 101, 555, 100],
            "l_suppkey": [200, 200, 200, 200, 200, 200, 777],
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_referential_integrity_counts_injected_orphans(spark, orphaned_star_dir):
    rows = {
        r["fk"]: (r["n_child"], r["n_orphans"], r["orphan_fp"])
        for r in QUERIES["dq_referential_integrity"](spark, orphaned_star_dir).collect()
    }
    assert rows["lineitem->orders"] == (7, 2, 285714)
    assert rows["lineitem->part"] == (7, 1, 142857)
    assert rows["lineitem->supplier"] == (7, 1, 142857)
    assert rows["orders->customer"] == (3, 1, 333333)


def test_referential_integrity_matches_oracle_on_orphans(spark, orphaned_star_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "part", "supplier", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{orphaned_star_dir}/{t}.parquet'"
        )
    got = QUERIES["dq_referential_integrity"](spark, orphaned_star_dir)
    want = con.execute(ORACLE["dq_referential_integrity"]).fetchdf()
    compare(got, want, name="dq_referential_integrity@orphans")
    con.close()


def test_referential_integrity_exact_under_duplicated_parent_keys(spark, tmp_path):
    """r7-advice regression (low): a DIRTY parent with a duplicated key
    must not multiply grouped child rows through the audit's join —
    n_child stays the true child row count (the NOT EXISTS oracle is
    immune; the DataFrame form needs the parent-key dedup)."""
    d = str(tmp_path)
    pd.DataFrame({"o_orderkey": [1, 2, 3], "o_custkey": [10, 10, 99]}).to_parquet(
        tmp_path / "orders.parquet"
    )
    # duplicated parent key 10 — the broken form would count custkey-10
    # orders twice (n_child 5, not 3)
    pd.DataFrame({"c_custkey": [10, 10]}).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({"p_partkey": [100]}).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame({"s_suppkey": [200, 200]}).to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame(
        {"l_orderkey": [1, 2], "l_partkey": [100, 100], "l_suppkey": [200, 200]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = {
        r["fk"]: (r["n_child"], r["n_orphans"])
        for r in QUERIES["dq_referential_integrity"](spark, d).collect()
    }
    assert rows["orders->customer"] == (3, 1)
    assert rows["lineitem->supplier"] == (2, 0)
    con = duckdb.connect()
    for t in ("orders", "customer", "part", "supplier", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    compare(
        QUERIES["dq_referential_integrity"](spark, d),
        con.execute(ORACLE["dq_referential_integrity"]).fetchdf(),
        name="dq_referential_integrity@dirty_parent",
    )
    con.close()
