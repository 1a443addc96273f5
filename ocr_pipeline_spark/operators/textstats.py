"""Text analysis operators for training-data pipelines (pure Column
expressions — JVM-side, whole-stage codegen; no Python UDFs).

These extend the engine beyond the reference's operator set (SURVEY.md §2
covers extraction; a 100 TB training-data pipeline also needs language ID,
quality scoring, token counting, and fingerprinting over the extracted
text). Heuristics follow published corpus-filtering practice (C4/Gopher
style length & stopword rules).

Every function is deliberately expressible in ANSI SQL so the driver's
DuckDB oracle can replay it exactly: normalization, hashing (md5) and
arithmetic are specified to be engine-identical (decimal/int math or
identically-ordered double folds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS_EN",
    "norm_text",
    "tokens",
    "word_count",
    "token_stats",
    "quality_flags",
    "lang_id",
    "lang_id_multi",
    "LANG_STOPWORDS",
    "annotate_quality",
    "fingerprint",
    "repetition_stats",
    "tfidf_top_terms",
    "rolling_hash",
    "winnow_fingerprints",
    "UNICODE_SAMPLES",
    "lang_id_ngram",
    "lang_trigram_sets",
    "with_nfc_text",
    "source_drift",
    "MOJIBAKE_MARKERS",
    "MOJIBAKE_SAMPLES",
    "mojibake_stats",
    "lang_confusion",
]

# Tiny deterministic English stopword list (top function words) — used by
# both the quality heuristic and the language-ID score; mirrored verbatim
# in the DuckDB oracle SQL.
STOPWORDS_EN = (
    "the be to of and a in that have i it for not on with he as you do at "
    "this but his by from they we say her she or an will my one all would "
    "there their what so up out if about who get which go me"
).split()

_WORD_RE = "[A-Za-z0-9]+"
_PUNCT_RE = "[.,;:!?]"


def norm_text(col: Column) -> Column:
    """Deterministic normalization shared by all text operators:
    NULL→'' (so downstream size()/length() never mix NULL semantics
    across engines — Spark's size(NULL) is -1, DuckDB's len(NULL) is
    NULL), lowercase, collapse whitespace runs, trim. Identical
    semantics in DuckDB:
    trim(regexp_replace(lower(coalesce(c, '')), '\\s+', ' ', 'g'))."""
    return F.trim(
        F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\s+", " ")
    )


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(norm_text(col), " ")


def word_count(col: Column) -> Column:
    """BPE-ish regex token count: alnum runs (punct splits words).
    NULL-safe: NULL text counts 0, matching len(regexp_extract_all(
    coalesce(c, ''), ...)) on the oracle side."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(_WORD_RE), 0)
    )


def _staged_tokens(
    docs: DataFrame, text_col: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, _t tokens, _n norm [, extra cols]) as a separate projection
    — tokenization evaluated once per row regardless of how many stats
    reference it downstream (no logical CSE in Catalyst; CollapseProject
    keeps the split for non-cheap multi-referenced producers)."""
    return docs.select(
        "doc_id",
        tokens(F.col(text_col)).alias("_t"),
        norm_text(F.col(text_col)).alias("_n"),
        *extra,
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token statistics (A3/A9 analogue: counts per unit)."""
    pre = _staged_tokens(docs, text_col, extra=(text_col,))
    t = F.col("_t")
    return pre.select(
        "doc_id",
        F.size(t).alias("ws_tokens"),
        word_count(F.col(text_col)).alias("words"),
        F.length(F.col("_n")).alias("norm_chars"),
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(_PUNCT_RE), 0
            )
        ).alias("punct_chars"),
        F.size(F.array_distinct(t)).alias("distinct_tokens"),
    )


def quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style quality gates as boolean columns + the verdict.

    All thresholds integer/boolean so cross-engine comparison is exact;
    mean word length is compared via cross-multiplication (chars vs
    token count) to avoid float division.
    """
    pre = _staged_tokens(docs, text_col)
    t = F.col("_t")
    n_tok = F.size(t)
    n_chars = F.length(F.col("_n"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    len_ok = (n_tok >= F.lit(5)) & (n_tok <= F.lit(100000))
    # mean token length in [2, 12]: 2*n_tok <= n_alpha_chars <= 12*n_tok
    n_word_chars = n_chars - (n_tok - F.lit(1))  # chars minus single spaces
    wlen_ok = (n_word_chars >= F.lit(2) * n_tok) & (
        n_word_chars <= F.lit(12) * n_tok
    )
    # ≥1 stopword per 50 tokens: 50*hits >= n_tok
    stop_ok = F.lit(50) * stop_hits >= n_tok
    return pre.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        len_ok.alias("len_ok"),
        wlen_ok.alias("wlen_ok"),
        stop_ok.alias("stop_ok"),
        (len_ok & wlen_ok & stop_ok).alias("is_quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language score (n-gram-free heuristic: a real deploy
    swaps in per-language stopword lists; the operator shape — vectorized
    membership scan + threshold — is the same). Emits integer evidence and
    the guess, no float ratios."""
    pre = _staged_tokens(docs, text_col)
    t = F.col("_t")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    hits = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_tok = F.size(t)
    guess = F.when(F.lit(20) * hits >= n_tok, F.lit("en")).otherwise(
        F.lit("unknown")
    )
    return pre.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        hits.alias("en_stop_hits"),
        guess.alias("lang_guess"),
    )


# Per-language function-word lists (top frequency-rank words — public
# linguistic knowledge). Deliberately tiny and deterministic; mirrored
# verbatim in the DuckDB oracle. Accented forms stay as written — exact
# UTF-8 token equality in both engines.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": STOPWORDS_EN,
    "de": (
        "der die das und ist ich nicht sie es ein zu er wir den mit sich "
        "auf für als auch an werden aus bei nach wie im einer um am sind "
        "noch nur war haben einen dem des"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como "
        "estar tener le lo todo pero más hacer o poder decir este ir los "
        "las una del al es"
    ).split(),
    "fr": (
        "le la les de des un une et est en que qui dans pour pas sur ne "
        "je il elle nous vous ils au du ce cette mais avec tout faire "
        "plus dire me on mon"
    ).split(),
}


def _in_arr(arr: Column):
    # closure factory, NOT a default-arg lambda: F.filter sniffs the
    # callback arity from the signature, and `lambda x, a=arr:` reads as
    # binary (see CLAUDE.md / round-1 notes)
    return lambda x: F.array_contains(arr, x)


def lang_id_multi(
    docs: DataFrame,
    text_col: str = "text",
    langs: tuple[str, ...] = ("en", "de", "es", "fr"),
) -> DataFrame:
    """Multilingual stopword-evidence language ID: one integer hit-count
    per language (vectorized membership scan over the staged token
    array), guess = first language (in ``langs`` priority order) whose
    hits equal the max, gated at ≥5% of tokens — integer math only, no
    float ratios, same cross-engine recipe as ``lang_id``.

    Scale shape: a single scan-local projection — the per-language
    filters all reference the one materialized token array (_t), so the
    tokenize tree is evaluated once per row however many languages are
    scored."""
    pre = _staged_tokens(docs, text_col)
    t = F.col("_t")
    hit_cols = [
        F.size(
            F.filter(t, _in_arr(F.array(*[F.lit(w) for w in LANG_STOPWORDS[lg]])))
        ).alias(f"{lg}_hits")
        for lg in langs
    ]
    scored = pre.select("doc_id", F.size(t).alias("n_tokens"), *hit_cols)
    best = F.greatest(*[F.col(f"{lg}_hits") for lg in langs])
    guess = F.when(F.lit(20) * best < F.col("n_tokens"), F.lit("unknown"))
    for lg in langs:
        guess = guess.when(F.col(f"{lg}_hits") == best, F.lit(lg))
    return scored.select(
        "doc_id",
        "n_tokens",
        *[f"{lg}_hits" for lg in langs],
        guess.otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def annotate_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All original columns + (n_tokens, is_quality, lang_guess) computed
    as NARROW columns (staged projections, zero shuffle) — the curation
    path's annotator. Same predicates as quality_flags/lang_id; those
    stay as standalone per-doc stat tables, this one rides along with
    the full row so the heavy text column never crosses an exchange."""
    pre = docs.select(
        *docs.columns,
        tokens(F.col(text_col)).alias("_t"),
        norm_text(F.col(text_col)).alias("_n"),
    )
    t = F.col("_t")
    n_tok = F.size(t)
    n_chars = F.length(F.col("_n"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    len_ok = (n_tok >= F.lit(5)) & (n_tok <= F.lit(100000))
    n_word_chars = n_chars - (n_tok - F.lit(1))
    wlen_ok = (n_word_chars >= F.lit(2) * n_tok) & (
        n_word_chars <= F.lit(12) * n_tok
    )
    stop_ok = F.lit(50) * stop_hits >= n_tok
    guess = F.when(F.lit(20) * stop_hits >= n_tok, F.lit("en")).otherwise(
        F.lit("unknown")
    )
    return pre.select(
        *docs.columns,
        n_tok.alias("n_tokens"),
        (len_ok & wlen_ok & stop_ok).alias("is_quality"),
        guess.alias("lang_guess"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition evidence (the standard
    repetition filters of large-corpus curation — duplicate-n-gram
    fraction, modal-n-gram fraction; Rae et al. 2021 §A1.1, C4's
    heuristics): per doc, total / distinct / modal word-n-gram counts
    plus rounded ratios. High ``rep_ratio`` or ``top_gram_frac`` marks
    boilerplate-loop and template pages for the curation gates.

    Relational shape (scale rules): n-grams are exploded and counted by
    (doc_id, md5-hash key) — the gram TEXT never crosses the shuffle,
    only doc_id + a 16-hex key; the count is a partial aggregate
    (map-side combine) and the per-doc rollup reuses the same doc_id
    partitioning. Docs shorter than ``n`` tokens fall back to one
    whole-text gram (mirrors the shingle fallback), so every input doc
    yields exactly one output row."""
    pre = _staged_tokens(docs, text_col)
    t, nm = F.col("_t"), F.col("_n")
    gram = F.when(
        F.size(t) < n, F.array(nm)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        )
    )
    grams = pre.select("doc_id", F.explode_outer(gram).alias("g")).filter(
        F.col("g").isNotNull()
    )
    per_gram = grams.select(
        "doc_id",
        F.substring(F.md5(F.encode(F.col("g"), "UTF-8")), 1, 16).alias("gk"),
    ).groupBy("doc_id", "gk").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.max("c").alias("top_gram_count"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 4
        ).alias("rep_ratio"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_gram_frac"),
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Per-doc top-k terms by tf·idf — the cross-doc pooling operator
    (corpus statistics feeding a per-doc score; keyword metadata for a
    training corpus). Output: (doc_id, rank, term, tf, df, score).

    Relational shape: explode tokens → tf by (doc_id, term) [shuffle on
    short token keys, partial agg]; tf is lazily localCheckpoint-ed so
    BOTH consumers (the df rollup and the score join) read the one
    materialized result — without it, column pruning gives the df
    branch a keys-only aggregate whose exchange never matches for
    reuse, and Spark scans + tokenizes + shuffles the corpus twice
    (verified in the executed plan; the checkpoint trades lineage-based
    recovery of this one stage for running it once — the dup_clusters
    precedent). The checkpointed blocks are released by Spark's
    ContextCleaner when the DataFrame is garbage-collected, so repeated
    invocations in a long-lived session do not accumulate storage. The df side is |vocabulary| rows — broadcastable by AQE
    at any corpus size; the corpus count joins in as a broadcast scalar
    (no driver collect). Score =
    round(tf · ln(N/df), 4) then rank with a term tie-break
    (round-then-rank). Cross-engine note: ln is the one op here without
    a bit-exactness recipe — JVM Math.log and libm may differ in the
    last ulp, so a mismatch needs |a−b| to straddle a 4-decimal rounding
    boundary (~1e-12 probability per value; same accepted residual class
    as the cosine fold)."""
    pre = _staged_tokens(docs, text_col)
    terms = (
        pre.select("doc_id", F.explode_outer("_t").alias("term"))
        .filter(F.col("term").isNotNull())
        .filter(F.col("term") != "")
    )
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def fingerprint(col: Column, prefix_len: int = 16) -> Column:
    """Document fingerprint: md5 of normalized text (stable across
    engines; DuckDB: substr(md5(norm), 1, 16)). The rolling-hash analogue
    of the reference's region ids — content-derived, not positional."""
    return F.substring(F.md5(F.encode(norm_text(col), "UTF-8")), 1, prefix_len)


def _token_hash(tok: Column) -> Column:
    """48-bit int hash of a token: first 12 hex chars of md5 — portable
    (DuckDB: ('0x' || substr(md5(t), 1, 12))::BIGINT; Python:
    ``token_hash48``). The ONE definition of this recipe."""
    return F.conv(
        F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 12), 16, 10
    ).cast("long")


def token_hash48(s: str) -> int:
    """Python-side companion of ``_token_hash`` — same bytes, same 48
    bits (driver-side probe-cell computation, oracle constants)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def rolling_hash(col: Column, mod: int = 1 << 31) -> Column:
    """Order-sensitive rolling document hash: left fold
    h = (h*31 + hash48(token)) mod 2^31 over whitespace tokens.
    Distinguishes permuted documents (md5-of-text also does, but the fold
    is incrementally updatable — the property streaming fingerprinters
    need). Identical fold order in the DuckDB oracle → identical ints."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + _token_hash(t)) % F.lit(mod),
    )


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """MOSS-style winnowing (Schleimer et al., SIGMOD'03): hash every
    k-gram of tokens, slide a window of ``w`` consecutive hashes, keep
    each window's minimum; output the distinct sorted selection.

    Guarantees: any shared run of ≥ w+k-1 tokens between two documents
    yields at least one shared fingerprint — the substring-plagiarism /
    near-dup detector that MinHash (set-based, order-blind) cannot
    express. Staged projections for the same CSE reason as
    dedup.minhash_signatures; everything stays JVM-side."""
    t_df = docs.select("doc_id", tokens(F.col(text_col)).alias("_t"))
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(F.col("_t")) - k, F.lit(0))),
        lambda i: _token_hash(F.array_join(F.slice(F.col("_t"), i + 1, k), " ")),
    )
    h_df = t_df.select("doc_id", gram_hashes.alias("_h"))
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(F.col("_h")) - w, F.lit(0))),
        lambda i: F.array_min(F.slice(F.col("_h"), i + 1, w)),
    )
    return h_df.select(
        "doc_id",
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    )


# planted Unicode-normalization fixtures for the driver query (the
# PII_SAMPLES precedent: the synth corpus is pure ASCII, so without
# planted rows the NFC check would be vacuous)
UNICODE_SAMPLES: list[str] = [
    "café visit",            # e + combining acute -> composed
    "déjà vu",           # already composed (unchanged)
    "Ångström",        # ring + diaeresis decomposed
    "한Å",    # hangul jamo + angstrom sign
    "plain ascii stays put",
]


def with_nfc_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC canonicalization: (doc_id, nfc_text, changed) — the
    text-canonicalization step multilingual web pipelines run before
    hashing/dedup (decomposed and composed accent sequences must not
    produce different fingerprints for identical rendered text).

    Spark has no built-in NFC, so non-ASCII rows go through an
    Arrow-batched mapInPandas over Python's unicodedata — the
    codec-style exception to the no-Python-in-hot-paths rule
    (multimodal.decode precedent); the DuckDB oracle uses its native
    nfc_normalize, empirically identical on the fixture classes
    (combining marks, Hangul jamo, compatibility characters are
    untouched by NFC on both engines). NULL text normalizes to ''
    (engine-wide NULL recipe).

    **ASCII fast path (r4):** NFC is the identity on pure-ASCII text,
    so ASCII rows are answered scan-locally (nfc_text = text,
    changed = false) and never cross the Arrow boundary — the Python
    round-trip cost becomes proportional to the NON-ASCII row count,
    not the corpus. On an English-heavy web corpus that's the
    difference between "every byte serialized twice" and "a few
    percent of rows"; measured 6.6 s → sub-second at sf0.1. The
    routing predicate is a codegen rlike over the staged text; the
    input is scanned once per branch with pruned columns (doc_id,
    text only)."""
    out_schema = "doc_id long, nfc_text string, changed boolean"

    staged = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("_t")
    )
    non_ascii = F.col("_t").rlike("[^\\x00-\\x7F]")

    fast = staged.filter(~non_ascii).select(
        "doc_id",
        F.col("_t").alias("nfc_text"),
        F.lit(False).alias("changed"),
    )

    def run(batches):
        import unicodedata

        for pdf in batches:
            src = pdf["_t"]
            nfc = src.map(lambda t: unicodedata.normalize("NFC", t))
            yield pdf.assign(nfc_text=nfc, changed=(nfc != src))[
                ["doc_id", "nfc_text", "changed"]
            ]

    slow = staged.filter(non_ascii).mapInPandas(run, out_schema)
    return fast.unionByName(slow)


def lang_trigram_sets(top: int = 30) -> dict[str, list[str]]:
    """Per-language character-trigram profiles, derived
    deterministically from LANG_STOPWORDS (trigrams of the
    space-joined function words, top-``top`` by count with a
    lexicographic tie-break) — the same list regenerates in any
    engine/oracle, no hand-maintained tables."""
    from collections import Counter

    out: dict[str, list[str]] = {}
    for lang, words in LANG_STOPWORDS.items():
        s = " " + " ".join(words) + " "
        counts = Counter(s[i : i + 3] for i in range(len(s) - 2))
        out[lang] = [
            g
            for g, _ in sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:top]
        ]
    return out


def lang_id_ngram(
    docs: DataFrame,
    text_col: str = "text",
    langs: tuple[str, ...] = ("en", "de", "es", "fr"),
) -> DataFrame:
    """Character-n-gram language ID (the classic n-gram-profile
    heuristic, textcat-style): the padded normalized text's trigrams
    are scored against each language's function-word trigram profile;
    guess = argmax hits with ``langs``-order priority on ties, or
    'unknown' when nothing matches. Complements the token-level
    ``lang_id_multi`` — n-gram profiles catch inflected/compounded
    forms whole-token stopword matching misses.

    Execution: the trigram array is materialized once (staged
    projection, no CSE), exploded with ``explode_outer`` (the
    InferFiltersFromGenerate rule would otherwise push the whole
    padded/transform tree into a re-inlined Filter), LEFT-joined
    against a ~120-row broadcast (trigram, lang) lookup, and
    conditional-counted per language under one partial-aggregated
    groupBy — only (doc_id, 4 bigint counts) cross the exchange.
    The left join keeps zero-hit and empty-text docs alive (their
    explode_outer row carries a NULL trigram / NULL lang), so no
    second scan of ``docs`` is needed to restore them. This replaces
    the original per-trigram higher-order-function membership scan
    (~120 interpreted CodegenFallback comparisons per trigram,
    BASELINE.md r3 note) with hash-join + count that stay inside
    whole-stage codegen. Integer evidence only."""
    sets = lang_trigram_sets()
    lookup = docs.sparkSession.createDataFrame(
        [(g, lang) for lang in langs for g in sets[lang]],
        "_tri string, _lang string",
    )
    padded = F.concat(F.lit(" "), norm_text(F.col(text_col)), F.lit(" "))
    staged = docs.select("doc_id", padded.alias("_p"))
    tri = F.when(
        F.length("_p") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length("_p") - F.lit(2)),
            lambda i: F.substr(F.col("_p"), i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = staged.select(
        "doc_id", F.explode_outer(tri).alias("_tri")
    )
    staged3 = (
        exploded.join(F.broadcast(lookup), "_tri", "left")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("_lang") == lang, 1).otherwise(0)
                ).alias(f"hits_{lang}")
                for lang in langs
            ]
        )
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"hits_{lang}").alias("h"),
                    F.lit(-i).alias("p"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(langs)
            ]
        )
    )
    return staged3.select(
        "doc_id",
        *[f"hits_{lang}" for lang in langs],
        F.when(best.getField("h") > 0, best.getField("lang"))
        .otherwise("unknown")
        .alias("lang_guess"),
    )


def source_drift(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus — total
    variation distance, the standard distribution-shift audit run
    before per-source mixing weights are set (and the alarm that fires
    when one feed's crawler breaks and starts emitting boilerplate):

        TVD(g) = 1/2 * sum_t | cnt_g(t)/N_g  -  cnt(t)/N |

    reported exactly in basis points via pure integer math:

        tvd_bp = (10000 * D_g) div (2 * N_g * N)
        D_g    = sum_{t in V_g} |cnt_g(t)*N - cnt(t)*N_g|
               + N_g * (N - C_g)

    where V_g is the group's vocabulary and C_g = sum_{t in V_g} cnt(t)
    is the CORPUS mass of the group's types — the second term folds in
    every token the group never emits analytically, so no outer join
    over the full vocabulary per group is ever built. 0 bp = the source
    is distributionally identical to the corpus; 10000 bp = disjoint.

    Output: (grp, n_tokens, vocab_g, tvd_bp), grp aliased from
    ``group_col``; all counters bigint.

    Scale shape (10^12 docs): one tokenize pass feeds both count
    aggregations (checkpointed short-key frame); shuffles carry
    (thash 16-hex, group, bigint) only; the per-group reduction is a
    groupBy over group keys (|groups| rows out). INTEGER RANGE: the
    products cnt*N_g are bounded by N*N_g — exact through ~10^9 corpus
    tokens per side; beyond that, run per shard (per-day / per-dump
    slices, which is how drift is monitored operationally anyway) or
    swap the exact products for double frequencies (drift is a
    diagnostic; 1e-15 relative error is immaterial — the integer form
    is the ORACLE-exact definition at validation scale).

    DuckDB oracle: `q: cur_source_drift`.
    """
    keyed = (
        docs.select(F.col(group_col).alias("grp"), F.col(text_col).alias("_t"))
        .select("grp", tokens(F.col("_t")).alias("toks"))
        .select("grp", F.explode_outer("toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .select(
            "grp",
            F.substring(F.md5(F.encode(F.col("tok"), "UTF-8")), 1, 16).alias(
                "thash"
            ),
        )
        .localCheckpoint(eager=False)
    )
    gcnt = keyed.groupBy("grp", "thash").agg(
        F.count(F.lit(1)).alias("cnt_g")
    )
    ccnt = keyed.groupBy("thash").agg(F.count(F.lit(1)).alias("cnt"))
    totals = gcnt.groupBy("grp").agg(
        F.sum("cnt_g").alias("n_g"), F.count(F.lit(1)).alias("vocab_g")
    )
    stats = ccnt.agg(F.sum("cnt").alias("n_total"))
    joined = (
        gcnt.join(ccnt, "thash")
        .join(totals, "grp")
        .crossJoin(F.broadcast(stats))
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.first("n_g").alias("n_tokens"),
            F.first("vocab_g").alias("vocab_g"),
            F.sum(F.abs(F.col("cnt_g") * F.col("n_total") - F.col("cnt") * F.col("n_g"))).alias("_d_in"),
            F.sum("cnt").alias("_c_g"),
            F.first("n_total").alias("_n"),
        )
        .select(
            "grp",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab_g").cast("long").alias("vocab_g"),
            F.expr(
                "(10000 * (_d_in + n_tokens * (_n - _c_g)))"
                " div (2 * n_tokens * _n)"
            ).alias("tvd_bp"),
        )
    )


# Classic UTF-8-decoded-as-Latin-1/cp1252 signature sequences (the
# ftfy heuristic, Speer 2019 "ftfy: fixes text for you" -- these byte
# pairs/triples are vanishingly rare in intentional text but are
# exactly what e-acute, curly quotes, degree signs, NBSP, the BOM and
# emoji turn into after one round of the wrong decode). LITERAL
# substrings, counted with replace() arithmetic on both engines --
# zero regex-dialect risk. Written as \u escapes so the source stays
# ASCII-clean.
MOJIBAKE_MARKERS: list[str] = [
    "\u00e2\u20ac",          # a-circ + euro: any U+2018-range punct
    "\u00c3\u00a9",          # A-tilde + copyright-ish: e-acute
    "\u00c3\u00a8",          # e-grave
    "\u00c3\u00bc",          # u-umlaut
    "\u00c3\u00b1",          # n-tilde
    "\u00c3\u00a7",          # c-cedilla
    "\u00c3\u00b3",          # o-acute
    "\u00c2\u0020",          # A-circ + space: NBSP
    "\u00c2\u00b0",          # degree sign
    "\u00c2\u00bb",          # right guillemet
    "\u00ef\u00bb\u00bf",   # UTF-8 BOM
    "\u00f0\u0178",          # emoji lead bytes
]

# Fixture corpus for the driver query (UNICODE_SAMPLES precedent --
# the synth corpus is pure ASCII, so the rule is vacuous without
# planted rows; single source of truth for BOTH engines).
MOJIBAKE_SAMPLES: list[str] = [
    "it\u00e2\u20ac\u2122s a broken apostrophe",
    "caf\u00c3\u00a9 au lait",
    "\u00ef\u00bb\u00bfleading bom",
    "100\u00c2\u00b0 and \u00c2\u00bbquotes",
    "clean ascii stays clean",
    "na\u00c3\u00afve \u00e2\u20ac\u0153double quoted\u00e2\u20ac\u009d",
    "\u00f0\u0178\u02dc\u20ac mangled emoji",
    "d\u00e9j\u00e0 vu is FINE real utf-8",
]


def mojibake_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mojibake (double-encoded UTF-8) detection -- the encoding-repair
    triage flag of web-corpus cleanup (ftfy's core heuristic): count
    occurrences of the MOJIBAKE_MARKERS signature substrings in the
    RAW text (pre-normalization -- normalization must not mask broken
    decodes). Output: (doc_id, n_hits, mojibake) with mojibake =
    n_hits > 0; route flagged docs to a re-decode pass, don't silently
    drop them (the text is usually recoverable).

    Per-marker count is pure replace() arithmetic --
    (len(t) - len(replace(t, m, ''))) / len(m) -- summed over the fixed
    marker list: literal substrings on both engines, NO regex, so
    Java/RE2 dialect drift is structurally impossible (the lesson the
    CLAUDE.md ASCII-\\s recipe teaches). Scan-local, codegen, no
    shuffle; cost is a dozen replace passes over the text column,
    fused in one whole-stage-codegen projection.

    DuckDB oracle: `q: ts_mojibake` (markers + planted MOJIBAKE_SAMPLES
    fixtures inlined on both sides -- the synth corpus is pure ASCII).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_hits = F.lit(0)
    for m in MOJIBAKE_MARKERS:
        n_hits = n_hits + (
            (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit(""))))
            / F.lit(len(m))
        ).cast("long")
    return docs.select(
        "doc_id",
        n_hits.cast("long").alias("n_hits"),
        (n_hits > 0).alias("mojibake"),
    )


def lang_confusion(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Language-ID evaluation against the corpus labels: the confusion
    rollup reduced to per-class precision / recall / F1 in basis points
    — the quality report a curation team reads before trusting a
    language gate (mis-ID'ed docs leak across per-language pipelines).
    Guesses come from :func:`lang_id_multi` on the same rows.

    For each TRUE class L: tp = n(L, L); fp = predicted-L mass from
    other classes; fn = L's mass guessed elsewhere;
    precision_bp = (10000*tp) div max(tp+fp, 1) (0 when nothing was
    predicted L), recall_bp likewise over tp+fn, f1_bp the harmonic
    mean computed IN basis points: (2*p*r) div max(p+r, 1) — integer
    end to end.

    Output: (lang, tp, fp, fn, precision_bp, recall_bp, f1_bp), one row
    per distinct true label.

    Scale shape: one scan-local lang-ID projection; the confusion
    matrix is a groupBy over (label, guess) shorts — at most
    |labels| x |guesses| rows leave the aggregation; everything after
    runs on that tiny frame.

    DuckDB oracle: `q: ts_lang_confusion`.
    """
    guesses = lang_id_multi(docs, text_col=text_col).select(
        "doc_id", "lang_guess"
    )
    conf = (
        docs.select("doc_id", F.col(label_col).alias("lang"))
        .join(guesses, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tp = conf.filter(F.col("lang") == F.col("lang_guess")).select(
        "lang", F.col("n").alias("tp")
    )
    row_tot = conf.groupBy("lang").agg(F.sum("n").alias("n_true"))
    col_tot = conf.groupBy("lang_guess").agg(F.sum("n").alias("n_pred"))
    out = (
        row_tot.join(tp, "lang", "left")
        .join(
            col_tot.withColumnRenamed("lang_guess", "lang"), "lang", "left"
        )
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.col("n_true") - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    return out.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.expr("(10000 * tp) div greatest(tp + fp, 1)")
        .cast("long")
        .alias("precision_bp"),
        F.expr("(10000 * tp) div greatest(tp + fn, 1)")
        .cast("long")
        .alias("recall_bp"),
    ).withColumn(
        "f1_bp",
        F.expr(
            "(2 * precision_bp * recall_bp)"
            " div greatest(precision_bp + recall_bp, 1)"
        ).cast("long"),
    )
