"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all built-in
column expressions (JVM-side, whole-stage codegen), zero Python UDFs, so
they stream through a 100 TB corpus at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.materialize import materialize

# small multilingual marker-word lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "las", "es", "una", "que"],
    "fr": ["le", "la", "les", "est", "une", "dans", "que"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char counts, average token length per document.

    Tokens are materialized in a prior projection: higher-order /
    repeated array expressions are interpreted and re-evaluated when
    inlined (see dedup_text._shingle_expr) — alias once, use many."""
    non_ws_chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return (
        df.withColumn("__toks", tokens(text_col))
        .select(
            "*",
            F.size("__toks").cast("long").alias("n_tokens"),
            F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
            F.round(non_ws_chars / F.size("__toks"), 4).alias("avg_token_len"),
        )
        .drop("__toks")
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: type-token ratio (vocabulary
    diversity), stopword ratio, length band. Deterministic arithmetic on
    integer counts so oracle comparison is exact."""
    toks = F.col("__toks")
    n = F.size(toks)
    distinct_n = F.size(F.array_distinct(toks))
    stop_n = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return (
        df.withColumn("__toks", tokens(text_col))
        .withColumn("__n", n)
        .withColumn("__d", distinct_n)
        .withColumn("__s", stop_n)
        .select(
            "*",
            F.round(F.col("__d") / F.col("__n"), 6).alias("type_token_ratio"),
            F.round(F.col("__s") / F.col("__n"), 6).alias("stopword_ratio"),
            F.round(
                (F.col("__d") / F.col("__n")) * 0.6
                + (F.col("__s") / F.col("__n")) * 0.2
                + F.least(F.col("__n") / F.lit(100.0), F.lit(1.0)) * 0.2,
                6,
            ).alias("quality_score"),
        )
        .drop("__toks", "__n", "__d", "__s")
    )


def _marker_hits(toks, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count marker hits per language, predict
    the argmax (ties broken by a fixed language order). Pure column
    expressions — the argmax is a chained greatest/when."""
    langs = list(LANG_MARKERS)
    with_toks = df.withColumn("__toks", tokens(text_col))
    # materialize the per-language hit counts before the argmax reuses
    # each of them several times
    with_hits = with_toks.select(
        "*",
        *[
            _marker_hits(F.col("__toks"), LANG_MARKERS[lang])
            .cast("long")
            .alias(f"hits_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("unknown")
    # build when-chain in reverse so earlier langs win ties
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), lang
        ).otherwise(pred)
    return with_hits.select("*", pred.alias("predicted_lang")).drop("__toks")


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token bag. Two docs with the same vocabulary collide —
    the cheap first-stage near-dup key."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        F.md5(F.col(text_col)).alias("exact_fingerprint"),
        bag_fingerprint(text_col).alias("bag_fingerprint"),
    )


def rolling_hash(toks_col: str, *, base: int = 31, mod: int = 2147483647) -> Column:
    """Order-SENSITIVE document fingerprint: polynomial rolling hash
    over per-token crc32 codes, folded left-to-right with modular
    arithmetic kept under 2^36 (no overflow in either long or int64
    semantics). Complements bag_fingerprint (order-insensitive): equal
    bags with different word order get different rolling hashes."""
    return F.aggregate(
        F.col(toks_col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + F.crc32(t.cast("binary"))) % mod,
    )


def rolling_hash_md5(
    toks_col: str, *, base: int = 31, mod: int = 2147483647
) -> Column:
    """Engine-portable rolling hash: per-token code = 60-bit integer
    from md5 (instead of crc32, which DuckDB lacks), same left-to-right
    polynomial fold. acc < mod < 2^31, so acc*base + code < 2^36 + 2^60
    — no int64 overflow in either engine. DuckDB replicates it with
    list_reduce over list_transform(md5 hex-parse)."""
    codes = F.transform(
        F.col(toks_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % mod,
    )


def with_rolling_fingerprint(
    df: DataFrame, text_col: str = "text", *, hash_method: str = "crc32"
) -> DataFrame:
    h = (
        rolling_hash_md5("__toks")
        if hash_method == "md5"
        else rolling_hash("__toks")
    )
    return (
        df.withColumn("__toks", tokens(text_col))
        .withColumn("rolling_hash", h)
        .drop("__toks")
    )


def tfidf_top_terms(
    df: DataFrame, *, id_col: str, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing — never zero,
    never divides by zero). The large-corpus keyword/feature extractor.

    Scale shape: explode -> one hash aggregation (term frequency per
    doc) -> document frequency as a COUNT window over term (no
    self-join: a groupBy+join formulation costs 4 extra Exchanges) ->
    broadcast the scalar N -> per-doc window top-k. Three shuffles
    total, each on a natural key; no UDFs. Scores are rounded to 6dp
    BEFORE ranking (round-then-tiebreak rule) with the term as the
    unique tiebreaker, so rankings are deterministic and
    engine-portable.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
    tf = (
        tok.select("__id", F.explode("__toks").alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n))
        .select(
            "__id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )

    w = Window.partitionBy("__id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__id").alias(id_col), "term", "tf", "score", "rank")
    )


def with_repetition(
    df: DataFrame, *, id_col: str, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher/C4-style repetition signals per document: the fraction of
    word n-grams that are duplicates (`dup_ngram_ratio` = 1 - distinct/
    total) and the share held by the single most repeated n-gram
    (`top_ngram_share`). High values mark boilerplate/spam that
    length- and vocabulary-based scores miss. One explode + one
    two-level aggregation — shuffles on (doc, gram) then doc, both
    partial-aggregated map-side. Docs shorter than n tokens report 0.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    sz = F.size("__toks")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("__toks", i + k) for k in range(n)]
    )
    grams = toks.select(
        "__id",
        F.explode(
            F.when(
                sz >= n, F.transform(F.sequence(F.lit(1), sz - (n - 1)), gram)
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    per_gram = grams.groupBy("__id", "gram").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_doc = per_gram.groupBy("__id").agg(
        F.sum("__c").alias("__t"),
        F.count(F.lit(1)).alias("__d"),
        F.max("__c").alias("__m"),
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(
                F.round((F.col("__t") - F.col("__d")) / F.col("__t"), 6),
                F.lit(0.0),
            ).alias("dup_ngram_ratio"),
            F.coalesce(
                F.round(F.col("__m") / F.col("__t"), 6), F.lit(0.0)
            ).alias("top_ngram_share"),
        )
    )


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9]+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """GPT-2-style pre-tokenization, simplified to an engine-portable
    regex (no lookahead — RE2-safe): letter runs, SINGLE digits (the
    digit-splitting LLM tokenizers do), and punctuation runs. The
    second token-counting mode next to whitespace `tokens()`
    (SURVEY north star: "whitespace + a BPE-ish regex")."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0))


# -- normalization tier (pre-shingling) ------------------------------------

NONWORD_RUN = r"[^\p{L}\p{N}]+"


def nfc(col: Column | str) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF.

    Spark SQL has no built-in Unicode normalizer, so this is the one
    deliberate Python hop in the text tier — vectorized (one
    ``unicodedata.normalize`` per value inside an Arrow batch, never
    per-row pickling). Equivalent to DuckDB's ``nfc_normalize``.
    """
    import pandas as pd  # noqa: F401  (typing only)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


def normalize_text(
    col: Column | str,
    *,
    use_nfc: bool = True,
    casefold: bool = True,
    collapse_nonword: bool = True,
) -> Column:
    """Canonical text for dedup/shingling: lowercase -> Unicode NFC ->
    collapse every non-letter/digit run to one space -> trim.

    Without this tier, MinHash/SimHash/n-gram dedup treats "Hello,
    World!" and "hello world" as different documents — the first thing
    a mixed-case web corpus breaks. All steps except NFC are JVM
    expressions; order matches the DuckDB oracle
    (``nfc_normalize(lower(text))``) exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    if casefold:
        c = F.lower(c)
    if use_nfc:
        c = nfc(c)
    if collapse_nonword:
        c = F.trim(F.regexp_replace(c, NONWORD_RUN, " "))
    return c


# -- PII redaction (pre-training scrub) ------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement) — applied in order, all RE2-safe (no
    # lookbehind) so the same patterns run on Spark, DuckDB, and RE2
    # engines. Order matters: emails before bare domains would.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(col: Column | str) -> Column:
    """Chained regexp_replace over the PII pattern table — emails,
    phone numbers, IPv4s, SSNs to typed placeholders. Pure JVM
    expressions (one codegen span); patterns are deliberately
    lookaround-free so external engines replay them byte-for-byte.
    The standard pre-training scrub pass (public corpora ship with
    exactly this class of regex redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-class match counts (audit trail for the scrub)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, p, _ in PII_PATTERNS
    ]


def char_entropy(col: Column | str, *, round_dp: int = 6) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    cheap perplexity proxy: near-0 for degenerate repetition, ~4.2 for
    typical English, higher for random bytes. Computed entirely with
    array expressions: split to chars -> distinct -> per-char count via
    filter+size -> -Σ p·log2 p. No shuffle, no UDF — runs at scan
    speed per document."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    n = F.size(chars)
    # sorted fold: float addition isn't associative, so both this and
    # the SQL oracle accumulate terms in ascending char order — the
    # sums are then bit-identical, not merely close
    uniq = F.array_sort(F.array_distinct(chars))
    p = lambda ch: F.size(F.filter(chars, lambda x: x == ch)) / n  # noqa: E731
    ent = F.aggregate(
        uniq,
        F.lit(0.0),
        lambda acc, ch: acc - p(ch) * F.log2(p(ch)),
    )
    return F.round(F.when(n > 0, ent).otherwise(F.lit(0.0)), round_dp)


def char_bigram_lm_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_chars: int = 1000,
) -> DataFrame:
    """Statistical LM quality score (the CCNet-style filter, made
    integer-exact): train a character-bigram frequency table on the
    corpus itself, then score each document by the corpus frequency of
    its own bigrams — natural text reuses the corpus's common bigrams,
    while mojibake/binary-spill/gibberish is built from rare ones and
    scores low. The perplexity variant sums log-probs; summing raw
    corpus COUNTS is monotone for filtering and keeps every value an
    exact integer (no cross-engine float/log drift — the discipline the
    oracle hash demands).

    Scale shape: documents are truncated to ``head_chars`` before the
    bigram explode (the standard LM-filter move — quality is a
    property of the prose, not its length), the bigram LM is a tiny
    aggregate (~|alphabet|^2 rows) joined BROADCAST so scoring never
    shuffles bigram rows; the only wide exchange is the per-doc
    re-aggregation, which partial-aggregates map-side to one row per
    doc per partition.

    Output: id_col, n_bigrams, freq_sum (both BIGINT; the mean
    frequency freq_sum/n_bigrams is derivable and intentionally not
    emitted as a rounded double).
    """
    d = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, head_chars).alias("__t"),
    )
    # sequence(1, n-1) would flip to a DESCENDING sequence when n < 2
    # (Spark infers step -1), so short docs get an explicit empty array
    bigrams = F.when(
        F.char_length("__t") >= 2,
        F.expr("transform(sequence(1, char_length(__t) - 1), "
               "i -> substring(__t, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    b = d.select(F.col(id_col), F.explode(bigrams).alias("__bg"))
    lm = b.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c"))
    return (
        b.join(F.broadcast(lm), "__bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__c").alias("freq_sum"),
        )
    )


def lm_quality_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    head_chars: int = 1000,
    scale: int = 10**6,
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.
    2020 §4.4): per language, rank documents by LM score and split the
    ranking into thirds — "head" (most language-model-typical) is what
    CCNet keeps for LM pretraining, "tail" is the gibberish end. The
    LM score is char_bigram_lm_score's integer-exact corpus-frequency
    proxy (higher mean bigram frequency = more typical prose; CCNet's
    perplexity is the log-space analog and ranks identically for
    filtering purposes).

    Determinism/scale contract:
    - score_key = freq_sum * scale div n_bigrams — pure int64
      arithmetic on both engines (`div`, not floor(double /), which
      loses exactness past 2^53). Caller must keep
      freq_sum * scale < 2^63: at the default ppm scale that allows
      freq_sum up to ~9.2e12; for corpora whose bigram LM counts
      exceed that (a 100 TB crawl), pass scale=10**3 or train the LM
      on a fixed-size sample — the ranking only needs relative order.
    - Buckets are assigned by SCORE CUTOFFS, not per-doc rank: with
      `above` = #docs of the same language with strictly greater
      score_key, a doc is head iff 3*above < n_lang, middle iff
      3*above < 2*n_lang, else tail (ties share a bucket, exact
      thirds up to tie granularity — the same contract as CCNet's
      percentile thresholds).
    - Scale shape: NO corpus-wide sort. The ranking runs on the
      (lang, score_key) HISTOGRAM — bounded by |langs| x |distinct
      scores| (value-space, not corpus-sized) — and the per-doc
      bucket assignment is a broadcast join back on
      (lang, score_key). A Window.partitionBy(lang).orderBy over the
      raw docs would put 40%+ of a real crawl in one partition; the
      histogram cumsum never sees a fact-sized partition.

    Output: id, lang, n_bigrams, freq_sum, score_key, bucket.
    """
    from pyspark.sql import Window

    scored = (
        char_bigram_lm_score(
            df, id_col=id_col, text_col=text_col, head_chars=head_chars
        )
        .join(df.select(F.col(id_col), F.col(lang_col).alias("lang")), id_col)
        .select(
            F.col(id_col),
            "lang",
            "n_bigrams",
            "freq_sum",
            F.expr(f"freq_sum * {scale} div n_bigrams").alias("score_key"),
        )
        # scored feeds BOTH the histogram (broadcast build side) and the
        # final probe side; without lineage truncation Catalyst expands
        # the whole bigram explode + LM-join subtree once per reference
        # (4 Generate nodes in the physical plan, measured ~2x the
        # query). Values unchanged — plan-shape only (guide §1.2 step 1:
        # don't compute things twice).
        .transform(materialize)
    )
    hist = scored.groupBy("lang", "score_key").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_desc = (
        Window.partitionBy("lang")
        .orderBy(F.col("score_key").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cut = hist.select(
        "lang",
        "score_key",
        (F.sum("__cnt").over(w_desc) - F.col("__cnt")).alias("__above"),
        F.sum("__cnt").over(w_all).alias("__n"),
    ).select(
        "lang",
        "score_key",
        F.when(3 * F.col("__above") < F.col("__n"), F.lit("head"))
        .when(3 * F.col("__above") < 2 * F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return scored.join(F.broadcast(cut), ["lang", "score_key"]).select(
        F.col(id_col), "lang", "n_bigrams", "freq_sum", "score_key", "bucket"
    )


BOILERPLATE_LINE = r"::(nav|footer)::"


def trim_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 4,
    boilerplate_pattern: str = BOILERPLATE_LINE,
) -> DataFrame:
    """Line-level quality trimming (the C4/FineWeb move: most web junk
    is line-granular — nav menus, cookie banners, footers — so filter
    LINES, not whole documents, and reassemble the survivors).

    A line is dropped when it has fewer than ``min_tokens`` whitespace
    tokens or matches ``boilerplate_pattern``. Returns one row per doc:
    (id, n_lines, n_kept, trimmed_text).

    Scale shape: split -> filter -> array_join is a single narrow
    projection — no explode, no shuffle, no UDF; text volume never
    leaves its scan partition. Reference has no line-level stage (its
    corpus is row-per-record pandas); this extends the training-data
    surface per the LLM-pipeline brief.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: (
            (F.size(F.split(F.trim(ln), r"\s+")) >= min_tokens)
            & ~ln.rlike(boilerplate_pattern)
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("trimmed_text"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-size token windows with overlap (window - stride tokens):
    the standard context-window chunking step before embedding or LM
    training when documents exceed the model's sequence length.

    One narrow projection + one explode — no shuffle, no UDF: chunk
    starts are a `sequence(1, n_tokens, stride)` array, each chunk a
    `slice` of the (aliased-once) token array. Output one row per
    chunk: (id, chunk_id, start_pos, n_tokens, chunk_text) with
    1-based start positions; the trailing chunk is shorter than
    `window` rather than dropped (nothing is lost; dedupe downstream
    handles near-identical tails).
    """
    t = df.withColumn("__toks", tokens(text_col))
    n = F.size("__toks")
    ch = t.select(
        id_col,
        "__toks",
        F.posexplode(F.sequence(F.lit(1), n, F.lit(stride))).alias(
            "chunk_id", "start_pos"
        ),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_pos"), window)
    return ch.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def dsir_importance_rank(
    df: DataFrame,
    *,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_chars: int = 1000,
    k: int = 100,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    on hashed character-bigram features: rank every document by how
    much more target-like than corpus-average its bigrams are, and
    keep the top k — the public-recipe way to skew a 100 TB crawl
    toward a target domain without training a classifier.

    This is the frequency-ratio variant: per doc we sum the TARGET
    corpus count and the FULL-corpus count of its bigrams (both exact
    BIGINTs, same integer discipline as char_bigram_lm_score) and
    order by the ratio tgt_sum/src_sum. The ratio is a single IEEE
    division — deterministic on any engine — and only integer sums
    plus the integer rank are emitted, so the output is hash-stable.

    Scale shape: one bigram explode feeds BOTH frequency tables; each
    LM is ~|alphabet|^2 rows joined broadcast; the wide exchange is
    the per-doc sum (map-side partial agg). The top-k is
    TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(id_col),
        target_pred.alias("__is_tgt"),
        F.substring(F.col(text_col), 1, head_chars).alias("__t"),
    )
    bigrams = F.when(
        F.char_length("__t") >= 2,
        F.expr("transform(sequence(1, char_length(__t) - 1), "
               "i -> substring(__t, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    b = d.select(F.col(id_col), "__is_tgt", F.explode(bigrams).alias("__bg"))
    lm_src = b.groupBy("__bg").agg(F.count(F.lit(1)).alias("__src_c"))
    lm_tgt = (
        b.where(F.col("__is_tgt"))
        .groupBy("__bg")
        .agg(F.count(F.lit(1)).alias("__tgt_c"))
    )
    scored = (
        b.join(F.broadcast(lm_src), "__bg")
        .join(F.broadcast(lm_tgt), "__bg", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("__tgt_c"), F.lit(0)))
            .cast("long")
            .alias("tgt_sum"),
            F.sum("__src_c").cast("long").alias("src_sum"),
        )
    )
    ratio = F.col("tgt_sum").cast("double") / F.col("src_sum").cast("double")
    top = scored.orderBy(
        ratio.desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(ratio.desc(), F.col(id_col).asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select(id_col, "n_bigrams", "tgt_sum", "src_sum", "rank")


# Cyrillic -> Latin homoglyphs (the high-frequency confusables from
# UTS #39's confusable table; the full table is data-driven — extend
# the two parallel strings below to widen coverage).
_CONFUSABLE_SRC = "аеорсхіѕук"
_CONFUSABLE_DST = "aeopcxisyk"
_ZERO_WIDTH = "​‌‍﻿"


def skeleton_key(col: Column | str) -> Column:
    """Confusable-skeleton dedup key (UTS #39 'skeleton' idea, the
    anti-spam/anti-evasion normalization): lowercase, strip zero-width
    characters, map common Cyrillic homoglyphs onto their Latin
    lookalikes, collapse whitespace. Two texts that differ only by
    homoglyph substitution — the standard trick to evade exact-hash
    dedup and blocklists — collapse to the same key.

    Pure Catalyst (lower/translate/regexp_replace/trim): map-side at
    scan speed; feed the key into exact_dup_groups exactly like the
    normalized-text tier.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    s = F.translate(s, _ZERO_WIDTH, "")
    s = F.translate(s, _CONFUSABLE_SRC, _CONFUSABLE_DST)
    return F.trim(F.regexp_replace(s, r"\s+", " "))
