"""Text-analysis operators for training-data pipelines (X5 + §2.8 mandate).

The reference has no text processing (its corpus is dense vectors); these are
the north-star LLM-pipeline operators, all pure Catalyst expressions — no
Python in the row path, so they run whole-stage-codegen'd over 100 TB of
documents:

- tokenization + token counting (whitespace and BPE-ish regex)
- language ID: stopword-dictionary voting (n-gram heuristic class)
- quality scoring: length / punctuation / stopword / token-shape signals
- document fingerprinting: winnowing-style min-hash over rolling k-grams
  plus a normalized-content hash

Every operator has an exact ANSI-SQL twin in queries.py (the dictionaries are
inlined literals on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword dictionaries (public common words). Deliberately
# small and inlined: the operator's shape (dictionary voting) is the point;
# swap in real dictionaries at deployment.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "en": ("the", "a", "of", "and", "is", "not", "with", "to", "in", "for"),
    "es": ("el", "la", "de", "y", "es", "no", "con", "un", "una", "en"),
    "fr": ("le", "la", "de", "et", "est", "pas", "avec", "un", "une", "dans"),
    "zh": ("的", "是", "不", "和", "在", "了", "有", "我", "他", "这"),
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  # BPE-ish: words | numbers | symbols


def tokens(text: Column) -> Column:
    """Whitespace tokens (lowercased)."""
    return F.split(F.lower(text), " ")


def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter-runs, digit-runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) that are stopwords of `lang`."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stop, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, lang) for lang in sorted(STOPWORDS)}


def predicted_lang(text: Column) -> Column:
    """Dictionary-voting language ID; ties break to the alphabetically first
    language; zero hits everywhere -> 'und' (undetermined)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0, 1]: rewards mid-length docs, prose-like
    token shapes, low symbol noise. Deterministic arithmetic only.

    score = 0.4 * min(1, n_tokens / 50)
          + 0.3 * (letter_tokens / tokens)
          + 0.3 * (1 - symbol_chars / chars)
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    letter_toks = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
    n_chars = F.length(text)
    sym_chars = n_chars - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / 50)
        + F.lit(0.3) * (letter_toks.cast("double") / F.greatest(n_tok, F.lit(1)))
        + F.lit(0.3) * (F.lit(1.0) - sym_chars.cast("double") / F.greatest(n_chars, F.lit(1)))
    )
    return F.round(score, 6)


def normalized_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, squeeze whitespace — the
    canonical form both fingerprints hash."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def content_fingerprint(text: Column) -> Column:
    """md5 of the normalized text — robust exact-dup fingerprint."""
    return F.md5(normalized_text(text).cast("binary"))


def winnow_fingerprint(text: Column, k: int = 5) -> Column:
    """Winnowing-style rolling fingerprint: minimum md5 over all k-token
    rolling windows of the normalized text. Documents sharing any long run
    of tokens tend to share the minimizing window — the SQL-expressible core
    of the Winnowing/MOSS rolling-hash family."""
    toks = F.split(normalized_text(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    # get(): short docs yield one partial window (concat_ws skips NULLs)
    # instead of an ANSI INVALID_ARRAY_INDEX error under Spark 4 defaults
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)])
    )
    return F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))


def repetition_signals(text: Column) -> dict[str, Column]:
    """Repetition-based quality signals (Gopher-rule analogs adapted to the
    fixture's line-less token streams): heavily repetitive documents are the
    classic low-quality / machine-generated tell.

    - type_token_ratio: distinct tokens / tokens (low = repetitive)
    - top_bigram_frac: occurrences of the most frequent token bigram over
      all bigram positions
    - rep3_frac: fraction of trigram positions whose trigram occurs more
      than once in the document

    All three are pure per-row expressions over the document's OWN tokens —
    map-side, zero shuffle at any corpus size (the O(distinct x n) inner
    scans are over one document, not the corpus). Rounded to 6 per the
    float policy.
    """
    toks = tokens(text)
    n = F.size(toks)

    def grams(k: int) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        # get(): NULL past the end on short docs, not an ANSI index error
        return F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)])
        )

    bg, tg = grams(2), grams(3)
    top_bigram = F.array_max(
        F.transform(F.array_distinct(bg), lambda b: F.size(F.filter(bg, lambda x: x == b)))
    )
    rep3 = F.size(F.filter(tg, lambda t: F.size(F.filter(tg, lambda x: x == t)) > 1))
    return {
        "n_tokens": n.cast("int"),
        "type_token_ratio": F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.greatest(n, F.lit(1)), 6
        ),
        "top_bigram_frac": F.round(
            top_bigram.cast("double") / F.greatest(F.size(bg), F.lit(1)), 6
        ),
        "rep3_frac": F.round(rep3.cast("double") / F.greatest(F.size(tg), F.lit(1)), 6),
    }


def bigram_lm(
    docs,
    top_n: int = 3,
    min_left: int = 20,
    text_col: str = "text",
):
    """Count-based bigram language model: for each left token w1, the top_n
    most likely next tokens with conditional probability c(w1,w2) / c(w1,*).

    The corpus-statistics workhorse of data-quality work (n-gram LM scoring,
    contamination fingerprints, boilerplate discovery) expressed as the
    canonical Spark two-stage shape:

    - bigram positions explode map-side and partial-aggregate before the
      ONE shuffle on (w1, w2) — the exchange carries distinct pairs, not
      token positions;
    - c(w1,*) is a window sum over the already-aggregated pairs (input is
      |distinct pairs|, so the hot-token skew of a positions-level groupBy
      on w1 never materializes);
    - the top-n cut is the same rank window as top-k search, partial-limit
      pushed (WindowGroupLimit) before its exchange.

    min_left drops rare left-tokens (noise floor). Ordering inside a w1 is
    (pair_count DESC, w2 ASC) — fully deterministic. Returns
    (w1, w2, pair_count, left_count, cond_p, rank).
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # size >= 2 guard: sequence(0, size-2) on a 1-token doc is the
    # DESCENDING sequence [0, -1] (Spark infers step -1), not empty —
    # phantom reversed pairs / ANSI index errors (the bigram_lm twin below
    # already filters this way)
    pairs = docs.filter(F.size(toks) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.struct(toks[i].alias("w1"), toks[i + 1].alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    left_w = Window.partitionBy("w1")
    rank_w = Window.partitionBy("w1").orderBy(F.desc("pair_count"), F.asc("w2"))
    return (
        counts.withColumn("left_count", F.sum("pair_count").over(left_w))
        .filter(F.col("left_count") >= min_left)
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= top_n)
        .select(
            "w1",
            "w2",
            "pair_count",
            "left_count",
            F.round(F.col("pair_count") / F.col("left_count"), 6).alias("cond_p"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def filter_funnel(docs, stages):
    """Quality-gate funnel report: how many documents survive each stage of
    an ordered filter chain — the per-stage rejection accounting every
    production data pipeline publishes next to its output.

    `stages` is an ordered list of (name, boolean Column); a document passes
    stage i iff it passes stages 0..i (cumulative conjunction, matching how
    a real pipeline short-circuits). ONE pass over the corpus: all stage
    counters are conditional counts inside a single global aggregate (Spark
    computes them map-side-partial; the exchange carries one row per task),
    then the single result row unpivots to (stage, name, entering, passing,
    pass_rate) via stack.
    """
    conds = []
    acc = None
    for name, cond in stages:
        acc = cond if acc is None else (acc & cond)
        conds.append((name, acc))
    aggs = [F.count("*").alias("n_input")] + [
        F.count_if(c).alias(f"_p{i}") for i, (_, c) in enumerate(conds)
    ]
    row = docs.agg(*aggs)
    cells, prev = [], "n_input"
    for i, (name, _) in enumerate(conds):
        cells.append(f"{i}, '{name}', {prev}, _p{i}")
        prev = f"_p{i}"
    unpivoted = row.selectExpr(
        f"stack({len(cells)}, {', '.join(cells)}) AS (stage, name, entering, passing)"
    )
    return unpivoted.select(
        F.col("stage").cast("int").alias("stage"),
        "name",
        "entering",
        "passing",
        F.round(
            F.col("passing") / F.greatest(F.col("entering"), F.lit(1)), 6
        ).alias("pass_rate"),
    )


def bm25_search(
    docs,
    queries,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 top-k keyword retrieval (Lucene/Okapi form): score(q, d) =
    sum over distinct query terms of idf(t) * tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl)), idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    `queries` is (query_id BIGINT, terms ARRAY<STRING>); terms are treated
    as a SET (duplicates ignored). Scale shape: the distinct query-term set
    is tiny and BROADCASTS onto the exploded token stream, so the only
    corpus-wide shuffle carries matching postings (doc, term) -- the
    standard impact-ordered-postings trade, no inverted index needed. df
    and the (N, sum dl) corpus scalars are aggregates over the matched
    postings / a count-only pass; the final per-(query, doc) sum and top-k
    rank are windows over candidate rows only.

    Float policy: per-term scores round to 12 decimals and accumulate as
    DECIMAL (order-independent -- parallel double sums are not), the
    ranking key rounds to 6. Ties break (score DESC, doc_id ASC). Output:
    (query_id, rank, doc_id, score, n_terms_hit).
    """
    from pyspark.sql import Window

    # no spread here (measured, guide §1): both corpus passes aggregate
    # immediately after the tokenize (codegen'd, cheap per row) and the
    # postings pass is term-filtered small, so the two added exchanges cost
    # more than the width buys (sf0.1 A/B: 1.08 s unspread vs 1.60 s spread).
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"), toks.alias("_tk"))
    # exact corpus scalars: long sum / long count, single tiny row, broadcast
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qterms = queries.select(F.explode(F.array_distinct("terms")).alias("term")).distinct()
    postings = (
        base.select("doc_id", "dl", F.explode("_tk").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    scored = postings.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    tf_part = (tf_d * (k1 + 1.0)) / (tf_d + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    per_term = scored.select(
        "term",
        "doc_id",
        F.round(idf * tf_part, 12).cast("decimal(24,12)").alias("_s"),
    )
    qx = queries.select(
        "query_id", F.explode(F.array_distinct("terms")).alias("term")
    )
    agg = (
        per_term.join(F.broadcast(qx), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("_sdec"), F.count("*").alias("n_terms_hit"))
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("_sdec").cast("double"), 6).alias("score"),
            F.col("n_terms_hit").cast("int").alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "doc_id", "score", "n_terms_hit")
    )


def lm_cross_entropy(
    docs,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document bigram-LM cross-entropy against the CORPUS language
    model -- the CCNet/KenLM-style quality signal: low cross-entropy =
    looks like the corpus, high = outlier/noise.

    H(d) = -(1/|bigrams(d)|) * sum over bigram positions of
           ln( (c(w1,w2) + alpha) / (c(w1,*) + alpha*V) )
    with corpus counts c, add-alpha smoothing, V = corpus distinct-token
    vocabulary. Docs with < 2 tokens are excluded (no bigrams to score).

    Scale shape (r13): ONE exploded-bigram pass feeds everything. The
    corpus LM tables are derived from the per-doc pair counts instead of
    re-exploding the corpus: c(w1,w2) = sum of c_doc over (w1,w2) and
    c(w1,*) = sum of c_doc over (w1), both as window sums over the
    already-aggregated per-doc pairs -- exact BIGINT arithmetic, identical
    values to the former standalone aggregates. This replaces two extra
    full tokenize+explode scans AND the (w1,w2)/(w1) joins (whose right
    sides are vocabulary-sized -- broadcastable at test scale only) with
    two window passes over distinct (doc, w1, w2) rows. The vocabulary
    size still needs its own unigram pass (singleton-doc tokens and
    final-position tokens never appear in a bigram). The ln terms
    accumulate as round-12 DECIMAL weighted by the doc's pair
    multiplicity -- order-independent, so the round-6 result is
    engine-stable.

    Output: (doc_id, n_bigrams, cross_entropy).
    """
    from pyspark.sql import Window

    from webscale_vector_search_spark.operators.knn import spread_if_narrow

    # the bigram explode (and the vocab unigram pass) run before any
    # exchange; spread an unsplittable narrow input so they parallelize
    # (guide §2.5). All accumulation is BIGINT window sums + round-12
    # DECIMAL — order-independent, so results are engine-stable under any
    # partitioning (measured identical; ~2x at sf0.1 on 32 cores).
    docs = spread_if_narrow(docs)
    toks = tokens(F.col(text_col))
    pos = docs.filter(F.size(toks) >= 2).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.struct(toks[i].alias("w1"), toks[i + 1].alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    doc_pairs = pos.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("c_doc"))
    # corpus counts as window sums over the per-doc pairs: pair_count =
    # sum(c_doc) over (w1, w2); left_count = sum(c_doc) over (w1) -- the
    # same BIGINT totals the former groupBy tables held, minus two corpus
    # scans and two joins. The w1 window runs first so the (w1, w2) window
    # can reuse its hash partitioning (one exchange, not two).
    vocab = docs.select(F.explode(tokens(F.col(text_col))).alias("w")).agg(
        F.count_distinct("w").alias("v_size")
    )
    joined = (
        doc_pairs.withColumn(
            "left_count", F.sum("c_doc").over(Window.partitionBy("w1"))
        )
        .withColumn(
            "pair_count", F.sum("c_doc").over(Window.partitionBy("w1", "w2"))
        )
        .crossJoin(F.broadcast(vocab))
    )
    # alpha matters for the smoothed denominator and for scoring held-out
    # text against the same tables
    lp = F.log(
        (F.col("pair_count") + F.lit(alpha))
        / (F.col("left_count") + F.lit(alpha) * F.col("v_size"))
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.sum(
            (F.round(lp, 12).cast("decimal(24,12)")) * F.col("c_doc").cast("decimal(10,0)")
        ).alias("_lpsum"),
        F.sum("c_doc").alias("n_bigrams"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(-(F.col("_lpsum").cast("double")) / F.col("n_bigrams"), 6).alias(
            "cross_entropy"
        ),
    )


def corpus_card(docs, group_col: str = "source", text_col: str = "text"):
    """Per-source corpus report card -- the accounting table every production
    corpus publishes next to a release: volume, token budget, language mix,
    quality, and exact-duplicate rate, one row per source.

    ONE aggregate pass over the corpus: every per-doc signal (token count,
    predicted language, round-6 quality score, content hash) is a map-side
    expression, and the group aggregate carries count/sum/count_distinct
    partials through a single exchange on the group key. Quality means
    accumulate as DECIMAL (per-doc scores are round-6 already, so the sum is
    exact and order-independent); the duplicate rate is within-group:
    (n_docs - distinct content hashes) / n_docs.

    Output: (source, n_docs, total_tokens, avg_tokens, pct_en, mean_quality,
    dup_rate), ordered by source.
    """
    t = F.col(text_col)
    enriched = docs.select(
        F.col(group_col),
        ws_token_count(t).alias("_nt"),
        (predicted_lang(t) == "en").alias("_en"),
        quality_score(t).cast("decimal(18,6)").alias("_q"),
        F.md5(t.cast("binary")).alias("_h"),
    )
    agg = enriched.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.count_if(F.col("_en")).alias("_n_en"),
        F.sum("_q").alias("_qsum"),
        F.count_distinct("_h").alias("_n_uniq"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 6).alias("avg_tokens"),
        F.round(F.col("_n_en") / F.col("n_docs"), 6).alias("pct_en"),
        F.round(F.col("_qsum").cast("double") / F.col("n_docs"), 6).alias("mean_quality"),
        F.round((F.col("n_docs") - F.col("_n_uniq")) / F.col("n_docs"), 6).alias("dup_rate"),
    )
