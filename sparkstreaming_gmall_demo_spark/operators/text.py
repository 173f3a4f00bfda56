"""Text operators: keyword AND-match plus the training-data-pipeline
text-analysis family (language ID, quality scoring, token counting,
fingerprinting).

Reference semantics reproduced:
- ES bool query: term filter AND full-text match with operator=AND --
  every analyzed token of the keyword must match (reference
  service/impl/PublisherServiceImpl.java:84-87). Fixture analog:
  whitespace tokenization + exact token membership.

All expressions are built-in Column functions (JVM, codegen) -- no
Python in the hot path. Token explosion is the only shuffle producer
(token_stats); everything else is narrow per-row work that scales
linearly and pushes column pruning to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

# Tiny per-language stopword lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic; real deployments swap in
# a larger lexicon table (broadcast dim join keeps the plan identical).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para", "en"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "个"],
}


ANALYZER_SPLIT = r"[^\p{L}\p{N}]+"  # split on non-letter/digit runs

# Han ideograph ranges (URO + Ext-A + compatibility). ES's standard
# tokenizer (UAX#29) emits one token PER ideograph — a CJK keyword
# matches documents containing its characters in any segmentation, the
# behavior the gmall stack's ik analyzer approximates with dictionary
# segmentation (PublisherServiceImpl.java:84-87 runs match on the
# ES-analyzed index). Explicit codepoint ranges, not \p{script=Han}:
# the class must mean the same thing in Java regex (Spark), RE2
# (DuckDB oracle), and Python re (driver-side keyword twin).
CJK_CHAR_CLASS = "[㐀-䶿一-鿿豈-﫿]"


def analyze(text_col) -> Column:
    """Analyzer-lite tokenization: lowercase, split each Han ideograph
    into its own token (ES standard-analyzer CJK behavior), then split
    on non-alphanumeric runs with empties dropped — the approximation
    of what ES runs before a ``match`` query ("Spark" matches "spark",
    "join," matches "join", "数据库" matches any text containing 数+据+库).
    DuckDB twin: ``list_filter(string_split_regex(regexp_replace(
    lower(x), '(CJK)', ' \\1 ', 'g'), '[^\\p{L}\\p{N}]+'), t -> t != '')``
    (same classes — RE2-compatible).
    """
    text_col = F.col(text_col) if isinstance(text_col, str) else text_col
    segmented = F.regexp_replace(F.lower(text_col), f"({CJK_CHAR_CLASS})", " $1 ")
    return F.filter(F.split(segmented, ANALYZER_SPLIT), lambda t: t != F.lit(""))


def analyze_keyword(keyword: str) -> list[str]:
    """Driver-side twin of ``analyze`` for the query string. The split
    class is [\\W_] so underscore is a separator exactly as in the
    document-side [^\\p{L}\\p{N}] class ('user_id' must tokenize to
    ['user', 'id'] on BOTH sides or the AND-match can never hit)."""
    import re

    segmented = re.sub(f"({CJK_CHAR_CLASS})", r" \1 ", keyword.lower())
    return [t for t in re.split(r"[\W_]+", segmented, flags=re.UNICODE) if t]


def keyword_and_match(df: DataFrame, text_col: str, keyword: str,
                      analyzed: bool = True) -> DataFrame:
    """Keep rows whose text contains EVERY token of ``keyword`` — the ES
    bool-query ``match`` with operator=AND (reference
    service/impl/PublisherServiceImpl.java:84-87). ES analyzes BOTH the
    document and the query before matching; ``analyzed=True`` mirrors
    that with the analyzer-lite normalization (case-insensitive,
    punctuation-insensitive). ``analyzed=False`` keeps the round-1
    whitespace-exact behavior for callers that index raw terms."""
    if analyzed:
        toks = analyze(text_col)
        terms = analyze_keyword(keyword)
    else:
        toks = tokens(text_col)
        terms = keyword.split()
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.array_contains(toks, t)
    return df.filter(cond)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count per document (BPE-ish regex variant:
    count non-space runs -- identical on the fixture corpus)."""
    return df.withColumn("n_tokens", F.size(tokens(text_col)).cast("long"))


# BPE-ish pre-tokenizer: letter runs | digit runs | single other glyph
# (the GPT-2 pre-split shape, simplified to an engine-portable regex —
# identical RE2/Java semantics, verified in tests).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Rolling-hash parameters: polynomial fold mod a Mersenne prime. Token
# values come from md5's first 7 hex digits (< 2^28), so acc*31 + v
# stays far inside int64 and the first fold step equals the raw value
# in both engines (DuckDB's list_reduce seeds with the first element;
# Spark's aggregate seeds with 0 — congruent because v < p).
ROLLING_MOD = 2_147_483_647  # 2^31 - 1


def bpe_tokens(text_col) -> Column:
    """BPE-ish regex tokenization (training-data token accounting).

    Whitespace splitting undercounts for punctuation-glued text; this
    matches letter runs, digit runs, and individual symbols — the
    shape BPE pre-tokenizers produce before merges."""
    text_col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_bpe_tokens", F.size(bpe_tokens(text_col)).cast("long"))


def rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over the token stream, ``acc = (acc*31 + v(tok)) mod (2^31-1)``
    with ``v = int(md5(tok)[:7], 16)``.

    Unlike the md5-of-normalized-text fingerprint this is incremental
    (a sliding window can roll tokens in/out) and engine-portable —
    the DuckDB oracle computes the identical fold, so the declared
    query is value-checked, not rows-only. One narrow pass, no
    shuffle."""
    return df.withColumn(
        "rolling_fp",
        F.expr(
            f"aggregate(split({text_col}, ' '), 0L, (acc, t) -> "
            f"(acc * 31 + cast(conv(substring(md5(t), 1, 7), 16, 10) as bigint)) "
            f"% {ROLLING_MOD})"
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: score each language by how many of
    its stopwords appear in the token set; argmax with lexicographic
    tie-break. Pure built-ins: array_intersect over a token set per
    row; no shuffle, no UDF."""
    tok_set = F.array_distinct(tokens(text_col))
    scores = [
        F.struct(
            F.size(F.array_intersect(tok_set, F.array(*[F.lit(w) for w in words]))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    # array_max on struct(score, lang): max score, ties -> max lang; to get
    # deterministic *lexicographically-smallest* on ties we negate via
    # sort: pick max by (score, reversed-lang) is overkill -- fixture
    # texts share one vocab, so score ties across langs are expected;
    # document the tie rule as "highest score, then lexicographically
    # LAST language" to keep the expression a single array_max.
    return df.withColumn("pred_lang", F.array_max(F.array(*scores)).getField("lang"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score, per document:
    - n_tokens, mean token length
    - stopword_ratio (any language's stopwords)
    - alpha_ratio: fraction of alphabetic chars
    Deterministic double arithmetic, rounded to 4dp for oracle hashing.
    """
    toks = tokens(text_col)
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    n_tok = F.size(toks)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_token_len", F.round((n_chars - (n_tok - 1)) / n_tok, 4))
        .withColumn("stopword_ratio", F.round(n_stop / n_tok, 4))
        .withColumn("alpha_ratio", F.round(n_alpha / n_chars, 4))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized token
    stream (lowercase, single-space). Engine-portable (md5 exists in
    Spark and DuckDB), used for exact-dup detection at scale -- hash
    first, shuffle the 32-byte digest, never the document."""
    normalized = F.concat_ws(" ", tokens(F.lower(F.col(text_col))))
    return df.withColumn("fingerprint", F.md5(normalized))


def token_stats(df: DataFrame, text_col: str = "text", lang_col: str = "lang", k: int = 5) -> DataFrame:
    """Top-k tokens by frequency per language (tie -> token asc).

    explode -> two-level agg. Map-side partial aggregation collapses
    the (lang, token) pairs before shuffle; top-k via row_number over
    each lang partition.
    """
    from pyspark.sql import Window

    freq = (
        df.select(F.col(lang_col).alias("lang"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "token", "cnt", F.col("rank").cast("int").alias("rank"))
    )


# PII patterns, deliberately restricted to constructs whose regex
# semantics are identical in Java (Spark), RE2 (DuckDB oracle), and
# Python re: no lookaround, no backreferences. Real deployments extend
# the table; the plumbing (count-then-replace in one projection) is
# the part that has to scale.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{9,}\b", "<NUM>"),  # account/phone-length digit runs
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: mask emails, IPv4s, and long digit
    runs, counting what was redacted. One narrow projection — the
    redaction count comes from regexp_extract_all BEFORE the replace
    (count-then-replace keeps both engine-portable; regexp_count is
    not in DuckDB), and replacements chain left-to-right in
    PII_PATTERNS order so earlier masks can't create later matches
    (<EMAIL> contains no digits/@). No shuffle, no UDF — at 100 TB
    this is a map-only pass that pushes column pruning to the scan."""
    text = F.col(text_col)
    n_red = None
    for _name, pat, _rep in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        n_red = c if n_red is None else (n_red + c)
    clean = text
    for _name, pat, rep in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, rep)
    return df.withColumn("n_redactions", n_red.cast("long")).withColumn(
        "clean_text", clean
    )


def repetition_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the dedup-adjacent per-document
    filter every corpus pipeline runs before training):
    - distinct_token_ratio: |distinct tokens| / |tokens|
    - repeated_bigram_frac: 1 − |distinct bigrams| / |bigrams|
    Low distinct ratios / high repeated fractions flag boilerplate and
    generation loops. Pure array expressions over one tokenization —
    narrow, no shuffle; 4dp rounding for oracle hashing.

    The token array is materialized into a column BEFORE the bigram
    lambda reads it: a ``split(...)`` inside the transform body is
    re-evaluated per element (O(tokens^2) string splitting per doc —
    measured 8.8 s vs 0.6 s on the sf0.1 corpus), the same trap
    neardup.shingle_sets documents."""
    tcol = "__rep_toks"
    toked = df.withColumn(tcol, tokens(text_col))
    n_tok = F.size(F.col(tcol))
    bigrams = F.expr(
        f"CASE WHEN size({tcol}) >= 2 THEN "
        f"transform(sequence(1, size({tcol}) - 1), "
        f"i -> concat_ws(' ', {tcol}[i-1], {tcol}[i])) "
        f"ELSE array() END"
    )
    n_big = F.size(bigrams)
    return (
        toked.withColumn(
            "distinct_token_ratio",
            F.round(F.size(F.array_distinct(F.col(tcol))) / n_tok, 4),
        )
        .withColumn(
            "repeated_bigram_frac",
            F.when(n_big > 0, F.round(1 - F.size(F.array_distinct(bigrams)) / n_big, 4))
            .otherwise(F.lit(0.0)),
        )
        .drop(tcol)
    )


# Gopher-style corpus quality rule suite (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1 data pipeline — public paper).
# Thresholds live in one table so the declared entry's oracle SQL
# restates the exact same constants. Every rule compares a 4dp-ROUNDED
# signal (the quality_score/repetition_score outputs) against the
# threshold: rounding first makes the comparison engine-stable (both
# engines round-half-up the same int/int division), so a doc sitting
# on a knife edge classifies identically in Spark and DuckDB.
GOPHER_THRESHOLDS: dict[str, float] = {
    "min_tokens": 20,
    "max_tokens": 90,
    "mean_token_len_lo": 3.0,
    "mean_token_len_hi": 5.2,
    "min_stopword_ratio": 0.01,
    "min_distinct_ratio": 0.35,
    "max_repeated_bigram": 0.9,
}


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document rule evaluation: one ``fail_<rule>`` 0/1 column per
    rule plus a ``keep`` flag (no rule failed). Signals come from
    :func:`quality_score` + :func:`repetition_score` — one narrow
    projection chain, no shuffle; at 100 TB this is a map-only pass
    fused into the scan stage by whole-stage codegen."""
    t = GOPHER_THRESHOLDS
    sig = repetition_score(quality_score(df, text_col), text_col)
    fails: dict[str, Column] = {
        "high_repeated_bigrams": F.col("repeated_bigram_frac") > t["max_repeated_bigram"],
        "low_distinct_ratio": F.col("distinct_token_ratio") < t["min_distinct_ratio"],
        "low_stopword_ratio": F.col("stopword_ratio") < t["min_stopword_ratio"],
        "mean_token_len_out_of_range": (F.col("mean_token_len") < t["mean_token_len_lo"])
        | (F.col("mean_token_len") > t["mean_token_len_hi"]),
        "too_few_tokens": F.col("n_tokens") < t["min_tokens"],
        "too_many_tokens": F.col("n_tokens") > t["max_tokens"],
    }
    out = sig
    keep = F.lit(True)
    for name in sorted(fails):
        out = out.withColumn(f"fail_{name}", fails[name].cast("int"))
        keep = keep & ~fails[name]
    return out.withColumn("keep", keep)


def gopher_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-rule drop accounting: (rule, n_docs) with one row per rule
    counting the documents that fail it (rules are NOT exclusive — a
    doc can fail several) plus a ``kept_docs`` row for the survivors.
    The whole report is one global agg of 0/1 indicator sums (partial
    map-side combine, a single 7-value row crosses the shuffle) then a
    stack() unpivot — constant-size output at any corpus scale."""
    flagged = gopher_rules(df, text_col)
    rules = sorted(k for k in flagged.columns if k.startswith("fail_"))
    agg = flagged.agg(
        *[F.sum(r).cast("long").alias(r) for r in rules],
        F.sum(F.col("keep").cast("int")).cast("long").alias("kept_docs"),
    )
    pairs = ", ".join(f"'{r[5:]}', {r}" for r in rules)
    pairs += ", 'kept_docs', kept_docs"
    n = len(rules) + 1
    return agg.selectExpr(f"stack({n}, {pairs}) as (rule, n_docs)").orderBy("rule")


def tfidf_top_terms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k terms per document by tf-idf (tf = in-doc term count,
    idf = ln(N / docs-containing-term)); ties break on term asc.

    Plan shape: one token explode feeds BOTH frequency levels — the
    per-(doc, term) tf aggregate, then the per-term document frequency
    derived from it (already one row per doc×term, so df is a count —
    no second pass over text). N arrives as a broadcast single-row
    cross join, keeping everything plan-side (no driver collect). The
    top-k window partitions by doc — high cardinality, so no skew.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n = df.agg(F.count("*").alias("n"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("s", F.col("tf") * F.log(F.col("n") / F.col("dfreq")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", F.round("s", 4).alias("tfidf"))
    )


def scored_search(
    df: DataFrame,
    text_col: str,
    keyword: str,
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Relevance-ORDERED keyword search: the ES score-sorted page the
    reference serves (reference service/impl/PublisherServiceImpl.java:98-99
    pages hits in ES practical-score order; keyword_and_match covers
    only the match set). Returns the top ``k`` AND-matching rows as
    (id, score), score descending, id ascending on ties.

    The score is a tf×idf proxy in EXACT integer arithmetic:
    ``score = Σ_t tf(t, doc) * (1_000_000 DIV df(t))`` — rarer terms
    weigh more, repeated terms add linearly, and no float/log enters
    the result, so ranking and values are bit-identical across engines
    and partitionings (ES's float practical score cannot be mirrored
    exactly; deterministic ordering is the documented semantic upgrade,
    SURVEY §2.8).

    Plan shape at 100 TB: per-doc tf columns are a narrow map over the
    analyzed tokens; the per-term document frequencies are ONE 1-row
    aggregate broadcast back (never a global window, which would drag
    every row through a single partition); the top-k is a global
    ORDER BY ... LIMIT k — Spark's TakeOrderedAndProject, per-partition
    heaps + driver merge of k rows, no full sort materialization.
    """
    terms = analyze_keyword(keyword)
    if not terms:
        raise ValueError("keyword analyzes to no terms")
    toks = analyze(text_col)

    def _tf(term: str):
        # NB: the predicate must be UNARY — a second (default) arg would
        # make PySpark treat it as the (element, index) form
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    narrowed = df.select(
        F.col(id_col),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    dfs = narrowed.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ]
    )
    match_all = F.lit(True)
    for i in range(len(terms)):
        match_all = match_all & (F.col(f"tf_{i}") > 0)
    score = None
    for i in range(len(terms)):
        term_score = F.expr(f"tf_{i} * (1000000 DIV df_{i})")
        score = term_score if score is None else score + term_score
    return (
        narrowed.join(F.broadcast(dfs))
        .filter(match_all)
        .select(F.col(id_col), score.cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    keyword: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 OR-match top-k: the length-normalized upgrade of
    :func:`scored_search` (ES's actual default similarity — the
    reference's match queries run BM25 under the hood,
    service/impl/PublisherServiceImpl.java:84-87; scored_search keeps
    the integer proxy for bit-exact paging, this entry exposes the real
    scoring model). Returns (id, score) for the top ``k`` documents
    matching ANY query term, score = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)) with the Lucene idf
    ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape at 100 TB (same discipline as scored_search): per-doc
    term frequencies and length are a narrow map over the token array
    (no explode — the shuffle-free path since the query has O(1)
    terms); N, avgdl and per-term dfs are ONE 1-row aggregate broadcast
    back; the top-k is ORDER BY … LIMIT — TakeOrderedAndProject,
    per-partition heaps, no global sort. Ordering uses the ROUNDED
    score (4 dp) with id tiebreak so ranking is reproducible across
    engines and partitionings.
    """
    # the SAME analyzer-lite tokenization as scored_search/q9 (lowercase
    # + CJK per-ideograph + non-alphanumeric split) — BM25 claims to be
    # the real model behind ES match, so it must see what the analyzer
    # sees ('Spark' matches 'spark', 'join,' matches 'join'); a raw
    # whitespace split would silently drop case/punctuation variants
    terms = analyze_keyword(keyword)
    if not terms:
        raise ValueError("keyword analyzes to no terms")
    toks = analyze(text_col)

    def _tf(term: str):
        # unary predicate — see scored_search note
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    narrowed = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("dl"),
        *[_tf(t).cast("double").alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = narrowed.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    match_any = F.lit(False)
    score = None
    for i in range(len(terms)):
        match_any = match_any | (F.col(f"tf_{i}") > 0)
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        term_score = idf * (
            F.col(f"tf_{i}")
            * F.lit(k1 + 1.0)
            / (
                F.col(f"tf_{i}")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term_score if score is None else score + term_score
    return (
        narrowed.join(F.broadcast(stats))
        .filter(match_any)
        .select(F.col(id_col), F.round(score, 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 6,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, df): token n-grams occurring in at least ``min_df``
    DISTINCT documents — the corpus-derived boilerplate dictionary
    (CCNet/RefinedWeb-style repeated-passage detection: headers,
    navigation chrome, license blurbs repeat verbatim across pages;
    high document frequency at n≥6 tokens is the standard signal).

    Plan: one tokenize pass; per-doc n-gram DISTINCT before the gram
    shuffle (a doc never votes twice), then a count per gram — the
    shuffle carries (gram, doc_id) pairs bounded by corpus n-gram
    diversity, the same budget as the decontamination shingle join."""
    grams = _positioned_ngrams(df, n, id_col, text_col)
    return (
        grams.select(id_col, "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )


def _positioned_ngrams(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram): every token n-gram with its 1-based start
    position — a narrow map (array arithmetic) then one explode."""
    return df.select(
        F.col(id_col),
        tokens(text_col).alias("_toks"),
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN size(_toks) >= {n} THEN "
                f"transform(sequence(1, size(_toks) - {n} + 1), "
                f"i -> struct(i AS pos, array_join(slice(_toks, i, {n}), ' ') AS gram)) "
                "ELSE array() END"
            )
        ).alias("g"),
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))


def dup_span_scrub(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Exact duplicate-span scrubbing with keep-first semantics: any
    token ``n``-gram occurring MORE THAN ONCE in the corpus keeps only
    its first occurrence (ordered by (doc_id, pos)); every token
    position covered by a non-canonical occurrence is removed from its
    document. Returns (id, n_tokens, removed_tokens, kept_text).

    This is substring-level dedup (the "remove all but one occurrence
    of any long repeated span" discipline): a verbatim paragraph pasted
    into ten otherwise-distinct pages survives document-level near-dup
    (Jaccard stays low) and the boilerplate dictionary only AUDITS it —
    this operator actually rewrites the corpus, keeping exactly one
    copy. Reference analogy: the canonical-first rule is the same
    keep-one-winner discipline as the reference's Redis SETNX DAU
    dedup (handler/DauHandler.scala:61-73), applied to spans instead
    of user ids.

    Semantics are coverage-based and order-independent: a position is
    removed iff ANY non-canonical duplicated-gram occurrence covers it,
    so the result does not depend on scan order (the boilerplate_
    coverage discipline). Canonical = min(struct(doc_id, pos)) per
    gram — a partial-aggregable min, NOT a row_number window: the
    groupBy ships map-side-combined (gram, first, count) partials, so
    a pathological gram repeated millions of times (hot boilerplate at
    100 TB) never forces a single-partition sort. Document text never
    crosses a shuffle: grams + int positions shuffle, the rewrite is a
    narrow array_except/transform over the original token array.

    ``hash_grams=True`` is the 100 TB shuffle diet: the 8-token gram
    string (~50 bytes, crossing BOTH the canon groupBy and the occ
    join) is replaced by its xxhash64 (8 bytes) before either shuffle.
    A 64-bit collision falsely merges two distinct grams and over-
    scrubs one span (birthday bound: ~10^12 corpus grams -> a few
    percent chance of ONE such span corpus-wide) — the standard
    fingerprint-dedup trade; tests pin output equality with the exact
    kernel on the fixture corpus."""
    # localCheckpoint (r12): the positioned-gram stream feeds both the
    # canonical-occurrence aggregate and the occurrence join; without
    # materialization the n-gram explode runs twice over the corpus.
    # hash FIRST (r13, ADVICE r12): when hash_grams is on, the
    # materialized blocks hold 8-byte xxhash64 values instead of full
    # n-token gram strings (~n x corpus text bytes in MEMORY_AND_DISK)
    # — both consumers only ever read the hashed column
    occ = _positioned_ngrams(df, n, id_col, text_col)
    if hash_grams:
        occ = occ.select(
            id_col, "pos", F.xxhash64("gram").alias("gram")
        )
    occ = occ.localCheckpoint()
    canon = (
        occ.groupBy("gram")
        .agg(
            F.count("*").alias("cnt"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("first"),
        )
        .filter(F.col("cnt") >= 2)
        .select("gram", "first")
    )
    bad_pos = (
        occ.join(canon, "gram")
        .filter(
            ~(
                (F.col(id_col) == F.col("first.d"))
                & (F.col("pos") == F.col("first.p"))
            )
        )
        .select(
            id_col,
            F.explode(F.expr(f"sequence(pos, pos + {n} - 1)")).alias("cpos"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("cpos")).alias("bad_pos"))
    )
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return toks.join(bad_pos, id_col, "left").select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.coalesce(F.size("bad_pos"), F.lit(0)).cast("long").alias(
            "removed_tokens"
        ),
        F.array_join(
            F.expr(
                "transform(array_except(sequence(1, size(_toks)), "
                "coalesce(bad_pos, CAST(array() AS array<int>))), "
                "i -> element_at(_toks, i))"
            ),
            " ",
        ).alias("kept_text"),
    )


def boilerplate_coverage(
    df: DataFrame,
    n: int = 6,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate audit: (id, n_tokens, covered_tokens,
    keep_ratio) where covered_tokens counts token positions lying under
    ANY occurrence of a boilerplate n-gram (coverage semantics — order-
    and overlap-independent, so the result is well-defined however the
    occurrences tile, unlike greedy removal whose output depends on
    scan order). keep_ratio = kept/total rounded 4 dp; a curation
    pipeline drops or trims documents below a floor.

    Plan: occurrences join the boilerplate dictionary on gram (shuffle
    carries grams + int positions, never text), covered positions fan
    out as an int explode with a per-doc distinct, and the final frame
    is one left join back to per-doc lengths. Document text crosses no
    shuffle at any point. The audit is a TWO-pass op by design (the
    dictionary pass and the coverage pass each tokenize the corpus —
    Spark does not share identical subplans across join arms, and
    materializing the positioned-gram frame costs more than the second
    narrow pass saves: measured 1.3 s -> 1.6 s at sf0.1 in r12, unlike
    the dupspan twin where BOTH consumers need positions); the
    streaming pipeline amortizes the dictionary pass away entirely
    (boilerplate_read_dictionary)."""
    occ = _positioned_ngrams(df, n, id_col, text_col)
    bp = boilerplate_ngrams(df, n, min_df, id_col, text_col)
    covered = (
        occ.join(bp.select("gram"), "gram")
        .select(id_col, F.explode(F.expr(f"sequence(pos, pos + {n} - 1)")).alias("cpos"))
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("covered_tokens"))
    )
    lengths = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )
    return lengths.join(covered, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        F.round(
            (F.col("n_tokens") - F.coalesce("covered_tokens", F.lit(0)))
            / F.col("n_tokens"),
            4,
        ).alias("keep_ratio"),
    )


def hashed_classifier_weight_sql(token_expr: str) -> str:
    """The shared hashed-weight formula as a SQL expression string:
    weight(token) = ((ascii(m1)*8191 + ascii(m2)*131 + ascii(m3)*17
    + ascii(m4)) % 1001) - 500 over the first four chars of
    md5(token). Every function used (md5, substring, ascii, %) means
    the same thing in Spark SQL and DuckDB, so the identical string
    serves both the operator and its oracle — the contract is the
    formula, not an engine. Weights land in [-500, 500], integer."""
    m = f"md5({token_expr})"
    return (
        f"((ascii(substring({m}, 1, 1)) * 8191"
        f" + ascii(substring({m}, 2, 1)) * 131"
        f" + ascii(substring({m}, 3, 1)) * 17"
        f" + ascii(substring({m}, 4, 1))) % 1001) - 500"
    )


def hashed_classifier_score(text_col: str = "text") -> Column:
    """Per-document classifier score as a single Column: the
    higher-order ``aggregate`` fold of hashed_classifier_weight_sql
    over the token array — exact BIGINT, zero shuffle, usable in any
    projection (the streaming quality gate scores each micro-batch
    with exactly this expression)."""
    w = hashed_classifier_weight_sql("t")
    return F.expr(
        f"aggregate(split({text_col}, ' '), 0L, (acc, t) -> acc + ({w}))"
    )


def hashed_classifier_gate(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality gating in the fastText shape (hashed
    bag-of-words -> linear score -> keep/drop), the filter family
    CCNet and LLaMA-style pipelines run after heuristic rules. The
    hash-bucketed weight table is DERIVED (md5 arithmetic,
    hashed_classifier_weight_sql) rather than trained — the honest
    stand-in discipline of the reranker slot (retrieval.py): the
    plumbing that matters at 100 TB is real, the learned weights drop
    in by swapping one expression for a broadcast map lookup.

    Scoring is a single higher-order ``aggregate`` over the token
    array — per-row JVM work inside whole-stage codegen with NO
    explode and NO shuffle; a 100 TB corpus is scored in one narrow
    map pass, and only the (lang)-keyed rollup (map-side partials)
    shuffles. Returns per language: n_docs, n_keep (score_sum >= 0),
    sum_score — all exact BIGINT.
    """
    scored = df.select(
        F.col(lang_col),
        hashed_classifier_score(text_col).alias("score_sum"),
    )
    return scored.groupBy(lang_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("score_sum") >= 0).cast("long")).cast("long").alias("n_keep"),
        F.sum("score_sum").cast("long").alias("sum_score"),
    )


def curation_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The stage-attrition funnel of the standard curation cascade —
    heuristic rules -> model gate -> exact dedup — as ONE report:
    (stage_order, stage, n_docs, dropped) with cumulative survivor
    counts and per-stage drops. This is the first table a curation
    run prints (how much did each stage cost us?) and the one that
    catches a mis-tuned stage wiping the corpus.

    Single-plan shape: every per-doc signal (Gopher rule flags, the
    hashed classifier score, the content fingerprint) comes from one
    narrow projection over one scan; the funnel is then ONE aggregate
    — conditional sums for the cumulative gates plus a conditional
    COUNT DISTINCT on the fingerprint for the dedup stage (survivor =
    distinct content among gate-passers; no window, no second pass) —
    unpivoted with stack() into the constant-size report. At 100 TB
    this costs exactly one corpus scan + a one-row shuffle.
    """
    flagged = gopher_rules(df, text_col).withColumn(
        "_score", hashed_classifier_score(text_col)
    )
    adm = F.col("keep") & (F.col("_score") >= 0)
    agg = flagged.agg(
        F.count("*").cast("long").alias("n_input"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_rules"),
        F.sum(adm.cast("int")).cast("long").alias("n_cls"),
        F.count_distinct(
            F.when(adm, F.md5(F.lower(F.col(text_col))))
        ).cast("long").alias("n_uniq"),
    )
    return agg.selectExpr(
        "stack(4, "
        "1L, 'input', n_input, 0L, "
        "2L, 'rules_pass', n_rules, n_input - n_rules, "
        "3L, 'classifier_pass', n_cls, n_rules - n_cls, "
        "4L, 'dedup_survivor', n_uniq, n_cls - n_uniq"
        ") as (stage_order, stage, n_docs, dropped)"
    ).orderBy("stage_order")


def wilson_source_rank(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    z: float = 1.96,
) -> DataFrame:
    """Rank sources by the Wilson lower confidence bound of their
    quality keep-rate — the small-sample-honest ordering: a source
    with 3/3 keeps must NOT outrank one with 9,000/10,000, which is
    exactly what ranking by the raw ratio does. The keep signal is the
    hashed classifier's exact-BIGINT score (>= 0 keeps), so ``n`` and
    ``k`` are engine-exact integers and the LCB

        (p + z²/2n − z·sqrt((p(1−p) + z²/4n)/n)) / (1 + z²/n)

    is a pure scalar function of them — identical operation order on
    both engines means identical IEEE doubles, so even the derived
    RANK is hash-stable. Scoring is one narrow fold per document
    (no explode, no shuffle); only (source, n, k) rollups shuffle.
    Returns (rank, source, n_docs, n_keep, keep_bp, wilson_lcb_bp).
    """
    from pyspark.sql.window import Window

    agg = (
        df.select(
            F.col(source_col).alias("source"),
            (hashed_classifier_score(text_col) >= 0).cast("long").alias("keep"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_keep"),
        )
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_keep").cast("double") / n
    z2 = z * z
    lcb = (
        p
        + F.lit(z2) / (2 * n)
        - F.lit(z) * F.sqrt((p * (1 - p) + F.lit(z2) / (4 * n)) / n)
    ) / (1 + F.lit(z2) / n)
    scored = agg.select(
        "source",
        "n_docs",
        "n_keep",
        F.floor(F.col("n_keep") * 10000 / F.col("n_docs")).cast("long").alias(
            "keep_bp"
        ),
        F.floor(lcb * 10000).cast("long").alias("wilson_lcb_bp"),
    )
    w = Window.orderBy(F.col("wilson_lcb_bp").desc(), F.col("source"))
    return scored.select(
        F.row_number().over(w).cast("long").alias("rank"), *scored.columns
    ).orderBy("rank")


def ngram_novelty(
    df: DataFrame,
    n_batches: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus novelty curve: bucket documents into ``n_batches``
    deterministic ingest batches (``doc_id % n_batches`` — the
    engine-portable stand-in for arrival order) and report, per batch,
    how many distinct word-bigram shingles appear vs how many are NEW
    (first seen in that batch). The saturation shape is the dedup
    planner's capacity signal: when new_bp collapses, additional
    crawl volume is re-buying existing content and the near-dup
    stages dominate the value.

    Only 16-char md5 digests of shingles cross the shuffle (the
    neardup discipline — text never shuffles); per-doc DISTINCT
    before the exchange bounds the explode. Two bounded aggregates
    over the (batch, digest) pair frame join on the tiny batch key.
    Tokens are materialized into a column first so the bigram window
    reads the array instead of re-splitting the text per gram index
    (the shingle_sets O(tokens) vs O(tokens^2) discipline).
    Returns (batch, n_grams, n_new, new_bp) — all BIGINT.
    """
    toked = df.select(
        F.pmod(F.col(id_col), F.lit(n_batches)).cast("long").alias("batch"),
        F.split(F.col(text_col), " ").alias("_t"),
    )
    grams = (
        toked.select(
            "batch",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "CASE WHEN size(_t) >= 2 THEN "
                        "transform(sequence(1, size(_t) - 1), "
                        "i -> substring(md5(concat_ws(' ', _t[i-1], _t[i])), "
                        "1, 16)) ELSE array() END"
                    )
                )
            ).alias("digest"),
        )
        .distinct()
    )
    per_batch = grams.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    first_seen = (
        grams.groupBy("digest")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    return (
        per_batch.join(first_seen, "batch", "left")
        .select(
            "batch",
            "n_grams",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.floor(
                F.coalesce("n_new", F.lit(0)) * 10000 / F.col("n_grams")
            ).cast("long").alias("new_bp"),
        )
        .orderBy("batch")
    )


# winnowing packed-key layout: 40-bit md5-prefix hash, 20-bit position
WINNOW_POS_BITS = 20
POS_SPACE = 1 << WINNOW_POS_BITS


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide
    a window of ``w`` consecutive hashes, keep each window's minimum.
    The selected set is position-robust — ANY shared token run of
    length >= w + k - 1 between two documents is GUARANTEED to share
    at least one selected fingerprint — at an expected density of only
    2/(w+1) of all grams, which is what makes a fingerprint INDEX
    affordable where "store every shingle" is not.

    Entirely per-document array arithmetic: gram hashing, the sliding
    window, and the min-selection are higher-order expressions inside
    one narrow projection — NO shuffle of any kind (winnowing is
    document-local); only the selected (id, pos, fp) rows are
    exploded. The (hash, pos) pair is packed into one BIGINT
    (``h * 2^20 + pos`` — 40-bit hash, 20-bit position) so the window
    minimum needs no struct ordering and ties break toward the
    LEFTMOST position by construction; documents beyond 2^20 - 1
    k-grams RAISE rather than silently overflowing pos into the hash
    (chunk them first); consecutive windows sharing a minimum collapse
    via array_distinct, per the paper. The hash is the
    engine-portable md5-prefix integer (the rolling_fingerprint
    discipline), so the DuckDB oracle restates the selection
    bit-for-bit.

    Expression shape matters here: an expensive sub-array referenced
    INSIDE a higher-order lambda is re-evaluated per element (the
    split per gram, the full md5 gram array per window — O(n^2) work
    per document; measured 8.4 s -> 2.1 s first-run on the sf0.1
    corpus, and the warm scale-smoke row dropped 10.5 s -> 0.42 s),
    and hoisting it into a prior projection is undone by Catalyst's
    CollapseProject. So both the token array and the hashed-gram
    array are BOUND as lambda variables via the single-element
    ``transform(array(X), x -> ...)`` wrapper, which pins exactly-once
    evaluation inside one expression where no rewrite can re-inline
    it.

    Returns (id_col, pos, fp) — 1-based gram position and the 44-bit
    fingerprint — one row per selected fingerprint, ordered.
    """
    if w < 1 or k < 1:
        raise ValueError("k and w must be >= 1")
    sp = f"split({text_col}, ' ')"
    # hashed (hash * 2^20 + pos) gram keys over the BOUND token array
    # sp0; sequence is 1-based so the packed position needs no +1.
    # Width budget: 40-bit md5-prefix hash + 20-bit position = 60 bits,
    # safely inside int64 — positions up to 2^20 - 1 = 1,048,575 grams
    # (~1M tokens). Beyond that the pos field would overflow into the
    # hash and silently corrupt every fingerprint, so the data path
    # RAISES instead (chunk longer documents first — chunking.py).
    keyed_of_sp0 = (
        f"transform(sequence(1, size(sp0) - {k} + 1), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', slice(sp0, i, {k}))), "
        f"1, 10), 16, 10) as bigint) * {POS_SPACE} + i)"
    )
    windows_of_ks = (
        f"array_distinct(transform(sequence(1, size(ks) - {w} + 1), "
        f"j -> array_min(slice(ks, j, {w}))))"
    )
    # the overflow guard lives INSIDE the value path (a side column
    # would be pruned away by the optimizer as unused)
    selected = (
        f"element_at(transform(array({sp}), sp0 -> "
        f"CASE WHEN size(sp0) - {k} + 1 > {POS_SPACE - 1} THEN "
        f"cast(raise_error('winnowing: document exceeds {POS_SPACE - 1} "
        f"k-grams; chunk long documents first (operators/chunking.py)') "
        f"as array<bigint>) ELSE "
        f"element_at(transform(array({keyed_of_sp0}), ks -> "
        f"{windows_of_ks}), 1) END), 1)"
    )
    return (
        df.filter(F.expr(f"size({sp}) >= {k + w - 1}"))
        .select(id_col, F.explode(F.expr(selected)).alias("key"))
        .select(
            id_col,
            (F.col("key") % POS_SPACE).cast("long").alias("pos"),
            # integer div, NOT `/`: the packed key is 60 bits and double
            # division would shear off the low bits before dividing
            F.expr(f"key div {POS_SPACE}").cast("long").alias("fp"),
        )
        .orderBy(id_col, "pos")
    )


def source_overlap_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise content-overlap matrix between sources: for every
    source pair, how many DISTINCT document fingerprints they share —
    the provenance question behind ext_source_dedup_report's scalar
    cross-source count (WHO is mirroring whom, not just how much).
    overlap_bp normalizes by the smaller side's distinct-content
    volume, so a small source fully mirrored inside a big one reads
    10000 regardless of the big side's size (the containment
    convention, not Jaccard).

    Only (source, 32-char digest) pairs — deduplicated BEFORE the
    self-join — ever shuffle; the join key is the digest, so the
    blowup per fingerprint is bounded by the number of sources
    carrying it (documents carrying it collapsed by the distinct).
    Returns (source_a, source_b, fps_a, fps_b, shared_fps,
    overlap_bp), a < b, ordered.
    """
    fps = (
        df.select(source_col, F.md5(F.lower(F.col(text_col))).alias("fp"))
        .distinct()
    )
    sizes = fps.groupBy(source_col).agg(F.count("*").cast("long").alias("n_fps"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{source_col}") < F.col(f"b.{source_col}")),
        )
        .groupBy(
            F.col(f"a.{source_col}").alias("source_a"),
            F.col(f"b.{source_col}").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("shared_fps"))
    )
    sa = sizes.select(
        F.col(source_col).alias("source_a"), F.col("n_fps").alias("fps_a")
    )
    sb = sizes.select(
        F.col(source_col).alias("source_b"), F.col("n_fps").alias("fps_b")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "fps_a",
            "fps_b",
            "shared_fps",
            F.floor(
                F.col("shared_fps") * 10000 / F.least("fps_a", "fps_b")
            ).cast("long").alias("overlap_bp"),
        )
        .orderBy("source_a", "source_b")
    )


def quality_calibration(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language calibration table for the hashed classifier: the
    score distribution (exact interpolated p10/p50/p90) plus the keep
    rate at the GLOBAL zero threshold — the table that shows why one
    global cutoff over- or under-filters some languages (their score
    distributions sit at different offsets) and what per-language
    percentile thresholds would equalize. Scores are exact BIGINTs
    (one higher-order fold per doc, no explode); the percentile is
    Spark's exact interpolated ``percentile`` = DuckDB
    ``quantile_cont`` (the length_quantiles precedent), rounded 4 dp.
    Returns (lang, n_docs, p10, p50, p90, keep_bp).
    """
    scored = df.select(
        F.col(lang_col),
        hashed_classifier_score(text_col).alias("score"),
    )
    return (
        scored.groupBy(lang_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.expr("percentile(score, 0.1)"), 4).alias("p10"),
            F.round(F.expr("percentile(score, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(score, 0.9)"), 4).alias("p90"),
            F.floor(
                F.sum((F.col("score") >= 0).cast("long")) * 10000 / F.count("*")
            ).cast("long").alias("keep_bp"),
        )
        .orderBy(lang_col)
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The MOSS match step over :func:`winnowing_fingerprints`:
    document pairs sharing at least ``min_shared`` selected
    fingerprints, with the shared count and a containment-normalized
    overlap. This is the partial-copy detector the whole-document
    kernels provably miss — a paragraph quoted inside an otherwise
    new document moves token-set Jaccard barely at all, but any
    shared run of w+k-1 tokens is GUARANTEED to land a shared
    selected fingerprint (the winnowing detection property), so
    quote-reuse surfaces here at fingerprint-index cost instead of
    shingle-posting cost.

    Fingerprints selected by more than ``max_df`` documents are
    dropped BEFORE the pair join (the MOSS ubiquity rule: boilerplate
    every page carries is no evidence of copying) — which is also the
    hot-key bound: the join is keyed on the 44-bit fingerprint, so
    the candidate blowup per fingerprint is capped at
    ``max_df``-choose-2 instead of corpus-squared. Only (doc, fp)
    BIGINT pairs — already deduplicated, ~2/(w+1) of the gram count —
    ever shuffle; text stays in the document-local selection stage.
    ``overlap_bp`` normalizes by the smaller side's retained
    fingerprint count (the containment convention, as in
    source_overlap_matrix), so a short document pasted into a long
    one still reads near 10000.

    Returns (i, j, shared_fps, overlap_bp) — all BIGINT, i < j,
    ordered.

    The selected (doc_id, fp) frame is localCheckpoint-ed (r12): the
    plan consumes it from FIVE branches (rare, both self-join sides
    via kept, sizes), and each branch would otherwise re-run the
    winnowing selection over the corpus (guide §2.4/§5). The frame is
    the fingerprint INDEX itself — BIGINT pairs at ~2/(w+1) gram
    density — i.e. exactly what winnowing_write_index persists at
    scale.
    """
    fps = (
        winnowing_fingerprints(df, k, w, id_col, text_col)
        .select(F.col(id_col).alias("doc_id"), "fp")
        .distinct()
        .localCheckpoint()
    )
    return winnowing_overlap_pairs_from_fps(fps, min_shared, max_df)


def winnowing_overlap_pairs_from_fps(
    fps: DataFrame, min_shared: int = 2, max_df: int = 64
) -> DataFrame:
    """The match step over an ALREADY-MATERIALIZED distinct
    (doc_id, fp) frame — the winnowing index contents. Callers that
    need the fingerprint frame for more than the pair kernel (e.g.
    the span locator's rare-evidence restriction) derive it once,
    localCheckpoint it, and pass it here instead of paying a second
    winnowing selection pass (r12)."""
    rare = fps.groupBy("fp").agg(F.count("*").alias("df_cnt")).filter(
        F.col("df_cnt") <= max_df
    )
    kept = fps.join(rare.select("fp"), "fp")
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_fps"))
    a, b = kept.alias("a"), kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j")
        )
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    si, sj = sizes.alias("si"), sizes.alias("sj")
    return (
        shared.join(si, F.col("i") == F.col("si.doc_id"))
        .join(sj, F.col("j") == F.col("sj.doc_id"))
        .select(
            "i",
            "j",
            "shared_fps",
            F.floor(
                F.col("shared_fps")
                * 10000
                / F.least(F.col("si.n_fps"), F.col("sj.n_fps"))
            )
            .cast("long")
            .alias("overlap_bp"),
        )
        .orderBy("i", "j")
    )


WINNOW_INDEX_BUCKETS = 16


def winnowing_write_index(
    df: DataFrame,
    path: str,
    k: int = 4,
    w: int = 4,
    n_buckets: int = WINNOW_INDEX_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the winnowing fingerprint index: one (fb, doc_id, fp)
    row per distinct selected fingerprint per document, laid out
    partitioned by ``fb = fp % n_buckets``. The fingerprint is
    already a uniform 44-bit md5-prefix hash, so the bucket is plain
    modulo — computable driver-side in pure Python (no JVM round-trip
    like bm25index._buckets_py needs for string terms), which is what
    lets a probe turn its query fingerprints into partition-pruning
    literals. Storage is ~2/(w+1) of the gram count per document —
    the winnowing density that makes a corpus-scale fingerprint index
    affordable where every-shingle postings are not (the MOSS design
    point, and the same serve-from-index discipline as
    operators/bm25index.py)."""
    import os

    fps = (
        winnowing_fingerprints(df, k, w, id_col, text_col)
        .select(F.col(id_col).alias("doc_id"), "fp")
        .distinct()
    )
    fps.select(
        F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int").alias("fb"),
        "doc_id",
        "fp",
    ).write.mode("overwrite").partitionBy("fb").parquet(
        os.path.join(path, "postings")
    )
    # layout metadata rides WITH the index: a probe bucketing with a
    # different n_buckets than the writer silently excludes every
    # posting outside its fb set (matches drop, nothing errors), so
    # the reader returns the stored value instead of trusting callers
    # to agree
    df.sparkSession.createDataFrame(
        [(int(n_buckets), int(k), int(w))], "n_buckets int, k int, w int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def winnowing_read_index(spark, path: str):
    """Returns (postings, n_buckets) — pass the STORED n_buckets to
    :func:`winnowing_index_probe` so the bucket literals match the
    layout that actually exists on disk."""
    import os

    meta = spark.read.parquet(os.path.join(path, "meta")).collect()[0]  # collect-bound: 1-row meta
    return spark.read.parquet(os.path.join(path, "postings")), meta.n_buckets


def winnowing_index_probe(
    postings: DataFrame,
    query_fps: list,
    min_shared: int = 1,
    n_buckets: int = WINNOW_INDEX_BUCKETS,
) -> DataFrame:
    """Check one document against the corpus fingerprint index (the
    MOSS serve path: "has any part of this submission been seen
    before?"). ``query_fps`` is the query document's selected
    fingerprint list — bounded at ~2/(w+1) of its gram count, so it
    travels as driver-side literals: the bucket set ``fp %
    n_buckets`` prunes the partitioned layout (PartitionFilters — the
    scan touches only the queried fingerprints' buckets, cost follows
    the query's posting lists, not the corpus), and the fp IN-list
    prunes within the bucket. Returns (doc_id, shared_fps) for every
    indexed document sharing >= ``min_shared`` fingerprints, ordered
    by evidence strength then id.

    An empty ``query_fps`` (document shorter than k+w-1 tokens) has
    no overlap evidence by construction: returns an empty frame with
    the same schema rather than raising — gates treat no-evidence as
    novel."""
    if not query_fps:
        return (
            postings.select(
                "doc_id", F.lit(0).cast("long").alias("shared_fps")
            ).limit(0)
        )
    qs = sorted({int(f) for f in query_fps})
    fbs = sorted({f % n_buckets for f in qs})
    return (
        postings.filter(F.col("fb").isin(fbs) & F.col("fp").isin(qs))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .orderBy(F.col("shared_fps").desc(), F.col("doc_id").asc())
    )


def overlap_span_anchors(
    df: DataFrame,
    i_doc: int,
    j_doc: int,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_fps: DataFrame | None = None,
) -> DataFrame:
    """The MOSS highlight step: given a document pair (typically one
    surfaced by :func:`winnowing_overlap_pairs`), report WHERE the
    shared material sits — every fingerprint value both documents
    selected, with its leftmost gram position in each. Anchors are
    what a reviewer or a scrubber consumes next: each (pos_i, pos_j)
    pair marks the start of a k-gram both documents contain verbatim,
    and runs of consecutive anchors trace the copied span (detection
    finds THAT content was reused; this locates it, completing
    detect -> locate the way dup_span_scrub locates exact n-gram
    repeats corpus-wide).

    Document-local selection (zero shuffles) filtered to TWO
    documents, then a fingerprint-keyed join of two tiny frames —
    cost is the two documents' fingerprint lists, nothing
    corpus-shaped. Leftmost position per side keeps the output
    deterministic when a fingerprint repeats within a document.

    ``allowed_fps`` (a 1-column ``fp`` frame) restricts anchors to
    the SAME evidence set the match step used — pass the corpus's
    rare-fingerprint set so a ubiquitous boilerplate header both
    documents carry is not highlighted as a copied span (the MOSS
    ubiquity rule must hold detect AND locate, or a scrubber
    consuming anchors scrubs boilerplate as plagiarism). None skips
    the restriction (pair-local forensics over everything shared).
    Returns (fp, pos_i, pos_j) ordered by pos_i, fp — all BIGINT.
    """
    fps = winnowing_fingerprints(
        df.filter(F.col(id_col).isin([int(i_doc), int(j_doc)])),
        k, w, id_col, text_col,
    )
    if allowed_fps is not None:
        fps = fps.join(allowed_fps.select("fp"), "fp")
    side_i = (
        fps.filter(F.col(id_col) == int(i_doc))
        .groupBy("fp")
        .agg(F.min("pos").cast("long").alias("pos_i"))
    )
    side_j = (
        fps.filter(F.col(id_col) == int(j_doc))
        .groupBy("fp")
        .agg(F.min("pos").cast("long").alias("pos_j"))
    )
    return (
        side_i.join(side_j, "fp")
        .select("fp", "pos_i", "pos_j")
        .orderBy("pos_i", "fp")
    )
