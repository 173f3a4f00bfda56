"""Corpus vocabulary construction and unigram-LM scoring.

The tokenizer-building step of a training-data pipeline: derive a
frequency-ordered vocabulary from the corpus itself (the id assignment
every downstream tokenizer consumes), then score documents by unigram
surprisal against the corpus LM — the classic cheap quality signal
(documents whose tokens are systematically improbable under the corpus
distribution are boilerplate, encoding noise, or off-domain).

Scale design (100 TB):
- Token counting is a narrow ``explode`` + partial-aggregated
  ``groupBy(token)`` — map-side combine collapses each partition to its
  distinct tokens before the single shuffle; the text column itself
  never shuffles.
- Vocabulary selection is top-N by (count DESC, token ASC) — a
  ``TakeOrderedAndProject`` (no global sort materialization), and the
  result (N rows, two narrow columns) is broadcast back for id lookup.
- Surprisal scoring joins exploded tokens against the BROADCAST
  vocabulary — the corpus-side stream never shuffles; out-of-vocab
  tokens fall back to a single smoothed OOV probability so the
  broadcast stays bounded (``top_n`` rows) no matter how heavy the
  token tail gets at scale.

Tokenization matches the repo-wide convention (split on single space,
``operators/text.py:token_count``) so vocab ids, token accounting and
surprisal all agree on what a token is.

Reference anchor: the reference has no tokenizer pipeline (its text
path is the ES analyzer, gmall-publisher DSL building at
PublisherServiceImpl.java); this family is a beyond-reference
extension for LLM corpus curation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode to one row per token occurrence. Narrow (no shuffle);
    duplicates preserved — counts downstream are occurrence counts."""
    return df.withColumn("token", F.explode(F.split(F.col(text_col), " ")))


def vocab_build(
    df: DataFrame, top_n: int = 256, text_col: str = "text"
) -> DataFrame:
    """Frequency-ordered vocabulary: ``(token_id, token, cnt)`` with
    contiguous ids 0..top_n-1 assigned by (cnt DESC, token ASC) — the
    deterministic tie-break makes id assignment engine-portable.

    The ``row_number`` window is over the top-N rows only (the
    ``limit`` is applied on an already-aggregated frame of distinct
    tokens), so the single-partition window everyone fears with
    ``Window.orderBy`` touches N rows, not the corpus.
    """
    counts = (
        corpus_tokens(df, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    rank_key = F.struct((-F.col("cnt")).alias("c"), F.col("token").alias("t"))
    topn = counts.orderBy(rank_key).limit(top_n)
    w = Window.orderBy(rank_key)
    return topn.select(
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("token_id"),
        "token",
        F.col("cnt").cast("long").alias("cnt"),
    )


def unigram_surprisal(
    df: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram surprisal ``avg(-ln p(tok))`` under
    the add-one-smoothed corpus LM restricted to ``vocab``:

        p(tok in vocab) = (cnt + 1) / (total + V + 1)
        p(OOV)          = 1         / (total + V + 1)

    ``vocab`` is the (token, cnt) frame from :func:`vocab_build` —
    joined as a BROADCAST (bounded rows by construction), so the
    document stream stays shuffle-free until the final per-doc
    aggregation on ``id_col``. Returns (id_col, n_tokens, surprisal).
    """
    denom = float(total_tokens + vocab_size + 1)
    toks = corpus_tokens(df.select(id_col, text_col), text_col)
    scored = toks.join(
        F.broadcast(vocab.select("token", "cnt")), on="token", how="left"
    ).select(
        id_col,
        (-F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0)) / F.lit(denom))).alias(
            "surprisal_tok"
        ),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg("surprisal_tok").alias("surprisal"),
    )


END_OF_WORD = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the ONLY corpus-sized pass BPE
    training makes. Everything after operates on this table, whose row
    count is the distinct-word vocabulary (bounded by language, not by
    corpus size) — the classic Sennrich et al. 2016 trick that makes
    BPE training tractable at 100 TB: iterate on word *types* weighted
    by frequency, never on the token stream."""
    return (
        corpus_tokens(df.select(text_col), text_col)
        .filter(F.col("token") != "")
        .groupBy(F.col("token").alias("word"))
        .agg(F.count("*").alias("freq"))
    )


def _word_symbols(word) -> "F.Column":
    """Initial symbol sequence: one symbol per character plus the
    end-of-word marker (so merges can't cross word boundaries and a
    word-final symbol is distinct from the same char mid-word)."""
    word = F.col(word) if isinstance(word, str) else word
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms) -> "F.Column":
    """struct(a, b) per adjacent symbol position."""
    syms = F.col(syms) if isinstance(syms, str) else syms
    return F.transform(
        F.slice(syms, 1, F.size(syms) - 1),
        lambda x, i: F.struct(x.alias("a"), F.element_at(syms, i + F.lit(2)).alias("b")),
    )


def _apply_merge(syms, a: str, b: str) -> "F.Column":
    """Greedy left-to-right merge of every adjacent (a, b) into the
    concatenated symbol — a left fold (``F.aggregate``), so [a,a,a]
    under merge (a,a) becomes [aa, a] exactly like the sequential
    reference algorithm. Pure built-ins: stays in codegen, no UDF."""
    syms = F.col(syms) if isinstance(syms, str) else syms
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    max_word_types: int = 2_000_000,
) -> list[dict]:
    """Train ``n_merges`` BPE merge rules on the corpus. Returns the
    merge table [{step, left, right, merged, freq}] in training order
    — the artifact a tokenizer ships.

    Architecture (the one every production BPE trainer uses, Sennrich
    et al. 2016 onward): the CORPUS-sized work is exactly one
    distributed pass — the word-type frequency histogram
    (:func:`word_freqs`). The merge loop then runs on that histogram,
    which is bounded by the language's word-type vocabulary (a few
    million rows ≈ tens of MB), NOT by corpus size — 100 TB of text
    and 100 GB of text produce comparably-sized histograms. So the
    loop is a driver-side computation over a provably bounded table, a
    deliberate exception to the no-collect rule (and the reason real
    tokenizer trainers are single-node after the counting stage: 30k
    sequential merge rounds against corpus-sized state would be absurd).
    If the histogram exceeds ``max_word_types`` the training falls back
    to :func:`bpe_train_distributed`, which keeps all state in
    DataFrames at ~2 Spark jobs per merge round.

    Determinism: merge choice is (freq DESC, left ASC, right ASC) —
    engine-portable, no RNG; both paths and the pure-Python reference
    model in tests agree exactly."""
    wf = word_freqs(df, text_col)
    if wf.limit(max_word_types + 1).count() > max_word_types:
        return bpe_train_distributed(df, n_merges, text_col, min_freq)
    words: dict[tuple, int] = {}
    for r in wf.collect():  # collect-bound: <= max_word_types rows (guard above)
        words[tuple(list(r["word"]) + [END_OF_WORD])] = int(r["freq"])
    merges: list[dict] = []
    for step in range(n_merges):
        pair_counts: dict[tuple, int] = {}
        for syms, freq in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        (a, b), pfreq = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pfreq < min_freq:
            break
        merges.append(
            {"step": step, "left": a, "right": b, "merged": a + b, "freq": int(pfreq)}
        )
        rewritten: dict[tuple, int] = {}
        for syms, freq in words.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            rewritten[key] = rewritten.get(key, 0) + freq
        words = rewritten
    return merges


def bpe_train_distributed(
    df: DataFrame, n_merges: int, text_col: str = "text", min_freq: int = 2
) -> list[dict]:
    """All-DataFrame BPE training for histograms too large to collect:
    each round is adjacent-pair counts over the word-type table
    (explode + partial-aggregated groupBy — the pair key space is
    bounded by the symbol vocabulary), a single-row argmax collect by
    (freq DESC, pair ASC), and the fold-kernel rewrite
    (:func:`_apply_merge`). ``localCheckpoint`` truncates per-round
    lineage (same discipline as operators/graph.py:pagerank) so round
    k's plan doesn't replay rounds 1..k-1.

    The loop is inherently sequential (merge k+1's counts depend on
    merge k's rewrite) — the parallelism is WITHIN each round, which
    is all BPE training admits anywhere. Produces EXACTLY the same
    merge table as :func:`bpe_train` (pinned by test)."""
    words = (
        word_freqs(df, text_col)
        .select(_word_symbols("word").alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[dict] = []
    for step in range(n_merges):
        best = (
            words.select(F.explode(_adjacent_pairs("syms")).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pfreq"))
            .orderBy(F.desc("pfreq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # collect-bound: limit(1)
        )
        if not best or best[0]["pfreq"] < min_freq:
            break
        a, b, pfreq = best[0]["a"], best[0]["b"], int(best[0]["pfreq"])
        merges.append(
            {"step": step, "left": a, "right": b, "merged": a + b, "freq": pfreq}
        )
        words = words.select(
            _apply_merge("syms", a, b).alias("syms"), "freq"
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge table to the corpus: (id_col, n_tokens,
    n_chars) per document, where n_tokens counts BPE symbols after all
    merges (the number a loader budgets context length with).

    The merge list is a driver-side constant (a tokenizer artifact of
    a few thousand rules); applying rules sequentially per word is an
    inherently iterative inner loop, so this is the documented
    Pandas-UDF case (Arrow-batched, broadcast-free: the rules travel in
    the closure) rather than ``n_merges`` chained fold projections that
    would blow past codegen's expression budget at real rule counts."""
    rules = [(m["left"], m["right"]) for m in merges]

    @F.pandas_udf("int")
    def n_bpe_tokens(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def encode_word(word: str) -> int:
            # encoding is a pure function of the word, and natural text
            # repeats words heavily — memoize per worker (Zipf's law
            # makes the hit rate ~= 1 - typeRate, huge in practice)
            hit = memo.get(word)
            if hit is not None:
                return hit
            syms = list(word) + [END_OF_WORD]
            for a, b in rules:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            memo[word] = len(syms)
            return len(syms)

        return texts.map(
            lambda t: sum(encode_word(w) for w in t.split(" ") if w) if t else 0
        )

    return df.select(
        id_col,
        n_bpe_tokens(F.col(text_col)).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def token_pmi_pairs(
    df: DataFrame,
    vocab: DataFrame,
    n_docs: int | None,
    min_cooccur: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: pointwise mutual information over token
    PAIRS co-occurring in a document, restricted to the ``vocab``
    frame — the phrase/topic-affinity signal corpus analyses build on.

        pmi(a, b) = ln( N * df(a,b) / (df(a) * df(b)) )

    with doc-frequency counts (presence, not occurrences) and N the
    corpus document count.

    Scale design: the vocabulary restriction is the whole story — the
    pair space is bounded at |V|^2/2 regardless of corpus size, so the
    co-occurrence aggregation partial-aggregates into at most that many
    keys map-side. Tokens filter through a BROADCAST vocab join, each
    doc collapses to its sorted distinct vocab-token array (bounded at
    |V| entries), and pairs are generated per doc with the same array
    combinatorics as the near-dup bucket kernel — text never shuffles,
    and nothing the size of the corpus ever hits a wide key space.
    Returns (a, b, cooccur, pmi4) with a < b.

    ``n_docs=None`` derives N IN-PLAN as a 1-row count aggregate of
    ``df`` broadcast-cross-joined into the PMI projection (r13, guide
    §5: callers used to run a blocking ``df.count()`` before the real
    query — a separate driver action per build). Same double: the
    float literal path and the in-plan cast(count as double) agree
    exactly for any N < 2^53.

    ``per_doc`` is localCheckpoint-ed (r13): THREE plan branches
    consume it (the pair explode plus the two dfreq broadcast sides),
    and each used to re-run the corpus tokenize + vocab join +
    collect_set — the dominant cost. The frame is |docs| rows of
    <=|V|-entry arrays, exactly the per-doc vocabulary projection a
    corpus analysis persists (guide §8's materialize-the-proxy trade,
    same judgement as the r12 winnowing/rare-token materializations)."""
    toks = corpus_tokens(df.select(id_col, text_col), text_col).join(
        F.broadcast(vocab.select("token")), "token"
    )
    per_doc = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_set("token")).alias("ts")
    ).localCheckpoint()
    pairs = per_doc.filter(F.size("ts") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, k) -> "
                "transform(slice(ts, k + 2, size(ts)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    cab = pairs.groupBy("a", "b").agg(F.count("*").alias("cooccur"))
    # dfreq from per_doc, not from a second pass over toks: ``ts`` is
    # the collect_set of the doc's vocab tokens, so exploding it yields
    # exactly the distinct (doc, token) rows the old
    # ``toks.distinct().groupBy`` counted — identical dfreq, one fewer
    # corpus tokenize pass and one fewer distinct shuffle (guide §2.4)
    uni = (
        per_doc.select(F.explode("ts").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("dfreq"))
    )
    scored = (
        cab.filter(F.col("cooccur") >= min_cooccur)
        .join(F.broadcast(uni.withColumnRenamed("token", "a").withColumnRenamed("dfreq", "dfa")), "a")
        .join(F.broadcast(uni.withColumnRenamed("token", "b").withColumnRenamed("dfreq", "dfb")), "b")
    )
    if n_docs is None:
        nd = df.select(id_col).agg(F.count("*").alias("_ndocs"))
        scored = scored.join(F.broadcast(nd))
        n_expr = F.col("_ndocs").cast("double")
    else:
        n_expr = F.lit(float(n_docs))
    return scored.select(
        "a",
        "b",
        F.col("cooccur").cast("long").alias("cooccur"),
        F.round(
            F.log(
                n_expr
                * F.col("cooccur")
                / (F.col("dfa") * F.col("dfb"))
            ),
            4,
        ).alias("pmi4"),
    )


UNK = "<unk>"


def bigram_surprisal(
    df: DataFrame,
    vocab_tokens: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, surprisal): per-document mean bigram surprisal
    ``avg(-ln p(w2|w1))`` under the add-one-smoothed corpus bigram LM
    over the closed symbol set vocab ∪ {<unk>} (every off-vocab token
    maps to <unk> BEFORE pairing, so the model space is bounded at
    (V+1)² however large the corpus — the same boundedness trick as
    token_pmi):

        p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V + 1)

    with c(w1·) the count of bigram occurrences led by w1 and V+1 the
    symbol-set size. The order-sensitive upgrade of
    :func:`unigram_surprisal` — repetitive or shuffled text scores
    high even when its unigram profile looks natural.

    Plan shape: symbol mapping is a narrow map against the LITERAL
    vocab array (no join — V is driver-bounded by construction);
    bigrams fan out per position; the count tables are (V+1)²-bounded
    aggregates broadcast back into the scoring pass; the only
    corpus-keyed shuffle is the final per-doc aggregation."""
    v_syms = len(vocab_tokens) + 1  # + <unk>
    lit_vocab = F.array(*[F.lit(t) for t in vocab_tokens])
    syms = F.transform(
        F.split(F.col(text_col), " "),
        lambda t: F.when(F.array_contains(lit_vocab, t), t).otherwise(F.lit(UNK)),
    )
    bg = df.select(F.col(id_col), syms.alias("_syms")).select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(_syms) >= 2 THEN "
                "transform(sequence(1, size(_syms) - 1), "
                "i -> struct(element_at(_syms, i) AS w1, element_at(_syms, i + 1) AS w2)) "
                "ELSE array() END"
            )
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    # the count table is (V+1)^2-bounded; localCheckpoint it so the
    # expensive bigram fan-out (tokenize + vocab membership per token)
    # runs ONCE instead of once per consumer (c12 broadcast, c1
    # broadcast — guide §2.4; the scoring pass over bg itself stays
    # lazy and is the one full-corpus pass)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).localCheckpoint()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .select(
            id_col,
            (
                -F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.lit(float(v_syms)))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("s").alias("surprisal"),
    )


def surprisal_buckets(
    scored: DataFrame, n_buckets: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style perplexity banding (Wenzek et al. 2020, public
    paper): split the corpus into equal-frequency quality bands —
    head / middle / tail for ``n_buckets=3`` — by per-document LM
    surprisal (:func:`unigram_surprisal` output). Band 1 is the most
    in-distribution (lowest surprisal) slice; curation recipes keep
    head+middle and route tail to extra filtering.

    ntile over (4dp-rounded surprisal, id) — the q23 decile
    discipline: round first so knife-edge docs band identically in
    both engines, break ties on the PK so rank parity is exact. At
    fact scale swap the global ntile for approx_percentile cutoffs
    (mergeable t-digest, map-side) and band by threshold — exact
    equal-frequency rank parity is a fixture-scale affordance
    (plans/registry.py q23 carries the same note).

    Returns (id_col, surprisal4, bucket).
    """
    s4 = F.round("surprisal", 4)
    w = Window.orderBy(s4.asc(), F.col(id_col).asc())
    return scored.select(
        F.col(id_col),
        s4.alias("surprisal4"),
        F.ntile(n_buckets).over(w).cast("int").alias("bucket"),
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-health metric: per-language out-of-vocabulary rate
    under a bounded vocabulary — the first thing a tokenizer/corpus
    pairing is judged on (a language whose tokens mostly fall outside
    the vocab trains as byte soup). Returns
    (lang, n_tokens, oov_tokens, oov_bp) with the rate frozen to
    integer basis points (the q10 per-mille discipline — no float
    rides the contract).

    One narrow token explode + a BROADCAST left join against the
    bounded vocab + one (lang)-keyed agg with map-side combine: text
    never shuffles, the only wide exchange carries (lang, partials).
    """
    toks = corpus_tokens(df.select(lang_col, text_col), text_col)
    probed = toks.join(
        F.broadcast(vocab.select("token", "cnt")), "token", "left"
    )
    return (
        probed.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt").isNull().cast("int")).cast("long").alias(
                "oov_tokens"
            ),
        )
        .select(
            "lang",
            "n_tokens",
            "oov_tokens",
            F.round(F.col("oov_tokens") * 10000.0 / F.col("n_tokens"))
            .cast("long")
            .alias("oov_bp"),
        )
    )


def rare_token_report(
    df: DataFrame,
    max_df_bp: int = 1000,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Long-tail knowledge finder: documents that carry RARE tokens —
    tokens whose corpus document frequency is at most ``max_df_bp``
    basis points of the corpus doc count (cutoff = floor(n_docs *
    max_df_bp / 10000), integer in both engines). Rarity is RELATIVE:
    an absolute df cutoff silently degenerates as the corpus grows
    (at 100x the docs, df <= 2 selects nothing), while a share-of-
    corpus cutoff names the same tail at every scale. Rare-token
    density is the standard proxy for "this document contains
    information the rest of the corpus doesn't"; curation pipelines
    up-sample high-density docs (the complement of the boilerplate
    audit, which finds what is repeated everywhere).

    Returns one row per document that contains at least one rare
    token: (doc_id, lang, n_distinct, n_rare, rare_bp) where
    n_distinct is the doc's distinct-token count, n_rare the distinct
    rare tokens it contains, and rare_bp the density in integer basis
    points (round(n_rare * 10000 / n_distinct)).

    Shape at 100 TB: per-doc DISTINCT before the token shuffle (the
    boilerplate_ngrams discipline) caps the exploded rows at distinct
    tokens per doc; the document-frequency aggregate shuffles tokens
    once; the doc count is a bounded collected scalar (the
    perplexity-band discipline); the rare set — vocabulary-tail-sized
    by construction — flows back as a token-keyed semi-join. No text
    ever shuffles and no full vocab is collected anywhere.
    """
    cutoff = df.count() * max_df_bp // 10000
    # localCheckpoint (r12): three plan branches (document frequency,
    # per-doc distinct counts, the rare semi-join probe) each re-ran
    # the explode + per-doc distinct over the corpus
    doc_toks = (
        df.select(id_col, lang_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .dropDuplicates([id_col, "token"])
        .localCheckpoint()
    )
    dfreq = doc_toks.groupBy("token").agg(F.count("*").alias("dfc"))
    rare = dfreq.filter(F.col("dfc") <= cutoff).select("token")
    per_doc = doc_toks.groupBy(id_col, lang_col).agg(
        F.count("*").cast("long").alias("n_distinct")
    )
    rare_hits = (
        doc_toks.join(rare, "token", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_rare"))
    )
    return (
        per_doc.join(rare_hits, id_col)
        .select(
            id_col,
            lang_col,
            "n_distinct",
            "n_rare",
            F.round(F.col("n_rare") * 10000.0 / F.col("n_distinct"))
            .cast("long")
            .alias("rare_bp"),
        )
    )


def oov_sweep(
    df: DataFrame,
    sizes: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-budget planning: corpus OOV rate at SEVERAL candidate
    vocabulary sizes from ONE pass — the curve a tokenizer designer
    reads before committing a vocab budget (the marginal coverage of
    doubling the vocab falls off the Zipf cliff somewhere; this finds
    where). Returns one row per candidate size:
    (top_n, n_tokens, oov_tokens, oov_bp), rates as integer basis
    points.

    Shape at 100 TB: token frequencies aggregate once (the only
    token-keyed shuffle), the rank table is vocabulary-sized and
    broadcast back onto the token stream, and every candidate size is
    a CONDITIONAL SUM over the same probed column — adding a size adds
    one aggregate expression, not a pass. The per-size rows unpivot
    from the single aggregate row via explode of a literal-built
    array (no join, no extra shuffle).
    """
    max_n = max(sizes)
    toks = corpus_tokens(df.select(text_col), text_col)
    ranked = vocab_build(df, top_n=max_n, text_col=text_col).select(
        "token", (F.col("token_id") + 1).alias("rank")  # 1-based
    )
    probed = toks.join(F.broadcast(ranked), "token", "left")
    agg = probed.agg(
        F.count("*").cast("long").alias("n_tokens"),
        *[
            F.sum(
                (F.col("rank").isNull() | (F.col("rank") > n)).cast("long")
            ).alias(f"oov_{n}")
            for n in sizes
        ],
    )
    return (
        agg.select(
            "n_tokens",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).cast("long").alias("top_n"),
                            F.col(f"oov_{n}").alias("oov_tokens"),
                        )
                        for n in sizes
                    ]
                )
            ).alias("e"),
        )
        .select(
            F.col("e.top_n"),
            "n_tokens",
            F.col("e.oov_tokens"),
            F.round(F.col("e.oov_tokens") * 10000.0 / F.col("n_tokens"))
            .cast("long")
            .alias("oov_bp"),
        )
    )


def zipf_slope(
    df: DataFrame,
    top_v: int = 64,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language Zipf fit over the top-``top_v`` token frequencies:
    the OLS slope (and intercept) of ``ln(freq) ~ ln(rank)`` — natural
    language sits near slope -1; a corpus slice that deviates hard is
    templated/boilerplate (too flat: synthetic key soup) or
    degenerate (too steep: one token dominating), making this the
    cheapest distribution-shape QA signal next to the ratio rules.

    slope = covar_pop(ln r, ln f) / var_pop(ln r), spelled out the
    same way on the DuckDB side (= regr_slope) so the contract is the
    formula. Ranks are row_number by (freq DESC, token ASC) — the
    deterministic tie-break — and the rank window is PER LANGUAGE over
    the aggregated (lang, token) count frame, so it distributes; only
    token counts shuffle, never text. Returns
    (lang, v, slope, intercept) with the doubles rounded to 4 dp.

    Degenerate groups (round-6 ADVICE): with a single distinct token
    (v = 1) var_pop(lx) is 0 — Spark's x/0 yields NULL while DuckDB's
    IEEE 0/0 yields NaN, so the division is guarded on BOTH sides
    (when var > 0 here, nullif(var, 0) in the oracle): a one-token
    language reports slope = intercept = NULL, which is the honest
    answer — no line fits one point.
    """
    counts = (
        df.withColumn("token", F.explode(F.split(F.col(text_col), " ")))
        .groupBy(lang_col, "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_v)
        .select(
            lang_col,
            F.log(F.col("rank").cast("double")).alias("lx"),
            F.log(F.col("cnt").cast("double")).alias("ly"),
        )
    )
    return (
        ranked.groupBy(lang_col)
        .agg(
            F.count("*").cast("long").alias("v"),
            F.when(
                F.var_pop("lx") > 0, F.covar_pop("lx", "ly") / F.var_pop("lx")
            ).alias("_slope"),
            F.avg("lx").alias("_mx"),
            F.avg("ly").alias("_my"),
        )
        .select(
            lang_col,
            "v",
            F.round("_slope", 4).alias("slope"),
            F.round(F.col("_my") - F.col("_slope") * F.col("_mx"), 4).alias(
                "intercept"
            ),
        )
        .orderBy(lang_col)
    )


def source_divergence(
    df: DataFrame,
    vocab: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source Jensen-Shannon divergence against the corpus token
    distribution — the mixture-drift monitor: a source whose JSD
    creeps up is diverging from the corpus it is supposed to feed
    (crawl rot, template takeover, language shift). Bounded in
    [0, ln 2]; symmetric; defined even where a source is missing
    tokens, unlike raw KL.

    Both distributions live on the FIXED support of ``vocab`` (the
    broadcast top-V frame from :func:`vocab_build`, renormalized), so
    the absent-token terms of the global half-sum collapse to the
    closed form ``0.5·ln2·(1 - Σ_{t∈s} q_t)``:

        JSD_s = 0.5·Σ_{t∈s}[p·ln(p/m) + q·ln(q/m) − q·ln2] + 0.5·ln2

    with ``m = (p+q)/2`` — which needs only the per-(source, token)
    rows a source actually HAS. No source×vocab grid, no outer join:
    one narrow explode, a broadcast semi-restriction to the vocab,
    one partial-aggregated count shuffle, and a broadcast join of the
    V-row global distribution. Returns (source, n_tokens, jsd4) with
    the double rounded to 4 dp.
    """
    st = _vocab_restricted_counts(df, vocab, source_col, text_col)
    gl = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    # the global total via a whole-frame window over the V-row vocab
    # frame (bounded by construction) — no driver round-trip, one job
    q = gl.withColumn(
        "tot", F.sum("c_t").over(Window.partitionBy(F.lit(1)))
    ).select("token", (F.col("c_t") / F.col("tot").cast("double")).alias("q"))
    return _jsd_fold(st, q, source_col)


def _vocab_restricted_counts(
    df: DataFrame, vocab: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """(source, token, c_st) occurrence counts restricted to the
    broadcast vocabulary support — the one corpus-sized pass both
    divergence variants share."""
    return (
        df.select(source_col, text_col)
        .withColumn("token", F.explode(F.split(F.col(text_col), " ")))
        .join(F.broadcast(vocab.select("token")), "token")
        .select(source_col, "token")
        .groupBy(source_col, "token")
        .agg(F.count("*").alias("c_st"))
    )


def _jsd_fold(st: DataFrame, q: DataFrame, source_col: str) -> DataFrame:
    """JSD via the closed-form absent-token fold (see
    :func:`source_divergence`): needs only the (source, token) rows a
    source actually has, plus the V-row reference distribution ``q``
    (token, q with Σq = 1) joined as a broadcast."""
    stot = st.groupBy(source_col).agg(F.sum("c_st").alias("tot_s"))
    ln2 = 0.6931471805599453
    p = F.col("c_st") / F.col("tot_s")
    m = (p + F.col("q")) / F.lit(2.0)
    term = p * F.log(p / m) + F.col("q") * F.log(F.col("q") / m) - F.col("q") * F.lit(
        ln2
    )
    return (
        st.join(F.broadcast(q), "token")
        .join(F.broadcast(stot), source_col)
        .groupBy(source_col)
        .agg(
            F.sum("c_st").cast("long").alias("n_tokens"),
            F.round(F.sum(term) * F.lit(0.5) + F.lit(0.5 * ln2), 4).alias("jsd4"),
        )
        .orderBy(source_col)
    )


def vocab_distribution(vocab: DataFrame) -> DataFrame:
    """(token, q) reference distribution from a :func:`vocab_build`
    frame: counts renormalized over the top-V support. V-row input,
    V-row output — computed once offline, broadcast everywhere."""
    return vocab.withColumn(
        "tot", F.sum("cnt").over(Window.partitionBy(F.lit(1)))
    ).select("token", (F.col("cnt") / F.col("tot").cast("double")).alias("q"))


def reference_divergence(
    df: DataFrame,
    ref: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source JSD against a FROZEN reference distribution ``ref``
    (token, q from :func:`vocab_distribution`) instead of the pooled
    corpus — the drift-detection form: freeze the distribution of a
    trusted snapshot once, then measure every later slice (or every
    arriving micro-batch, streaming/pipelines.py:
    divergence_monitor_pipeline) against it. Same closed-form fold and
    output shape as :func:`source_divergence`; per-slice results are a
    pure function of the slice + the frozen reference, so streaming
    output ≡ batch on the same rows by construction."""
    st = _vocab_restricted_counts(df, ref, source_col, text_col)
    return _jsd_fold(st, ref.select("token", "q"), source_col)
