"""Text-analysis operators: TF-IDF, language stats/ID, quality scoring,
token counting, document fingerprinting.

All built-in-function compositions over the ``documents`` table — the hot
path is explode + hash-aggregate, the same shape as the index pipeline, so
everything whole-stage-codegens and scales with the same partitioning
story. The reference's seed is T1/T2/A1 (tokenize/normalize/aggregate,
``src/functions.cpp:77-128``); TF-IDF composes the reference's df with the
term frequencies it deliberately discards (``src/functions.cpp:86``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduceindexer_spark.functions.text import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    normalized_token_array,
    shingles,
    tokens_normalized,
)

# Whitespace tokens, alpha runs, digit runs, single punctuation — the
# "BPE-ish" pre-tokenizer split used by q_token_counts.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tfidf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, idf, tfidf) — classic ln(N/df) weighting.

    Shape: ONE corpus scan — tf by aggregation, then df as a window count
    over tf (tf has exactly one row per (doc, term), so ``count() OVER
    (PARTITION BY term)`` IS the document frequency). No self-join, no
    second scan: scan → explode → (doc,term) agg → term-partitioned window
    → broadcast of the single-row corpus count. At 100 TB the df column is
    exactly the index's postings df — build once, reuse both places.
    """
    from pyspark.sql import Window

    terms = tokens_normalized(docs)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").cast("bigint").alias("tf"))
    tfdf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("bigint")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    idf_raw = F.log(F.col("n_docs") / F.col("df"))
    return tfdf.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        F.round(idf_raw, 6).alias("idf"),
        F.round(F.col("tf") * idf_raw, 6).alias("tfidf"),
    )


def lang_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics (metadata aggregation family)."""
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(38,10)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality heuristics: token count, mean token length,
    stopword ratio, and a bounded composite score.

    The score is a deliberately simple, fully-deterministic formula
    (length prior × (1 − stopword share)); real pipelines swap in a model
    score — the query shape (explode → agg → arithmetic) is the point.
    """
    terms = tokens_normalized(docs)
    per_doc = terms.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.col("term").isin(*STOPWORDS_EN).cast("int")).cast("bigint").alias("n_stop"),
        F.round(
            F.sum(F.length("term").cast("decimal(38,10)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_token_len"),
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        "avg_token_len",
        F.round(F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * (1 - stop_ratio), 6).alias(
            "quality"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-list language ID (n-gram heuristic family).

    Scores each doc against three stopword lists; argmax with a fixed
    precedence (en > de > fr) for ties. A real system uses char-n-gram
    models; the Spark shape (explode → conditional agg → argmax) is
    identical.
    """
    terms = tokens_normalized(docs)
    hits = terms.groupBy("doc_id").agg(
        F.sum(F.col("term").isin(*STOPWORDS_EN).cast("int")).cast("bigint").alias("en_hits"),
        F.sum(F.col("term").isin(*STOPWORDS_DE).cast("int")).cast("bigint").alias("de_hits"),
        F.sum(F.col("term").isin(*STOPWORDS_FR).cast("int")).cast("bigint").alias("fr_hits"),
    )
    return hits.select(
        "doc_id",
        "en_hits",
        "de_hits",
        "fr_hits",
        F.when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")),
            "en",
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
        .alias("lang_pred"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenizer counts per document — the
    token-budget accounting every training pipeline needs."""
    ws = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    bpe = F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0)
    return docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(bpe).cast("bigint").alias("n_bpe_pieces"),
    )


def fingerprints(docs: DataFrame, k: int = 3) -> DataFrame:
    """Winnowing-style document fingerprint: min shingle digest per doc.

    Documents with < k tokens have no shingles and are excluded —
    consistent in engine and oracle.
    """
    sh = docs.select(
        "doc_id",
        F.explode(shingles(normalized_token_array("text"), k)).alias("shingle"),
    )
    return sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


def doc_2grams(docs: DataFrame) -> DataFrame:
    """(doc_id, g) word-2-gram stream WITH multiplicity — narrow per-row
    construction (no shuffle); docs with < 2 tokens contribute nothing."""
    return docs.select(
        "doc_id", normalized_token_array("text").alias("tk")
    ).select(
        "doc_id",
        F.explode(
            F.when(
                F.size("tk") >= 2,
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals over word 2-grams:
    duplicate-2-gram ratio and most-frequent-2-gram fraction.

    High values flag boilerplate/spam documents that slip past exact and
    near dedup (repetition is WITHIN a document, not across documents) —
    a standard quality gate in LLM data curation (Rae et al., Gopher
    §A1.1). Shape: narrow per-row 2-gram construction (no shuffle), one
    explode, one (doc, gram) aggregate, one per-doc aggregate — identical
    partitioning story to the index pipeline, so it scales the same way.
    Documents with < 2 tokens have no 2-grams and are excluded, in engine
    and oracle alike.
    """
    per_gram = doc_2grams(docs).groupBy("doc_id", "g").agg(
        F.count("*").alias("cnt")
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_2grams"),
        F.count("*").cast("bigint").alias("n_distinct_2grams"),
        F.round(1 - F.count("*") / F.sum("cnt"), 6).alias("dup_2gram_ratio"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_2gram_frac"),
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits).

    H = log2(n) - (1/n) * sum tf * log2(tf) — the sum runs over per-term
    contributions cast to DECIMAL(38,10), so the aggregate is exact and
    order-independent; only the final two double ops happen in IEEE
    arithmetic. Low entropy = repetitive/templated text, another curation
    quality gate. One explode + two hash aggregates, no joins.
    """
    terms = tokens_normalized(docs)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    contrib = (F.col("tf") * F.log2("tf")).cast("decimal(38,10)")
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum(contrib).cast("double").alias("s"),
    )
    h = F.log2("n_tokens") - F.col("s") / F.col("n_tokens")
    return per_doc.select(
        "doc_id", "n_tokens", F.round(h, 6).alias("entropy_bits")
    )


def domain_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus accounting: document counts, exact-duplicate rate
    (md5 of raw text) and character volume — the per-domain health sheet
    a curation pipeline reviews before setting mixing weights. Two hash
    aggregates (md5 collapses within source first); no joins."""
    per_text = docs.groupBy("source", F.md5("text").alias("h")).agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )
    return per_text.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_unique_texts"),
        F.round(1 - F.count("*") / F.sum("n"), 6).alias("dup_ratio"),
        F.sum("chars").cast("bigint").alias("sum_chars"),
    )


def mixing_weights(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled source mixing weights: share_i proportional to
    n_i ** alpha (alpha < 1 upweights small sources — the multilingual /
    multi-domain sampling scheme from GPT-3 / XLM-R style pipelines).

    The normalizer is a sum of per-source DECIMAL(38,10) casts of
    n**alpha, so shares are bit-deterministic; the per-source relation is
    one aggregate row per domain and broadcasts at any corpus size.
    """
    per_src = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    n_dbl = F.col("n_docs").cast("double")
    # sqrt is IEEE-exactly-rounded in every engine; pow(x, 0.5) is not —
    # route the common alpha through sqrt so the oracle replays it bit-exact.
    w_dbl = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    w = w_dbl.cast("decimal(38,10)")
    weighted = per_src.select("source", "n_docs", w.alias("w"))
    total = weighted.agg(F.sum("w").alias("tw"))
    share = F.col("w").cast("double") / F.col("tw").cast("double")
    return weighted.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.floor(share * 1000000).cast("bigint").alias("docs_per_million"),
    )


def blocklist_hits(
    docs: DataFrame, terms: tuple[str, ...], flag_threshold: int = 5
) -> DataFrame:
    """Safety / content-policy gate: per-document blocklist term counts.

    The standard first-pass filter of an LLM curation pipeline — a fixed
    term list (slurs, boilerplate markers, spam vocabulary) matched
    against normalized tokens. Tokenize once (the same T1+T2 pass as the
    index pipeline), filter to the blocklist with an IN predicate (a tiny
    literal set — codegen emits a switch, no join), then one hash
    aggregate per document. Documents with zero hits never leave the map
    side, so output volume is bounded by the blocklist's corpus frequency,
    not corpus size.
    """
    hits = tokens_normalized(docs).filter(F.col("term").isin(*terms))
    n = F.count("*").cast("bigint")
    return hits.groupBy("doc_id").agg(
        n.alias("n_hits"),
        F.sort_array(F.collect_set("term")).alias("hit_terms"),
        (n >= flag_threshold).alias("flagged"),
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """Bigram language-model quality gate — the perplexity-style filter a
    curation pipeline runs to drop garbled/boilerplate text (CCNet-shape:
    score each document under a corpus-trained n-gram LM).

    Model: add-one-smoothed bigram probabilities p(b|a) = (c_ab + 1) /
    (c_a + V) trained on the corpus itself (at production scale the counts
    come from a held-out reference corpus — same plan, different input).

    Determinism contract: every probability is materialized as the exact
    integer floor((c_ab+1) · 10^12 / (c_a+V)) — pure int64 arithmetic both
    engines replay bit-for-bit — summed exactly as BIGINT per document;
    the reported avg divides the exact sum by exact counts in one IEEE
    double expression. No float accumulates across rows anywhere.
    (int64 headroom: overflows only when a single bigram exceeds ~9·10^6
    occurrences; a 100 TB run scales the factor down or uses DECIMAL(38).)

    Plan: bigrams are a narrow per-row construction (doc_2grams); the
    model is two hash aggregates (bigram counts, predecessor counts); the
    scoring join shuffles on the bigram string then the predecessor token;
    V is a single-row broadcast. At scale both count relations are far
    smaller than the corpus and the joins are plain equi-joins — no
    windows, no Python.
    """
    bg = doc_2grams(docs)
    # The bigram-count MODEL is referenced twice (the scoring join and
    # the predecessor-count derivation below) — stage it once or the
    # corpus-sized bigram stream gets re-derived per branch (the
    # multi-branch-reference lesson, PLANS.md). The model is bounded by
    # the observed-bigram vocabulary, not the corpus.
    cab = bg.groupBy("g").agg(F.count("*").alias("c_ab")).localCheckpoint()
    a_of_g = F.substring_index("g", " ", 1)
    # c_a = Σ c_ab over bigrams starting with a — derived from the
    # already-reduced bigram counts, NOT from another corpus scan.
    ca = (
        cab.select(a_of_g.alias("a"), "c_ab")
        .groupBy("a")
        .agg(F.sum("c_ab").alias("c_a"))
    )
    vocab = tokens_normalized(docs).agg(
        F.countDistinct("term").alias("v")
    )
    scored = (
        bg.join(cab, "g")
        .join(ca, a_of_g == F.col("a"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(
                "(c_ab + 1) * CAST(1000000000000 AS BIGINT) div (c_a + v)"
            ).alias("sp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("sp").cast("bigint").alias("sum_scaled_p"),
        F.round(
            F.sum("sp").cast("double") / F.count("*") / 1_000_000_000_000.0, 9
        ).alias("avg_p"),
    )


def quality_classifier(
    docs: DataFrame,
    n_buckets: int = 64,
    gain: float = 1000.0,
) -> DataFrame:
    """TRAINED quality classifier — the model-based data-filtering tier
    beside the heuristic gates (``quality_scores``), the bigram-LM
    perplexity filter (``lm_scores``), and DSIR importance weights: a
    Rocchio / nearest-centroid LINEAR classifier over hash60-bucketed
    term-frequency features, trained in ONE corpus pass (labels:
    lang='en' as the deterministic positive class — production swaps in
    curated seed labels; the plan is identical) and used to score every
    document. This is the classic cheap trainable baseline of the
    GPT-3-style "quality classifier" stage: train small, score
    everything; a logistic/fastText upgrade keeps the exact same plan
    shape (train = per-class feature statistics, score = one broadcast
    dot product).

    Model: w_j = mean_pos(x_j) - mean_neg(x_j) over tf-share features
    x_j = count_j / doc_len (absent buckets count as 0 via the
    class-size denominator — no densification needed), bias = -w . m at
    the class-centroid midpoint m, score = sigmoid(gain * (w . x + b))
    with a fixed calibration ``gain`` (margins live at tf-share scale;
    the sign — and therefore every keep/drop decision — is
    gain-independent).

    Scale + determinism: train is one (bucket, class) aggregate —
    at most 2 x (n_buckets + 1) groups regardless of corpus size; the
    weight relation is broadcast-scale by construction; scoring is a
    sparse join + per-doc reduce (docs never densify). Every mean, the
    bias dot, and each margin accumulate in exact DECIMAL(38,10) and
    round to 6 decimals at every boundary, so the DuckDB oracle replays
    training AND scoring bit-for-bit. Output: (lang, n_docs,
    n_pred_pos, mean_score) — the per-language separation the filter
    thresholds on. No reference counterpart (src/functions.cpp has no
    scoring of any kind)."""
    from pyspark.sql import functions as F

    scored = _rocchio_scored(docs, docs, docs, n_buckets, gain)
    return scored.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("p") > 0.5).cast("bigint"))
        .cast("bigint")
        .alias("n_pred_pos"),
        F.round(
            F.sum(F.col("p").cast("decimal(38,10)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_score"),
    )


def quality_classifier_holdout(
    docs: DataFrame,
    n_buckets: int = 64,
    gain: float = 1000.0,
) -> DataFrame:
    """The PROPER train/test protocol over ``quality_classifier``'s
    model: the centroids are trained on the EVEN-doc_id half of the
    corpus only and evaluated on the odd half the trainer never saw —
    per test-set language: document count, predicted-positive count,
    CORRECT classifications ((lang='en') == (p > 0.5)), and mean score.
    Generalization, not memorization, is what a production quality
    filter is deployed on; the deterministic parity split keeps the
    protocol oracle-replayable (a hash-based split would work the same
    way at scale). Same determinism contract as the full-corpus query.

    Measured honesty note: on the driver's synthetic corpus (one 31-term
    vocabulary shared by every language, only small frequency shifts)
    holdout accuracy sits near chance — the instrument correctly
    exposes that the full-corpus fit's separation is partly memorized
    noise there; corpora with real vocabulary differences separate."""
    from pyspark.sql import functions as F

    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    scored = _rocchio_scored(docs, train, test, n_buckets, gain)
    return scored.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("p") > 0.5).cast("bigint"))
        .cast("bigint")
        .alias("n_pred_pos"),
        F.sum(
            ((F.col("lang") == "en") == (F.col("p") > 0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(F.col("p").cast("decimal(38,10)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_score"),
    )



def _rocchio_scored(
    docs: DataFrame,
    train: DataFrame,
    score: DataFrame,
    n_buckets: int,
    gain: float,
) -> DataFrame:
    """The shared train+score body of the quality-classifier family:
    (doc_id, lang, p) of every ``score`` document under a Rocchio
    centroid model trained on ``train`` (both subsets of ``docs``;
    features are hashed once over the union — the full-corpus query
    passes docs for both, the holdout twin disjoint halves). See
    ``quality_classifier`` for the model and determinism contract."""
    from pyspark.sql import functions as F

    from mapreduceindexer_spark.functions.hashing import hash60
    from mapreduceindexer_spark.functions.text import tokens_normalized

    t = tokens_normalized(docs)
    cnt = t.groupBy(
        "doc_id", (hash60("term") % n_buckets).cast("bigint").alias("j")
    ).agg(F.count("*").cast("bigint").alias("c"))
    ntok = t.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("ntok"))
    x = (
        cnt.join(ntok, "doc_id")
        .select(
            "doc_id",
            "j",
            F.round(F.col("c") / F.col("ntok").cast("double"), 6).alias("x"),
        )
        .localCheckpoint()  # feeds training AND scoring
    )
    lab = train.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("pos")
    )
    sizes = lab.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    # TRAIN: per-class per-bucket mean of x, absent (doc, bucket) pairs
    # contributing 0 through the class-size denominator. The inner join
    # on the label relation restricts training to ``train`` docs.
    sums = (
        x.join(lab, "doc_id")
        .groupBy("j")
        .agg(
            F.sum(
                F.when(F.col("pos") == 1, F.col("x"))
                .otherwise(F.lit(0.0))
                .cast("decimal(38,10)")
            ).alias("s_pos"),
            F.sum(
                F.when(F.col("pos") == 0, F.col("x"))
                .otherwise(F.lit(0.0))
                .cast("decimal(38,10)")
            ).alias("s_neg"),
        )
        .crossJoin(F.broadcast(sizes))
        .select(
            "j",
            F.round(F.col("s_pos").cast("double") / F.col("n_pos"), 6).alias(
                "m_pos"
            ),
            F.round(F.col("s_neg").cast("double") / F.col("n_neg"), 6).alias(
                "m_neg"
            ),
        )
    )
    weights = sums.select(
        "j",
        F.round(F.col("m_pos") - F.col("m_neg"), 6).alias("w"),
        F.round((F.col("m_pos") + F.col("m_neg")) / 2, 6).alias("m"),
    ).localCheckpoint()
    bias = weights.agg(
        F.round(
            -F.sum((F.col("w") * F.col("m")).cast("decimal(38,10)")).cast(
                "double"
            ),
            6,
        ).alias("b")
    )
    # SCORE: sparse dot + broadcast bias; a doc with no features scores
    # at the bias alone (left join keeps it).
    dots = (
        x.join(F.broadcast(weights.select("j", "w")), "j")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("w") * F.col("x")).cast("decimal(38,10)"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        score.select("doc_id", "lang")
        .join(dots, "doc_id", "left")
        .crossJoin(F.broadcast(bias))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0)) + F.col("b"), 6
            ).alias("margin"),
        )
        .select(
            "doc_id",
            "lang",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-gain * F.col("margin"))), 6
            ).alias("p"),
        )
    )



def bpe_train(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """Greedy BPE vocabulary training, ``rounds`` merge rounds: the full
    trainer promised by q_bpe_pairs' docstring (Sennrich et al. 2016).

    Per round: (1) weighted adjacent-symbol-pair counts over the word-
    frequency table, (2) argmax pair with deterministic (count DESC,
    left ASC, right ASC) tie-break, (3) greedy left-to-right non-
    overlapping re-segmentation of every word. Output: one row per round
    — (merge_round, lhs, rhs, merged, pair_count).

    Spark-first mechanics:

    - the word-frequency table (one aggregate over the corpus terms) is
      what iterates — never the corpus itself: BPE training cost is
      O(|vocab|) per round after the single corpus pass, the property
      that makes it feasible at 100 TB (the standard trainer design);
    - the argmax is the window-free ``min(struct(-cnt, l, r))`` hash
      aggregate, one row, crossJoin-broadcast back — no driver collect,
      so the whole K-round train is ONE lazy plan the optimizer sees;
    - re-segmentation is a higher-order ``aggregate`` fold over the
      symbol array (JVM codegen, no Python): append, or merge with the
      accumulator's tail when (tail, next) equals the round's pair.
      Within a round the merged token can never equal the pair's left
      side (rhs is nonempty), so the fold is exactly the left-to-right
      greedy scan.

    The DuckDB oracle replays each round with a different formulation
    (two-space-delimited strings + non-overlapping replace), which is
    what makes the parity check meaningful rather than self-fulfilling.
    """
    from mapreduceindexer_spark.functions.text import tokens_normalized

    words = (
        tokens_normalized(docs)
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .select("freq", F.split("term", "").alias("symbols"))
    )
    merge_fold = """aggregate(
        symbols, cast(array() as array<string>),
        (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1) = l AND x = r
            THEN concat(slice(acc, 1, size(acc) - 1), array(concat(l, r)))
            ELSE concat(acc, array(x)) END)"""
    adjacent = """CASE WHEN size(symbols) >= 2 THEN
        transform(slice(symbols, 1, size(symbols) - 1),
                  (x, i) -> struct(x AS l, element_at(symbols, i + 2) AS r))
        ELSE cast(array() as array<struct<l: string, r: string>>) END"""
    merges = []
    for i in range(1, rounds + 1):
        pair_counts = (
            words.select("freq", F.explode(F.expr(adjacent)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        raw = pair_counts.agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("l"), F.col("r"))
            ).alias("m")
        )
        # Degenerate-round guard: with no adjacent pairs left the agg's
        # single row is all-NULL. The OUTPUT drops it (matching the
        # oracle's empty LIMIT-1 CTE: an exhausted round trains no
        # merge); the FOLD keeps the always-one-row relation — a NULL
        # (l, r) never matches `element_at(acc,-1) = l`, so the round is
        # a no-op instead of crossJoin-emptying the vocabulary.
        best = raw.select(
            F.lit(i).cast("bigint").alias("merge_round"),
            F.col("m.l").alias("lhs"),
            F.col("m.r").alias("rhs"),
            F.concat("m.l", "m.r").alias("merged"),
            (-F.col("m.nc")).cast("bigint").alias("pair_count"),
        ).filter(F.col("lhs").isNotNull())
        merges.append(best)
        words = words.crossJoin(
            F.broadcast(
                raw.select(F.col("m.l").alias("l"), F.col("m.r").alias("r"))
            )
        ).select("freq", F.expr(merge_fold).alias("symbols"))
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def sparse_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_df_frac: float = 0.1,
) -> DataFrame:
    """All-pairs document cosine similarity over TF-IDF vectors, joined
    THROUGH the inverted index — the sparse-vector similarity join
    (Bayardo et al.'s AllPairs family): two documents meet only on the
    terms they share, so the pair stream is generated by a self-join of
    the (doc, term, weight) relation on term, never by comparing every
    document to every document.

    Semantics: cosine over the df-PRUNED vocabulary — terms in more than
    ``max_df_frac`` of documents (stopwords: tiny idf, huge fan-out) are
    dropped from the vectors themselves, so norms, dots, and the
    threshold all agree on the same pruned space and every pair with
    similarity > 0 shares at least one surviving term (no recall loss
    within the pruned semantics).

    Scale: df pruning is what bounds the join — each surviving term
    contributes at most (max_df_frac·N)² pair-products, and the skew
    that would concentrate on stopword terms is exactly what got pruned.
    One corpus scan builds tf; df is a window over tf; the pair products
    accumulate in exact decimal so the per-pair dot is
    shuffle-order-independent. At larger thresholds, prefix filtering
    (sort terms by df, index only the first |v|−⌈t·|v|⌉+1 terms) cuts
    candidates further — same plan shape, stricter index condition.

    Determinism: weights are the ROUND-6 tfidf values (the engines'
    ln() may differ in the last ulp; rounding first makes the vector
    entries bit-identical — the q_tfidf convention), products of those
    doubles are IEEE-identical per-row, sums are exact decimal, and the
    final division is one double op.
    """
    from pyspark.sql import Window

    terms = tokens_normalized(docs)
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    tfdf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("bigint")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    w = (
        tfdf.crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.col("n_docs") * max_df_frac)
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,10)")).cast("double")
        ).alias("nrm")
    )
    wa = w.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("w_a")
    )
    wb = w.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("w_b")
    )
    dots = (
        wa.join(wb, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum((F.col("w_a") * F.col("w_b")).cast("decimal(38,10)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def bpe_encode(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: encode every document with
    the BPE merge table trained by ``bpe_train`` and account tokens →
    pieces per document (the token-budget number a training pipeline
    actually bills by).

    The encode runs on the VOCABULARY, not the corpus: merges apply to
    the |vocab| distinct terms (each a small symbol array), and per-doc
    piece counts come from tf × pieces-per-term — the corpus is touched
    exactly once (the tf aggregate). That is the production tokenizer
    design: the merge table and the piece table are broadcast-scale; the
    only data-sized stage is the tf aggregate the pipeline needs anyway.

    The K-row merge table is localCheckpointed: the apply loop
    references it per round, and without staging each round would
    re-run the whole training plan (the multi-branch-reference lesson
    from PLANS.md).
    """
    from mapreduceindexer_spark.functions.text import tokens_normalized

    merges = bpe_train(docs, rounds=rounds).localCheckpoint()
    terms = tokens_normalized(docs)
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    pieces = bpe_segment(tf.select("term"), merges, rounds).select(
        "term", F.size("symbols").cast("bigint").alias("pieces_per_term")
    )
    return (
        tf.join(pieces, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("pieces_per_term"))
            .cast("bigint")
            .alias("n_pieces"),
            F.expr("sum(tf * pieces_per_term) * 1000 div sum(tf)")
            .cast("bigint")
            .alias("pieces_per_token_permille"),
        )
    )


def bpe_segment(
    terms: DataFrame, merges: DataFrame, rounds: int = 3
) -> DataFrame:
    """Apply a TRAINED merge table to a term relation: (term, symbols)
    after ``rounds`` greedy merge applications — the serving half of the
    tokenizer split out of ``bpe_encode`` (round 9) so a PERSISTED merge
    table (read back from a transactional table) can encode a corpus the
    trainer never saw. ``merges`` is ``bpe_train`` output (or any
    relation with merge_round/lhs/rhs); each round's pair enters the
    plan as a broadcast one-row aggregate and the fold is the same JVM
    higher-order ``aggregate`` as training, so train-time and
    serve-time segmentation cannot drift. Cost: O(|distinct terms| x
    rounds), corpus never touched."""
    vocab = terms.select("term").distinct().select(
        "term", F.split("term", "").alias("symbols")
    )
    merge_fold = """aggregate(
        symbols, cast(array() as array<string>),
        (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1) = l AND x = r
            THEN concat(slice(acc, 1, size(acc) - 1), array(concat(l, r)))
            ELSE concat(acc, array(x)) END)"""
    for i in range(1, rounds + 1):
        # agg(max) keeps this a one-row relation even when round i
        # trained no merge (exhausted corpus) — NULL (l, r) makes the
        # fold a no-op instead of crossJoin-emptying the vocabulary.
        mi = (
            merges.filter(F.col("merge_round") == i)
            .select(F.col("lhs").alias("l"), F.col("rhs").alias("r"))
            .agg(F.max("l").alias("l"), F.max("r").alias("r"))
        )
        vocab = vocab.crossJoin(F.broadcast(mi)).select(
            "term", F.expr(merge_fold).alias("symbols")
        )
    return vocab


def token_stats_arrow(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars_utf8, n_tokens, n_vowels) via ``mapInArrow`` —
    the zero-copy Arrow batch API (Spark 4): the kernel receives raw
    ``pyarrow.RecordBatch``es and runs compiled Arrow C++ compute kernels
    (``utf8_length``, ``count_substring_regex``) with NO pandas
    conversion on either edge. This is the lowest-overhead Python
    boundary Spark has — the right surface when a kernel exists in Arrow
    compute but not in ``pyspark.sql.functions``, one tier below
    ``mapInPandas`` (which pays Arrow→pandas→Arrow per batch).

    Scale shape: embarrassingly parallel (zero exchanges — per-row
    arithmetic on scan output); the scan is pruned to (doc_id, text).
    NULL text propagates as NULL counts in both engines (kernel-level
    null semantics, no Python branching). The DuckDB oracle replays the
    regex counts exactly (RE2 and DuckDB agree on ``\\S+`` and ASCII
    vowel classes; pinned including Unicode inputs by
    tests/test_new_ops_edges.py).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.count_substring_regex(text, pattern=r"\S+"), pa.int64()
                    ),
                    pc.cast(
                        pc.count_substring_regex(text, pattern=r"[aeiou]"),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_chars_utf8", "n_tokens", "n_vowels"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        kernel,
        "doc_id bigint, n_chars_utf8 bigint, n_tokens bigint, n_vowels bigint",
    )


def unigram_lm_round(
    docs: DataFrame,
    max_word_len: int = 8,
    max_piece_len: int = 4,
    top_pieces: int = 60,
    top_out: int = 20,
    big: int = 10**9,
) -> DataFrame:
    """One EM round of unigram-LM tokenizer training (the SentencePiece
    algorithm family, Kudo ACL'18), completing the tokenizer-training
    trio beside greedy BPE (``bpe_train``) and WordPiece inference.

    E-step: Viterbi-segment every distinct (truncated) word over the
    current piece inventory (all substrings up to ``max_piece_len``,
    pruned to the ``top_pieces`` most frequent multi-char pieces plus all
    single chars). M-step: re-count piece frequencies over the chosen
    segmentations; output the ``top_out`` pieces by new count.

    Determinism contract: real unigram-LM maximizes the product of piece
    probabilities — a float objective two engines can disagree on at the
    last ulp. Here the Viterbi objective is EXACT integers: minimize
    piece count, tie-break by maximal summed piece frequency, then
    (prev_j, piece) lexicographically — encoded as one BIGINT key
    ``cost*BIG - freq_sum`` and one ``min(struct(...))`` argmin per
    position, so Spark and the unrolled-DP DuckDB oracle are
    bit-identical. Same plan shape as the float version.

    Scale: every DP relation is O(|vocabulary|) rows (never corpus-
    sized); the piece inventory is broadcast to all ``max_word_len``
    unrolled DP stages, and each stage is localCheckpoint'd — the
    stage-p plan otherwise references stages p-1..p-4 and the lineage
    grows 4^L. Positions/pieces per word are bounded by the truncation
    dials, so the whole train step is a fixed number of bounded joins
    regardless of corpus size.
    """
    words = (
        docs.select(
            F.explode(normalized_token_array("text")).alias("term")
        )
        .select(F.substring("term", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    subs = (
        words.select(
            "w",
            "tf",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("pos"),
        )
        .select(
            "w",
            "tf",
            "pos",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("w") - F.col("pos") + 1
                    ),
                )
            ).alias("len"),
        )
        .select(
            F.expr("substr(w, pos, len)").alias("piece"), "tf"
        )
        .groupBy("piece")
        .agg(F.sum("tf").cast("bigint").alias("freq"))
    )
    top = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(top_pieces)
    )
    chars = subs.filter(F.length("piece") == 1)
    pieces = top.union(chars).distinct().localCheckpoint()
    # The exact-integer objective encodes (cost, -freq_sum) in ONE BIGINT
    # as cost*big - freq_sum: a piece frequency reaching `big` would
    # silently INVERT the fewest-pieces preference (more pieces -> lower
    # key) with no parity break, since the oracle replays the same
    # arithmetic. Fail loudly instead; callers size `big` above the
    # corpus's max piece frequency (one scalar off the checkpointed
    # inventory, not a corpus scan).
    max_freq = pieces.agg(F.max("freq")).collect()[0][0]
    if max_freq is not None and max_freq >= big:
        raise ValueError(
            f"unigram_lm_round: max piece frequency {max_freq} >= "
            f"big={big}; raise `big` above it or the Viterbi objective "
            "inverts"
        )

    dp = {0: words.select("w", "tf", F.lit(0).cast("bigint").alias("key"))}
    for p in range(1, max_word_len + 1):
        cands = None
        for j in range(max(0, p - max_piece_len), p):
            c = (
                dp[j]
                .select("w", "tf", "key")
                .filter(F.length("w") >= p)
                .join(
                    F.broadcast(pieces),
                    F.col("piece") == F.expr(f"substr(w, {j + 1}, {p - j})"),
                )
                .select(
                    "w",
                    "tf",
                    (F.col("key") + F.lit(big) - F.col("freq")).alias("key"),
                    F.lit(j).cast("bigint").alias("prev_j"),
                    "piece",
                )
            )
            cands = c if cands is None else cands.unionAll(c)
        stage = (
            cands.groupBy("w")
            .agg(
                F.min(F.struct("key", "prev_j", "piece", "tf")).alias("m")
            )
            .select(
                "w",
                F.col("m.tf").alias("tf"),
                F.col("m.key").alias("key"),
                F.col("m.prev_j").alias("prev_j"),
                F.col("m.piece").alias("piece"),
            )
        )
        # Checkpoint EVERY stage: stage p references stages
        # p-1..p-max_piece_len, so any un-checkpointed stage multiplies
        # the downstream plan by ~max_piece_len. A stride-2 variant was
        # measured SLOWER (5.5 s vs 4.5 s at sf0.1): at vocabulary scale
        # the analyzer cost of the expanded plans exceeds the driver-side
        # job overhead the skipped checkpoints save.
        dp[p] = stage.localCheckpoint()
    dpall = None
    for p in range(1, max_word_len + 1):
        d = dp[p].select(
            "w", F.lit(p).cast("int").alias("pos"), "prev_j", "piece"
        )
        dpall = d if dpall is None else dpall.unionAll(d)
    dpall = dpall.localCheckpoint()

    # Backtrack: a LINEAR join chain against the checkpointed dpall —
    # unlike the dp stages (which reference up to max_piece_len prior
    # stages and would re-expand 4^L without checkpoints), each bt step
    # references only its predecessor, so the whole walk stays one lazy
    # plan and runs as a single job at the end (dropping the per-step
    # eager checkpoints here cut ~8 driver-side jobs from the query).
    bt = words.select("w", "tf", F.length("w").cast("int").alias("pos"))
    onpath = None
    for _ in range(max_word_len):
        step = bt.filter(F.col("pos") > 0).join(dpall, ["w", "pos"])
        emitted = step.select("w", "tf", "piece")
        onpath = emitted if onpath is None else onpath.unionAll(emitted)
        bt = step.select(
            "w", "tf", F.col("prev_j").cast("int").alias("pos")
        )
    recount = onpath.groupBy("piece").agg(
        F.sum("tf").cast("bigint").alias("new_count")
    )
    from pyspark.sql import Window

    w_rn = Window.orderBy(F.desc("new_count"), F.asc("piece"))
    return (
        recount.orderBy(F.desc("new_count"), F.asc("piece"))
        .limit(top_out)
        .withColumn("rn", F.row_number().over(w_rn).cast("bigint"))
    )


def remove_boilerplate(
    docs: DataFrame, w: int = 10, max_df: int = 2
) -> DataFrame:
    """BOILERPLATE PASSAGE REMOVAL (the C4 span rule, token-windowed):
    any ``w``-token window whose exact content appears in MORE THAN
    ``max_df`` distinct documents is boilerplate (navigation chrome,
    license headers, templated spam); every token position covered by
    at least one boilerplate window is dropped, and each document is
    reassembled from its surviving tokens in original order. Returns
    (doc_id, clean_text, n_tokens, n_removed).

    Where the dedup tiers drop whole DOCUMENTS, this repairs documents
    that are mostly unique but share templated passages — the standard
    complement (C4 kept pages but removed any three-sentence span seen
    more than once; this is the token-window form, threshold dialed by
    ``max_df``).

    Shape: windows are built narrowly per row (transform over the token
    array — no shuffle, like ``doc_2grams``); the corpus-frequency pass
    is ONE aggregate on the 60-bit window hash (the shuffle carries
    hashes, not text); coverage explodes each boilerplate window to its
    ``w`` positions (bounded by w x matching windows, never the
    corpus); reassembly is one per-doc aggregate with an in-row sort.
    Hashing is the portable ``hash60`` so a DuckDB oracle replays every
    window decision bit-for-bit. Documents shorter than ``w`` tokens
    have no windows and pass through verbatim.
    """
    from mapreduceindexer_spark.functions.hashing import hash60

    toks = docs.select(
        "doc_id", normalized_token_array("text").alias("tk")
    ).localCheckpoint()  # windows + positions + reassembly share it
    wins = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("tk") >= w,
                F.expr(
                    f"transform(sequence(1, size(tk) - {w} + 1),"
                    f" i -> struct(i - 1 AS p, "
                    f"array_join(slice(tk, i, {w}), ' ') AS s))"
                ),
            ).otherwise(
                F.array().cast("array<struct<p:int,s:string>>")
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.p").alias("p"), hash60(F.col("x.s")).alias("h"))
    boiler = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") > max_df)
        .select("h")
    )
    covered = (
        wins.join(boiler, "h")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(w - 1))).alias(
                "pos"
            ),
        )
        .distinct()
    )
    pos_toks = toks.select(
        "doc_id",
        F.posexplode("tk").alias("pos", "tok"),
    )
    kept = pos_toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("n_tokens"),
    )
    totals = pos_toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("_n_total")
    )
    # Fully-boilerplate docs vanish from `kept`; an outer join restores
    # them with empty text (removal is a repair, never a silent drop).
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
            (
                F.col("_n_total")
                - F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint"))
            ).alias("n_removed"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """DOCUMENT FINGERPRINTING by WINNOWING (Schleimer/Wilkerson/Aiken
    2003 — the MOSS algorithm): rolling k-gram hashes, then one selected
    fingerprint per length-``w`` window of consecutive hashes (the
    window MINIMUM, ties to the LEFTMOST position — struct ordering
    gives both engines the identical pick). The selection guarantee is
    the algorithm's whole point: any token substring of length
    >= w + k - 1 shared by two documents forces a shared fingerprint,
    while storing only ~2/(w+1) of the k-gram hashes — the
    plagiarism/attribution primitive between a single min-hash
    (q_fingerprint: cheap, no guarantee) and full substring search
    (q_substring_dup: exact, heavier).

    Documents with fewer than ``w`` k-grams fingerprint their single
    global minimum (the standard short-doc rule); empty/short-of-k
    documents report zero counts rather than vanishing.

    Shape: hashing and window selection are per-row array expressions —
    no shuffle, no explosion beyond the SELECTED set (~m/w rows per
    doc); the only joins are hash-keyed (the sharing count) and the
    outer join restoring short docs. Hashing is the portable ``hash60``
    so the oracle replays every window pick bit-for-bit.

    Output: (doc_id, n_kgrams, n_fps, n_docs_sharing) — sharing counts
    DISTINCT other documents with >= 1 common selected fingerprint.
    """
    toks = docs.select(
        "doc_id", normalized_token_array("text").alias("tk")
    ).localCheckpoint()  # feeds fingerprints AND the short-doc restore
    # (h, p) structs per k-gram — the expr-string form keeps the nested
    # higher-order lambda readable; the hash is hash60's md5 form
    # inlined (seed 0), identical to functions/hashing.py::hash60.
    g = toks.filter(F.size("tk") >= k).select(
        "doc_id",
        F.expr(
            f"""transform(sequence(1, size(tk) - {k} + 1),
                 i -> struct(
                   CAST(conv(substring(md5(concat('0:', array_join(slice(tk, i, {k}), ' '))), 1, 15), 16, 10) AS BIGINT) AS h,
                   CAST(i - 1 AS BIGINT) AS p))"""
        ).alias("hs"),
    )
    sel = g.select(
        "doc_id",
        F.size("hs").alias("n_kgrams"),
        F.when(
            F.size("hs") >= w,
            F.expr(
                f"transform(sequence(1, size(hs) - {w} + 1),"
                f" j -> array_min(slice(hs, j, {w})))"
            ),
        )
        .otherwise(F.array(F.array_min("hs")))
        .alias("fps"),
    ).localCheckpoint()  # feeds the exploded join and the per-doc counts
    fp = (
        sel.select("doc_id", F.explode("fps").alias("f"))
        .select("doc_id", F.col("f.h").alias("h"))
        .distinct()
    )
    sharing = (
        fp.alias("a")
        .join(fp.alias("b"), "h")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count_distinct(F.col("b.doc_id")).alias("n_docs_sharing"))
    )
    # Distinct SELECTIONS counted via string keys — the same window
    # minimum reachable from several windows counts once; struct
    # dedup is avoided because the oracle engine can't distinct
    # struct lists (both sides use the identical "h:p" key).
    counted = (
        sel.select(
            "doc_id",
            F.col("n_kgrams").cast("bigint").alias("n_kgrams"),
            F.size(
                F.array_distinct(
                    F.expr("transform(fps, x -> concat(x.h, ':', x.p))")
                )
            )
            .cast("bigint")
            .alias("n_fps"),
        )
        .join(sharing, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            "n_fps",
            F.coalesce("n_docs_sharing", F.lit(0)).cast("bigint").alias(
                "n_docs_sharing"
            ),
        )
    )
    return (
        toks.select("doc_id")
        .join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kgrams", F.lit(0)).cast("bigint").alias("n_kgrams"),
            F.coalesce("n_fps", F.lit(0)).cast("bigint").alias("n_fps"),
            F.coalesce("n_docs_sharing", F.lit(0)).cast("bigint").alias(
                "n_docs_sharing"
            ),
        )
    )


def html_wrap(docs: DataFrame) -> DataFrame:
    """Deterministically wrap each document's text as an HTML page —
    the synthetic-twin pattern the multimodal tier uses (the container
    ships no web corpus, so the wrapper is generated FROM the text and
    the oracle predicts the extraction output from the same source):
    entities escaped (& first, then < >), the text split into
    paragraph tags on sentence-ish boundaries, plus a <script> block,
    a <style> block, and attribute-carrying tags that a naive
    tag-stripper would mangle. Columns: (doc_id, html)."""
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    # Paragraph breaks at '. ' word boundaries — tags now separate
    # words, so extraction must substitute whitespace for tags, not
    # delete them.
    body = F.regexp_replace(esc, r"\. ", ".</p>\n<p>")
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title>\n<style type="text/css">p { margin: 0; }</style>'),
        F.lit('</head>\n<body class="main">\n<script>\nvar tracker = "'),
        F.md5("text"),
        F.lit('";\n</script>\n<h1>Document</h1>\n<p>'),
        body,
        F.lit("</p>\n</body></html>"),
    )
    return docs.select("doc_id", "text", html.alias("html"))


def html_extract_text(pages: DataFrame) -> DataFrame:
    """HTML → text extraction, fully JVM-side (regexp_replace chain,
    no UDF): drop <script>/<style> WITH their contents (a tag-only
    stripper would leak tracker code and CSS into the corpus — the
    classic C4 contamination), replace every remaining tag with a
    space, decode the standard entities (&amp; LAST, inverting the
    escape order exactly once), and collapse whitespace. Output:
    (doc_id, extracted, n_extracted).

    Contract: composed with ``html_wrap`` the extraction recovers the
    original text up to whitespace normalization — pinned per row by
    the registered query's ``ok`` column and the oracle's prediction
    of ``n_extracted`` from the raw text."""
    t = F.col("html")
    for blk in ("script", "style"):
        t = F.regexp_replace(t, f"(?s)<{blk}[^>]*>.*?</{blk}>", " ")
    t = F.regexp_replace(t, "<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        t = F.regexp_replace(t, ent, ch)
    # Explicit whitespace class, NOT \s: Java's \s includes vertical
    # tab (\x0B) where RE2's (DuckDB, the oracle) does not — the one
    # character where the two engines' \s disagree. Spelling the class
    # out keeps the extraction bit-identical across engines.
    t = F.trim(F.regexp_replace(t, "[ \t\n\f\r]+", " "))
    out = pages.withColumn("extracted", t)
    return out.select(
        "doc_id",
        *(["text"] if "text" in pages.columns else []),
        "extracted",
        F.length("extracted").cast("bigint").alias("n_extracted"),
    )
