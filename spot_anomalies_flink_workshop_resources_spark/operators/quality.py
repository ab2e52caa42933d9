"""Corpus-quality operators: repetition filtering, PII redaction,
stratified sampling, and mixture weighting over ``documents``.

The training-data-pipeline surface beyond text.py's token stats — the
four ops a corpus build runs between raw scrape and tokenizer:

- ``repetition_stats``: Gopher-style repetition signals (fraction of
  unique words, characters inside duplicated words / word-2-grams) plus
  a keep flag. All JVM higher-order functions over the per-document
  word array — narrow, zero-shuffle, embarrassingly parallel; cost is
  O(distinct_words x words) per document (docs are word-bounded, so
  this stays cache-local; at 100 TB the plan is a pure map over the
  corpus scan with column pruning to (doc_id, text)).
- ``pii_redact``: regex redaction (emails, IPv4) with per-document hit
  counts and an md5 digest of the redacted text, so full-string
  equality is oracle-checkable without shipping the corpus through the
  compare. Patterns are shared Java/RE2-compatible literals (no
  backrefs, no lookaround). Synthetic PII is seeded deterministically
  onto 1-in-7 documents so the redaction path is actually exercised —
  the harness corpus is clean word soup.
- ``stratified_sample``: per-language Bernoulli sampling from the md5
  of doc_id (same determinism idiom as pipeline_ops.corpus_split):
  reshuffle/re-read never changes membership, and both engines compute
  the identical uniform from the identical hash. This is ``sampleBy``
  with a replayable coin.
- ``mixture_weights``: per-language token counts -> temperature-scaled
  sampling weights w proportional to share^alpha (alpha=0.5 via sqrt —
  IEEE-754 requires sqrt be correctly rounded, so it is bit-identical
  across engines, unlike exp/log/pow). One small agg + one global
  window over |languages| rows.

The reference has no corpus operators (its text column is generated,
never analyzed — code/lambdas/fragmentation_attack/lambda_handler.py:19-29);
this module is the beyond-reference surface BASELINE.json asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared regex literals (identical strings on the DuckDB side).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Gopher-style keep thresholds (repetition_stats.keep_doc)
MIN_FRAC_UNIQUE_WORDS = 0.2
MAX_DUP_2GRAM_CHARS_FRAC = 0.6


def _words(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition metrics + keep flag.

    - ``frac_unique_words``: distinct / total words.
    - ``dup_word_chars_frac``: fraction of word characters belonging to
      words that occur more than once (every occurrence counted).
    - ``dup_2gram_chars_frac``: same over word 2-grams (each gram's
      characters = its two words + separator, per occurrence).

    Duplicated-mass formulas are order-independent sums, so they are
    insensitive to sort-order/collation differences between engines —
    sorting is only the grouping device that makes equal tokens
    adjacent (a max-by-count "top word" metric would NOT be
    cross-engine deterministic on ties, which is why the
    duplicated-mass form is used instead).

    Cost: O(n log n) per document via sort-adjacency (an element is
    duplicated iff it equals a sorted neighbor). The naive
    count-per-distinct-token form is O(distinct x n) per document and
    measured 25x slower on the harness corpus — word-soup docs have
    distinct ~ n.
    """
    # STAGED projections: each intermediate array binds to a named
    # column so it is computed ONCE per row. Feeding a higher-order
    # function an expression (e.g. element_at(array_sort(ws), i) inside
    # the fold lambda) inlines that expression per ELEMENT — the sort
    # re-ran n times per doc and the op measured minutes instead of
    # seconds at sf0.01.
    ws = _words(F.col("text"))
    staged = docs.select("doc_id", ws.alias("_ws"))
    n_words = F.size(F.col("_ws"))
    # 2-grams guarded for 1-word docs: Spark's sequence(1, 0) DESCENDS
    # (ADVICE r2 lesson from char_ngram_profile)
    grams = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), n_words - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("_ws"), i), F.element_at(F.col("_ws"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select(
        "doc_id",
        "_ws",
        grams.alias("_gs"),
        F.array_sort("_ws").alias("_sw"),
    ).select("doc_id", "_ws", "_gs", "_sw", F.array_sort("_gs").alias("_sg"))

    def dup_char_mass(sorted_name: str) -> Column:
        """Characters of elements that occur more than once (every
        occurrence counted): an element of the SORTED array is
        duplicated iff it equals its previous or next neighbor.
        greatest/least clamp the probe index (ANSI element_at rejects
        index 0); the i>1 / i<n guards make the clamped compare
        irrelevant."""
        s = F.col(sorted_name)
        n = F.size(s)

        def step(acc: Column, i: Column) -> Column:
            cur = F.element_at(s, i)
            prev_eq = (i > F.lit(1)) & (
                F.element_at(s, F.greatest(i - 1, F.lit(1))) == cur
            )
            next_eq = (i < n) & (F.element_at(s, F.least(i + 1, n)) == cur)
            return acc + F.when(prev_eq | next_eq, F.length(cur)).otherwise(
                F.lit(0)
            )

        # n >= 1 guard: grams can be empty (descending-sequence trap)
        return F.when(
            n >= 1,
            F.aggregate(
                F.sequence(F.lit(1), n), F.lit(0).cast("long"), step
            ),
        ).otherwise(F.lit(0).cast("long"))

    def char_mass(name: str) -> Column:
        return F.aggregate(
            F.col(name), F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )

    n_words = F.size(F.col("_ws"))
    frac_unique = F.size(F.array_distinct(F.col("_ws"))).cast(
        "double"
    ) / F.greatest(n_words, F.lit(1))
    dup_word_frac = dup_char_mass("_sw").cast("double") / F.greatest(
        char_mass("_ws"), F.lit(1).cast("long")
    )
    dup_gram_frac = dup_char_mass("_sg").cast("double") / F.greatest(
        char_mass("_gs"), F.lit(1).cast("long")
    )
    return staged.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        frac_unique.alias("frac_unique_words"),
        dup_word_frac.alias("dup_word_chars_frac"),
        dup_gram_frac.alias("dup_2gram_chars_frac"),
        (
            (frac_unique > MIN_FRAC_UNIQUE_WORDS)
            & (dup_gram_frac < MAX_DUP_2GRAM_CHARS_FRAC)
        ).alias("keep_doc"),
    )


REPETITION_STATS_SQL = rf"""
WITH w AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents
),
g AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) >= 2
              THEN list_transform(generate_series(1, len(ws) - 1),
                                  i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS gs
  FROM w
),
srt AS (
  SELECT doc_id, ws, gs,
         list_sort(ws) AS sw, list_sort(gs) AS sg
  FROM g
),
-- sort-adjacency duplicated-character mass (same O(n log n) trick as
-- the Spark side; out-of-range list probes are NULL in DuckDB so the
-- boundary guards are plain conjunctions)
m AS (
  SELECT doc_id, ws, gs,
         coalesce(list_sum(list_transform(generate_series(1, len(sw)), i ->
           CASE WHEN (i > 1 AND sw[i] = sw[i-1])
                  OR (i < len(sw) AND sw[i] = sw[i+1])
                THEN length(sw[i]) ELSE 0 END)), 0) AS dup_w,
         coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tot_w,
         coalesce(list_sum(list_transform(generate_series(1, len(sg)), i ->
           CASE WHEN (i > 1 AND sg[i] = sg[i-1])
                  OR (i < len(sg) AND sg[i] = sg[i+1])
                THEN length(sg[i]) ELSE 0 END)), 0) AS dup_g,
         coalesce(list_sum(list_transform(gs, x -> length(x))), 0) AS tot_g
  FROM srt
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1)
         AS frac_unique_words,
       CAST(dup_w AS DOUBLE) / greatest(tot_w, 1) AS dup_word_chars_frac,
       CAST(dup_g AS DOUBLE) / greatest(tot_g, 1) AS dup_2gram_chars_frac,
       (CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1)
          > {MIN_FRAC_UNIQUE_WORDS})
       AND (CAST(dup_g AS DOUBLE) / greatest(tot_g, 1)
          < {MAX_DUP_2GRAM_CHARS_FRAC}) AS keep_doc
FROM m
"""


def _with_synthetic_pii(docs: DataFrame) -> Column:
    """Deterministically seed PII onto 1-in-7 documents (the harness
    corpus is clean, so redaction would otherwise be a no-op path)."""
    return F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 250).cast("string"),
        ),
    ).otherwise(F.col("text"))


def pii_redact(docs: DataFrame) -> DataFrame:
    """Count and redact emails/IPv4s; emit an md5 digest of the redacted
    text (full-string equality without corpus-sized compares)."""
    aug = _with_synthetic_pii(docs)
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


# DuckDB regexp_replace is first-match unless the 'g' flag is passed —
# Spark's is global by default, hence the explicit 'g' here.
PII_REDACT_SQL = rf"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com from 10.'
                   || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                   || CAST(doc_id % 250 AS VARCHAR)
              ELSE text END AS t
  FROM documents
),
red AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{IPV4_RE}', '<IP>', 'g') AS r
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(length(r) AS BIGINT) AS redacted_len,
       md5(r) AS redacted_md5
FROM red
"""


DEFAULT_RATES: dict[str, float] = {
    "en": 0.25,  # downsample the head language
    "de": 0.75,
    "es": 0.75,
    "fr": 0.75,
    "zh": 1.0,  # keep the tail
}


def stratified_sample(
    docs: DataFrame, rates: dict[str, float] | None = None
) -> DataFrame:
    """Per-language Bernoulli sample with a replayable md5 coin:
    u = first 8 md5 hex digits of doc_id as a uniform in [0, 1);
    keep iff u < rate(lang). Unknown languages keep everything."""
    rates = DEFAULT_RATES if rates is None else rates
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = F.lit(1.0)
    for lang, r in rates.items():
        rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
    return (
        docs.select("doc_id", "lang", "source", u.alias("u"), rate.alias("rate"))
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "lang", "source", "u")
    )


def stratified_sample_sql(rates: dict[str, float] | None = None) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    cases = " ".join(
        f"WHEN '{lang}' THEN {float(r)!r}" for lang, r in rates.items()
    )
    return f"""
WITH coin AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         CASE lang {cases} ELSE 1.0 END AS rate
  FROM documents
)
SELECT doc_id, lang, source, u FROM coin WHERE u < rate
"""


def hash_rank_sample(
    docs: DataFrame, k: int = 50, by: str | None = None
) -> DataFrame:
    """Deterministic EXACT-k sample: rank documents by the md5 of their
    id (a replayable uniform permutation — the distributed analogue of
    a seeded reservoir sample) and keep the k smallest, globally or per
    ``by`` group.

    Bernoulli sampling (``stratified_sample``) gives an approximate
    count; this gives exactly min(k, n) rows with the same
    reshuffle-stable membership guarantee (the coin is the md5 of the
    id, not the physical row position). Plan shape: global form is
    orderBy+limit → TakeOrdered (per-partition heaps, no global sort);
    grouped form is one hash exchange on ``by`` + per-group
    row_number — both scale-safe.
    """
    coin = F.md5(F.col("doc_id").cast("string"))
    if by is None:
        return (
            docs.select("doc_id", "lang", "source", coin.alias("coin"))
            .orderBy("coin")
            .limit(k)
        )
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy("coin")
    return (
        docs.select("doc_id", "lang", "source", coin.alias("coin"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def hash_rank_sample_sql(k: int = 50, by: str | None = None) -> str:
    if by is None:
        return f"""
SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS coin
FROM documents
ORDER BY coin
LIMIT {k}
"""
    return f"""
WITH ranked AS (
  SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS coin,
         ROW_NUMBER() OVER (PARTITION BY {by} ORDER BY
                            md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
)
SELECT doc_id, lang, source, coin FROM ranked WHERE rk <= {k}
"""


def mixture_weights(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Per-language temperature-scaled mixture weights:
    w(lang) = share^alpha / sum(share^alpha), share = token share.

    alpha=0.5 is computed as sqrt (IEEE-correctly-rounded, unlike pow,
    so the per-row terms match across engines bit-for-bit). The
    normalizing SUM ... OVER () accumulates doubles in an order the
    engine chooses, so the final weights are tolerance-equal (~1e-16
    relative on the handful-of-languages frame), not guaranteed
    bit-identical — in practice both engines have agreed exactly on
    every harness run (ADVICE r3 softened this claim).
    """
    if alpha != 0.5:
        raise ValueError("only alpha=0.5 (sqrt) is cross-engine exact")
    from pyspark.sql import Window

    from .text import TOKEN_RE

    toks = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0)))
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    # windows staged across selects: a window inside another window's
    # argument is illegal in both engines, so share materializes first
    wall = Window.partitionBy()
    shares = per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(wall)).alias(
            "token_share"
        ),
    )
    raw = F.sqrt(F.col("token_share"))
    return shares.select(
        "lang",
        "n_docs",
        "n_tokens",
        "token_share",
        (raw / F.sum(raw).over(wall)).alias("mix_weight"),
    )


def _mixture_weights_sql() -> str:
    from .text import TOKEN_RE

    return f"""
WITH per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
),
shares AS (
  SELECT lang, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS token_share
  FROM per_lang
)
SELECT lang, n_docs, n_tokens, token_share,
       sqrt(token_share) / SUM(sqrt(token_share)) OVER () AS mix_weight
FROM shares
"""


MIXTURE_WEIGHTS_SQL = _mixture_weights_sql()


def weighted_sample(
    docs: DataFrame, k: int = 50, weight_col: str = "n_chars"
) -> DataFrame:
    """Exact-k weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row draws a deterministic uniform u from the md5 of its
    id and competes with key ln(u)/w — the k LARGEST keys win, giving
    inclusion probability proportional to weight. Sampling by length/
    token count is how token-budget corpus mixtures are actually drawn.

    Replayable like hash_rank_sample: the coin is content-stable (md5
    of doc_id, mapped to (0,1) via the first 13 hex digits — 2^52
    grid, exact in a double), so membership survives reshuffles and
    re-reads. Plan: narrow per-row key compute, then orderBy+limit →
    TakeOrdered per-partition heaps, no global sort.

    ``u`` is strictly inside (0,1) (offset +0.5 on the integer grid),
    so ln(u) is finite and negative; larger weights divide it toward
    zero. Ties (impossible on distinct ids) break on lower doc_id.
    ln runs through the libm twin (functions/libm.py) so the key — and
    therefore the top-k SELECTION — is bit-identical to the DuckDB
    oracle (JVM Math.log is 1 ulp off libm on ~1.4% of arguments).
    """
    from ..functions.libm import libm_log

    grid = float(16 ** 13)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(grid)
    lkey = libm_log(u) / F.col(weight_col).cast("double")
    return (
        docs.select(
            "doc_id", "lang", "source",
            F.col(weight_col).cast("long").alias("weight"),
            lkey.alias("lkey"),
        )
        .orderBy(F.desc("lkey"), F.asc("doc_id"))
        .limit(k)
    )


def weighted_sample_sql(k: int = 50, weight_col: str = "n_chars") -> str:
    grid = float(16 ** 13)
    u = (
        "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
        f"::DOUBLE + 0.5) / {grid!r})"
    )
    return f"""
SELECT doc_id, lang, source,
       CAST({weight_col} AS BIGINT) AS weight,
       ln({u}) / CAST({weight_col} AS DOUBLE) AS lkey
FROM documents
ORDER BY lkey DESC, doc_id ASC
LIMIT {k}
"""


# Gopher rule thresholds (Rae et al. 2021 §A1.1, adapted to this
# corpus's [10, 99]-token documents): every comparison is integer
# cross-multiplication, so the audit is bit-exact across engines.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 4   # 4*n <= sum_len
GOPHER_MAX_MEAN_WORD_LEN = 10  # sum_len <= 10*n
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")
GOPHER_MIN_STOPWORDS = 2       # distinct stopwords present
GOPHER_MAX_TOP_TOKEN_X5 = 5    # 5*max_tf <= n  (top token <= 20%)
GOPHER_ALPHA_NUM = (4, 5)      # 5*n_alpha >= 4*n (>=80% alphabetic)


def gopher_rules(docs: DataFrame, cache_key: str | None = None) -> DataFrame:
    """Per-rule Gopher quality-filter audit: for each (source, rule),
    how many documents pass and fail. The per-rule long form is what a
    curation team actually reads — a single blended score (corpus_prep)
    hides WHICH rule is rejecting a source.

    Rules (each an integer comparison — no float thresholds anywhere):
      word_count      GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
      mean_word_len   4 <= sum_len/n <= 10, as 4n <= sum_len <= 10n
      stopwords       >= 2 distinct stopwords present
      repetition      top-token share <= 20%, as 5*max_tf <= n
      alpha_ratio     >= 80% tokens contain a letter, as 5*n_alpha >= 4n

    One explode -> per-(doc, tok) counts -> per-doc integer profile ->
    rule booleans -> stack to long form -> per-source counts. The only
    wide stages are the two hash aggs (token-keyed, then doc-keyed);
    the stack is a narrow 5x row multiply on |docs| rows, and the final
    agg has |sources| x 5 groups. Documents with zero tokens re-enter
    via a left join and fail every gate.

    Output: (source, rule, n_pass, n_fail).
    """
    # the token stream reduces from the shared per-corpus tokenize pass
    # (operators/text.token_arrays) — identical factored expression
    from .text import token_arrays

    stopset = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    toks = token_arrays(docs, cache_key).select(
        "doc_id", "source", F.explode("toks").alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    per_doc = per_tok.groupBy("doc_id", "source").agg(
        F.sum("tf").cast("long").alias("n"),
        F.sum(F.col("tf") * F.length("tok")).cast("long").alias("sum_len"),
        F.max("tf").cast("long").alias("max_tf"),
        F.sum(
            F.when(F.expr(f"tok IN ({stopset})"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_stop"),
        F.sum(
            F.when(F.col("tok").rlike("[a-z]"), F.col("tf")).otherwise(F.lit(0))
        ).cast("long").alias("n_alpha"),
    )
    profile = (
        docs.select("doc_id", "source")
        .join(per_doc.drop("source"), "doc_id", "left")
        .na.fill(
            {"n": 0, "sum_len": 0, "max_tf": 0, "n_stop": 0, "n_alpha": 0}
        )
    )
    a_num, a_den = GOPHER_ALPHA_NUM
    rules = {
        "word_count": (F.col("n") >= GOPHER_MIN_WORDS)
        & (F.col("n") <= GOPHER_MAX_WORDS),
        "mean_word_len": (
            F.col("sum_len") >= GOPHER_MIN_MEAN_WORD_LEN * F.col("n")
        )
        & (F.col("sum_len") <= GOPHER_MAX_MEAN_WORD_LEN * F.col("n"))
        & (F.col("n") > 0),
        "stopwords": F.col("n_stop") >= GOPHER_MIN_STOPWORDS,
        "repetition": (
            GOPHER_MAX_TOP_TOKEN_X5 * F.col("max_tf") <= F.col("n")
        )
        & (F.col("n") > 0),
        "alpha_ratio": (a_den * F.col("n_alpha") >= a_num * F.col("n"))
        & (F.col("n") > 0),
    }
    flagged = profile.select(
        "source",
        *[
            F.when(cond, F.lit(1)).otherwise(F.lit(0)).alias(name)
            for name, cond in rules.items()
        ],
    )
    stack_args = ", ".join(f"'{r}', {r}" for r in rules)
    long = flagged.selectExpr(
        "source", f"stack({len(rules)}, {stack_args}) AS (rule, passed)"
    )
    return long.groupBy("source", "rule").agg(
        F.sum("passed").cast("long").alias("n_pass"),
        F.sum(F.lit(1) - F.col("passed")).cast("long").alias("n_fail"),
    )


def gopher_rules_sql() -> str:
    """DuckDB oracle twin of :func:`gopher_rules`."""
    from .text import TOKEN_RE

    stopset = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    a_num, a_den = GOPHER_ALPHA_NUM
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents
),
per_tok AS (
  SELECT doc_id, source, tok, COUNT(*) AS tf
  FROM toks GROUP BY doc_id, source, tok
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(tf) AS BIGINT) AS n,
         CAST(SUM(tf * length(tok)) AS BIGINT) AS sum_len,
         CAST(MAX(tf) AS BIGINT) AS max_tf,
         CAST(SUM(CASE WHEN tok IN ({stopset}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stop,
         CAST(SUM(CASE WHEN regexp_matches(tok, '[a-z]') THEN tf ELSE 0 END)
              AS BIGINT) AS n_alpha
  FROM per_tok GROUP BY doc_id
),
profile AS (
  SELECT d.source,
         COALESCE(p.n, 0) AS n,
         COALESCE(p.sum_len, 0) AS sum_len,
         COALESCE(p.max_tf, 0) AS max_tf,
         COALESCE(p.n_stop, 0) AS n_stop,
         COALESCE(p.n_alpha, 0) AS n_alpha
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
),
flagged AS (
  SELECT source,
         CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
              THEN 1 ELSE 0 END AS word_count,
         CASE WHEN sum_len >= {GOPHER_MIN_MEAN_WORD_LEN} * n
               AND sum_len <= {GOPHER_MAX_MEAN_WORD_LEN} * n
               AND n > 0 THEN 1 ELSE 0 END AS mean_word_len,
         CASE WHEN n_stop >= {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
           AS stopwords,
         CASE WHEN {GOPHER_MAX_TOP_TOKEN_X5} * max_tf <= n AND n > 0
              THEN 1 ELSE 0 END AS repetition,
         CASE WHEN {a_den} * n_alpha >= {a_num} * n AND n > 0
              THEN 1 ELSE 0 END AS alpha_ratio
  FROM profile
),
long AS (
  SELECT source, 'word_count' AS rule, word_count AS passed FROM flagged
  UNION ALL
  SELECT source, 'mean_word_len', mean_word_len FROM flagged
  UNION ALL
  SELECT source, 'stopwords', stopwords FROM flagged
  UNION ALL
  SELECT source, 'repetition', repetition FROM flagged
  UNION ALL
  SELECT source, 'alpha_ratio', alpha_ratio FROM flagged
)
SELECT source, rule,
       CAST(SUM(passed) AS BIGINT) AS n_pass,
       CAST(SUM(1 - passed) AS BIGINT) AS n_fail
FROM long
GROUP BY source, rule
"""
