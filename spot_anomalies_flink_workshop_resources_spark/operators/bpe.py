"""Byte-pair-encoding vocabulary induction over the corpus.

The tokenizer-training half of a data pipeline: classic BPE on the word
frequency dictionary (count adjacent symbol pairs weighted by word
frequency; merge the most frequent pair; repeat). Two surfaces:

- ``bpe_pair_counts``: ONE merge round's pair statistics, oracle-backed
  (pure SQL twin). Plan: token explode -> vocab-sized (token, count)
  agg -> per-token adjacent char pairs -> pair-count agg -> top-k under
  the total order (count desc, pair asc). Two hash exchanges, both on
  vocabulary-sized keys — corpus size only enters through the first
  narrow explode+count, exactly like corpus_top_terms.
- ``learn_merges``: the iterative trainer. After the first vocab agg
  the working set IS the vocabulary (words as symbol arrays + counts),
  so each merge round is: pair-count agg over the vocab frame -> argmax
  pair to the driver (one row) -> JVM fold rewriting symbol arrays
  (greedy leftmost, non-overlapping — folding left keeps a symbol just
  merged from re-merging in the same round, matching the reference BPE
  algorithm). localCheckpoint every few rounds caps lineage, the same
  pattern as dedup's fixpoint components. Ties on pair count break by
  lexicographic (left, right), so the merge table is reproducible
  across partitionings.

At 100 TB the corpus pass is the only data-sized stage; rounds iterate
on a |vocab| frame (millions of rows at web scale — still cluster-tiny,
and every step is a hash agg + narrow map, no corpus rescans).
No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import TOKEN_RE


def _vocab(docs: DataFrame, cache_key: str | None = None) -> DataFrame:
    """(token, n) word-frequency dictionary — the BPE working set.
    Tokenization reduces from the shared per-corpus token-array pass
    (operators/text.token_arrays, round 11) — identical expression."""
    from .text import token_arrays

    return (
        token_arrays(docs, cache_key)
        .select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bpe_pair_counts(
    docs: DataFrame, top_k: int = 30, cache_key: str | None = None
) -> DataFrame:
    """First-round BPE pair statistics: adjacent character pairs across
    the word-frequency dictionary, weighted by word count; top_k rows
    ranked by (count desc, pair asc) — a total order, so the cut is
    deterministic."""
    from pyspark.sql import Window

    vocab = _vocab(docs, cache_key=cache_key)
    pairs = vocab.select(
        "n",
        F.explode(
            F.when(
                F.length("tok") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("tok") - 1),
                    lambda i: F.substring(F.col("tok"), i, 2),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("n").cast("long").alias("pair_count")
    )
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        counts.withColumn("merge_rank", F.row_number().over(w).cast("long"))
        .where(F.col("merge_rank") <= top_k)
        .select("merge_rank", "pair", "pair_count")
    )


def bpe_pair_counts_sql(top_k: int = 30) -> str:
    return f"""
WITH vocab AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
        FROM documents)
  GROUP BY tok
),
pairs AS (
  SELECT n,
         unnest(list_transform(generate_series(1, length(tok) - 1),
                               i -> substr(tok, i, 2))) AS pair
  FROM vocab
),
counts AS (
  SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS BIGINT)
         AS merge_rank,
       pair, pair_count
FROM counts
QUALIFY merge_rank <= {top_k}
"""


def _chars(col):
    """Symbol array of single characters (split('') has engine-varying
    trailing-empty behavior — substring probing is unambiguous)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: F.substring(col, i, 1)
    )


def _sym_pairs(syms):
    """Adjacent (left, right) symbol pairs, empty for 1-symbol words."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _select_batch(
    rows, max_batch: int, truncated: bool
) -> list[tuple[str, str, int]]:
    """Pick a batch of merges from one round's snapshot pair counts
    (``rows`` sorted by count desc, l asc, r asc) that is provably
    equivalent to applying them one serial BPE round at a time.

    Exactness argument (why batched == serial, bit-for-bit, including
    the recorded pair_count column):

    - Accepted pairs must have pairwise-disjoint ``{l, r, l+r}`` string
      sets. Disjoint merges cannot change each other's occurrence
      counts, and the combined single-pass fold equals the serial
      composition of per-rule folds (at each position at most one rule
      can match, and a merged output string never equals another
      rule's symbol — the ``l+r`` membership guards both directions,
      including an earlier-round symbol named exactly ``l+r``).
    - Scanning STOPS at the first conflicting pair (it is not skipped):
      every pair that could be created or boosted by an accepted merge
      (``(x, ab)`` / ``(ab, y)``) has a snapshot witness (``(x, a)`` /
      ``(b, y)``) that shares a symbol, hence ranks at-or-after the
      stop point, bounding all new-pair counts by the stop count.
      Accepted pairs are then trimmed to those STRICTLY above that
      bound, so no new pair can outrank (or tie) a later batch member.
    - A self-pair ``(a,a)`` is the one case with no independent
      witness: its own runs spawn ``(aa,a)`` / ``(aa,aa)`` with counts
      <= floor(c/2). After accepting one, later accepts must exceed
      that bound too.
    - The first accepted pair is always kept: serial round 1 picks the
      global max unconditionally.
    """
    accepted: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    stop_cap: int | None = None
    self_cap = 0
    i, n = 0, len(rows)
    while i < n:
        row = rows[i]
        if row.c < 2:
            # everything from here counts <2: new pairs bounded below
            # the merge floor, no cap needed
            break
        syms = {row.l, row.r, row.l + row.r}
        if (syms & touched) or (accepted and row.c <= self_cap):
            stop_cap = row.c
            break
        accepted.append((row.l, row.r, row.c))
        touched |= syms
        if row.l == row.r:
            self_cap = max(self_cap, row.c // 2)
        i += 1
        if len(accepted) >= max_batch:
            # unscanned pairs (or their new-pair offspring) may tie a
            # late batch member — bound by the next rank's count
            if i < n:
                stop_cap = rows[i].c
            elif truncated:
                stop_cap = rows[-1].c
            break
    else:
        # ran off the collected prefix: if the frame was truncated,
        # unseen pairs may rank just below — bound by the last count
        if truncated and rows:
            stop_cap = rows[-1].c
    if stop_cap is not None and accepted:
        keep = [accepted[0]]
        keep.extend(p for p in accepted[1:] if p[2] > stop_cap)
        accepted = keep
    return accepted


def _fold_rules(syms, rules: list[tuple[str, str, str]]):
    """One greedy-leftmost pass applying every (l, r, merged) rule:
    append, except when the incoming symbol is some rule's ``r`` and
    the last emitted symbol is that rule's ``l`` — then the pair
    collapses. try_element_at(-1) is NULL on the empty array, so the
    first symbol always appends. Rules are symbol-disjoint (enforced by
    ``_select_batch``), so at most one rule can match per position and
    the combined pass equals the serial composition."""

    def step(out, x):
        branch = None
        for a, b, ab in rules:
            cond = (F.try_element_at(out, F.lit(-1)) == a) & (x == b)
            collapse = F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(ab))
            )
            branch = (
                F.when(cond, collapse)
                if branch is None
                else branch.when(cond, collapse)
            )
        return branch.otherwise(F.concat(out, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def learn_merges(
    docs: DataFrame,
    n_merges: int = 16,
    checkpoint_every: int = 4,
    max_batch: int = 8,
    stats: dict | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank, left, right, merged, pair_count). Stops early when no
    pair occurs at least twice.

    Each round applies up to ``max_batch`` non-interfering merges in
    one pass (selection rule in ``_select_batch`` — provably identical
    output to ``max_batch=1`` serial training), collapsing the
    one-Spark-job-per-merge scheduling cost that would make a real
    32k-merge vocabulary run scheduler-bound. Pass ``stats`` to receive
    ``{"rounds": r}`` for instrumentation."""
    spark = docs.sparkSession
    vocab = (
        _vocab(docs, cache_key=cache_key)
        .select(_chars(F.col("tok")).alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    rounds = 0
    # collect enough of the head that a full batch plus its stop
    # witness is usually inside the prefix
    collect_cap = 4 * max_batch + 8
    while len(merges) < n_merges:
        rows = (
            vocab.select("n", F.explode(_sym_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(collect_cap)
            .collect()
        )
        rounds += 1
        if not rows or rows[0].c < 2:
            break
        batch = _select_batch(
            rows,
            min(max_batch, n_merges - len(merges)),
            truncated=len(rows) == collect_cap,
        )
        rules = []
        for a, b, c in batch:
            merges.append((len(merges) + 1, a, b, a + b, c))
            rules.append((a, b, a + b))
        vocab = vocab.select(_fold_rules(F.col("syms"), rules).alias("syms"), "n")
        if rounds % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    if stats is not None:
        stats["rounds"] = rounds
    return _merge_table(spark, merges)


def bpe_encode(
    docs: DataFrame, merges: list[tuple], cache_key: str | None = None
) -> DataFrame:
    """Apply a learned merge table to the corpus: per document, the
    whitespace/regex token count and the BPE symbol count after all
    merges — the number a sequence-packing or cost-estimation stage
    actually consumes.

    The encode is VOCAB-keyed like training: merges apply to the
    distinct-token frame (each merge is one narrow fold over symbol
    arrays, in rank order — same greedy-leftmost fold as the trainer,
    so encode(train corpus) sees exactly the trainer's final state),
    then the corpus joins the tiny token→symbol-count map by broadcast.
    The corpus is touched twice (token explode + broadcast join), never
    per-merge. Rank-order single passes reproduce the trainer's final
    vocabulary state exactly on the training corpus (training performs
    those same folds); on UNSEEN text the standard priority-iterated
    encode can differ where a later merge creates an earlier merge's
    pair — the registered query encodes the training corpus, where the
    two coincide. ``merges`` is the collected merge table
    (rank, left, right, merged, count) from :func:`learn_merges`;
    data-dependent, hence the registered query is rows-only with a
    pure-Python reference unit test.

    Output: (doc_id, n_tokens, n_bpe_tokens) — n_bpe_tokens <=
    n_chars, >= n_tokens's information floor; equal to n_tokens' sum of
    per-token symbol counts.
    """
    from .text import token_arrays

    toks = token_arrays(docs, cache_key).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    vocab = toks.select("tok").distinct().select(
        "tok", _chars(F.col("tok")).alias("syms")
    )
    # fuse consecutive symbol-disjoint rules into one fold pass (the
    # same disjointness that makes trainer batches exact makes fused
    # encode passes equal the serial composition) — cuts plan depth
    # from n_merges selects to ~n_merges/batch
    groups: list[list[tuple[str, str, str]]] = []
    touched: set[str] = set()
    for r in sorted(merges, key=lambda m: m[0]):
        a, b, ab = r[1], r[2], r[3]
        syms = {a, b, ab}
        if not groups or (syms & touched):
            groups.append([])
            touched = set()
        groups[-1].append((a, b, ab))
        touched |= syms
    for rules in groups:
        vocab = vocab.select(
            "tok", _fold_rules(F.col("syms"), rules).alias("syms")
        )
    sym_counts = vocab.select(
        "tok", F.size("syms").cast("long").alias("n_syms")
    )
    return (
        toks.join(F.broadcast(sym_counts), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
    )


def _bpe_rounds_ctes(n_rounds: int) -> str:
    """DuckDB CTE chain unrolling ``n_rounds`` SERIAL BPE merge rounds
    (the unrolled-CTE technique that made trained k-means oracle-able).

    The engine trains BATCHED (``_select_batch``), but batched output is
    provably identical to serial (docstring + property tests), so a
    serial oracle is the strongest possible cross-check: it exercises
    the equivalence argument itself on real data, per round.

    Serial round i: ``best{{i}}`` = argmax pair by (count desc, l, r)
    with the >=2 merge floor (empty CTE once training stops — later
    rounds then fold identity, matching the engine's early stop);
    ``v{{i}}`` = greedy-leftmost fold of that one rule. The fold needs
    no recursion: for l != r, matches can never overlap (an overlap
    would force l = r), so position j merges iff ``(s_j, s_j+1) =
    (l, r)`` and drops iff ``(s_j-1, s_j) = (l, r)``; for a self-pair
    the merge positions are exactly the ODD offsets within each maximal
    run of ``l`` (k-th consecutive occurrence merges iff k is odd and a
    next run element exists — 'aaaa' -> [aa, aa], 'aaa' -> [aa, a]),
    which is one islands window (j - row_number over the run rows).
    Ends with ``v{n_rounds}(tok, syms, n)`` plus ``best1..best{n_rounds}``.
    """
    parts = [
        f"""v0 AS MATERIALIZED (
  SELECT tok,
         list_transform(generate_series(1, length(tok)),
                        i -> substr(tok, i, 1)) AS syms,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
        FROM documents)
  GROUP BY tok
)"""
    ]
    for i in range(1, n_rounds + 1):
        prev = f"v{i - 1}"
        parts.append(
            f""",
best{i} AS MATERIALIZED (
  SELECT l, r, l || r AS m, CAST(SUM(n) AS BIGINT) AS c
  FROM (SELECT v.n, v.syms[u.j] AS l, v.syms[u.j + 1] AS r
        FROM {prev} v, UNNEST(generate_series(1, len(v.syms) - 1)) AS u(j))
  GROUP BY l, r
  HAVING SUM(n) >= 2
  ORDER BY c DESC, l ASC, r ASC
  LIMIT 1
),
ex{i} AS MATERIALIZED (
  SELECT v.tok, v.n, u.j, v.syms[u.j] AS s,
         v.syms[u.j + 1] AS s_next, v.syms[u.j - 1] AS s_prev
  FROM {prev} v, UNNEST(generate_series(1, len(v.syms))) AS u(j)
),
runs{i} AS (
  SELECT tok, j,
         ROW_NUMBER() OVER (PARTITION BY tok, j - rn ORDER BY j) AS k
  FROM (SELECT e.tok, e.j,
               ROW_NUMBER() OVER (PARTITION BY e.tok ORDER BY e.j) AS rn
        FROM ex{i} e JOIN best{i} b ON e.s = b.l)
),
dec{i} AS (
  SELECT e.tok, e.n, e.j,
         CASE
           WHEN b.l IS NULL THEN e.s
           WHEN b.l <> b.r AND e.s = b.l AND e.s_next = b.r THEN b.m
           WHEN b.l <> b.r AND e.s = b.r AND e.s_prev = b.l THEN NULL
           WHEN b.l = b.r AND e.s = b.l THEN
             CASE WHEN rk.k % 2 = 1 AND e.s_next = b.l THEN b.m
                  WHEN rk.k % 2 = 0 THEN NULL
                  ELSE e.s END
           ELSE e.s
         END AS out_s
  FROM ex{i} e
  LEFT JOIN best{i} b ON TRUE
  LEFT JOIN runs{i} rk ON rk.tok = e.tok AND rk.j = e.j
),
v{i} AS MATERIALIZED (
  SELECT tok, n, list(out_s ORDER BY j) AS syms
  FROM dec{i} WHERE out_s IS NOT NULL
  GROUP BY tok, n
)"""
        )
    return "".join(parts)


def bpe_merges_sql(n_merges: int = 12) -> str:
    """Value oracle for :func:`learn_merges` — ``n_merges`` serial
    rounds unrolled; the merge table is the per-round ``best`` rows
    (rounds past an early stop contribute no row, matching the engine)."""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, l AS \"left\","
        f" r AS \"right\", m AS merged, c AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_rounds_ctes(n_merges)}\n{union}"


def bpe_encode_sql(n_merges: int = 16) -> str:
    """Value oracle for train-then-encode (:func:`bpe_encode` applied
    to the training corpus with :func:`learn_merges` output): the final
    round's vocabulary state ALREADY holds each distinct token's merged
    symbol array, so the encode is a per-doc token join against
    ``v{n_merges}`` — exactly the engine's broadcast-join shape."""
    return f"""WITH {_bpe_rounds_ctes(n_merges)},
doc_toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens
FROM doc_toks t JOIN v{n_merges} v ON v.tok = t.tok
GROUP BY t.doc_id
"""


def _merge_table(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    schema = (
        "merge_rank long, left string, right string, merged string, "
        "pair_count long"
    )
    return spark.createDataFrame(merges, schema)
