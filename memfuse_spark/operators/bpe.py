"""Byte-pair-encoding merge-table training (Sennrich et al. '16), the
tokenizer-building step of a training-data pipeline, as an iterative
Spark job.

Each round: count adjacent symbol pairs across the corpus (explode +
map-side-combined groupBy — one narrow shuffle), pick the most frequent
pair (count desc, then lexicographic — deterministic), and merge its
occurrences greedily left-to-right in every document. N rounds = N jobs,
the same driver-coordinated iteration shape as PageRank/KMeans; the
per-round argmax collect is ONE row.

Merge application uses a delimiter-string representation shared with the
DuckDB oracle: a document is '·tok·' segments concatenated (double '·'
between tokens, one at each edge), so replacing '·A··B·' with '·AB·' is
exactly the greedy non-overlapping left-to-right BPE merge — ordinary
string replace() in both engines, no UDF. Symbols stay [a-z0-9]+ so the
'·' delimiter never collides.

Per-round results are persisted and the previous round released —
lineage stays O(1) deep, not O(rounds) (the PageRank lesson).

Reference: the memfuse reference counts tokens with len//4 and a BPE-ish
regex (SURVEY §2.7 A6/X9) but never trains a vocabulary; this is the
real merge-learning algorithm, deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_ROUNDS = 8
SEP = "·"  # '·' — outside the tokenizer's [a-z0-9] symbol alphabet


def _to_sep_string(tokens_col):
    return F.concat(
        F.lit(SEP), F.concat_ws(SEP + SEP, tokens_col), F.lit(SEP)
    )


def _pair_counts(docs_s: DataFrame) -> DataFrame:
    """Adjacent-pair counts from the delimiter-string representation."""
    arr = F.split(F.expr(f"trim(BOTH '{SEP}' FROM s)"), SEP + SEP)
    pairs = F.zip_with(
        arr,
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return (
        docs_s.select(F.explode_outer(pairs).alias("pair"))
        # zip_with pads the shorter slice with null; concat_ws then
        # yields a spaceless singleton — only real "left right" pairs count
        .filter(F.col("pair").isNotNull() & F.col("pair").contains(" "))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_merges(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """(rank, left, right, pair_count) — the learned merge table after
    ``rounds`` BPE iterations over the corpus."""
    from memfuse_spark.functions.text import tokenize

    spark = docs.sparkSession
    cur = docs.select(_to_sep_string(tokenize(text_col)).alias("s")).persist()
    merges = []
    # ONE job per round, not two: round r's replace is left LAZY and
    # materializes fused into round r+1's pair-count scan (which also
    # fills r+1's cache) — the standalone per-round count() paid a full
    # extra corpus pass and job launch just to materialize the rewrite.
    # The superseded round's cache is released only AFTER the next
    # round's argmax action has filled the new cache (until then the
    # lazy persist still reads the previous round's blocks).
    prev = None
    try:
        for r in range(1, rounds + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            pair, cnt = top[0]["pair"], top[0]["cnt"]
            left, right = pair.split(" ")
            merges.append((r, left, right, int(cnt)))
            nxt = cur.select(
                F.expr(
                    f"replace(s, '{SEP}{left}{SEP}{SEP}{right}{SEP}',"
                    f" '{SEP}{left}{right}{SEP}')"
                ).alias("s")
            ).persist()
            prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_merges_sql(tokenize_sql: str, rounds: int = BPE_ROUNDS) -> str:
    """DuckDB twin: the same algorithm as ``rounds`` chained CTE stages,
    each recomputing its own argmax — fully independent of the Spark
    run (no learned state is injected)."""

    def counts(src: str) -> str:
        return f"""
  SELECT concat(l[i], ' ', l[i + 1]) AS pair, count(*) AS cnt
  FROM (SELECT string_split(trim(s, '{SEP}'), '{SEP}{SEP}') AS l FROM {src}),
       unnest(range(1, len(l))) AS t(i)
  GROUP BY pair"""

    parts = [
        f"""t0 AS (
  SELECT concat('{SEP}', array_to_string({tokenize_sql}, '{SEP}{SEP}'),
                '{SEP}') AS s
  FROM documents
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""m{r} AS (
  SELECT pair, cnt, split_part(pair, ' ', 1) AS l,
         split_part(pair, ' ', 2) AS rr
  FROM ({counts(f't{r - 1}')})
  ORDER BY cnt DESC, pair ASC LIMIT 1
)"""
        )
        parts.append(
            f"""t{r} AS (
  SELECT replace(s, concat('{SEP}', l, '{SEP}{SEP}', rr, '{SEP}'),
                 concat('{SEP}', l, rr, '{SEP}')) AS s
  FROM t{r - 1}, m{r}
)"""
        )
    selects = "\nUNION ALL\n".join(
        f'SELECT {r} AS rank, l AS "left", rr AS "right", cnt AS pair_count'
        f" FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f'\nSELECT CAST(rank AS INTEGER) AS rank, "left", "right",'
        f" CAST(pair_count AS BIGINT) AS pair_count FROM ({selects})"
        f" ORDER BY rank"
    )


def apply_merges(text_tokens_col, merges: list[tuple]):
    """COLUMN: token array after applying a learned merge table in rank
    order — the tokenizer's encode step over a corpus column.

    The merge list is plan-time data (collected from :func:`bpe_merges`,
    vocab-sized), so application compiles to a chain of plain string
    ``replace`` calls over the delimiter representation — whole-stage
    codegen, no UDF, no per-row loop. Exactly the training-time greedy
    left-to-right semantics (same representation, same replace).
    """
    s = _to_sep_string(text_tokens_col)
    for _, left, right, *_ in sorted(merges, key=lambda m: m[0]):
        s = F.replace(
            s,
            F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
            F.lit(f"{SEP}{left}{right}{SEP}"),
        )
    return F.filter(
        F.split(F.regexp_replace(s, f"^{SEP}|{SEP}$", ""), SEP + SEP),
        lambda t: F.length(t) > 0,
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_raw_tokens, n_bpe_tokens) — sequence lengths under the
    learned vocabulary vs raw whitespace tokens; the number that actually
    prices a training run (merged tokens shrink sequences)."""
    from memfuse_spark.catalog import ensure_parallelism
    from memfuse_spark.functions.text import tokenize

    # the replace-chain encode runs INSIDE the scan stage, and a small
    # single-file input arrives as ONE partition — one core would pay
    # the whole corpus's encode (profiled r11: 2.9s on 4 tasks for the
    # stats twin). Project to the consumed columns first (§2.3), then
    # spread; no-op at scale where scans have many splits (§2.5).
    toks = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk")
    )
    return toks.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_raw_tokens"),
        F.size(apply_merges(F.col("tk"), merges)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


def exact_token_count(text_col, merges: list[tuple]):
    """COLUMN: deterministic EXACT token count — tokenize, encode under
    the trained merge table (:func:`apply_merges`, a plan-time replace
    chain: whole-stage codegen, no UDF), count. This is the engine's
    tokenizer-preferred tier of the reference's token-counting ladder
    (utils/token_counter.py:26-70 prefers real tokenizer counts via
    tiktoken and only then falls back to a heuristic): the trained BPE
    table plays the role of the real tokenizer, which keeps the count
    deterministic and therefore oracle-checkable. Empty/whitespace text
    encodes to zero tokens — the reference also returns 0 for empty
    text, and NULL text counts 0 as well (size() alone would return
    NULL — or -1 under legacy sizeOfNull — breaking oracle parity with
    the DuckDB twin, which yields 0; same guard as
    heuristic_token_count)."""
    from memfuse_spark.functions.text import tokenize

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.size(apply_merges(tokenize(c), merges)).cast("long")
    return F.when(c.isNull(), F.lit(0).cast("long")).otherwise(n)


def heuristic_token_count(text_col):
    """COLUMN: the reference's FALLBACK token estimate
    (utils/token_counter.py:114-130): ``int(max(cjk_word_count, 1) *
    1.3)`` for non-empty text, 0 for empty/NULL. Word counting is the
    engine's shared X9 CJK rule (functions/text.py — whitespace words +
    one per CJK char; the reference's _count_words_with_cjk:132-155 is
    the same shape with a slightly wider CJK range)."""
    from memfuse_spark.functions.text import word_count_cjk

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    wc = F.greatest(word_count_cjk(c), F.lit(1))
    return (
        F.when(c.isNull() | (F.length(c) == 0), F.lit(0))
        .otherwise(F.floor(wc * 1.3))
        .cast("long")
    )


def token_counter_stats(
    docs: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Both tiers of the reference token-counting ladder side by side,
    per document: (doc_id, n_tokens_exact, n_tokens_heuristic,
    heuristic_ratio). ``n_tokens_exact`` is the trained-BPE encode
    length (the count that actually prices a context-window budget);
    ``heuristic_ratio`` = heuristic/exact is the calibration signal for
    the fallback multiplier. One narrow projection over the corpus —
    no shuffle, no UDF."""
    from memfuse_spark.catalog import ensure_parallelism

    # same single-file-scan guard as bpe_token_counts: the encode chain
    # is per-row heavy and otherwise runs on one core (profiled r11)
    docs = ensure_parallelism(docs.select(id_col, text_col))
    exact = exact_token_count(text_col, merges)
    heur = heuristic_token_count(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        exact.alias("n_tokens_exact"),
        heur.alias("n_tokens_heuristic"),
        F.round(
            F.when(exact > 0, heur.cast("double") / exact).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("heuristic_ratio"),
    )


def token_counter_stats_sql(
    tokenize_sql_tpl: str,
    wc_cjk_sql_tpl: str,
    rounds: int = BPE_ROUNDS,
) -> str:
    """DuckDB twin of :func:`token_counter_stats`: re-derives the merge
    table with the same chained argmax CTEs as tokenizer_fertility_sql
    (no learned state injected), counts the encoded tokens per doc, and
    computes the heuristic from the shared X9 wordcount SQL template
    (``{col}``-parameterized)."""
    tokenize_sql = tokenize_sql_tpl.format(col="text")
    # str.replace, not .format: the wordcount template's CJK ranges use
    # DuckDB's \x{...} regex escapes, which .format would parse as fields
    wc = wc_cjk_sql_tpl.replace("{col}", "d.text")

    def counts(src: str) -> str:
        return f"""
  SELECT concat(l[i], ' ', l[i + 1]) AS pair, count(*) AS cnt
  FROM (SELECT string_split(trim(s, '{SEP}'), '{SEP}{SEP}') AS l FROM {src}),
       unnest(range(1, len(l))) AS t(i)
  GROUP BY pair"""

    parts = [
        f"""t0 AS MATERIALIZED (
  SELECT doc_id,
         concat('{SEP}', array_to_string({tokenize_sql}, '{SEP}{SEP}'),
                '{SEP}') AS s
  FROM documents
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""m{r} AS (
  SELECT pair, cnt, split_part(pair, ' ', 1) AS l,
         split_part(pair, ' ', 2) AS rr
  FROM ({counts(f't{r - 1}')})
  ORDER BY cnt DESC, pair ASC LIMIT 1
)"""
        )
        parts.append(
            f"""t{r} AS MATERIALIZED (
  SELECT doc_id,
         replace(s, concat('{SEP}', l, '{SEP}{SEP}', rr, '{SEP}'),
                 concat('{SEP}', l, rr, '{SEP}')) AS s
  FROM t{r - 1}, m{r}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
per_doc AS (
  SELECT t.doc_id,
         len(list_filter(string_split(trim(t.s, '{SEP}'), '{SEP}{SEP}'),
                         x -> len(x) > 0)) AS exact,
         CASE WHEN d.text IS NULL OR len(d.text) = 0 THEN 0
              ELSE CAST(floor(greatest(({wc}), 1) * 1.3) AS BIGINT)
         END AS heur
  FROM t{rounds} t JOIN documents d USING (doc_id)
)
SELECT doc_id, CAST(exact AS BIGINT) AS n_tokens_exact,
       CAST(heur AS BIGINT) AS n_tokens_heuristic,
       round(CASE WHEN exact > 0 THEN CAST(heur AS DOUBLE) / exact
                  ELSE 0.0 END, 6) AS heuristic_ratio
FROM per_doc ORDER BY doc_id"""
    )


# ---------------------------------------------------------------------------
# batched training: K symbol-disjoint merges per round
# ---------------------------------------------------------------------------

BPE_BATCH_K = 4
_NOOP = "§"  # outside the symbol alphabet AND never produced by merging


def _select_disjoint(cands: list[tuple[str, int]], k: int) -> list[tuple]:
    """Deterministic conservative independent-set selection over the
    ranked candidate window: keep a candidate only if NO higher-ranked
    candidate shares a symbol with it (left or right side). Stricter
    than greedy-with-state — but expressible as a pure NOT EXISTS
    self-join, so the oracle replicates it exactly; the top pair always
    survives, so every round makes progress.
    """
    out = []
    for i, (pair, cnt) in enumerate(cands):
        l, r = pair.split(" ")
        conflict = False
        for pj, _ in cands[:i]:
            jl, jr = pj.split(" ")
            if jl in (l, r) or jr in (l, r):
                conflict = True
                break
        if not conflict:
            out.append((l, r, int(cnt)))
            if len(out) == k:
                break
    return out


def bpe_merges_batched(
    docs: DataFrame,
    rounds: int = 3,
    batch_k: int = BPE_BATCH_K,
    text_col: str = "text",
) -> DataFrame:
    """(rank, left, right, pair_count) — batched BPE: each round counts
    pairs ONCE and applies up to ``batch_k`` symbol-disjoint merges in a
    single projection (the fast-trainer batching of YouTokenToMe/
    SentencePiece lineage). Disjoint symbols make the in-batch replaces
    order-independent, so one round costs the same two jobs as one
    strict-BPE merge but learns K merges — rounds drop K-fold for the
    same vocabulary depth. Counts are from the round start (batched
    semantics, deliberately not strict-sequential BPE; the oracle
    mirrors the same rule, candidate window fixed at 2*batch_k).
    """
    from memfuse_spark.functions.text import tokenize

    spark = docs.sparkSession
    cur = docs.select(_to_sep_string(tokenize(text_col)).alias("s")).persist()
    merges = []
    # one job per round (see bpe_merges): the rewrite stays lazy and
    # materializes fused into the next round's candidate-count scan;
    # the superseded cache is released after that scan fills the new one
    prev = None
    try:
        for _ in range(rounds):
            cands = [
                (row["pair"], row["cnt"])
                for row in _pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(2 * batch_k)
                .collect()
            ]
            if prev is not None:
                prev.unpersist()
                prev = None
            picked = _select_disjoint(cands, batch_k)
            if not picked:
                break
            for left, right, cnt in picked:
                merges.append((len(merges) + 1, left, right, cnt))
            s = F.col("s")
            for left, right, _ in picked:
                s = F.replace(
                    s,
                    F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
                    F.lit(f"{SEP}{left}{right}{SEP}"),
                )
            nxt = cur.select(s.alias("s")).persist()
            prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_merges_batched_sql(
    tokenize_sql: str, rounds: int = 3, batch_k: int = BPE_BATCH_K
) -> str:
    """DuckDB twin of :func:`bpe_merges_batched`: per round, ranked
    candidate window (2*batch_k) → NOT EXISTS symbol-disjoint filter →
    up to batch_k merges applied via fixed replace slots (missing slots
    degrade to a no-op pattern)."""

    def counts(src: str) -> str:
        return f"""
  SELECT concat(l[i], ' ', l[i + 1]) AS pair, count(*) AS cnt
  FROM (SELECT string_split(trim(s, '{SEP}'), '{SEP}{SEP}') AS l FROM {src}),
       unnest(range(1, len(l))) AS t(i)
  GROUP BY pair"""

    parts = [
        f"""t0 AS MATERIALIZED (
  SELECT concat('{SEP}', array_to_string({tokenize_sql}, '{SEP}{SEP}'),
                '{SEP}') AS s
  FROM documents
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT pair, cnt, split_part(pair, ' ', 1) AS l,
         split_part(pair, ' ', 2) AS rr,
         row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rn
  FROM ({counts(f't{r - 1}')})
  ORDER BY cnt DESC, pair ASC LIMIT {2 * batch_k}
)"""
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
  SELECT *, row_number() OVER (ORDER BY rn) AS slot FROM (
    SELECT a.* FROM c{r} a
    WHERE NOT EXISTS (
      SELECT 1 FROM c{r} b
      WHERE b.rn < a.rn
        AND (b.l IN (a.l, a.rr) OR b.rr IN (a.l, a.rr))
    ) ORDER BY rn LIMIT {batch_k}
  )
)"""
        )
        slot_cols = ", ".join(
            f"coalesce(max(CASE WHEN slot = {i} THEN"
            f" concat('{SEP}', l, '{SEP}{SEP}', rr, '{SEP}') END), '{_NOOP}')"
            f" AS f{i},"
            f" coalesce(max(CASE WHEN slot = {i} THEN"
            f" concat('{SEP}', l, rr, '{SEP}') END), '{_NOOP}') AS g{i}"
            for i in range(1, batch_k + 1)
        )
        chain = "s"
        for i in range(1, batch_k + 1):
            chain = f"replace({chain}, f{i}, g{i})"
        parts.append(f"p{r} AS (SELECT {slot_cols} FROM s{r})")
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT {chain} AS s FROM t{r - 1}, p{r})"
        )
    selects = "\nUNION ALL\n".join(
        f'SELECT {r} AS round, slot, l AS "left", rr AS "right",'
        f" cnt AS pair_count FROM s{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(row_number() OVER (ORDER BY round, slot) AS INTEGER) AS rank,
       "left", "right", CAST(pair_count AS BIGINT) AS pair_count
FROM ({selects})
ORDER BY rank"""
    )


# ---------------------------------------------------------------------------
# tokenizer fertility by source domain
# ---------------------------------------------------------------------------


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[tuple],
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain tokenizer FERTILITY report under a learned merge
    table: (group, n_docs, raw_tokens, bpe_tokens, fertility,
    merges_applied). Fertility (bpe/raw sequence-length ratio) is the
    standard tokenizer-fit metric — a domain whose ratio stays near
    1.0 is poorly covered by the learned vocabulary and will pay more
    sequence length per word at training time.

    Plan shape: :func:`apply_merges` is a plan-time replace chain
    (whole-stage codegen, no UDF), so the whole report is one narrow
    scan + one groupBy(domain) — wordcount-shaped at any scale.
    """
    counts = bpe_token_counts(docs, merges, id_col=id_col, text_col=text_col)
    keyed = counts.join(
        docs.select(F.col(id_col).alias("doc_id"), group_col), "doc_id"
    )
    return (
        keyed.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_raw_tokens").cast("long").alias("raw_tokens"),
            F.sum("n_bpe_tokens").cast("long").alias("bpe_tokens"),
            F.round(
                F.sum("n_bpe_tokens") / F.sum("n_raw_tokens"), 6
            ).alias("fertility"),
            (F.sum("n_raw_tokens") - F.sum("n_bpe_tokens"))
            .cast("long")
            .alias("merges_applied"),
        )
        .orderBy(group_col)
    )


def tokenizer_fertility_sql(
    tokenize_sql_tpl: str, rounds: int = BPE_ROUNDS, group_col: str = "source"
) -> str:
    """DuckDB twin of :func:`tokenizer_fertility`: re-derives the merge
    table with the same chained argmax CTEs as bpe_merges_sql (no
    learned state injected), carries doc identity through the replace
    chain, and aggregates per domain. ``tokenize_sql_tpl`` is the
    ``{col}``-parameterized TOKENIZE_SQL template."""
    tokenize_sql = tokenize_sql_tpl.format(col="text")

    def counts(src: str) -> str:
        return f"""
  SELECT concat(l[i], ' ', l[i + 1]) AS pair, count(*) AS cnt
  FROM (SELECT string_split(trim(s, '{SEP}'), '{SEP}{SEP}') AS l FROM {src}),
       unnest(range(1, len(l))) AS t(i)
  GROUP BY pair"""

    parts = [
        f"""t0 AS MATERIALIZED (
  SELECT doc_id, {group_col},
         concat('{SEP}', array_to_string({tokenize_sql}, '{SEP}{SEP}'),
                '{SEP}') AS s
  FROM documents
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""m{r} AS (
  SELECT pair, cnt, split_part(pair, ' ', 1) AS l,
         split_part(pair, ' ', 2) AS rr
  FROM ({counts(f't{r - 1}')})
  ORDER BY cnt DESC, pair ASC LIMIT 1
)"""
        )
        parts.append(
            f"""t{r} AS MATERIALIZED (
  SELECT doc_id, {group_col},
         replace(s, concat('{SEP}', l, '{SEP}{SEP}', rr, '{SEP}'),
                 concat('{SEP}', l, rr, '{SEP}')) AS s
  FROM t{r - 1}, m{r}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
per_doc AS (
  SELECT t.{group_col},
         len({tokenize_sql_tpl.format(col="d.text")}) AS rawlen,
         len(list_filter(string_split(trim(t.s, '{SEP}'), '{SEP}{SEP}'),
                         x -> len(x) > 0)) AS bpelen
  FROM t{rounds} t JOIN documents d USING (doc_id)
)
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(rawlen) AS BIGINT) AS raw_tokens,
       CAST(sum(bpelen) AS BIGINT) AS bpe_tokens,
       round(CAST(sum(bpelen) AS DOUBLE) / sum(rawlen), 6) AS fertility,
       CAST(sum(rawlen) - sum(bpelen) AS BIGINT) AS merges_applied
FROM per_doc GROUP BY {group_col} ORDER BY {group_col}
"""
    )
