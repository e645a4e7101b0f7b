"""DuckDB oracle SQL twins for the dedup and text-analysis operators.

Each generator mirrors its Spark operator parameter-for-parameter; shared
constants come from the operator modules so the two sides cannot drift.
Hashes are md5 (identical in Spark and DuckDB); float outputs are rounded
to 6 decimals on both sides.
"""

from __future__ import annotations

from memfuse_spark.operators.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    SHINGLE_N,
    SIMHASH_BITS,
)
from memfuse_spark.operators.textanalysis import LANG_MARKERS, STOPWORDS

# --- shared CTE fragments --------------------------------------------------

TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM documents
)"""


def _shingles_cte(n: int = SHINGLE_N) -> str:
    return f"""
shingles AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) >= {n}
         THEN [array_to_string(tk[i:i+{n - 1}], ' ')
               for i in range(1, len(tk) - {n - 1} + 1)]
         ELSE [array_to_string(tk, ' ')]
    END) AS s
  FROM toks
)"""


def _sig_cte(num_hashes: int = NUM_HASHES) -> str:
    # keep in lockstep with dedup.minhash_signature: one 32-bit md5 per
    # shingle, then h_i = (a_i·x + b_i) mod P over the shared constants
    from memfuse_spark.operators.dedup import MINHASH_PRIME, minhash_mix_constants

    mins = ", ".join(
        f"min(({a} * xv + {b}) % {MINHASH_PRIME}) AS h{h}"
        for h, (a, b) in enumerate(minhash_mix_constants(num_hashes))
    )
    return f"""
sigs AS (
  SELECT doc_id, {mins}
  FROM (SELECT doc_id,
               CAST(('0x' || substring(md5(sh), 1, 8)) AS BIGINT) AS xv
        FROM (SELECT doc_id, unnest(s) AS sh FROM shingles))
  GROUP BY doc_id
)"""


def _bands_cte(bands: int = BANDS, num_hashes: int = NUM_HASHES) -> str:
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = " || '|' || ".join(
            f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs"
        )
    return "bands AS (\n" + "\n  UNION ALL\n".join(parts) + "\n)"


def _cands_cte() -> str:
    return """
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""


def _minhash_prefix(n: int = SHINGLE_N) -> str:
    return (
        "WITH "
        + TOKS_CTE
        + ","
        + _shingles_cte(n)
        + ","
        + _sig_cte()
        + ","
        + _bands_cte()
        + ","
        + _cands_cte()
    )


# --- dedup oracles ----------------------------------------------------------

def exact_dedup_sql() -> str:
    return """
SELECT md5(lower(text)) AS content_hash,
       min(doc_id) AS keep_id, count(*) AS group_size
FROM documents GROUP BY 1
"""


def minhash_pairs_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    return (
        _minhash_prefix()
        + f"""
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.s, sb.s))::DOUBLE
             / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
FROM cands
JOIN shingles sa ON sa.doc_id = doc_a
JOIN shingles sb ON sb.doc_id = doc_b
WHERE round(len(list_intersect(sa.s, sb.s))::DOUBLE
      / len(list_distinct(list_concat(sa.s, sb.s))), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""
    )


def minhash_dedup_keep_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    return (
        _minhash_prefix()
        + f""",
dropped AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM cands
  JOIN shingles sa ON sa.doc_id = doc_a
  JOIN shingles sb ON sb.doc_id = doc_b
  WHERE round(len(list_intersect(sa.s, sb.s))::DOUBLE
        / len(list_distinct(list_concat(sa.s, sb.s))), 6) >= {threshold}
)
SELECT d.doc_id FROM documents d
LEFT JOIN dropped USING (doc_id)
WHERE dropped.doc_id IS NULL
ORDER BY d.doc_id
"""
    )


def dup_clusters_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """Connected components over verified near-dup pairs: WITH RECURSIVE
    min-label reachability (component = min doc_id reachable), every
    document a node (singletons form their own component)."""
    prefix = _minhash_prefix().replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        prefix
        + f""",
pairs AS (
  SELECT doc_a, doc_b
  FROM cands
  JOIN shingles sa ON sa.doc_id = doc_a
  JOIN shingles sb ON sb.doc_id = doc_b
  WHERE round(len(list_intersect(sa.s, sb.s))::DOUBLE
        / len(list_distinct(list_concat(sa.s, sb.s))), 6) >= {threshold}
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (
  SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
)
SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS cluster_size
FROM comp ORDER BY doc_id
"""
    )


def simhash_sql(bits: int = SIMHASH_BITS) -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (th >> {i}) & 1 = 1 THEN tf ELSE -tf END) AS s{i}"
        for i in range(bits)
    )
    bit_terms = " + ".join(
        f"CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END" for i in range(bits)
    )
    return f"""
WITH {TOKS_CTE.strip()},
tf AS (
  SELECT doc_id, tok, count(*) AS tf,
         CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS th
  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
  GROUP BY doc_id, tok
),
sums AS (SELECT doc_id, {bit_sums} FROM tf GROUP BY doc_id)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
FROM sums ORDER BY doc_id
"""


def simhash_pairs_sql(max_hamming: int = 3, bits: int = SIMHASH_BITS) -> str:
    n_bytes = bits // 8
    band_parts = "\n  UNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS byte_idx, (simhash >> {i * 8}) & 255 AS byte_val FROM sim"
        for i in range(n_bytes)
    )
    inner = simhash_sql(bits).strip().removesuffix("ORDER BY doc_id").rstrip()
    # wrap the per-doc simhash as a CTE
    return f"""
WITH sim AS ({inner}),
banded AS (
{band_parts}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


def ngram_jaccard_sql(n: int = 5) -> str:
    """Char-n-gram jaccard over minhash-LSH candidate pairs."""
    return (
        _minhash_prefix()
        + f""",
grams AS (
  SELECT doc_id, list_distinct(
    [substring(lower(text), i, {n})
     for i in range(1, greatest(len(lower(text)) - {n - 1}, 1) + 1)]) AS g
  FROM documents
)
SELECT doc_a, doc_b,
       round(len(list_intersect(ga.g, gb.g))::DOUBLE
             / len(list_distinct(list_concat(ga.g, gb.g))), 6) AS jaccard
FROM cands
JOIN grams ga ON ga.doc_id = doc_a
JOIN grams gb ON gb.doc_id = doc_b
ORDER BY doc_a, doc_b
"""
    )


def embedding_neardup_sql(k: int = 50) -> str:
    cos = (
        "round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
        " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"
    )
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cosine DESC, id_a ASC, id_b ASC
LIMIT {k}
"""


# --- text-analysis oracles ---------------------------------------------------

def token_stats_sql() -> str:
    return f"""
WITH {TOKS_CTE.strip()}
SELECT doc_id,
       len(tk) AS n_tokens,
       len(list_distinct(tk)) AS n_unique_tokens,
       round(CASE WHEN len(tk) > 0
                  THEN list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)
                  ELSE 0.0 END, 6) AS avg_token_len
FROM toks ORDER BY doc_id
"""


def quality_score_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH {TOKS_CTE.strip()},
base AS (
  SELECT d.doc_id, d.text, t.tk,
         len(t.tk) AS n,
         len(list_filter(t.tk, x -> x IN ({stop_list}))) AS stop_hits,
         list_sum(list_transform(t.tk, x -> len(x))) AS total_len,
         len(regexp_replace(d.text, '[^a-zA-Z0-9]', '', 'g')) AS alnum,
         len(d.text) AS chars
  FROM documents d JOIN toks t USING (doc_id)
)
SELECT doc_id,
       round(0.3 * least(n / 100.0, 1.0)
           + 0.3 * (1.0 - CASE WHEN n > 0 THEN stop_hits::DOUBLE / n ELSE 0.0 END)
           + 0.2 * least((CASE WHEN n > 0 THEN total_len::DOUBLE / n ELSE 0.0 END) / 8.0, 1.0)
           + 0.2 * (CASE WHEN chars > 0 THEN alnum::DOUBLE / chars ELSE 0.0 END), 6)
       AS quality
FROM base ORDER BY doc_id
"""


def lang_id_sql() -> str:
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return f"len(list_filter(tk, x -> x IN ({lst})))"

    # RE2 syntax (DuckDB) — the Spark side uses Java \uXXXX escapes
    cjk = "[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}\\x{ac00}-\\x{d7af}]"
    return f"""
WITH {TOKS_CTE.strip()},
scored AS (
  SELECT d.doc_id,
         {hits('de')} AS h_de, {hits('fr')} AS h_fr,
         {hits('es')} AS h_es, {hits('zh')} AS h_zh,
         len(d.text) - len(regexp_replace(d.text, '{cjk}', '', 'g')) AS cjk_chars
  FROM documents d JOIN toks t USING (doc_id)
)
SELECT doc_id,
       CASE WHEN cjk_chars > 0 THEN 'zh'
            WHEN greatest(h_de, h_fr, h_es, h_zh) = 0 THEN 'en'
            WHEN h_de = greatest(h_de, h_fr, h_es, h_zh) THEN 'de'
            WHEN h_fr = greatest(h_de, h_fr, h_es, h_zh) THEN 'fr'
            WHEN h_es = greatest(h_de, h_fr, h_es, h_zh) THEN 'es'
            ELSE 'zh' END AS lang_pred
FROM scored ORDER BY doc_id
"""


# --- hierarchy oracles (events as M0) ----------------------------------------

# X9 CJK-aware word count as a {col}-parameterized DuckDB template —
# whitespace words (after blanking CJK chars) + one per CJK char; the
# SQL twin of functions/text.py word_count_cjk (same regex ranges).
_WC_CJK_RANGES = r"[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"
WC_CJK_SQL_TPL = (
    "len(list_filter(string_split_regex("
    f"regexp_replace({{col}}, '{_WC_CJK_RANGES}', ' ', 'g'), '\\s+'),"
    " x -> len(x) > 0))"
    f" + (len({{col}}) - len(regexp_replace({{col}}, '{_WC_CJK_RANGES}', '', 'g')))"
)

M0_CTE = """
m0 AS (
  SELECT event_id AS message_id, user_id AS conversation_id,
         event_type AS role, props AS content,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS sequence_number
  FROM events
)"""


def _m1_cte(batch_size: int, dim: int) -> str:
    from memfuse_spark.functions.vector import hash_embedding_sql

    emb = hash_embedding_sql("content", dim)
    return f"""
batched AS (
  SELECT *, CAST(floor((sequence_number - 1) / {batch_size}) AS INT) AS batch_id
  FROM m0
),
chunks AS (
  SELECT conversation_id, batch_id,
         string_agg('[' || role || ']: ' || content, e'\\n\\n'
                    ORDER BY sequence_number) AS content,
         list(message_id ORDER BY sequence_number) AS m0_raw_ids
  FROM batched GROUP BY conversation_id, batch_id
),
m1 AS (
  SELECT conversation_id || '-' || batch_id AS chunk_id,
         conversation_id, batch_id, content, m0_raw_ids,
         CAST(ceil(len(content) / 4.0) AS INT) AS token_count,
         round(least(CAST(ceil(len(content) / 4.0) AS INT) / 200.0, 1.0), 6)
           AS chunk_quality_score,
         list_transform({emb}, x -> round(x, 6)) AS embedding
  FROM chunks
)"""


def m0_records_sql() -> str:
    return f"WITH {M0_CTE.strip()}\nSELECT message_id, conversation_id, role, content, sequence_number FROM m0 ORDER BY message_id"


def m1_chunks_sql(batch_size: int = 5, dim: int = 16) -> str:
    # list columns serialized to CSV strings at the query boundary
    # (harness-safe); inner CTEs keep the raw lists
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)}\n"
        "SELECT chunk_id, conversation_id, batch_id, content,\n"
        "       array_to_string(list_transform(m0_raw_ids,"
        " x -> CAST(x AS VARCHAR)), ',') AS m0_raw_ids_csv,\n"
        "       token_count, chunk_quality_score,\n"
        "       array_to_string(list_transform(embedding,"
        " x -> printf('%.6f', x)), ',') AS embedding_csv\n"
        "FROM m1 ORDER BY chunk_id"
    )


def m2_facts_sql(
    batch_size: int = 5, dim: int = 16, confidence_threshold: float = 0.7
) -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)},"
        + f"""
toks AS (
  SELECT chunk_id, conversation_id, t.tok
  FROM m1, unnest(list_filter(string_split_regex(lower(content), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS t(tok)
  WHERE t.tok NOT IN ({stop_list})
),
tf AS (
  SELECT chunk_id, conversation_id, tok, count(*) AS tf
  FROM toks GROUP BY chunk_id, conversation_id, tok
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY chunk_id
                               ORDER BY tf DESC, tok ASC) AS rnk
  FROM tf
),
n_tok AS (SELECT chunk_id, count(*) AS n_tok FROM toks GROUP BY chunk_id),
agg AS (
  SELECT r.chunk_id, r.conversation_id,
         max(CASE WHEN rnk = 1 THEN tok END) AS entity_a,
         max(CASE WHEN rnk = 2 THEN tok END) AS entity_b,
         sum(tf) AS top_tf
  FROM ranked r WHERE rnk <= 2 GROUP BY r.chunk_id, r.conversation_id
)
SELECT a.chunk_id, a.conversation_id,
       entity_a || ' co_occurs_with ' || entity_b AS fact_content,
       entity_a || ',' || entity_b AS entities_csv,
       round(least(0.5 + top_tf::DOUBLE / n.n_tok, 1.0), 6) AS confidence
FROM agg a JOIN n_tok n ON a.chunk_id = n.chunk_id
WHERE entity_b IS NOT NULL
  AND round(least(0.5 + top_tf::DOUBLE / n.n_tok, 1.0), 6) >= {confidence_threshold}
ORDER BY a.chunk_id
"""
    )


def chunk_stats_sql(batch_size: int = 5, dim: int = 16) -> str:
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)}\n"
        + """
SELECT conversation_id,
       count(*) AS n_chunks,
       CAST(sum(token_count) AS BIGINT) AS total_tokens,
       round(avg(token_count), 6) AS avg_tokens,
       round(max(chunk_quality_score), 6) AS max_quality
FROM m1 GROUP BY conversation_id ORDER BY conversation_id
"""
    )


def m3_patterns_sql(min_support: int = 2) -> str:
    m2 = m2_facts_sql()
    return f"""
WITH m2 AS (SELECT * FROM ({m2}))
SELECT conversation_id || '-' || md5(fact_content) AS pattern_id,
       conversation_id,
       fact_content AS pattern_content,
       arg_min(entities_csv, chunk_id) AS entities_csv,
       array_to_string(list_sort(list(chunk_id)), ',') AS steps_csv,
       CAST(count(*) AS BIGINT) AS execution_count,
       round(avg(confidence), 6) AS success_rate
FROM m2
GROUP BY conversation_id, fact_content
HAVING count(*) >= {min_support}
ORDER BY pattern_id
"""


def m1_former_sql(batch_size: int = 5, dim: int = 16) -> str:
    """DuckDB twin of the deterministic stand-in episode former
    (q_m1_episodes_former): content = 'EPISODE <n>: <first> | <last>'
    over the ordered message lines, then the standard m1 tail (token
    count, quality, hash embedding) derived from the FORMED content."""
    from memfuse_spark.functions.vector import hash_embedding_sql

    emb = hash_embedding_sql("content", dim)
    return f"""
WITH {M0_CTE.strip()},
batched AS (
  SELECT *, CAST(floor((sequence_number - 1) / {batch_size}) AS INT) AS batch_id
  FROM m0
),
grp AS (
  SELECT conversation_id, batch_id,
         list('[' || role || ']: ' || content ORDER BY sequence_number) AS ls,
         list(message_id ORDER BY sequence_number) AS m0_raw_ids
  FROM batched GROUP BY conversation_id, batch_id
),
formed AS (
  SELECT conversation_id, batch_id, m0_raw_ids,
         'EPISODE ' || len(ls) || ': ' || ls[1] || ' | ' || ls[len(ls)]
           AS content
  FROM grp
),
m1 AS (
  SELECT conversation_id || '-' || batch_id AS chunk_id,
         conversation_id, batch_id, content, m0_raw_ids,
         CAST(ceil(len(content) / 4.0) AS INT) AS token_count,
         round(least(CAST(ceil(len(content) / 4.0) AS INT) / 200.0, 1.0), 6)
           AS chunk_quality_score,
         list_transform({emb}, x -> round(x, 6)) AS embedding
  FROM formed
)
SELECT chunk_id, conversation_id, batch_id, content,
       array_to_string(list_transform(m0_raw_ids,
         x -> CAST(x AS VARCHAR)), ',') AS m0_raw_ids_csv,
       token_count, chunk_quality_score,
       array_to_string(list_transform(embedding,
         x -> printf('%.6f', x)), ',') AS embedding_csv
FROM m1 ORDER BY chunk_id
"""


# entity → ontology leaf class (operators/msmg.classify_entity twin)
_MSMG_CLS = (
    "CASE WHEN regexp_full_match({e}, '[0-9]+') THEN 'numeric' "
    "WHEN len({e}) <= 4 THEN 'short_term' ELSE 'long_term' END"
)

_MSMG_ONTO_CTES = """
onto(class_id, parent_class_id, hierarchy_level) AS (
  VALUES ('thing', CAST(NULL AS VARCHAR), 0),
         ('entity', 'thing', 1), ('relation', 'thing', 1),
         ('numeric', 'entity', 2), ('short_term', 'entity', 2),
         ('long_term', 'entity', 2), ('co_occurrence', 'relation', 2)
),
anc AS (
  SELECT class_id, class_id AS ancestor_id FROM onto
  UNION ALL
  SELECT class_id, parent_class_id FROM onto WHERE parent_class_id IS NOT NULL
  UNION ALL
  SELECT o.class_id, p.parent_class_id FROM onto o JOIN onto p
    ON o.parent_class_id = p.class_id WHERE p.parent_class_id IS NOT NULL
)"""


def msmg_rollup_sql() -> str:
    """Instance→ontology rollup over the MSMG two-layer graph
    (operators/msmg.rollup_by_class twin)."""
    cls = _MSMG_CLS.format(e="u.entity")
    return f"""
WITH m2 AS (SELECT * FROM ({m2_facts_sql()})),
einst AS (
  SELECT m.conversation_id AS context_id, m.confidence AS source_confidence,
         {cls} AS ontology_class_id
  FROM m2 m, unnest(string_split(m.entities_csv, ',')) AS u(entity)
),
rinst AS (
  SELECT conversation_id AS context_id, confidence AS source_confidence,
         'co_occurrence' AS ontology_class_id
  FROM m2
),
inst AS (SELECT * FROM einst UNION ALL SELECT * FROM rinst),{_MSMG_ONTO_CTES}
SELECT a.ancestor_id AS class_id, o2.hierarchy_level,
       CAST(count(*) AS BIGINT) AS n_instances,
       CAST(count(DISTINCT i.context_id) AS BIGINT) AS n_contexts,
       round(avg(i.source_confidence), 6) AS mean_confidence
FROM inst i
JOIN anc a ON i.ontology_class_id = a.class_id
JOIN onto o2 ON a.ancestor_id = o2.class_id
GROUP BY a.ancestor_id, o2.hierarchy_level
ORDER BY o2.hierarchy_level, class_id
"""


def msmg_neighborhood_sql() -> str:
    """Cross-layer sibling neighborhood off the MSMG lineage arrays
    (operators/msmg.cross_layer_neighborhood twin). Each m2 fact has
    exactly two distinct entities, so the sibling expansion is both
    directed pairs of (entity_a, entity_b)."""
    cls_a = _MSMG_CLS.format(e="a")
    cls_b = _MSMG_CLS.format(e="b")
    return f"""
WITH m2 AS (SELECT * FROM ({m2_facts_sql()})),
pairs AS (
  SELECT chunk_id, conversation_id,
         string_split(entities_csv, ',')[1] AS a,
         string_split(entities_csv, ',')[2] AS b
  FROM m2
),
both_dirs AS (
  SELECT chunk_id, conversation_id, a, b FROM pairs
  UNION ALL
  SELECT chunk_id, conversation_id, b AS a, a AS b FROM pairs
)
SELECT chunk_id || ':' || a AS instance_id,
       a AS instance_name,
       {cls_a} AS instance_class,
       chunk_id || ':' || b AS neighbor_id,
       b AS neighbor_name,
       {cls_b} AS neighbor_class,
       chunk_id || ':fact' AS via_relation,
       conversation_id AS context_id
FROM both_dirs
ORDER BY instance_id, neighbor_id
"""


def contextual_chunks_sql(
    batch_size: int = 5, dim: int = 16, n_prev: int = 2
) -> str:
    """M6 deterministic context assembly: previous-n chunk window."""
    lags = ",\n           ".join(
        f"lag(content, {i}) OVER (PARTITION BY conversation_id ORDER BY batch_id)"
        for i in range(n_prev, 0, -1)
    )
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)},"
        + f"""
ctx AS (
  SELECT chunk_id, conversation_id, batch_id, content,
         concat_ws(e'\\n---\\n',
           {lags}) AS context
  FROM m1
)
SELECT chunk_id, conversation_id, batch_id,
       CAST(len(context) AS BIGINT) AS context_len,
       CASE WHEN context <> ''
            THEN '[CTX]' || chr(10) || context || chr(10) || '[CHUNK]' || chr(10) || content
            ELSE content END AS enhanced_content
FROM ctx ORDER BY chunk_id
"""
    )


def m6_enhancer_sql(
    batch_size: int = 5, dim: int = 16, n_prev: int = 2
) -> str:
    """M6 LLM-mode seam twin: same previous-n window assembly, then the
    deterministic stand-in enhancer rule CTXSUM(len(context)): content
    replayed in SQL."""
    lags = ",\n           ".join(
        f"lag(content, {i}) OVER (PARTITION BY conversation_id ORDER BY batch_id)"
        for i in range(n_prev, 0, -1)
    )
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)},"
        + f"""
ctx AS (
  SELECT chunk_id, conversation_id, batch_id, content,
         concat_ws(e'\\n---\\n',
           {lags}) AS context
  FROM m1
)
SELECT chunk_id, conversation_id, batch_id,
       CAST(len(context) AS BIGINT) AS context_len,
       'CTXSUM(' || len(context) || '): ' || content AS enhanced_content
FROM ctx ORDER BY chunk_id
"""
    )


def unigram_logprob_sql() -> str:
    return f"""
WITH {TOKS_CTE.strip()},
t AS (SELECT doc_id, u.tok FROM toks, unnest(tk) AS u(tok)),
lm AS (SELECT tok, count(*) AS ctf FROM t GROUP BY tok),
total AS (SELECT CAST(sum(ctf) AS DOUBLE) AS total FROM lm)
SELECT doc_id, round(avg(ln(ctf / total)), 6) AS avg_logprob
FROM t JOIN lm USING (tok), total
GROUP BY doc_id ORDER BY doc_id
"""


def gopher_quality_sql(
    min_tokens: int = 10,
    max_tokens: int = 100000,
    max_repetition: float = 0.20,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> str:
    return f"""
WITH {TOKS_CTE.strip()},
t AS (SELECT doc_id, u.tok FROM toks, unnest(tk) AS u(tok)),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
share AS (
  SELECT doc_id, CAST(max(tf) AS DOUBLE) / sum(tf) AS top_share
  FROM tf GROUP BY doc_id
),
base AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         CASE WHEN len(tk) > 0
              THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
              ELSE 0.0 END AS avg_tok_len
  FROM toks
)
SELECT b.doc_id, b.n_tokens,
       round(coalesce(s.top_share, 0.0), 6) AS top_token_share,
       b.n_tokens >= {min_tokens} AS len_ok_low,
       b.n_tokens <= {max_tokens} AS len_ok_high,
       coalesce(s.top_share, 0.0) <= {max_repetition} AS repetition_ok,
       (b.avg_tok_len >= {min_avg_token_len}
        AND b.avg_tok_len <= {max_avg_token_len}) AS token_len_ok,
       (b.n_tokens >= {min_tokens} AND b.n_tokens <= {max_tokens}
        AND coalesce(s.top_share, 0.0) <= {max_repetition}
        AND b.avg_tok_len >= {min_avg_token_len}
        AND b.avg_tok_len <= {max_avg_token_len}) AS keep
FROM base b LEFT JOIN share s USING (doc_id)
ORDER BY b.doc_id
"""


def corpus_filter_pipeline_sql(quality_threshold: float = 0.5) -> str:
    """Composed keep verdict: gopher ∧ quality ∧ lang ∧ not-near-dup."""
    return f"""
WITH g AS (SELECT doc_id, keep AS gopher_ok FROM ({gopher_quality_sql()})),
qs AS (SELECT doc_id, quality FROM ({quality_score_sql()})),
l AS (SELECT doc_id, lang_pred FROM ({lang_id_sql()})),
kd AS (SELECT doc_id FROM ({minhash_dedup_keep_sql()}))
SELECT g.doc_id, g.gopher_ok, qs.quality, l.lang_pred,
       kd.doc_id IS NOT NULL AS not_dup,
       (g.gopher_ok AND qs.quality >= {quality_threshold}
        AND l.lang_pred = 'en' AND kd.doc_id IS NOT NULL) AS keep
FROM g JOIN qs USING (doc_id) JOIN l USING (doc_id) LEFT JOIN kd USING (doc_id)
ORDER BY g.doc_id
"""


def lineage_sql(batch_size: int = 5, dim: int = 16) -> str:
    return (
        f"WITH {M0_CTE.strip()},{_m1_cte(batch_size, dim)}\n"
        + """
SELECT m1.chunk_id, u.message_id, m0.role, m0.sequence_number
FROM m1, unnest(m0_raw_ids) AS u(message_id)
JOIN m0 ON m0.message_id = u.message_id
ORDER BY m1.chunk_id, u.message_id
"""
    )


# --- ANN oracles --------------------------------------------------------------

def ann_lsh_topk_sql(anchor: int, k: int, dim: int = 64, num_planes: int = 8) -> str:
    from memfuse_spark.operators.ann import lsh_bucket_sql

    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
qb AS (SELECT {lsh_bucket_sql('qv', dim, num_planes)} AS b FROM q),
bucketed AS (
  SELECT e.vec_id, e.embedding,
         {lsh_bucket_sql('e.embedding', dim, num_planes)} AS bucket
  FROM embeddings e
)
SELECT e.vec_id, {cos} AS score
FROM bucketed e, q, qb
WHERE e.bucket = qb.b
ORDER BY score DESC, e.vec_id ASC
LIMIT {k}
"""


IVF_CENTROIDS_CTE = """
exploded AS (
  SELECT label AS cell, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS x
  FROM embeddings, range(0, {dim}) AS t(i)
),
means AS (SELECT cell, pos, avg(x) AS m FROM exploded GROUP BY cell, pos),
cents AS (
  SELECT cell, list(round(m, 6) ORDER BY pos) AS centroid
  FROM means GROUP BY cell
)"""


def ivf_centroids_sql(dim: int = 64) -> str:
    # centroid serialized as fixed %.6f CSV — the driver's pandas
    # canonicalizer cannot hash/sort raw list columns
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + "\nSELECT cell, array_to_string(list_transform(centroid,"
        " x -> printf('%.6f', x)), ',') AS centroid_csv"
        "\nFROM cents ORDER BY cell"
    )


def ann_ivf_topk_sql(anchor: int, k: int, nprobe: int = 2, dim: int = 64) -> str:
    cos_c = (
        "list_dot_product(c.centroid, q.qv)"
        " / (sqrt(list_dot_product(c.centroid, c.centroid))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    cos_e = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + f""",
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
probed AS (
  SELECT c.cell FROM cents c, q
  ORDER BY {cos_c} DESC, c.cell ASC LIMIT {nprobe}
)
SELECT e.vec_id, {cos_e} AS score
FROM embeddings e JOIN probed p ON e.label = p.cell, q
ORDER BY score DESC, e.vec_id ASC
LIMIT {k}
"""
    )


def ivf_knn_join_sql(
    query_ids: list, k: int, nprobe: int = 2, dim: int = 64
) -> str:
    """Batch IVF kNN join: queries are the anchor embeddings; each
    probes its nprobe best cells, candidates ranked per query."""
    ids = ", ".join(str(i) for i in query_ids)
    cos_c = (
        "list_dot_product(c.centroid, q.qv)"
        " / (sqrt(list_dot_product(c.centroid, c.centroid))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    cos_e = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + f""",
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({ids})
),
probe AS (
  SELECT query_id, cell, qv FROM (
    SELECT q.query_id, c.cell, q.qv,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_c} DESC, c.cell ASC) AS rn
    FROM cents c, q
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, e.vec_id, {cos_e} AS score
  FROM embeddings e
  JOIN probe p ON e.label = p.cell
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS rn
  FROM cand
) WHERE rn <= {k}
ORDER BY query_id, score DESC, vec_id
"""
    )


def mutual_knn_ctes(
    k: int,
    nprobe: int = 2,
    dim: int = 64,
    target_cell_size: int = 500,
    fit_pred: str | None = None,
) -> str:
    """The shared CTE chain behind ann.mutual_knn_pairs' DEFAULT
    (corpus-scaled sign-LSH cells): params → cells → hot-cell split →
    centroids → probe → per-item top-k (`knn`). num_planes is derived
    from count(*) INSIDE the SQL (scalar subquery), so the oracle stays
    corpus-adaptive at any SF — the same rule the Spark side computes
    (max(1, ceil(log2(max(n/target, 2))))). Single-sourced so the pair
    query (mutual_knn_scaled_sql) and the kNN edge store
    (knn_edges_cte) can never drift. `knn` is always MATERIALIZED:
    every consumer self-joins it, and DuckDB would otherwise re-expand
    the whole LSH-cell chain twice.

    ``fit_pred`` (a predicate over embeddings.vec_id) switches the
    chain to FROZEN-QUANTIZER semantics — the incremental kNN store
    contract (graph.build_knn_store_inc + append_knn_store): plane
    count, hot-cell split config and centroids are fitted on the fit
    rows only, while cells, probes and the kNN run over the FULL
    corpus. build(fit) + append(rest) must serve exactly this."""
    from memfuse_spark.operators.ann import plane_sql_expr

    plane = plane_sql_expr(dim)
    cos_c = (
        "list_dot_product(c.centroid, q.qv)"
        " / (sqrt(list_dot_product(c.centroid, c.centroid))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    cos_e = (
        "round(list_dot_product(e.v, p.qv)"
        " / (sqrt(list_dot_product(e.v, e.v))"
        " * sqrt(list_dot_product(p.qv, p.qv))), 6)"
    )
    from memfuse_spark.operators.ann import split_hot_cells_sql

    fit_and = f" AND ({fit_pred})" if fit_pred is not None else ""
    fit_where = f" WHERE {fit_pred}" if fit_pred is not None else ""
    return f"""
params AS (
  SELECT greatest(1, CAST(ceil(log2(greatest(count(*) / {target_cell_size}.0,
                                             2.0))) AS INT)) AS planes
  FROM embeddings WHERE embedding IS NOT NULL{fit_and}
),
cells0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         array_to_string(
           list_transform(range((SELECT planes FROM params)), j ->
             CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                        {plane}) > 0
                  THEN '1' ELSE '0' END), '') AS cell
  FROM embeddings WHERE embedding IS NOT NULL
),
{split_hot_cells_sql(
        "cells0", "(SELECT planes FROM params)", dim, target_cell_size,
        fit_pred=fit_pred,
    )},
exploded AS (
  SELECT cell, t.i AS pos, v[t.i + 1] AS x
  FROM cells, range(0, {dim}) AS t(i){fit_where}
),
means AS (SELECT cell, pos, avg(x) AS m FROM exploded GROUP BY cell, pos),
cents AS (
  SELECT cell, list(round(m, 6) ORDER BY pos) AS centroid
  FROM means GROUP BY cell
),
q AS (SELECT vec_id AS query_id, v AS qv FROM cells),
probe AS (
  SELECT query_id, cell, qv FROM (
    SELECT q.query_id, c.cell, q.qv,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({cos_c}, 6) DESC, c.cell ASC) AS rn
    FROM cents c, q
  ) WHERE rn <= {nprobe}
),
knn AS MATERIALIZED (
  SELECT query_id, vec_id, score FROM (
    SELECT p.query_id, e.vec_id, {cos_e} AS score,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY {cos_e} DESC, e.vec_id ASC) AS rn
    FROM cells e
    JOIN probe p ON e.cell = p.cell AND e.vec_id <> p.query_id
  ) WHERE rn <= {k}
)"""


def mutual_knn_scaled_sql(
    k: int, nprobe: int = 2, dim: int = 64, target_cell_size: int = 500
) -> str:
    """Twin of ann.mutual_knn_pairs' DEFAULT tier: the shared
    mutual_knn_ctes chain closed with the reciprocal self-join."""
    return f"""
WITH {mutual_knn_ctes(k, nprobe, dim, target_cell_size).strip()}
SELECT f.query_id AS vec_a, f.vec_id AS vec_b, f.score
FROM knn f
JOIN knn r ON r.query_id = f.vec_id AND r.vec_id = f.query_id
WHERE f.query_id < f.vec_id
ORDER BY vec_a, vec_b
"""


def knn_edges_cte(
    k: int,
    nprobe: int = 2,
    dim: int = 64,
    target_cell_size: int = 500,
    fit_pred: str | None = None,
) -> str:
    """Edge-table CTE block for the BOUNDED-DEGREE graph store (twin of
    graph.build_knn_edges_store): symmetric SIMILAR_TO arcs from the
    mutual-kNN pairs (≤ n·k arcs by construction) + sequential FOLLOWS.
    Same `edges` contract as edges_cte, so every downstream kernel SQL
    (pagerank_sql, kcore_nodes_sql, triangle_counts_sql) composes over
    either store unchanged. ``fit_pred`` switches the underlying chain
    to frozen-quantizer semantics (see mutual_knn_ctes) — the twin of
    the INCREMENTAL store's served state, whose members are VECTORS:
    a NULL-embedding row is not in that store at all, so its FOLLOWS
    arcs are filtered too (the batch store keeps the reference's
    keep-null-ids FOLLOWS semantics — a deliberate difference)."""
    follows_where = (
        "\n  WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL"
        if fit_pred is not None
        else ""
    )
    return f"""
{mutual_knn_ctes(k, nprobe, dim, target_cell_size, fit_pred=fit_pred).strip()},
mutual AS (
  SELECT f.query_id AS src, f.vec_id AS dst, f.score AS weight
  FROM knn f
  JOIN knn r ON r.query_id = f.vec_id AND r.vec_id = f.query_id
  WHERE f.query_id < f.vec_id
),
edges AS (
  SELECT src, dst, weight, 'SIMILAR_TO' AS relation FROM mutual
  UNION ALL
  SELECT dst AS src, src AS dst, weight, 'SIMILAR_TO' AS relation FROM mutual
  UNION ALL
  SELECT a.vec_id AS src, b.vec_id AS dst, CAST(1.0 AS DOUBLE) AS weight,
         'FOLLOWS' AS relation
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1{follows_where}
)"""


def knn_edges_store_sql(
    k: int, nprobe: int = 2, dim: int = 64, target_cell_size: int = 500
) -> str:
    return (
        f"WITH {knn_edges_cte(k, nprobe, dim, target_cell_size).strip()}\n"
        "SELECT src, dst, weight, relation FROM edges "
        "ORDER BY src, dst, relation"
    )


def knn_store_drift_sql(
    fit_pred: str,
    dim: int = 64,
    target_cell_size: int = 500,
    hot_factor: float = 2.0,
) -> str:
    """Twin of graph.knn_store_drift over the build(fit)+append(rest)
    store: recompute the frozen cells from scratch (params / split
    config fitted on the fit rows, applied to all), then the same
    one-row report — new cells = served cells absent from the FIT's
    cell set (no frozen centroid → unreachable by probing), hot cells =
    past hot_factor × the fitted target."""
    from memfuse_spark.operators.ann import plane_sql_expr, split_hot_cells_sql

    plane = plane_sql_expr(dim)
    return f"""
WITH params AS (
  SELECT greatest(1, CAST(ceil(log2(greatest(count(*) / {target_cell_size}.0,
                                             2.0))) AS INT)) AS planes
  FROM embeddings WHERE embedding IS NOT NULL AND ({fit_pred})
),
cells0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         array_to_string(
           list_transform(range((SELECT planes FROM params)), j ->
             CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                        {plane}) > 0
                  THEN '1' ELSE '0' END), '') AS cell
  FROM embeddings WHERE embedding IS NOT NULL
),
{split_hot_cells_sql(
        "cells0", "(SELECT planes FROM params)", dim, target_cell_size,
        fit_pred=fit_pred,
    )},
fit_cells AS (SELECT DISTINCT cell FROM cells WHERE {fit_pred}),
counts AS (
  SELECT c.cell, count(*) AS cn,
         CAST(f.cell IS NULL AS INT) AS is_new
  FROM cells c LEFT JOIN fit_cells f USING (cell)
  GROUP BY c.cell, f.cell
)
SELECT CAST(sum(cn) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(is_new) AS BIGINT) AS new_cells,
       CAST(coalesce(sum(CASE WHEN is_new = 1 THEN cn END), 0) AS BIGINT)
         AS rows_new_cells,
       CAST(max(cn) AS BIGINT) AS max_cell_rows,
       CAST(sum(CASE WHEN cn > {hot_factor} * {target_cell_size} THEN 1
                ELSE 0 END) AS BIGINT) AS hot_cells,
       round(sum(CASE WHEN cn > {hot_factor} * {target_cell_size} THEN cn
                 ELSE 0 END) / CAST(sum(cn) AS DOUBLE), 6) AS hot_row_share
FROM counts
"""


def knn_store_inc_edges_sql(
    k: int,
    nprobe: int,
    fit_pred: str,
    dim: int = 64,
    target_cell_size: int = 500,
) -> str:
    """Twin of the INCREMENTAL kNN store's served edge table after
    build(fit) + append(rest): the frozen-quantizer edge chain — the
    quantizer (planes / split config / centroids) fitted on the
    ``fit_pred`` rows, the kNN evaluated over the full corpus. The
    Spark side must serve EXACTLY this through its base+delta masking
    (graph.knn_store_edges), whatever sequence of appends produced the
    state — that equivalence is the whole correctness claim of the
    O(batch) append path."""
    return (
        f"WITH {knn_edges_cte(k, nprobe, dim, target_cell_size, fit_pred=fit_pred).strip()}\n"
        "SELECT src, dst, weight, relation FROM edges "
        "ORDER BY src, dst, relation"
    )


def label_outliers_sql(k: int, dim: int = 64) -> str:
    """Per-label centroid-distance outliers (twin of ann.label_outliers):
    k lowest-cosine members of each label vs that label's centroid."""
    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(c.centroid, c.centroid))), 6)"
    )
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + f"""
SELECT CAST(label AS INTEGER) AS label, vec_id, score FROM (
  SELECT e.label, e.vec_id, {cos} AS score,
         row_number() OVER (PARTITION BY e.label
                            ORDER BY {cos} ASC, e.vec_id ASC) AS rn
  FROM embeddings e JOIN cents c ON e.label = c.cell
) WHERE rn <= {k}
ORDER BY label, score, vec_id
"""
    )


def speculative_prefetch_sql(recent_ids: list, k: int, dim: int = 64) -> str:
    """B5 semantic-similarity prefetch: mean of recent embeddings (id
    order, left-assoc sum — matches the Spark fold) → cosine top-k
    excluding the recent set."""
    n = len(recent_ids)
    ids = ", ".join(str(i) for i in recent_ids)
    terms = "embs[1][i + 1]"
    for j in range(2, n + 1):
        terms = f"({terms} + embs[{j}][i + 1])"
    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.v)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(c.v, c.v))), 6)"
    )
    return f"""
WITH recent AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
  FROM embeddings WHERE vec_id IN ({ids})
),
ctx AS (SELECT list(embedding ORDER BY vec_id) AS embs FROM recent),
ctxv AS (
  SELECT [{terms} / CAST({n} AS DOUBLE) for i in range(0, {dim})] AS v
  FROM ctx
)
SELECT e.vec_id, {cos} AS score
FROM embeddings e, ctxv c
WHERE e.vec_id NOT IN ({ids})
ORDER BY score DESC, e.vec_id ASC
LIMIT {k}
"""


# --- graph oracles -----------------------------------------------------------

_PAIR_COS = (
    "round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"
)


def edges_cte(threshold: float) -> str:
    """Edge-table CTE block: symmetric SIMILAR_TO + sequential FOLLOWS."""
    return f"""
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_PAIR_COS} AS weight
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
sim AS (SELECT src, dst, weight FROM pairs WHERE weight >= {threshold}),
edges AS (
  SELECT src, dst, weight, 'SIMILAR_TO' AS relation FROM sim
  UNION ALL
  SELECT dst AS src, src AS dst, weight, 'SIMILAR_TO' AS relation FROM sim
  UNION ALL
  SELECT a.vec_id AS src, b.vec_id AS dst, CAST(1.0 AS DOUBLE) AS weight,
         'FOLLOWS' AS relation
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
)"""


def graph_edges_sql(threshold: float) -> str:
    return f"WITH {edges_cte(threshold).strip()}\nSELECT src, dst, weight, relation FROM edges ORDER BY src, dst, relation"


def graph_neighbors_sql(node_id: int, threshold: float, limit: int | None = None) -> str:
    lim = f"LIMIT {limit}" if limit else ""
    return f"""
WITH {edges_cte(threshold).strip()}
SELECT dst, relation, weight FROM edges WHERE src = {node_id}
ORDER BY weight DESC, dst ASC, relation ASC {lim}
"""


def graph_edges_between_sql(src: int, dst: int, threshold: float) -> str:
    return f"""
WITH {edges_cte(threshold).strip()}
SELECT src, dst, relation, weight FROM edges
WHERE src = {src} AND dst = {dst} ORDER BY relation
"""


def graph_2hop_sql(start_id: int, threshold: float) -> str:
    return f"""
WITH {edges_cte(threshold).strip()},
h0 AS (SELECT {start_id} AS node_id, 0 AS hop),
h1 AS (
  SELECT DISTINCT e.dst AS node_id, 1 AS hop
  FROM edges e JOIN h0 ON e.src = h0.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM h0)
),
h2 AS (
  SELECT DISTINCT e.dst AS node_id, 2 AS hop
  FROM edges e JOIN h1 ON e.src = h1.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM h0 UNION ALL SELECT node_id FROM h1)
)
SELECT node_id, min(hop) AS hop
FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1 UNION ALL SELECT * FROM h2)
GROUP BY node_id ORDER BY node_id
"""


def graph_weighted_2hop_sql(
    start_id: int, threshold: float, relation: str, min_weight: float
) -> str:
    """Weighted/relationship-filtered k-hop: only `relation` edges with
    weight >= min_weight participate in the expansion."""
    return f"""
WITH {edges_cte(threshold).strip()},
fe AS (
  SELECT src, dst FROM edges
  WHERE relation = '{relation}' AND weight >= {min_weight}
),
h0 AS (SELECT {start_id} AS node_id, 0 AS hop),
h1 AS (
  SELECT DISTINCT e.dst AS node_id, 1 AS hop
  FROM fe e JOIN h0 ON e.src = h0.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM h0)
),
h2 AS (
  SELECT DISTINCT e.dst AS node_id, 2 AS hop
  FROM fe e JOIN h1 ON e.src = h1.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM h0 UNION ALL SELECT node_id FROM h1)
)
SELECT node_id, min(hop) AS hop
FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1 UNION ALL SELECT * FROM h2)
GROUP BY node_id ORDER BY node_id
"""


def graph_contextual_sql(anchor: int, k: int, edges_cte_block: str) -> str:
    """U7 three-layer contextual retrieval over any edge construction
    exposing an `edges(src, dst, weight, …)` CTE (edges_cte /
    knn_edges_cte)."""
    cos_q = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
WITH {edges_cte_block.strip()},
anchorq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
l1 AS (
  SELECT e.vec_id, {cos_q} AS score
  FROM embeddings e, anchorq q ORDER BY score DESC, e.vec_id ASC LIMIT {k}
),
connected AS (
  SELECT ed.dst AS vec_id, round(max(ed.weight), 6) AS score
  FROM edges ed JOIN l1 ON ed.src = l1.vec_id
  WHERE ed.dst NOT IN (SELECT vec_id FROM l1)
  GROUP BY ed.dst
),
rescored AS (
  SELECT e.vec_id, {cos_q} AS score
  FROM embeddings e JOIN connected c ON e.vec_id = c.vec_id, anchorq q
  ORDER BY score DESC, e.vec_id ASC LIMIT {k}
)
SELECT vec_id, score, 'similar' AS layer FROM l1
UNION ALL
SELECT vec_id, score, 'connected' AS layer FROM connected
UNION ALL
SELECT vec_id, score, 'similar_contextual' AS layer FROM rescored
ORDER BY layer, score DESC, vec_id ASC
"""


def fingerprint_sql(n: int = 8, k: int = 4) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, list_distinct(
    [substring(lower(text), i, {n})
     for i in range(1, greatest(len(lower(text)) - {n - 1}, 1) + 1)]) AS g
  FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(list_transform(g, x -> md5(x)))[1:{k}], '') AS fingerprint
FROM grams ORDER BY doc_id
"""


# --- training-pipeline round-2 additions ------------------------------------

def semantic_dedup_pairs_sql(threshold: float) -> str:
    cos = (
        "round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
        " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"
    )
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS cell, {cos} AS cosine
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
ORDER BY id_a, id_b
"""


def decontaminate_sql(
    bench_mod: int, n: int = SHINGLE_N, ratio_threshold: float = 0.2
) -> str:
    return (
        "WITH "
        + TOKS_CTE
        + ","
        + _shingles_cte(n)
        + f""",
bench AS (
  SELECT DISTINCT unnest(s) AS g FROM shingles WHERE doc_id % {bench_mod} = 0
),
corpus AS (SELECT doc_id, s FROM shingles WHERE doc_id % {bench_mod} != 0),
hits AS (
  SELECT c.doc_id, count(*) AS overlap
  FROM (SELECT doc_id, unnest(s) AS g FROM corpus) c
  JOIN bench USING (g) GROUP BY c.doc_id
)
SELECT c.doc_id,
       CAST(coalesce(h.overlap, 0) AS BIGINT) AS overlap_shingles,
       CAST(len(c.s) AS BIGINT) AS total_shingles,
       round(coalesce(h.overlap, 0) / len(c.s), 6) AS contamination,
       round(coalesce(h.overlap, 0) / len(c.s), 6) >= {ratio_threshold} AS contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id)
ORDER BY c.doc_id
"""
    )


def sequence_pack_sql(budget: int) -> str:
    return (
        "WITH "
        + TOKS_CTE
        + """,
t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
  FROM t
)
"""
        + f"""
SELECT doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / {budget}) AS BIGINT) AS seq_id
FROM c ORDER BY doc_id
"""
    )


def doc_repetition_sql(
    max_dup_word_frac: float,
    max_top_bigram_share: float,
    max_top_trigram_share: float,
) -> str:
    def grams(n: int) -> str:
        idx = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
        return (
            f"CASE WHEN len(tk) >= {n} THEN [{idx} for i in range(1, len(tk) - {n - 1} + 1)] "
            f"ELSE [array_to_string(tk, ' ')] END"
        )

    def share(src: str) -> str:
        return (
            f"SELECT doc_id, max(c) / sum(c) AS share FROM ("
            f"SELECT doc_id, g1, count(*) AS c FROM "
            f"(SELECT doc_id, unnest(g) AS g1 FROM {src}) GROUP BY doc_id, g1"
            f") GROUP BY doc_id"
        )

    return (
        "WITH "
        + TOKS_CTE
        + f""",
base AS (
  SELECT doc_id,
         CASE WHEN len(tk) > 0
              THEN round(1.0 - len(list_distinct(tk)) / len(tk), 6)
              ELSE 0.0 END AS dup_word_frac
  FROM toks
),
g2 AS (SELECT doc_id, {grams(2)} AS g FROM toks),
g3 AS (SELECT doc_id, {grams(3)} AS g FROM toks),
s2 AS ({share("g2")}),
s3 AS ({share("g3")}),
j AS (
  SELECT base.doc_id, dup_word_frac,
         round(coalesce(s2.share, 0), 6) AS top_bigram_share,
         round(coalesce(s3.share, 0), 6) AS top_trigram_share
  FROM base LEFT JOIN s2 ON base.doc_id = s2.doc_id
            LEFT JOIN s3 ON base.doc_id = s3.doc_id
)
SELECT doc_id, dup_word_frac, top_bigram_share, top_trigram_share,
       (dup_word_frac <= {max_dup_word_frac}
        AND top_bigram_share <= {max_top_bigram_share}
        AND top_trigram_share <= {max_top_trigram_share}) AS repetition_ok
FROM j ORDER BY doc_id
"""
    )


_HASH_U = (
    "CAST(('0x' || substring(md5({salt} || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)"
    " / 4294967296.0"
)


def stratified_sample_sql(
    rates: dict[str, float], default_rate: float, strata_col: str = "source"
) -> str:
    whens = " ".join(f"WHEN '{v}' THEN CAST({r!r} AS DOUBLE)" for v, r in rates.items())
    u = _HASH_U.format(salt="''", key="doc_id")
    return f"""
SELECT doc_id, {strata_col} AS source FROM documents
WHERE {u} < CASE {strata_col} {whens} ELSE CAST({default_rate!r} AS DOUBLE) END
ORDER BY doc_id
"""


def domain_mixture_sql(alpha: float = 0.5) -> str:
    a = repr(float(alpha))
    return f"""
WITH c AS (
  SELECT source AS domain, count(*) AS n_docs FROM documents GROUP BY source
),
t AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS total_docs,
         sum(pow(n_docs, CAST({a} AS DOUBLE))) AS pow_total
  FROM c
)
SELECT domain, n_docs,
       round(n_docs / total_docs, 6) AS raw_share,
       round(pow(n_docs, CAST({a} AS DOUBLE)) / pow_total, 6) AS mix_weight,
       round((pow(n_docs, CAST({a} AS DOUBLE)) / pow_total)
             / (n_docs / total_docs), 6) AS upsample_factor
FROM c CROSS JOIN t
ORDER BY domain
"""


def length_buckets_sql() -> str:
    return f"""
WITH {TOKS_CTE.strip()},
b AS (
  SELECT CAST(pow(2.0, ceil(log2(greatest(len(tk), 1)))) AS BIGINT) AS bucket_tokens,
         greatest(len(tk), 1) AS n_tokens
  FROM toks
)
SELECT bucket_tokens,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(1.0 - CAST(sum(n_tokens) AS DOUBLE) / (count(*) * bucket_tokens), 6)
         AS padding_waste
FROM b GROUP BY bucket_tokens ORDER BY bucket_tokens
"""


def split_assign_sql(weights: dict[str, float], salt: str = "split") -> str:
    # boundaries accumulated in PYTHON float arithmetic, inlined with
    # repr — the Spark side builds the same when-chain from the same
    # dict, so 0.8 + 0.1 == 0.9000000000000001 on BOTH sides.
    u = _HASH_U.format(salt=f"'{salt}'", key="doc_id")
    names = list(weights)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += weights[name]
        whens.append(f"WHEN u < CAST({acc!r} AS DOUBLE) THEN '{name}'")
    return f"""
WITH t AS (SELECT doc_id, {u} AS u FROM documents)
SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split
FROM t ORDER BY doc_id
"""


def pii_redact_sql() -> str:
    from memfuse_spark.operators.textanalysis import PII_ORDER, PII_PATTERNS

    clean = "text"
    for k in PII_ORDER:
        clean = f"regexp_replace({clean}, '{PII_PATTERNS[k]}', '[{k.upper()}]', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{PII_PATTERNS[k]}')) AS BIGINT) AS n_{k}"
        for k in PII_ORDER
    )
    return f"""
SELECT doc_id, {clean} AS clean_text, {counts}
FROM documents ORDER BY doc_id
"""


def span_dedup_sql(span_words: int = 10) -> str:
    """Twin of dedup.span_dedup: fixed word-window segments, global
    first-occurrence-wins, md5 of the reassembled survivor text."""
    w = span_words
    return f"""
WITH {TOKS_CTE.strip()},
spans AS (
  SELECT doc_id, u.idx AS idx, u.s AS s
  FROM (
    SELECT doc_id,
           unnest([{{'idx': i,
                    's': array_to_string(tk[(i*{w}+1):(i*{w}+{w})], ' ')}}
                   for i in range(0, CAST(ceil(len(tk) / {w}.0) AS INT))]) AS u
    FROM toks
  )
),
ranked AS (
  SELECT doc_id, idx, s,
         ROW_NUMBER() OVER (PARTITION BY md5(s) ORDER BY doc_id, idx) = 1 AS keep
  FROM spans
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(s, ' ' ORDER BY idx) FILTER (WHERE keep), ''))
         AS kept_hash
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def top_ngrams_sql(n: int = 3, k: int = 20) -> str:
    """Twin of textanalysis.top_ngrams."""
    return f"""
WITH {TOKS_CTE.strip()},
grams AS (
  SELECT unnest(CASE WHEN len(tk) >= {n}
                THEN [array_to_string(tk[i:i+{n - 1}], ' ')
                      for i in range(1, len(tk) - {n - 1} + 1)]
                ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM toks
)
SELECT gram, CAST(count(*) AS BIGINT) AS cnt
FROM grams GROUP BY gram
ORDER BY cnt DESC, gram ASC LIMIT {k}
"""


def global_shuffle_sql(limit: int = 100, salt: str = "shuffle") -> str:
    """Twin of sampling.global_shuffle head: deterministic md5 order."""
    return f"""
WITH t AS (
  SELECT doc_id, md5('{salt}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents ORDER BY shuffle_key LIMIT {limit}
)
SELECT doc_id, shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key) AS BIGINT) AS position
FROM t ORDER BY position
"""


def quality_classifier_sql(buckets: int | None = None) -> str:
    from memfuse_spark.operators.textanalysis import (
        CLASSIFIER_BUCKETS,
        CLASSIFIER_MIX,
        CLASSIFIER_PRIME,
    )

    b = buckets or CLASSIFIER_BUCKETS
    a, c = CLASSIFIER_MIX
    sig = "CAST(1.0 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+exp(-z))"
    return f"""
WITH {TOKS_CTE.strip()},
occ AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(u.tok), 1, 8) AS BIGINT) % {b} AS bkt
  FROM toks, unnest(tk) AS u(tok)
),
z AS (
  SELECT doc_id,
         avg(CAST((((bkt * {a} + {c}) % {CLASSIFIER_PRIME}) % 2001) - 1000
                  AS DOUBLE) / CAST(1000.0 AS DOUBLE)) AS z
  FROM occ GROUP BY doc_id
)
SELECT doc_id, round({sig}, 6) AS clf_score, {sig} >= CAST(0.5 AS DOUBLE) AS clf_keep
FROM z ORDER BY doc_id
"""


def importance_weights_sql(target_mod: int, alpha: float = 0.5) -> str:
    al = f"CAST({alpha} AS DOUBLE)"
    return f"""
WITH {TOKS_CTE.strip()},
t AS (SELECT doc_id, u.tok FROM toks, unnest(tk) AS u(tok)),
clm AS (SELECT tok, count(*) AS cc FROM t GROUP BY tok),
tlm AS (SELECT tok, count(*) AS tc FROM t WHERE doc_id % {target_mod} = 0 GROUP BY tok),
stats AS (
  SELECT (SELECT sum(cc) FROM clm) AS cn,
         (SELECT CAST(count(*) AS DOUBLE) FROM clm) AS vocab,
         (SELECT sum(tc) FROM tlm) AS tn
)
SELECT doc_id, count(*) AS n_tokens,
       round(sum(ln((coalesce(tc, 0) + {al}) / (tn + {al} * vocab))
               - ln((cc + {al}) / (cn + {al} * vocab))), 6) AS log_ratio
FROM t JOIN clm USING (tok) LEFT JOIN tlm USING (tok), stats
GROUP BY doc_id ORDER BY doc_id
"""


# --- pagerank oracle --------------------------------------------------------

def pagerank_sql(
    edges_cte_block: str, iterations: int = 8, damping: float = 0.85
) -> str:
    """Unrolled fixed-iteration PageRank over any edge construction
    exposing an `edges(src, dst, …)` CTE (edges_cte / knn_edges_cte) —
    one CTE pair (dangling mass, contributions) per round, mirroring
    operators.graph.pagerank exactly: same base term ((1-d)/n emitted
    as the Python-computed double so both engines use the identical
    constant), same dangling redistribution, rounding only at the end."""
    om = repr(1.0 - damping)
    d = repr(float(damping))
    # MATERIALIZED: DuckDB inlines CTEs by default, so the unrolled
    # iteration chain (r{t} referenced by d{t+1}, c{t+1}, r{t+1}) would
    # otherwise re-expand the whole prefix 3^t times — materializing
    # `de` (one evaluation of the edge build) and each r{t}
    # (evaluated once per round) keeps the oracle linear in iterations.
    parts = [
        edges_cte_block.strip(),
        """
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
nodes AS (SELECT src AS node FROM de UNION SELECT dst AS node FROM de),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
degs AS (
  SELECT n.node, coalesce(o.deg, 0) AS deg
  FROM nodes n LEFT JOIN (SELECT src AS node, count(*) AS deg FROM de GROUP BY src) o
    USING (node)
),
r0 AS MATERIALIZED (SELECT d.node, d.deg, 1.0 / nn.n AS rank FROM degs d, nn)""".strip(),
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""
d{t} AS (SELECT coalesce(sum(rank), CAST(0 AS DOUBLE)) AS dm FROM r{p} WHERE deg = 0),
c{t} AS (
  SELECT e.dst AS node, sum(r.rank / r.deg) AS inflow
  FROM r{p} r JOIN de e ON r.node = e.src WHERE r.deg > 0 GROUP BY e.dst
),
r{t} AS MATERIALIZED (
  SELECT r.node, r.deg,
         CAST({om} AS DOUBLE) / nn.n
         + CAST({d} AS DOUBLE) * (coalesce(c.inflow, CAST(0 AS DOUBLE)) + d{t}.dm / nn.n)
           AS rank
  FROM r{p} r LEFT JOIN c{t} c USING (node), d{t}, nn
)""".strip()
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT node, round(rank, 6) AS rank FROM r{iterations} "
        "ORDER BY rank DESC, node ASC"
    )


# --- deterministic PQ oracle ------------------------------------------------

def pq_topk_sql(anchor: int, k: int, m: int = 4, dim: int = 64) -> str:
    """DuckDB twin of ann.pq_topk_from_labels: label-mean codebooks
    (rounded to 6 — pinning both engines to identical codewords),
    L2-argmin encode with (d2, cell) tie-breaking, ADC cosine scoring.
    All vector folds are sequential on both sides, so pre-rounding
    arithmetic is bit-comparable."""
    d_sub = dim // m
    return f"""
WITH exploded AS (
  SELECT label AS cell, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS x
  FROM embeddings, range(0, {dim}) AS t(i)
),
means AS (SELECT cell, pos, avg(x) AS mn FROM exploded GROUP BY cell, pos),
cb AS (
  SELECT CAST(pos // {d_sub} AS INT) AS s, cell,
         list(round(mn, 6) ORDER BY pos) AS cvec
  FROM means GROUP BY 1, 2
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
subs AS (
  SELECT e.vec_id, t.s,
         list_transform(range(1, {d_sub} + 1),
                        i -> CAST(e.embedding[t.s * {d_sub} + i] AS DOUBLE)) AS sub
  FROM embeddings e, range(0, {m}) AS t(s)
),
dists AS (
  SELECT v.vec_id, v.s, c.cell,
         list_sum(list_transform(range(1, {d_sub} + 1),
                  i -> (v.sub[i] - c.cvec[i]) * (v.sub[i] - c.cvec[i]))) AS d2
  FROM subs v JOIN cb c ON c.s = v.s
),
codes AS (
  SELECT vec_id, s, (list(cell ORDER BY d2, cell))[1] AS code
  FROM dists GROUP BY vec_id, s
),
tab AS (
  SELECT c.s, c.cell,
         list_dot_product(c.cvec, q.qv[c.s * {d_sub} + 1 : (c.s + 1) * {d_sub}]) AS qdot,
         list_dot_product(c.cvec, c.cvec) AS cn2
  FROM cb c, q
),
per_doc AS (
  SELECT codes.vec_id, sum(tab.qdot) AS qd, sum(tab.cn2) AS n2
  FROM codes JOIN tab ON tab.s = codes.s AND tab.cell = codes.code
  GROUP BY codes.vec_id
)
SELECT vec_id,
       round(qd / (sqrt(n2) * (SELECT sqrt(list_dot_product(qv, qv)) FROM q)), 6)
         AS score
FROM per_doc
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


# --- PMI collocations oracle ------------------------------------------------

def collocations_pmi_sql(k: int, min_count: int) -> str:
    """DuckDB twin of textanalysis.collocations_pmi (same tokenizer,
    same probability expressions, natural log both sides)."""
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM documents
),
withbg AS (
  SELECT tk,
         CASE WHEN len(tk) >= 2
           THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
           ELSE CAST([] AS VARCHAR[]) END AS bg
  FROM toks
),
uni AS (
  SELECT w, count(*) AS wc FROM (SELECT unnest(tk) AS w FROM withbg) GROUP BY w
),
ntok AS (SELECT sum(wc) AS n_tok FROM uni),
bi AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(bg) AS gram FROM withbg) GROUP BY gram
  HAVING count(*) >= {min_count}
),
nbi AS (SELECT sum(len(bg)) AS n_bi FROM withbg),
scored AS (
  SELECT b.gram, b.cnt,
         ln((b.cnt / nbi.n_bi)
            / ((ua.wc / ntok.n_tok) * (ub.wc / ntok.n_tok))) AS pmi
  FROM bi b
  JOIN uni ua ON ua.w = string_split(b.gram, ' ')[1]
  JOIN uni ub ON ub.w = string_split(b.gram, ' ')[2], ntok, nbi
)
SELECT gram, cnt, round(pmi, 6) AS pmi
FROM scored ORDER BY pmi DESC, gram ASC
LIMIT {k}
"""


# --- c-TF-IDF cluster keywords oracle ---------------------------------------

def cluster_keywords_sql(top_n: int) -> str:
    """DuckDB twin of textanalysis.cluster_keywords over
    documents × embeddings.label."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM documents
),
labeled AS (
  SELECT e.label AS cluster, t.tk FROM toks t JOIN embeddings e ON e.vec_id = t.doc_id
),
term_rows AS (SELECT cluster, unnest(tk) AS term FROM labeled),
tf AS (SELECT cluster, term, count(*) AS tf FROM term_rows GROUP BY 1, 2),
cf AS (SELECT term, count(*) AS f FROM term_rows GROUP BY 1),
cs AS (SELECT cluster, count(*) AS n_tok FROM term_rows GROUP BY 1),
a AS (SELECT avg(n_tok) AS a FROM cs),
scored AS (
  SELECT tf.cluster, tf.term, round(tf.tf * ln(1.0 + a.a / cf.f), 6) AS score
  FROM tf JOIN cf USING (term), a
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY score DESC, term) AS rn
  FROM scored
)
SELECT cluster, term, score FROM ranked WHERE rn <= {top_n}
ORDER BY cluster, score DESC, term
"""


# --- bigram LM oracle -------------------------------------------------------

def bigram_logprob_sql(smooth_k: float) -> str:
    """DuckDB twin of textanalysis.bigram_logprob (same tokenizer, same
    add-k smoothing; constants cast to DOUBLE so DuckDB's DECIMAL
    literals don't change the arithmetic)."""
    k = repr(float(smooth_k))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM documents
),
bgs AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tk) >= 2
                  THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
                  ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM toks
),
bi AS (SELECT gram, count(*) AS cbg FROM bgs GROUP BY 1),
ctx AS (SELECT string_split(gram, ' ')[1] AS w, count(*) AS cctx FROM bgs GROUP BY 1),
vocab AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(tk) AS w FROM toks)),
scored AS (
  SELECT b.doc_id,
         ln((bi.cbg + CAST({k} AS DOUBLE))
            / (ctx.cctx + CAST({k} AS DOUBLE) * vocab.v)) AS lp
  FROM bgs b JOIN bi USING (gram)
  JOIN ctx ON ctx.w = string_split(b.gram, ' ')[1], vocab
),
per_doc AS (
  SELECT doc_id, round(avg(lp), 6) AS avg_bigram_logprob FROM scored GROUP BY doc_id
)
SELECT t.doc_id, p.avg_bigram_logprob
FROM (SELECT DISTINCT doc_id FROM toks) t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


# --- MMR diversification oracle ---------------------------------------------

def mmr_rerank_sql(
    anchor: int, k: int, first_stage_k: int, lam: float = 0.7
) -> str:
    """Unrolled greedy MMR over the cosine top-first_stage_k candidate
    set — one MATERIALIZED CTE per selection step, mirroring
    rerank.mmr_rerank: same rounded pairwise sims, the Python-computed
    (1-λ) double emitted verbatim, ties broken by vec_id."""
    lam_s = repr(float(lam))
    om_s = repr(1.0 - float(lam))
    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    parts = [
        f"q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor})",
        f"""cand AS MATERIALIZED (
  SELECT e.vec_id, {cos} AS rel, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e, q
  ORDER BY rel DESC, e.vec_id ASC LIMIT {first_stage_k}
)""",
        """pair AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
               6) AS sim
  FROM cand a JOIN cand b ON a.vec_id < b.vec_id
)""",
        f"""s1 AS MATERIALIZED (
  SELECT vec_id, 1 AS mmr_rank, round(CAST({lam_s} AS DOUBLE) * rel, 6) AS mmr_score
  FROM cand ORDER BY mmr_score DESC, vec_id ASC LIMIT 1
)""",
    ]
    for t in range(2, k + 1):
        prev_union = " UNION ALL ".join(f"SELECT vec_id FROM s{i}" for i in range(1, t))
        parts.append(
            f"""sel{t} AS (SELECT vec_id FROM ({prev_union})),
s{t} AS MATERIALIZED (
  SELECT c.vec_id, {t} AS mmr_rank,
         round(CAST({lam_s} AS DOUBLE) * c.rel
               - CAST({om_s} AS DOUBLE) * coalesce(
                   (SELECT max(p.sim) FROM pair p JOIN sel{t} s
                     ON (p.ia = c.vec_id AND p.ib = s.vec_id)
                     OR (p.ib = c.vec_id AND p.ia = s.vec_id)),
                   CAST(0 AS DOUBLE)), 6) AS mmr_score
  FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t})
  ORDER BY mmr_score DESC, c.vec_id ASC LIMIT 1
)"""
        )
    final_union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, mmr_rank, mmr_score FROM ({final_union}) ORDER BY mmr_rank"
    )


# --- hard-negative mining oracle --------------------------------------------

def hard_negatives_sql(anchor_ids: list, k: int) -> str:
    """DuckDB twin of similarity.hard_negatives."""
    ids = ", ".join(str(i) for i in anchor_ids)
    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), a.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(a.qv, a.qv))), 6)"
    )
    return f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv, label AS alabel
  FROM embeddings WHERE vec_id IN ({ids})
),
scored AS (
  SELECT a.anchor_id, e.vec_id, {cos} AS score
  FROM embeddings e JOIN anchors a
    ON e.label <> a.alabel AND e.vec_id <> a.anchor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT anchor_id, vec_id, score FROM ranked WHERE rn <= {k}
ORDER BY anchor_id, score DESC, vec_id
"""


# --- multi-probe LSH oracle -------------------------------------------------

def ann_lsh_multiprobe_sql(
    anchor: int, k: int, num_planes: int, dim: int = 64
) -> str:
    """DuckDB twin of ann.ann_lsh_topk_multiprobe: query bucket + every
    Hamming-1 flip, candidates by bucket equi-join, exact cosine rank."""
    from memfuse_spark.operators.ann import lsh_bucket_sql

    qb = lsh_bucket_sql("q.qv", dim, num_planes)
    eb = lsh_bucket_sql("e.embedding", dim, num_planes)
    cos = (
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
        " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    flips = []
    for i in range(1, num_planes + 1):
        flips.append(
            f"SELECT substr(b, 1, {i - 1}) ||"
            f" (CASE WHEN substr(b, {i}, 1) = '0' THEN '1' ELSE '0' END) ||"
            f" substr(b, {i + 1}) AS bucket FROM qb"
        )
    probes = "SELECT b AS bucket FROM qb\n  UNION ALL " + "\n  UNION ALL ".join(flips)
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
qb AS (SELECT {qb} AS b FROM q),
probes AS (
  {probes}
)
SELECT e.vec_id, {cos} AS score
FROM embeddings e JOIN probes p ON {eb} = p.bucket, q
ORDER BY score DESC, e.vec_id ASC
LIMIT {k}
"""


def ivfpq_topk_sql(
    anchor: int, k: int, nprobe: int = 2, m: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of ann.ivfpq_topk: IVF probe (label-mean centroids)
    restricting the label-mean-codebook ADC scoring to nprobe cells."""
    d_sub = dim // m
    cos_c = (
        "list_dot_product(c.centroid, q.qv)"
        " / (sqrt(list_dot_product(c.centroid, c.centroid))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    return (
        "WITH "
        + IVF_CENTROIDS_CTE.format(dim=dim).strip()
        + f""",
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {anchor}),
probed AS (
  SELECT c.cell FROM cents c, q
  ORDER BY {cos_c} DESC, c.cell ASC LIMIT {nprobe}
),
pqx AS (
  SELECT label AS cell, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS x
  FROM embeddings, range(0, {dim}) AS t(i)
),
pqmeans AS (SELECT cell, pos, avg(x) AS mn FROM pqx GROUP BY cell, pos),
cb AS (
  SELECT CAST(pos // {d_sub} AS INT) AS s, cell,
         list(round(mn, 6) ORDER BY pos) AS cvec
  FROM pqmeans GROUP BY 1, 2
),
cand AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb
  FROM embeddings e JOIN probed p ON e.label = p.cell
),
subs AS (
  SELECT v.vec_id, t.s,
         list_transform(range(1, {d_sub} + 1),
                        i -> v.emb[t.s * {d_sub} + i]) AS sub
  FROM cand v, range(0, {m}) AS t(s)
),
dists AS (
  SELECT v.vec_id, v.s, c.cell,
         list_sum(list_transform(range(1, {d_sub} + 1),
                  i -> (v.sub[i] - c.cvec[i]) * (v.sub[i] - c.cvec[i]))) AS d2
  FROM subs v JOIN cb c ON c.s = v.s
),
codes AS (
  SELECT vec_id, s, (list(cell ORDER BY d2, cell))[1] AS code
  FROM dists GROUP BY vec_id, s
),
tab AS (
  SELECT c.s, c.cell,
         list_dot_product(c.cvec, q.qv[c.s * {d_sub} + 1 : (c.s + 1) * {d_sub}]) AS qdot,
         list_dot_product(c.cvec, c.cvec) AS cn2
  FROM cb c, q
),
per_doc AS (
  SELECT codes.vec_id, sum(tab.qdot) AS qd, sum(tab.cn2) AS n2
  FROM codes JOIN tab ON tab.s = codes.s AND tab.cell = codes.code
  GROUP BY codes.vec_id
)
SELECT vec_id,
       round(qd / (sqrt(n2) * (SELECT sqrt(list_dot_product(qv, qv)) FROM q)), 6)
         AS score
FROM per_doc
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""
    )


def ppr_sql(
    edges_cte_block: str,
    seeds: list,
    iterations: int = 8,
    damping: float = 0.85,
) -> str:
    """Unrolled personalized PageRank over any edge construction
    exposing an `edges(src, dst, …)` CTE (edges_cte / knn_edges_cte) —
    :func:`pagerank_sql` with the uniform restart vector replaced by the
    seed indicator (teleport AND dangling mass return to seeds)."""
    om = repr(1.0 - damping)
    d = repr(float(damping))
    sv = repr(1.0 / len(seeds))
    seed_list = ", ".join(str(s) for s in seeds)
    parts = [
        edges_cte_block.strip(),
        f"""
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
nodes AS (SELECT src AS node FROM de UNION SELECT dst AS node FROM de),
degs AS (
  SELECT n.node, coalesce(o.deg, 0) AS deg
  FROM nodes n LEFT JOIN (SELECT src AS node, count(*) AS deg FROM de GROUP BY src) o
    USING (node)
),
r0 AS MATERIALIZED (
  SELECT node, deg,
         CASE WHEN node IN ({seed_list}) THEN CAST({sv} AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS sv,
         CASE WHEN node IN ({seed_list}) THEN CAST({sv} AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS rank
  FROM degs
)""".strip(),
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""
d{t} AS (SELECT coalesce(sum(rank), CAST(0 AS DOUBLE)) AS dm FROM r{p} WHERE deg = 0),
c{t} AS (
  SELECT e.dst AS node, sum(r.rank / r.deg) AS inflow
  FROM r{p} r JOIN de e ON r.node = e.src WHERE r.deg > 0 GROUP BY e.dst
),
r{t} AS MATERIALIZED (
  SELECT r.node, r.deg, r.sv,
         CAST({om} AS DOUBLE) * r.sv
         + CAST({d} AS DOUBLE) * (coalesce(c.inflow, CAST(0 AS DOUBLE)) + d{t}.dm * r.sv)
           AS rank
  FROM r{p} r LEFT JOIN c{t} c USING (node), d{t}
)""".strip()
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT node, round(rank, 6) AS rank FROM r{iterations} "
        "WHERE rank > 0 ORDER BY rank DESC, node ASC"
    )


def label_propagation_sql(edges_cte_block: str, iterations: int = 4) -> str:
    """Unrolled fixed-iteration synchronous label propagation over any
    edge construction exposing an `edges(src, dst, …)` CTE, mirroring
    operators.graph.label_propagation: symmetrized distinct edges,
    per-round most-frequent-neighbor-label with least-label tiebreak,
    isolated nodes keep their label. MATERIALIZED per round for the
    same CTE-inlining reason as pagerank_sql."""
    parts = [
        edges_cte_block.strip(),
        """
de AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  )
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM de)""".strip(),
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""
n{t} AS (
  SELECT e.src AS node, l.label, count(*) AS cnt
  FROM de e JOIN l{p} l ON e.dst = l.node
  GROUP BY e.src, l.label
),
a{t} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM n{t}
  ) WHERE rn = 1
),
l{t} AS MATERIALIZED (
  SELECT l.node, coalesce(a.label, l.label) AS label
  FROM l{p} l LEFT JOIN a{t} a USING (node)
)""".strip()
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT node, label AS community FROM l{iterations} ORDER BY node"
    )


def quality_dedup_keep_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """Best-quality representative per near-dup component: the
    dup_clusters recursive reachability joined to the quality scores,
    one keeper per component by (quality DESC, doc_id ASC)."""
    return f"""
WITH clusters AS ({dup_clusters_sql(threshold)}),
qs AS ({quality_score_sql()}),
ranked AS (
  SELECT c.doc_id, c.component, c.cluster_size, q.quality,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM clusters c JOIN qs q USING (doc_id)
)
SELECT doc_id, component, cluster_size, quality
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


def minhash_accuracy_sql(num_hashes: int = 12) -> str:
    """Estimator audit twin: signature-agreement estimate vs exact
    shingle Jaccard on every LSH candidate pair."""
    match_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    exact = (
        "round(len(list_intersect(ga.s, gb.s))::DOUBLE"
        " / len(list_distinct(list_concat(ga.s, gb.s))), 6)"
    )
    return (
        _minhash_prefix()
        + f"""
SELECT doc_a, doc_b,
       round(({match_sum}) / {float(num_hashes)}, 6) AS est_jaccard,
       {exact} AS exact_jaccard,
       round(abs(round(({match_sum}) / {float(num_hashes)}, 6) - {exact}), 6)
         AS abs_err
FROM cands
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b
JOIN shingles ga ON ga.doc_id = doc_a
JOIN shingles gb ON gb.doc_id = doc_b
ORDER BY doc_a, doc_b
"""
    )


def api_key_scope_sql(
    as_of: str = "2024-01-10",
    permission: str = "read",
    epoch: str = "2024-01-01",
    keys_per_user: int = 2,
    expiry_mod: int = 20,
) -> str:
    """Control-plane auth twin (reference database/base.py:1071-1092
    validate_api_key + sqlite.py:140-151 schema): replay the
    deterministic api_keys fixture, the expiry/permission validation,
    and the per-key scoped activity rollup."""
    return f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
keys AS (
  SELECT user_id, u.k
  FROM users, unnest([{", ".join(str(i) for i in range(keys_per_user))}]) AS u(k)
),
api_keys AS (
  SELECT user_id * {keys_per_user} + k AS key_id,
         user_id,
         'key-' || CAST(k AS VARCHAR) AS name,
         (['read', 'read,write', 'write'])[CAST((user_id + k) % 3 AS INTEGER) + 1]
           AS permissions,
         CASE WHEN k = 0 THEN NULL
              ELSE DATE '{epoch}' + CAST(user_id % {expiry_mod} AS INTEGER)
         END AS expires_at
  FROM keys
),
active AS (
  SELECT * FROM api_keys
  WHERE (expires_at IS NULL OR expires_at >= DATE '{as_of}')
    AND list_contains(string_split(permissions, ','), '{permission}')
),
rollup AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
         max(ts) AS last_ts
  FROM events GROUP BY user_id
)
SELECT a.key_id, a.user_id, a.name, a.permissions,
       CAST(coalesce(r.n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(r.n_event_types, 0) AS BIGINT) AS n_event_types,
       r.last_ts
FROM active a LEFT JOIN rollup r USING (user_id)
ORDER BY key_id
"""


# --- M2 fact conflict detection / consolidation oracles ---------------------

FACT_PARTS_CTE = r"""f AS (
  SELECT chunk_id, conversation_id, fact_content, confidence,
         split_part(entities_csv, ',', 1) AS subject,
         split_part(entities_csv, ',', 2) AS object,
         CAST(regexp_extract(chunk_id, '(\d+)$', 1) AS INT) AS batch_id
  FROM m2
),
mx AS (
  SELECT conversation_id, max(batch_id) AS max_batch
  FROM f GROUP BY conversation_id
),
fe AS (
  SELECT f.* FROM f JOIN mx USING (conversation_id)
  WHERE batch_id < max_batch
),
fn AS (
  SELECT f.* FROM f JOIN mx USING (conversation_id)
  WHERE batch_id = max_batch
)"""


def fact_conflicts_sql(
    auto_resolve_threshold: float = 0.9, escalation_threshold: float = 0.5
) -> str:
    """DuckDB twin of conflicts.fact_conflicts (rule tier): same-subject
    later-batch VALUE_MISMATCH pairs (duplicates excluded) plus
    reversed-pair SEMANTIC_CONFLICT, the reference's 0.9/0.5 threshold
    ladder mapped onto severity + action."""
    m2 = m2_facts_sql()
    a, e = auto_resolve_threshold, escalation_threshold
    return f"""
WITH m2 AS (SELECT * FROM ({m2})),
{FACT_PARTS_CTE},
pairs AS (
  SELECT n.conversation_id,
         e.chunk_id AS existing_chunk_id, n.chunk_id AS new_chunk_id,
         n.subject,
         e.fact_content AS existing_fact, n.fact_content AS new_fact,
         'VALUE_MISMATCH' AS conflict_type,
         round((e.confidence + n.confidence) / 2, 6) AS confidence
  FROM fe e JOIN fn n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.subject AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
  UNION ALL
  SELECT n.conversation_id, e.chunk_id, n.chunk_id, n.subject,
         e.fact_content, n.fact_content, 'SEMANTIC_CONFLICT',
         round((e.confidence + n.confidence) / 2, 6)
  FROM fe e JOIN fn n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.object AND e.object = n.subject
   AND n.subject <> n.object
   AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
)
SELECT *,
  CASE WHEN confidence >= {a} THEN 'HIGH'
       WHEN confidence >= {e} THEN 'MEDIUM' ELSE 'LOW' END AS severity,
  CASE WHEN confidence >= {a} THEN 'auto_resolve'
       WHEN confidence >= {e} THEN 'escalate' ELSE 'ignore' END AS action,
  'temporal_priority' AS resolution_strategy
FROM pairs
ORDER BY conversation_id, new_chunk_id, existing_chunk_id, conflict_type
"""


def fact_conflicts_cumulative_sql(
    auto_resolve_threshold: float = 0.9, escalation_threshold: float = 0.5
) -> str:
    """DuckDB twin of conflicts.fact_conflicts_cumulative: the
    insert-time replay — every later-batch pair within the blocking
    key, not just pairs ending at the latest batch."""
    m2 = m2_facts_sql()
    a, e = auto_resolve_threshold, escalation_threshold
    return f"""
WITH m2 AS (SELECT * FROM ({m2})),
{FACT_PARTS_CTE},
pairs AS (
  SELECT n.conversation_id,
         e.chunk_id AS existing_chunk_id, n.chunk_id AS new_chunk_id,
         n.subject,
         e.fact_content AS existing_fact, n.fact_content AS new_fact,
         'VALUE_MISMATCH' AS conflict_type,
         round((e.confidence + n.confidence) / 2, 6) AS confidence
  FROM f e JOIN f n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.subject AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
  UNION ALL
  SELECT n.conversation_id, e.chunk_id, n.chunk_id, n.subject,
         e.fact_content, n.fact_content, 'SEMANTIC_CONFLICT',
         round((e.confidence + n.confidence) / 2, 6)
  FROM f e JOIN f n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.object AND e.object = n.subject
   AND n.subject <> n.object
   AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
)
SELECT *,
  CASE WHEN confidence >= {a} THEN 'HIGH'
       WHEN confidence >= {e} THEN 'MEDIUM' ELSE 'LOW' END AS severity,
  CASE WHEN confidence >= {a} THEN 'auto_resolve'
       WHEN confidence >= {e} THEN 'escalate' ELSE 'ignore' END AS action,
  'temporal_priority' AS resolution_strategy
FROM pairs
ORDER BY conversation_id, new_chunk_id, existing_chunk_id, conflict_type
"""


def fact_consolidation_sql() -> str:
    """DuckDB twin of conflicts.consolidate_facts: temporal-priority
    survivor per (conversation, subject) + duplicate/conflict counts."""
    m2 = m2_facts_sql()
    return f"""
WITH m2 AS (SELECT * FROM ({m2})),
{FACT_PARTS_CTE},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conversation_id, subject
    ORDER BY batch_id DESC, chunk_id DESC) AS rk
  FROM f
),
stats AS (
  SELECT conversation_id, subject,
         count(*) AS n_facts,
         count(*) - count(DISTINCT fact_content) AS removed_duplicates,
         count(DISTINCT fact_content) - 1 AS resolved_conflicts
  FROM f GROUP BY conversation_id, subject
)
SELECT r.conversation_id, r.subject,
       r.chunk_id AS kept_chunk_id, r.fact_content AS kept_fact,
       r.confidence AS kept_confidence,
       s.n_facts, s.removed_duplicates, s.resolved_conflicts
FROM ranked r JOIN stats s USING (conversation_id, subject)
WHERE rk = 1
ORDER BY conversation_id, subject
"""


def fact_conflicts_detector_sql(
    auto_resolve_threshold: float = 0.9, escalation_threshold: float = 0.5
) -> str:
    """DuckDB twin of the detector-seam stand-in: same blocked candidate
    pairs as the rule tier, flagged only when existing_fact <= new_fact
    lexically, confidence from combined fact length."""
    m2 = m2_facts_sql()
    a, e = auto_resolve_threshold, escalation_threshold
    return f"""
WITH m2 AS (SELECT * FROM ({m2})),
{FACT_PARTS_CTE},
cand AS (
  SELECT n.conversation_id,
         e.chunk_id AS existing_chunk_id, n.chunk_id AS new_chunk_id,
         n.subject,
         e.fact_content AS existing_fact, n.fact_content AS new_fact
  FROM fe e JOIN fn n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.subject AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
  UNION ALL
  SELECT n.conversation_id, e.chunk_id, n.chunk_id, n.subject,
         e.fact_content, n.fact_content
  FROM fe e JOIN fn n
    ON e.conversation_id = n.conversation_id
   AND e.subject = n.object AND e.object = n.subject
   AND n.subject <> n.object
   AND e.batch_id < n.batch_id
  WHERE e.fact_content <> n.fact_content
),
flagged AS (
  SELECT *, 'LLM_FLAGGED' AS conflict_type,
         round(least(1.0,
           (length(existing_fact) + length(new_fact)) / 100.0), 6)
           AS confidence
  FROM cand WHERE existing_fact <= new_fact
)
SELECT *,
  CASE WHEN confidence >= {a} THEN 'HIGH'
       WHEN confidence >= {e} THEN 'MEDIUM' ELSE 'LOW' END AS severity,
  CASE WHEN confidence >= {a} THEN 'auto_resolve'
       WHEN confidence >= {e} THEN 'escalate' ELSE 'ignore' END AS action,
  'temporal_priority' AS resolution_strategy
FROM flagged
ORDER BY conversation_id, new_chunk_id, existing_chunk_id, conflict_type
"""


def fact_validation_sql(
    min_confidence: float = 0.7,
    validated_confidence: float = 0.9,
    cumulative: bool = False,
) -> str:
    """DuckDB twin of conflicts.validate_facts: entity groundedness in
    the source chunk + confidence banding + conflict cross-check.
    ``cumulative=True`` mirrors ``validate_facts(cumulative=True)`` —
    the conflict cross-check pairs EVERY later batch (the insert-time
    replay), not just the latest batch per conversation."""
    m2 = m2_facts_sql()
    ex, nw = ("f", "f") if cumulative else ("fe", "fn")
    same_on = """e.conversation_id = n.conversation_id
   AND e.subject = n.subject AND e.batch_id < n.batch_id"""
    rev_on = """e.conversation_id = n.conversation_id
   AND e.subject = n.object AND e.object = n.subject
   AND n.subject <> n.object
   AND e.batch_id < n.batch_id
   AND e.fact_content <> n.fact_content"""
    return f"""
WITH {M0_CTE.strip()},{_m1_cte(5, 16)},
m2 AS (SELECT * FROM ({m2})),
{FACT_PARTS_CTE},
pairs AS (
  SELECT e.chunk_id, e.fact_content FROM {ex} e JOIN {nw} n ON {same_on}
  WHERE e.fact_content <> n.fact_content
  UNION
  SELECT n.chunk_id, n.fact_content FROM {ex} e JOIN {nw} n ON {same_on}
  WHERE e.fact_content <> n.fact_content
  UNION
  SELECT e.chunk_id, e.fact_content FROM {ex} e JOIN {nw} n ON {rev_on}
  UNION
  SELECT n.chunk_id, n.fact_content FROM {ex} e JOIN {nw} n ON {rev_on}
),
ctx AS (
  SELECT chunk_id,
         list_distinct(list_filter(
           string_split_regex(lower(content), '[^a-z0-9]+'),
           x -> len(x) > 0)) AS toks
  FROM m1
),
graded AS (
  SELECT f.chunk_id, f.conversation_id, f.fact_content, f.confidence,
         round(len(list_intersect(
           list_distinct([f.subject, f.object]), c.toks)) /
           CAST(len(list_distinct([f.subject, f.object])) AS DOUBLE),
           6) AS entity_support,
         (p.chunk_id IS NOT NULL) AS conflicted
  FROM f JOIN ctx c USING (chunk_id)
  LEFT JOIN pairs p
    ON f.chunk_id = p.chunk_id AND f.fact_content = p.fact_content
)
SELECT chunk_id, conversation_id, fact_content, confidence, entity_support,
  round(confidence * entity_support, 6) AS validation_score,
  CASE WHEN conflicted THEN 'conflicted'
       WHEN entity_support < 1.0 THEN 'rejected'
       WHEN confidence >= {validated_confidence} THEN 'validated'
       ELSE 'pending' END AS status,
  (NOT conflicted AND entity_support >= 1.0
   AND confidence >= {validated_confidence}) AS is_valid,
  CASE WHEN conflicted THEN 'REVISE'
       WHEN entity_support < 1.0 THEN 'REJECT'
       WHEN confidence >= {validated_confidence} THEN 'ACCEPT'
       ELSE 'REVISE' END AS recommendation
FROM graded
ORDER BY chunk_id, fact_content
"""


# --- SemDeDup (embedding-space dedup) oracle --------------------------------

def hashed_bow_cte(dim: int = 64) -> str:
    """CTEs ``toks``/``bk``/``grid``/``vecs`` — DuckDB twin of
    textanalysis.hashed_bow_vectors: vecs(doc_id, v DOUBLE[])."""
    return f"""toks AS (
  SELECT doc_id, t.tok FROM documents,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0)) AS t(tok)
),
bk AS (
  SELECT doc_id,
         CAST(CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % {dim} AS INT) AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM toks GROUP BY doc_id, b
),
grid AS (
  SELECT d.doc_id, i.i, coalesce(bk.c, 0.0) AS c
  FROM (SELECT DISTINCT doc_id FROM bk) d
  CROSS JOIN range(0, {dim}) AS i(i)
  LEFT JOIN bk ON bk.doc_id = d.doc_id AND bk.b = i.i
),
vecs AS (SELECT doc_id, list(c ORDER BY i) AS v FROM grid GROUP BY doc_id)"""


def _semdedup_body_sql(cells_sql: str, dim: int, threshold: float) -> str:
    """Shared tail of the semdedup twins: per-cell centroids,
    within-cell cosine >= threshold pairs, recursive min-label
    components, farthest-from-centroid keep — parameterized on the
    cells CTE (fixed-plane vs corpus-scaled bucketing)."""
    cos_vc = (
        "list_dot_product(c.v, ct.centroid)"
        " / (sqrt(list_dot_product(c.v, c.v))"
        " * sqrt(list_dot_product(ct.centroid, ct.centroid)))"
    )
    cos_ab = (
        "round(list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v))), 6)"
    )
    return f"""
WITH RECURSIVE {hashed_bow_cte(dim)},
{cells_sql},
per_dim AS (
  SELECT cell, t.i AS pos, avg(v[t.i + 1]) AS m
  FROM cells, range(0, {dim}) AS t(i) GROUP BY cell, t.i
),
cents AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM per_dim GROUP BY cell
),
wd AS (
  SELECT c.doc_id, c.cell,
         round(1 - {cos_vc}, 6) AS centroid_dist
  FROM cells c JOIN cents ct USING (cell)
),
dpairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE {cos_ab} >= {threshold}
),
sym AS (
  SELECT a_id AS a, b_id AS b FROM dpairs
  UNION
  SELECT b_id AS a, a_id AS b FROM dpairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM vecs
  UNION
  SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (
  SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
)
SELECT w.doc_id AS vec_id, w.cell, c.component,
       CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
         AS cluster_size,
       w.centroid_dist,
       (row_number() OVER (PARTITION BY c.component
                           ORDER BY w.centroid_dist DESC, w.doc_id ASC) = 1)
         AS keep
FROM wd w JOIN comp c USING (doc_id)
ORDER BY w.doc_id
"""


def semdedup_sql(
    dim: int = 64, num_planes: int = 4, threshold: float = 0.95
) -> str:
    """DuckDB twin of dedup.semdedup_keep over the hashed-BoW vectors:
    sign-LSH cells, per-cell centroids, within-cell cosine >= threshold
    pairs, recursive min-label components, farthest-from-centroid
    keep rule."""
    from memfuse_spark.operators.ann import lsh_bucket_sql

    bucket = lsh_bucket_sql("v", dim, num_planes)
    cells = f"cells AS (SELECT doc_id, v, {bucket} AS cell FROM vecs)"
    return _semdedup_body_sql(cells, dim, threshold)


def semdedup_scaled_sql(
    dim: int = 64, threshold: float = 0.95, target_cell_size: int = 4000
) -> str:
    """Twin of dedup.semdedup_keep's num_planes=None SCALE MODE: the
    plane count is derived from count(*) INSIDE the SQL (the
    mutual_knn_scaled_sql pattern), so the oracle applies the same
    corpus-scaled cell rule at any SF — planes = max(1,
    ceil(log2(max(n / target_cell_size, 2)))), bits from the shared
    md5 hyperplane derivation — followed by the HOT-CELL SPLIT
    (ann.split_hot_cells: cells over target gain
    min(8, ceil(log2(c/target))) extra planes).

    The params CTE counts FROM vecs, NOT FROM documents: the Spark side
    derives the plane count from the checkpointed hashed-BoW frame
    (dedup.py semdedup_keep scale mode), and hashed_bow_vectors emits
    no row for a document whose text tokenizes to nothing — counting
    documents would diverge on any corpus with token-less docs and
    shift every cell key."""
    from memfuse_spark.operators.ann import split_hot_cells_sql

    from memfuse_spark.operators.ann import plane_sql_expr

    plane = plane_sql_expr(dim)
    cells = f"""params AS (
  SELECT greatest(1, CAST(ceil(log2(greatest(count(*) / {target_cell_size}.0,
                                             2.0))) AS INT)) AS planes
  FROM vecs
),
cells0 AS (
  SELECT doc_id, v,
         array_to_string(
           list_transform(range((SELECT planes FROM params)), j ->
             CASE WHEN list_dot_product(v, {plane}) > 0
                  THEN '1' ELSE '0' END), '') AS cell
  FROM vecs
),
{split_hot_cells_sql(
        "cells0", "(SELECT planes FROM params)", dim, target_cell_size
    )}"""
    return _semdedup_body_sql(cells, dim, threshold)
