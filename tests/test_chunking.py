"""Chunking strategies vs Python references (mirrors memfuse
rag/chunk/{message,character,contextual}.py semantics)."""

from __future__ import annotations

import pytest

from memfuse_spark.operators import chunking as ch


def test_fixed_char_chunks_cover_text(spark):
    text = "x" * 450
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = ch.fixed_char_chunks(df, size=200, overlap=20).collect()
    # step=180 → ceil((450-20)/180)=3 chunks
    assert [r.chunk_index for r in got] == [0, 1, 2]
    assert got[0].chunk_len == 200
    assert got[2].chunk_text == text[360:450]


def test_fixed_char_chunks_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id bigint, text string")
    got = ch.fixed_char_chunks(df, size=200, overlap=20).collect()
    assert len(got) == 1 and got[0].chunk_text == "tiny"


def test_character_chunks_py_boundary_snap():
    text = ("word " * 50 + ". ") * 5  # sentence boundaries every ~252 chars
    chunks = ch.character_chunks_py(text, size=300, overlap=30)
    assert all(len(c) <= 300 for c in chunks)
    # every char of the original text appears (overlap allows dup coverage)
    joined = "".join(chunks)
    assert text[:250] in joined and text[-100:] in joined


def test_character_chunks_spark_matches_python(spark):
    texts = [
        (0, "alpha beta. " * 100),
        (1, "short"),
        (2, "nospacehere" * 60),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = ch.character_chunks(df, size=150, overlap=15).collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_index, r.chunk_text))
    for doc_id, text in texts:
        expected = ch.character_chunks_py(text, size=150, overlap=15)
        actual = [t for _, t in sorted(by_doc[doc_id])]
        assert actual == expected, f"doc {doc_id}"


def test_word_budget_groups():
    assert ch.word_budget_groups_py([100, 100, 100], budget=250) == [0, 0, 1]
    assert ch.word_budget_groups_py([300], budget=250) == [0]  # oversize alone
    assert ch.word_budget_groups_py([200, 300, 10], budget=250) == [0, 1, 2]


def test_contextual_chunks_group_per_session(spark):
    rows = [
        ("s1", 1, "user", "w " * 100, "m1"),
        ("s1", 2, "assistant", "w " * 100, "m2"),
        ("s1", 3, "user", "w " * 100, "m3"),
        ("s2", 1, "user", "hello", "m4"),
    ]
    df = spark.createDataFrame(
        rows,
        "session_id string, sequence_number int, role string, content string, message_id string",
    )
    got = ch.contextual_chunks(df, budget=250).collect()
    by_sess: dict[str, list] = {}
    for r in got:
        by_sess.setdefault(r.session_id, []).append(r)
    assert len(by_sess["s1"]) == 2  # 100+100 then 100
    g0 = next(r for r in by_sess["s1"] if r.group_id == 0)
    assert g0.m0_raw_ids == ["m1", "m2"]
    assert g0.content.startswith("[user]: ")
    assert "[assistant]: " in g0.content
    assert by_sess["s2"][0].m0_raw_ids == ["m4"]


def test_sentence_chunks_groups_and_remainder(spark):
    """7 sentences at 3/chunk → chunks of 3+3+1; punctuation runs and
    mixed terminators all count as boundaries; unterminated tail text is
    its own sentence; a doc with no boundaries yields one chunk."""
    from memfuse_spark.operators.chunking import sentence_chunks

    text = (
        "One two. Three four! Five six? Seven... Eight nine. "
        "Ten!! Eleven twelve"
    )
    docs = spark.createDataFrame(
        [(1, text), (2, "no boundaries here")], "doc_id bigint, text string"
    )
    rows = {
        (r.doc_id, r.chunk_index): r
        for r in sentence_chunks(docs, per_chunk=3).collect()
    }
    assert [rows[(1, i)].n_sentences for i in range(3)] == [3, 3, 1]
    assert rows[(2, 0)].n_sentences == 1
    # sentence content survives grouping: total chars bounded by input
    assert sum(rows[(1, i)].chunk_len for i in range(3)) <= len(text)


def test_contextual_enhance_enhancer_seam_injects_llm_mode(spark):
    """The enhancer= plug point (reference M6 LLM paraphrase path,
    rag/chunk/contextual.py:30-67): a fake paraphraser runs
    Arrow-batched over the (context, content) pairs AFTER the
    deterministic window assembly, its output REPLACES the
    [CTX]/[CHUNK] concatenation, and the default path is unchanged."""
    chunks = spark.createDataFrame(
        [
            ("c1", 0, "alpha"),
            ("c1", 1, "bravo"),
            ("c1", 2, "charlie"),
            ("c2", 0, "delta"),
        ],
        "conversation_id string, batch_id int, content string",
    )

    def fake_llm(contexts, contents):
        return [f"para<{ctx}|{c}>" for ctx, c in zip(contexts, contents)]

    got = {
        (r.conversation_id, r.batch_id): r
        for r in ch.contextual_enhance(chunks, enhancer=fake_llm).collect()
    }
    rule = {
        (r.conversation_id, r.batch_id): r
        for r in ch.contextual_enhance(chunks).collect()
    }
    assert got.keys() == rule.keys()
    # context assembly identical between modes; enhanced content swapped
    for k, r in got.items():
        assert r.context == rule[k].context
        assert r.enhanced_content == f"para<{r.context}|{r.content}>"
    # window semantics: batch 2 of c1 sees the previous TWO chunks
    assert got[("c1", 2)].context == "alpha\n---\nbravo"
    assert got[("c2", 0)].context == ""
    # default deterministic tier untouched by the new parameter
    assert rule[("c1", 2)].enhanced_content.startswith("[CTX]\n")
    assert rule[("c2", 0)].enhanced_content == "delta"


def test_token_estimate_matches_reference_heuristic(spark):
    """max(1, len//4) — rag/chunk/integrated.py:158-161; empty and
    sub-4-char content floor at 1 token."""
    df = spark.createDataFrame(
        [("", ), ("abc",), ("abcd",), ("x" * 9,), ("y" * 800,)], "c string"
    )
    got = [r.t for r in df.select(ch.token_estimate("c").alias("t")).collect()]
    assert got == [1, 1, 1, 2, 200]


def test_token_budget_chunks_boundaries(spark):
    """Greedy token grouping (integrated.py:264-283): flush when the
    running estimate would exceed max_tokens and the chunk is
    non-empty; an oversized message forms its own chunk; content is
    space-joined (integrated.py:301); est_tokens sums the per-message
    estimates (integrated.py:305)."""
    rows = [
        # s1: 8 chars = 2 tokens each; budget 5 -> groups of 2 messages
        ("s1", 1, "user", "aaaabbbb", "m1"),
        ("s1", 2, "assistant", "ccccdddd", "m2"),
        ("s1", 3, "user", "eeeeffff", "m3"),
        ("s1", 4, "assistant", "gggghhhh", "m4"),
        ("s1", 5, "user", "iiiijjjj", "m5"),
        # s2: oversized first message (40 chars = 10 tokens > budget 5)
        ("s2", 1, "user", "z" * 40, "m6"),
        ("s2", 2, "assistant", "tail", "m7"),
    ]
    df = spark.createDataFrame(
        rows,
        "session_id string, sequence_number int, role string, "
        "content string, message_id string",
    )
    got = {
        (r.session_id, r.chunk_index): r
        for r in ch.token_budget_chunks(df, max_tokens=5).collect()
    }
    assert {k for k in got} == {
        ("s1", 0), ("s1", 1), ("s1", 2), ("s2", 0), ("s2", 1)
    }
    c0 = got[("s1", 0)]
    assert c0.content == "aaaabbbb ccccdddd"
    assert c0.m0_raw_ids == ["m1", "m2"]
    assert c0.roles == "user,assistant"
    assert c0.n_messages == 2 and c0.est_tokens == 4
    assert got[("s1", 2)].m0_raw_ids == ["m5"]
    # the oversized message stands alone; its follower starts fresh
    assert got[("s2", 0)].m0_raw_ids == ["m6"]
    assert got[("s2", 0)].est_tokens == 10
    assert got[("s2", 1)].content == "tail" and got[("s2", 1)].est_tokens == 1


def test_validate_chunks_filter_truncate_metadata(spark):
    """validate_chunks (integrated.py:167-207): empty/short dropped,
    oversized truncated to max_len + '...', metadata computed on the
    POST-truncation content."""
    df = spark.createDataFrame(
        [
            ("empty", ""),
            ("blank", "   \t "),
            ("short", "tiny txt"),          # strip len 8 < 10 -> drop
            ("ok", "one two  three four!"),
            ("big", "w" * 120),
        ],
        "chunk_id string, content string",
    )
    got = {r.chunk_id: r for r in ch.validate_chunks(df, max_len=100).collect()}
    assert set(got) == {"ok", "big"}
    ok = got["ok"]
    assert ok.content_length == 20
    assert ok.estimated_tokens == 5  # 20 // 4
    assert ok.estimated_words == 4   # whitespace runs collapse
    assert ok.quality_validated is True
    big = got["big"]
    assert big.content == "w" * 100 + "..."
    assert big.content_length == 103          # post-truncation length
    assert big.estimated_tokens == 103 // 4   # estimate on truncated text


def test_validate_chunks_strips_all_whitespace_like_str_strip(spark):
    """ADVICE r7: the reference validates with str.strip() (ALL
    whitespace), while F.trim strips only ASCII spaces — a chunk padded
    with tabs/newlines whose stripped length is < min_len must be
    DROPPED (F.trim would have kept it). The DuckDB twin uses the same
    regexp strip, so the engines stay in lockstep."""
    df = spark.createDataFrame(
        [
            ("tab_pad", "\t\n  tiny txt \n\t"),   # strip -> 8 < 10: drop
            ("nl_blank", "\n\t\n"),                # strip -> empty: drop
            ("ok_pad", "\t a chunk long enough to keep \n"),
        ],
        "chunk_id string, content string",
    )
    got = {r.chunk_id for r in ch.validate_chunks(df, max_len=100).collect()}
    assert got == {"ok_pad"}


def test_validate_chunks_strips_unicode_whitespace(spark):
    """Java/RE2 \\s is ASCII-only, but Python's str.strip() (the
    reference) also removes unicode whitespace — a chunk padded to
    length with U+00A0 / U+2028 / U+3000 must still be dropped when the
    stripped body is under min_len. STRIP_PATTERN enumerates the full
    str.strip() set as literal characters (the identical pattern string
    feeds the DuckDB twin)."""
    df = spark.createDataFrame(
        [
            ("nbsp_pad", "\xa0\xa0tiny txt\xa0\xa0\xa0"),  # 8 < 10: drop
            ("ls_pad", "\u2028\u2028tiny\u2028\u2028\u2028\u2028"),  # drop
            ("cjk_pad", "\u3000tiny txt\u3000"),  # drop
            ("kept", "\xa0 a chunk long enough to keep \xa0"),
        ],
        "chunk_id string, content string",
    )
    got = {r.chunk_id for r in ch.validate_chunks(df, max_len=100).collect()}
    assert got == {"kept"}
    # every char in the shared set really is str.strip() whitespace
    assert all(c.isspace() for c in ch.UNICODE_WHITESPACE)
