"""M0 → M1 → M2 hierarchy on a tiny synthetic event stream."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators import hierarchy as h


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime.datetime(2025, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 100 + (i % 2), "click", f"payload word{i % 3} word{i % 3}")
        for i in range(12)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, props string"
    )


def test_m0_sequence_numbers(events):
    m0 = h.m0_from_events(events)
    seqs = {
        (r.conversation_id, r.sequence_number)
        for r in m0.select("conversation_id", "sequence_number").collect()
    }
    # 6 events per user → sequences 1..6 per conversation
    for uid in (100, 101):
        assert {(uid, i) for i in range(1, 7)} <= seqs


def test_m1_batches_and_lineage(events):
    m1 = h.m1_from_m0(h.m0_from_events(events), batch_size=5)
    rows = m1.collect()
    # 6 messages per conversation → batches of 5 and 1
    sizes = sorted(len(r.m0_raw_ids) for r in rows)
    assert sizes == [1, 1, 5, 5]
    r0 = next(r for r in rows if r.batch_id == 0 and r.conversation_id == 100)
    assert r0.content.startswith("[click]: ")
    assert len(r0.embedding) == 16
    assert r0.chunk_id == "100-0"


def test_m2_facts_confidence_filter(events):
    m1 = h.m1_from_m0(h.m0_from_events(events), batch_size=5)
    facts = h.m2_facts_from_m1(m1, confidence_threshold=0.0).collect()
    assert all(f.fact_content.split(" ")[1] == "co_occurs_with" for f in facts)
    assert all(0.0 <= f.confidence <= 1.0 for f in facts)
    assert all(len(f.entities) == 2 for f in facts)
    # threshold filters strictly
    hi = h.m2_facts_from_m1(m1, confidence_threshold=0.99).count()
    assert hi <= len(facts)


def test_lineage_join_roundtrip(events):
    m0 = h.m0_from_events(events)
    m1 = h.m1_from_m0(m0, batch_size=5)
    lin = h.lineage_join(m1, m0)
    # every m0 message appears exactly once in the lineage
    assert lin.count() == 12
    assert lin.select("message_id").distinct().count() == 12


def test_m2_extractor_seam_injects_llm_mode(events):
    """The extractor= plug point (reference primary LLM path,
    fact_extraction_processor.py:107-230): a fake batch extractor runs
    Arrow-batched, emits one row per extracted fact with the SAME output
    schema as the rule-based default, and the confidence threshold still
    applies after extraction."""
    m1 = h.m1_from_m0(h.m0_from_events(events), batch_size=5)

    def fake_llm(contents):
        out = []
        for c in contents:
            first = c.split()[0] if c.split() else "x"
            out.append(
                [
                    {"fact_content": f"{first} mentioned", "entities": [first], "confidence": 0.9},
                    {"fact_content": f"{first} doubted", "entities": [first], "confidence": 0.3},
                ]
            )
        return out

    got = h.m2_facts_from_m1(m1, extractor=fake_llm)
    rule = h.m2_facts_from_m1(m1)
    assert got.columns == rule.columns
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in rule.schema.fields
    ]
    rows = got.collect()
    n_chunks = m1.count()
    # one fact per chunk survives (0.9), one is threshold-dropped (0.3)
    assert len(rows) == n_chunks
    assert all(r.confidence == 0.9 and r.fact_content.endswith("mentioned") for r in rows)


def test_m1_former_seam_injects_llm_mode(events):
    """The former= plug point (reference primary LLM episode-formation
    path, episode_formation_processor.py:31-628): a fake batch former
    runs Arrow-batched over the grouped message batches, its output
    REPLACES the concat content, and token count / quality / embedding
    all derive from the formed content — same output schema as the
    rule-based default."""
    m0 = h.m0_from_events(events)

    def fake_llm(batches):
        return [f"summary of {len(ls)} msgs" for ls in batches]

    got = h.m1_from_m0(m0, batch_size=5, former=fake_llm)
    rule = h.m1_from_m0(m0, batch_size=5)
    assert got.columns == rule.columns
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in rule.schema.fields
    ]
    rows = {r.chunk_id: r for r in got.collect()}
    rule_rows = {r.chunk_id: r for r in rule.collect()}
    assert rows.keys() == rule_rows.keys()
    for cid, r in rows.items():
        n = len(rule_rows[cid].m0_raw_ids)
        assert r.content == f"summary of {n} msgs"
        # lineage preserved; downstream stats recomputed off the FORMED
        # content, not the concat
        assert r.m0_raw_ids == rule_rows[cid].m0_raw_ids
        assert r.token_count == -(-len(r.content) // 4)
        assert r.embedding != rule_rows[cid].embedding
