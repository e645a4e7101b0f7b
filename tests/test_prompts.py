"""Prompt-construction + parse-contract twin (memfuse_spark/prompts.py)
for the LLM seams — reference llm/prompts/manager.py,
hierarchy/llm_service.py, hierarchy/conflict_detection.py,
store/pgai_store/fact_extraction_processor.py."""

from __future__ import annotations

import json

import pytest

from memfuse_spark import prompts as P


# ---------------------------------------------------------------------------
# templating
# ---------------------------------------------------------------------------

def test_build_prompt_substitutes_and_coerces_none():
    p = P.build_prompt(
        "fact_extraction",
        content="alice likes tea",
        user_id="u1",
        session_id=None,  # manager.py:85 None -> ""
        timestamp=1234,   # stringified
    )
    assert "<conversation_content>\nalice likes tea\n" in p
    assert "User ID: u1" in p
    assert "Session ID: \n" in p
    assert "Timestamp: 1234" in p
    assert '"facts"' in p  # the JSON contract is part of the prompt


def test_build_prompt_safe_substitute_and_unknown_template():
    # missing variables stay as placeholders (safe_substitute), extras
    # are ignored — manager.py:88 behavior
    p = P.build_prompt("conflict_detection", new_fact="x", bogus="y")
    assert "<new_fact>\nx\n</new_fact>" in p
    assert "$existing_facts" in p
    with pytest.raises(ValueError, match="not found"):
        P.build_prompt("no_such_template")


def test_all_reference_templates_present_with_their_placeholders():
    # one template per reference templates/*.txt, same placeholder names
    expect = {
        "fact_extraction": {"content", "user_id", "session_id", "timestamp"},
        "fact_validation": {
            "fact", "original_context", "user_id", "min_confidence",
            "quality_standards",
        },
        "conflict_detection": {
            "new_fact", "existing_facts", "user_id", "threshold",
        },
        "contextual_chunking": {
            "past_messages", "current_messages", "chunk_content",
        },
    }
    import string

    for name, want in expect.items():
        got = {
            m.group("named") or m.group("braced")
            for m in string.Template(P.TEMPLATES[name]).pattern.finditer(
                P.TEMPLATES[name]
            )
            if m.group("named") or m.group("braced")
        }
        assert got == want, (name, got)


# ---------------------------------------------------------------------------
# parse ladders
# ---------------------------------------------------------------------------

def test_parse_fact_extraction_json_defaults_threshold_and_cap():
    resp = json.dumps(
        {
            "facts": [
                {"content": "a", "confidence": 0.95, "entities": ["x"]},
                {"content": "b"},  # defaults: type general, conf 0.5
                {"content": "c", "confidence": 0.9},
                {"content": "d", "confidence": 0.85},
            ]
        }
    )
    got = P.parse_fact_extraction_response(resp, min_confidence=0.7, max_facts=2)
    # 'b' dropped by threshold, then capped at 2
    assert [(f["content"], f["confidence"]) for f in got] == [("a", 0.95), ("c", 0.9)]
    assert got[0]["entities"] == ["x"] and got[1]["entities"] == []
    assert got[1]["type"] == "general"


def test_parse_fact_extraction_text_and_malformed_fallbacks():
    text = "alice prefers oolong tea\nshort\nbob moved to lisbon recently"
    got = P.parse_fact_extraction_response(text)
    assert [f["content"] for f in got] == [
        "alice prefers oolong tea",
        "bob moved to lisbon recently",
    ]
    assert all(f["confidence"] == 0.6 and f["type"] == "general" for f in got)
    # malformed JSON starting with '{' falls back to the text parser too
    got2 = P.parse_fact_extraction_response('{"facts": [oops...........]}')
    assert len(got2) == 1 and got2[0]["confidence"] == 0.6
    # VALID json with the wrong shapes inside (non-dict facts, non-list
    # facts, non-numeric score) must degrade, never raise
    got3 = P.parse_fact_extraction_response('{"facts": ["bare string"]}')
    assert got3 and got3[0]["type"] == "general"
    assert P.parse_fact_extraction_response('{"facts": 7}')
    assert P.parse_conflict_response(
        '{"conflicts_detected": true, "conflicts": ["x"]}'
    )["conflicts_detected"] is False
    assert P.parse_validation_response(
        '{"is_valid": true, "validation_score": {"a": 1}}'
    )["recommendation"] == "REJECT"


def test_parse_validation_ladder():
    ok = P.parse_validation_response(
        json.dumps(
            {
                "is_valid": True,
                "validation_score": 0.92,
                "recommendation": "ACCEPT",
            }
        )
    )
    assert ok["is_valid"] and ok["validation_score"] == 0.92
    assert ok["issues"] == [] and ok["corrected_fact"] is None
    # keyword fallback
    txt = P.parse_validation_response("This fact looks valid to me.")
    assert txt["is_valid"] and txt["validation_score"] == 0.7
    txt2 = P.parse_validation_response("nope, garbage")
    assert not txt2["is_valid"] and txt2["recommendation"] == "REJECT"


def test_parse_conflict_ladder_and_enum_coercion():
    # MISSING type/severity keys take the reference constructor
    # defaults (ConflictType(get("type", "SEMANTIC_CONFLICT")),
    # conflict_detection.py:212-213)
    ok = P.parse_conflict_response(
        json.dumps(
            {
                "conflicts_detected": True,
                "conflicts": [{"confidence": 0.8}],
                "overall_assessment": "one conflict",
            }
        )
    )
    assert ok["conflicts_detected"]
    assert ok["conflicts"][0]["type"] == "SEMANTIC_CONFLICT"
    assert ok["conflicts"][0]["severity"] == "MEDIUM"
    assert ok["conflicts"][0]["confidence"] == 0.8
    # PRESENT-but-invalid enum values raise inside the try — like the
    # reference's ConflictType("WEIRD_TYPE") ValueError — dropping the
    # WHOLE response to the no-conflicts parse-error result (ADVICE r6)
    bad_enum = P.parse_conflict_response(
        json.dumps(
            {
                "conflicts_detected": True,
                "conflicts": [
                    {"type": "WEIRD_TYPE", "severity": "EXTREME", "confidence": 0.8}
                ],
            }
        )
    )
    assert bad_enum["conflicts_detected"] is False
    assert bad_enum["conflicts"] == []
    assert "Parse error" in bad_enum["overall_assessment"]
    bad_sev = P.parse_conflict_response(
        json.dumps(
            {
                "conflicts_detected": True,
                "conflicts": [{"type": "VALUE_MISMATCH", "severity": "EXTREME"}],
            }
        )
    )
    assert bad_sev["conflicts_detected"] is False and bad_sev["conflicts"] == []
    # text fallback keys on the word 'conflict'
    assert P.parse_conflict_response("these facts conflict")["conflicts_detected"]
    assert not P.parse_conflict_response("all consistent")["conflicts_detected"]
    # malformed JSON -> no conflicts, error surfaced in the assessment
    bad = P.parse_conflict_response('{"conflicts_detected": tru')
    assert not bad["conflicts_detected"]
    assert "Parse error" in bad["overall_assessment"]


# ---------------------------------------------------------------------------
# seam round-trips with a fake LLM (the injection tests VERDICT r5 #4
# asked for: the REAL build -> call -> parse path, a fake provider)
# ---------------------------------------------------------------------------

def _make_fake_extraction_llm():
    """Deterministic fake provider: reads the content back OUT of the
    built prompt (proving substitution happened) and answers in the
    reference JSON contract. Built as a local closure so cloudpickle
    ships it by VALUE to executors (a module-level test function would
    pickle by reference and fail to import worker-side)."""
    import json as _json

    def _fake_extraction_llm(prompt: str) -> str:
        body = prompt.split("<conversation_content>\n")[1].split(
            "\n</conversation_content>"
        )[0]
        toks = body.split()
        return _json.dumps(
            {
                "facts": [
                    {
                        "content": f"{toks[0]} mentioned with {toks[-1]}",
                        "type": "general",
                        "confidence": 0.9,
                        "entities": [toks[0], toks[-1]],
                    }
                ]
            }
        )

    return _fake_extraction_llm


def test_llm_extractor_through_m2_seam(spark):
    from memfuse_spark.operators.hierarchy import m2_facts_from_m1

    m1 = spark.createDataFrame(
        [
            ("c1-0", "c1", "alpha beta gamma"),
            ("c1-1", "c1", "delta epsilon zeta"),
        ],
        "chunk_id string, conversation_id string, content string",
    )
    ext = P.llm_extractor(_make_fake_extraction_llm(), user_id="u1")
    rows = {
        r.chunk_id: r
        for r in m2_facts_from_m1(m1, extractor=ext).collect()
    }
    assert rows["c1-0"].fact_content == "alpha mentioned with gamma"
    assert rows["c1-0"].entities == ["alpha", "gamma"]
    assert rows["c1-0"].confidence == pytest.approx(0.9)
    assert rows["c1-1"].fact_content == "delta mentioned with zeta"


def test_llm_extractor_threshold_drops_low_confidence_facts(spark):
    from memfuse_spark.operators.hierarchy import m2_facts_from_m1

    def low_conf_llm(prompt: str) -> str:
        import json as _json

        return _json.dumps(
            {"facts": [{"content": "meh", "confidence": 0.2}]}
        )

    m1 = spark.createDataFrame(
        [("c1-0", "c1", "alpha beta")],
        "chunk_id string, conversation_id string, content string",
    )
    out = m2_facts_from_m1(
        m1, extractor=P.llm_extractor(low_conf_llm)
    ).collect()
    # the seam's 0.7 threshold (fact_extraction_processor.py:543-557)
    # applies AFTER the parse path
    assert out == []


def _make_fake_conflict_llm():
    import json as _json

    def _fake_conflict_llm(prompt: str) -> str:
        new = prompt.split("<new_fact>\n")[1].split("\n</new_fact>")[0]
        existing = prompt.split("<existing_facts>\n")[1].split(
            "\n</existing_facts>"
        )[0]
        if "tea" in new and "coffee" in existing:
            return _json.dumps(
                {
                    "conflicts_detected": True,
                    "conflicts": [
                        {
                            "type": "PREFERENCE_CHANGE",
                            "severity": "HIGH",
                            "confidence": 0.97,
                        }
                    ],
                }
            )
        return "no issues found"  # exercises the text fallback -> None

    return _fake_conflict_llm


def test_llm_detector_through_conflicts_seam(spark):
    from memfuse_spark.operators.conflicts import fact_conflicts

    m2 = spark.createDataFrame(
        [
            ("c1-0", "c1", "likes coffee a lot", ["alice", "coffee"], 0.9),
            ("c1-1", "c1", "now prefers tea", ["alice", "tea"], 0.9),
            ("c2-0", "c2", "works at acme", ["bob", "acme"], 0.9),
            ("c2-1", "c2", "still works at acme", ["bob", "acme"], 0.9),
        ],
        "chunk_id string, conversation_id string, fact_content string, "
        "entities array<string>, confidence double",
    )
    out = fact_conflicts(
        m2, detector=P.llm_detector(_make_fake_conflict_llm())
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.conflict_type == "PREFERENCE_CHANGE"
    assert r.confidence == pytest.approx(0.97)
    assert r.severity == "HIGH" and r.action == "auto_resolve"


def test_llm_enhancer_through_m6_seam(spark):
    from memfuse_spark.operators.chunking import contextual_enhance

    def _make_fake():
        def fake(prompt: str) -> str:
            chunk = prompt.split("<message_chunk>\n")[1].split(
                "\n</message_chunk>"
            )[0]
            return f"about:{chunk.split()[0]}"

        return fake

    chunks = spark.createDataFrame(
        [("c1", 0, "alpha beta"), ("c1", 1, "gamma delta")],
        "conversation_id string, batch_id int, content string",
    )
    rows = {
        r.batch_id: r.enhanced_content
        for r in contextual_enhance(
            chunks, enhancer=P.llm_enhancer(_make_fake())
        ).collect()
    }
    # the blurb the fake derives from the REAL prompt is prepended
    assert rows[0] == "about:alpha\nalpha beta"
    assert rows[1] == "about:gamma\ngamma delta"


def test_llm_former_through_m1_seam(spark):
    from memfuse_spark.operators.hierarchy import m1_from_m0

    def _make_fake():
        def fake(prompt: str) -> str:
            body = prompt.split("<message_chunk>\n")[1].split(
                "\n</message_chunk>"
            )[0]
            return f"episode about {len(body.splitlines())} messages"

        return fake

    m0 = spark.createDataFrame(
        [
            ("m1", "c1", 1, "user", "hello there"),
            ("m2", "c1", 2, "assistant", "hi, how can i help"),
        ],
        "message_id string, conversation_id string, sequence_number int, "
        "role string, content string",
    )
    out = m1_from_m0(m0, former=P.llm_former(_make_fake())).collect()
    assert len(out) == 1
    assert out[0].content == "episode about 2 messages"


# ---------------------------------------------------------------------------
# fuzz: a model can emit ANYTHING — the parse ladders must never raise
# and always return the full contract shape
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_any_text = st.one_of(
    st.text(max_size=300),
    # JSON-ish payloads, valid and broken
    st.builds(
        json.dumps,
        st.recursive(
            st.one_of(st.none(), st.booleans(), st.floats(allow_nan=False),
                      st.integers(), st.text(max_size=20)),
            lambda kids: st.one_of(
                st.lists(kids, max_size=4),
                st.dictionaries(st.text(max_size=10), kids, max_size=4),
            ),
            max_leaves=10,
        ),
    ),
    st.builds(lambda s: "{" + s, st.text(max_size=80)),
)


@settings(max_examples=150, deadline=None)
@given(_any_text)
def test_parse_ladders_total_on_arbitrary_output(resp):
    facts = P.parse_fact_extraction_response(resp)
    assert isinstance(facts, list) and len(facts) <= 10
    for f in facts:
        assert set(f) == {
            "content", "type", "confidence", "entities", "temporal_info",
            "source_context",
        }
        assert isinstance(f["confidence"], float)

    v = P.parse_validation_response(resp)
    assert set(v) == {
        "is_valid", "validation_score", "issues", "corrected_fact",
        "recommendation",
    }
    assert isinstance(v["validation_score"], float)

    c = P.parse_conflict_response(resp)
    assert set(c) == {"conflicts_detected", "conflicts", "overall_assessment"}
    for cf in c["conflicts"]:
        assert cf["type"] in P._CONFLICT_TYPES
        assert cf["severity"] in ("HIGH", "MEDIUM", "LOW")


def test_llm_validator_through_validate_facts_seam(spark):
    """The validation LLM seam end-to-end: the fake grades via the REAL
    fact_validation prompt (reads the fact back out), its ACCEPT/
    REJECT/REVISE drives status, and a detected conflict still
    overrides to `conflicted`."""
    from memfuse_spark.operators.conflicts import validate_facts

    def _make_fake():
        import json as _json

        def fake(prompt: str) -> str:
            fact = prompt.split("<fact_to_validate>\n")[1].split(
                "\n</fact_to_validate>"
            )[0]
            rec = (
                "REJECT" if "bogus" in fact
                else "REVISE" if "maybe" in fact
                else "ACCEPT"
            )
            return _json.dumps(
                {
                    "is_valid": rec == "ACCEPT",
                    "validation_score": 0.42 if rec != "ACCEPT" else 0.91,
                    "recommendation": rec,
                }
            )

        return fake

    m2 = spark.createDataFrame(
        [
            # conflicting pair (same subject, later batch, new object):
            # conflict override must win over the seam's ACCEPT
            ("c1-0", "c1", "a co_occurs_with b", ["a", "b"], 0.9),
            ("c1-1", "c1", "a co_occurs_with c", ["a", "c"], 0.9),
            ("c2-0", "c2", "bogus co_occurs_with x", ["bogus", "x"], 0.9),
            ("c3-0", "c3", "maybe co_occurs_with y", ["maybe", "y"], 0.9),
        ],
        "chunk_id string, conversation_id string, fact_content string, "
        "entities array<string>, confidence double",
    )
    m1 = spark.createDataFrame(
        [("c1-0", "a b"), ("c1-1", "a c"), ("c2-0", "bogus x"),
         ("c3-0", "maybe y")],
        "chunk_id string, content string",
    )
    got = {
        r.chunk_id: r
        for r in validate_facts(
            m2, m1, validator=P.llm_validator(_make_fake())
        ).collect()
    }
    assert got["c1-0"].status == "conflicted"  # override wins
    assert got["c1-1"].status == "conflicted"
    assert got["c2-0"].status == "rejected"
    assert got["c2-0"].recommendation == "REJECT"
    assert got["c3-0"].status == "pending"
    assert got["c3-0"].recommendation == "REVISE"
    assert got["c3-0"].validation_score == pytest.approx(0.42)
    # entity_support stays the deterministic column under the seam
    assert got["c2-0"].entity_support == pytest.approx(1.0)
