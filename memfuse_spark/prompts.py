"""Prompt construction + response-parsing contract for the LLM seams.

The engine's LLM plug points (``m2_facts_from_m1(extractor=)``,
``fact_conflicts(detector=)``, ``m1_episodes(former=)``,
``contextual_chunks(enhancer=)``) take opaque callables; THIS module is
the deterministic twin of the part a real LLM integration must
reproduce — the reference's prompt templating and JSON-parsing
contract:

- templates + ``$``-substitution: reference
  ``llm/prompts/manager.py:68-92`` (``string.Template.safe_substitute``
  with ``None -> ""`` coercion) and the four shipped templates under
  ``llm/prompts/templates/*.txt`` — same placeholder names, same
  section tags, same JSON output schema (wording is ours).
- fact-extraction parsing: ``hierarchy/llm_service.py:209-238``
  (JSON ``{"facts": [...]}``, per-field defaults) with the line-based
  text fallback ``:240-256`` and the confidence-threshold/max-facts
  post-filter of ``store/pgai_store/fact_extraction_processor.py:
  400-420``.
- validation parsing: ``hierarchy/llm_service.py:258-291``
  (JSON contract, keyword-based text fallback, REJECT on parse error).
- conflict-detection parsing: ``hierarchy/conflict_detection.py:
  201-240`` (JSON ``{"conflicts_detected", "conflicts": [...]}``,
  'conflict'-keyword text fallback, no-conflicts on parse error).

The adapters at the bottom plug a ``prompt -> response_text`` callable
(the only thing a real provider must supply) into the engine's seams,
so injection tests round-trip the REAL build→call→parse path with a
fake LLM.
"""

from __future__ import annotations

import json
from string import Template
from typing import Any, Callable

# ---------------------------------------------------------------------------
# templates — same placeholders / tags / JSON contract as the
# reference's llm/prompts/templates/*.txt; prose is our own
# ---------------------------------------------------------------------------

TEMPLATES: dict[str, str] = {
    # reference templates/fact_extraction.txt
    "fact_extraction": """You extract durable facts from conversation data.

<conversation_content>
$content
</conversation_content>

<context>
User ID: $user_id
Session ID: $session_id
Timestamp: $timestamp
</context>

Pull out statements, preferences and decisions worth recalling later;
skip throwaway details. Every fact must stand on its own and carry a
confidence score in [0.0, 1.0].

Output format (JSON):
{
  "facts": [
    {
      "content": "one self-contained factual statement",
      "type": "personal|preference|decision|general|temporal",
      "confidence": 0.95,
      "entities": ["entity1", "entity2"],
      "temporal_info": {
        "timestamp": "ISO format or null",
        "is_relative": false,
        "time_expression": "original time expression or null"
      },
      "source_context": "where this fact came from"
    }
  ]
}

Extract facts now:""",
    # reference templates/fact_validation.txt
    "fact_validation": """You grade the quality of an extracted fact.

<fact_to_validate>
$fact
</fact_to_validate>

<original_context>
$original_context
</original_context>

<validation_criteria>
User ID: $user_id
Minimum Confidence Threshold: $min_confidence
Quality Standards: $quality_standards
</validation_criteria>

Judge the fact on ACCURACY, COMPLETENESS, CLARITY, RELEVANCE,
CONFIDENCE and STRUCTURE against its original context.

Output format (JSON):
{
  "is_valid": true/false,
  "validation_score": 0.95,
  "issues": [
    {
      "type": "ACCURACY|COMPLETENESS|CLARITY|RELEVANCE|CONFIDENCE|STRUCTURE",
      "severity": "HIGH|MEDIUM|LOW",
      "description": "what is wrong",
      "suggestion": "how to fix it"
    }
  ],
  "corrected_fact": {
    "content": "corrected fact content if needed",
    "confidence": 0.85,
    "explanation": "why"
  },
  "recommendation": "ACCEPT|REJECT|REVISE",
  "overall_assessment": "summary"
}

Validate the fact now:""",
    # reference templates/conflict_detection.txt
    "conflict_detection": """You detect conflicts between facts in a knowledge base.

<new_fact>
$new_fact
</new_fact>

<existing_facts>
$existing_facts
</existing_facts>

<context>
User ID: $user_id
Detection Threshold: $threshold
</context>

Compare the new fact against each existing fact; newer information may
supersede older information. Classify every conflict as one of
DIRECT_CONTRADICTION, SEMANTIC_CONFLICT, TEMPORAL_INCONSISTENCY,
VALUE_MISMATCH or PREFERENCE_CHANGE.

Output format (JSON):
{
  "conflicts_detected": true/false,
  "conflicts": [
    {
      "type": "DIRECT_CONTRADICTION|SEMANTIC_CONFLICT|TEMPORAL_INCONSISTENCY|VALUE_MISMATCH|PREFERENCE_CHANGE",
      "severity": "HIGH|MEDIUM|LOW",
      "confidence": 0.95,
      "existing_fact_id": "fact_id",
      "description": "why these facts conflict",
      "resolution_suggestion": "how to resolve it",
      "evidence": {
        "new_fact_evidence": "support for the new fact",
        "existing_fact_evidence": "support for the existing fact"
      }
    }
  ],
  "overall_assessment": "summary"
}

Analyze for conflicts now:""",
    # reference templates/contextual_chunking.txt — consumed by the
    # enhancer= seam (chunking.contextual_chunks); free-text response,
    # no JSON contract
    "contextual_chunking": """<conversation_context>
$past_messages
$current_messages
</conversation_context>

Here is the message chunk to situate within the conversation flow
<message_chunk>
$chunk_content
</message_chunk>

Reply with ONLY a short context blurb that situates this chunk in the
conversation for retrieval purposes — nothing else.""",
}


def build_prompt(template_name: str, **kwargs: Any) -> str:
    """Reference ``PromptManager.get_prompt`` twin (manager.py:68-92):
    ``string.Template.safe_substitute`` over the named template, every
    value stringified with ``None -> ""``. Unknown placeholders are
    left intact (safe_substitute), unknown template names raise."""
    if template_name not in TEMPLATES:
        raise ValueError(f"Template '{template_name}' not found")
    safe = {k: ("" if v is None else str(v)) for k, v in kwargs.items()}
    return Template(TEMPLATES[template_name]).safe_substitute(**safe)


# ---------------------------------------------------------------------------
# response parsing — the exact fallback ladders of the reference
# ---------------------------------------------------------------------------

def parse_fact_extraction_response(
    response_content: str,
    min_confidence: float = 0.0,
    max_facts: int = 10,
) -> list[dict[str, Any]]:
    """Parse an LLM fact-extraction response (llm_service.py:209-238 +
    the processor's threshold/cap post-filter, fact_extraction_
    processor.py:400-420). Returns fact dicts with keys
    ``content/type/confidence/entities/temporal_info/source_context``.

    Ladder: JSON object -> ``data["facts"]`` with per-field defaults;
    anything else (or malformed JSON) -> line-based text fallback: each
    stripped line longer than 10 chars becomes a type='general' fact at
    confidence 0.6 (llm_service.py:240-256). Both paths then drop facts
    below ``min_confidence`` and cap at ``max_facts``."""
    facts: list[dict[str, Any]]
    try:
        if response_content.strip().startswith("{"):
            data = json.loads(response_content)
            facts = [
                {
                    "content": fd.get("content", ""),
                    "type": fd.get("type", "general"),
                    "confidence": float(fd.get("confidence", 0.5)),
                    "entities": fd.get("entities", []),
                    "temporal_info": fd.get("temporal_info"),
                    "source_context": fd.get("source_context"),
                }
                for fd in data.get("facts", [])
            ]
        else:
            facts = _parse_text_facts(response_content)
    except (json.JSONDecodeError, AttributeError, KeyError, TypeError, ValueError):
        facts = _parse_text_facts(response_content)
    facts = [f for f in facts if f["confidence"] >= min_confidence]
    return facts[:max_facts]


def _parse_text_facts(text: str) -> list[dict[str, Any]]:
    """llm_service.py:240-256 fallback: one fact per line > 10 chars."""
    return [
        {
            "content": line,
            "type": "general",
            "confidence": 0.6,
            "entities": [],
            "temporal_info": None,
            "source_context": None,
        }
        for line in (ln.strip() for ln in text.strip().split("\n"))
        if line and len(line) > 10
    ]


def parse_validation_response(response_content: str) -> dict[str, Any]:
    """Parse an LLM fact-validation response (llm_service.py:258-291).
    Keys: is_valid, validation_score, issues, corrected_fact,
    recommendation. Ladder: JSON contract -> keyword text fallback
    ('valid'/'accept' => ACCEPT at 0.7, else REJECT at 0.3) -> REJECT
    at 0.0 on parse error."""
    try:
        if response_content.strip().startswith("{"):
            data = json.loads(response_content)
            return {
                "is_valid": data.get("is_valid", False),
                "validation_score": float(data.get("validation_score", 0.0)),
                "issues": data.get("issues", []),
                "corrected_fact": data.get("corrected_fact"),
                "recommendation": data.get("recommendation", "REJECT"),
            }
        low = response_content.lower()
        is_valid = "valid" in low or "accept" in low
        return {
            "is_valid": is_valid,
            "validation_score": 0.7 if is_valid else 0.3,
            "issues": [],
            "corrected_fact": None,
            "recommendation": "ACCEPT" if is_valid else "REJECT",
        }
    except (json.JSONDecodeError, AttributeError, TypeError, ValueError) as e:
        return {
            "is_valid": False,
            "validation_score": 0.0,
            "issues": [{"type": "PARSE_ERROR", "description": str(e)}],
            "corrected_fact": None,
            "recommendation": "REJECT",
        }


_CONFLICT_TYPES = {
    "DIRECT_CONTRADICTION",
    "SEMANTIC_CONFLICT",
    "TEMPORAL_INCONSISTENCY",
    "VALUE_MISMATCH",
    "PREFERENCE_CHANGE",
}


def _require_enum(value: Any, allowed) -> str:
    """Enum-constructor stand-in: return value if it is a member of
    `allowed`, else raise ValueError — the same contract as the
    reference's ConflictType(value)/ConflictSeverity(value) calls
    (conflict_detection.py:212-213), whose ValueError the outer except
    turns into a whole-response no-conflicts result."""
    if value in allowed:
        return value
    raise ValueError(f"{value!r} is not a valid conflict enum value")


def parse_conflict_response(response_content: str) -> dict[str, Any]:
    """Parse an LLM conflict-detection response
    (conflict_detection.py:201-240). Keys: conflicts_detected,
    conflicts (list of dicts), overall_assessment. Ladder: JSON
    contract (a MISSING type/severity key takes the reference defaults
    SEMANTIC_CONFLICT/MEDIUM; a PRESENT-but-invalid value raises, which
    — exactly like the reference's ConflictType(...)/
    ConflictSeverity(...) ValueError — drops the whole response to the
    no-conflicts parse-error result) -> 'conflict'-keyword text
    fallback -> no-conflicts on parse error."""
    try:
        if response_content.strip().startswith("{"):
            data = json.loads(response_content)
            conflicts = [
                {
                    "type": _require_enum(
                        cd.get("type", "SEMANTIC_CONFLICT"), _CONFLICT_TYPES
                    ),
                    "severity": _require_enum(
                        cd.get("severity", "MEDIUM"),
                        ("HIGH", "MEDIUM", "LOW"),
                    ),
                    "confidence": float(cd.get("confidence", 0.5)),
                    "existing_fact_id": cd.get("existing_fact_id", "unknown"),
                    "description": cd.get("description", ""),
                    "resolution_suggestion": cd.get(
                        "resolution_suggestion", ""
                    ),
                    "evidence": cd.get("evidence", {}),
                }
                for cd in data.get("conflicts", [])
            ]
            return {
                "conflicts_detected": data.get("conflicts_detected", False),
                "conflicts": conflicts,
                "overall_assessment": data.get("overall_assessment", ""),
            }
        return {
            "conflicts_detected": "conflict" in response_content.lower(),
            "conflicts": [],
            "overall_assessment": response_content[:200],
        }
    except (json.JSONDecodeError, AttributeError, TypeError, ValueError) as e:
        return {
            "conflicts_detected": False,
            "conflicts": [],
            "overall_assessment": f"Parse error: {e}",
        }


# ---------------------------------------------------------------------------
# seam adapters — build -> call -> parse, shaped for the engine's seams
# ---------------------------------------------------------------------------

def llm_extractor(
    llm: Callable[[str], str],
    user_id: str = "unknown",
    session_id: str = "unknown",
    timestamp: str = "",
    min_confidence: float = 0.0,
    max_facts: int = 10,
) -> Callable[[list[str]], list[list[dict[str, Any]]]]:
    """Wrap a ``prompt -> response_text`` provider into the
    ``m2_facts_from_m1(extractor=)`` contract
    (``contents -> [[{fact_content, entities, confidence}, ...], ...]``)
    via the real fact_extraction prompt + parse path. Runs inside the
    seam's Arrow-batched ``mapInPandas``, one LLM call per chunk — the
    model boundary, same cost shape as the reference's per-chunk calls
    (fact_extraction_processor.py:107-230)."""

    def extract(contents: list[str]) -> list[list[dict[str, Any]]]:
        out = []
        for content in contents:
            prompt = build_prompt(
                "fact_extraction",
                content=content,
                user_id=user_id,
                session_id=session_id,
                timestamp=timestamp,
            )
            parsed = parse_fact_extraction_response(
                llm(prompt), min_confidence=min_confidence, max_facts=max_facts
            )
            out.append(
                [
                    {
                        "fact_content": f["content"],
                        "entities": f["entities"],
                        "confidence": f["confidence"],
                    }
                    for f in parsed
                ]
            )
        return out

    return extract


def llm_enhancer(
    llm: Callable[[str], str],
) -> Callable[[list[str], list[str]], list[str]]:
    """Wrap a ``prompt -> response_text`` provider into the
    ``contextual_enhance(enhancer=)`` contract
    (``(contexts, contents) -> enhanced_contents``) via the real
    contextual_chunking prompt (reference templates/
    contextual_chunking.txt; rag/chunk/contextual.py:30-67 sends
    exactly this window+chunk pair). The response is free text — the
    situating blurb — which the reference prepends to the chunk for
    retrieval; same here."""

    def enhance(contexts: list[str], contents: list[str]) -> list[str]:
        out = []
        for ctx, content in zip(contexts, contents):
            prompt = build_prompt(
                "contextual_chunking",
                past_messages=ctx,
                current_messages="",
                chunk_content=content,
            )
            blurb = llm(prompt).strip()
            out.append(f"{blurb}\n{content}" if blurb else content)
        return out

    return enhance


def llm_former(
    llm: Callable[[str], str],
    user_id: str = "unknown",
    session_id: str = "unknown",
) -> Callable[[list[list[str]]], list[str]]:
    """Wrap a ``prompt -> response_text`` provider into the
    ``m1_from_m0(former=)`` contract (``batches_of_lines ->
    episode_contents``). The reference's episode formation prompts the
    LLM with the raw message lines and stores the narrative it returns
    (episode_formation_processor.py:31-628); the prompt here is the
    fact_extraction template's sibling use — the message batch as
    ``$content`` — and the episode content is the response text
    verbatim (free text, no JSON contract)."""

    def form(batches_of_lines: list[list[str]]) -> list[str]:
        out = []
        for lines in batches_of_lines:
            prompt = build_prompt(
                "contextual_chunking",
                past_messages="",
                current_messages="\n".join(lines),
                chunk_content="\n".join(lines),
            )
            out.append(llm(prompt).strip() or "\n\n".join(lines))
        return out

    return form


def llm_validator(
    llm: Callable[[str], str],
    user_id: str = "unknown",
    min_confidence: float = 0.7,
    quality_standards: str = "high",
) -> Callable[[list[str], list[str]], list[tuple[bool, float, str]]]:
    """Wrap a ``prompt -> response_text`` provider into the
    ``validate_facts(validator=)`` contract (``(facts, contexts) ->
    [(is_valid, validation_score, recommendation), ...]``) via the real
    fact_validation prompt + parse ladder (reference
    llm_service.py:144-199 validate_fact_consistency, one call per
    fact with its original context)."""

    def validate(
        facts: list[str], contexts: list[str]
    ) -> list[tuple[bool, float, str]]:
        out = []
        for fact, context in zip(facts, contexts):
            prompt = build_prompt(
                "fact_validation",
                fact=fact,
                original_context=context,
                user_id=user_id,
                min_confidence=min_confidence,
                quality_standards=quality_standards,
            )
            v = parse_validation_response(llm(prompt))
            out.append(
                (v["is_valid"], v["validation_score"], v["recommendation"])
            )
        return out

    return validate


def llm_detector(
    llm: Callable[[str], str],
    user_id: str = "unknown",
    threshold: float = 0.8,
) -> Callable[[list[str], list[str]], list[tuple[str, float] | None]]:
    """Wrap a ``prompt -> response_text`` provider into the
    ``fact_conflicts(detector=)`` contract
    (``(existing_facts, new_facts) -> [(type, confidence) | None]``)
    via the real conflict_detection prompt + parse path: one LLM call
    per blocked candidate pair (the engine has already reduced
    candidates to entity-blocked pairs — the reference's prompt took
    the full existing list per new fact, conflict_detection.py:113-119,
    an O(|store|) prompt this pairwise form strictly refines). A pair
    maps to the FIRST parsed conflict's (type, confidence), or None
    when none are reported."""

    def detect(
        existing: list[str], new: list[str]
    ) -> list[tuple[str, float] | None]:
        verdicts: list[tuple[str, float] | None] = []
        for e_fact, n_fact in zip(existing, new):
            prompt = build_prompt(
                "conflict_detection",
                new_fact=n_fact,
                existing_facts=str([e_fact]),
                user_id=user_id,
                threshold=threshold,
            )
            parsed = parse_conflict_response(llm(prompt))
            if parsed["conflicts_detected"] and parsed["conflicts"]:
                c = parsed["conflicts"][0]
                verdicts.append((c["type"], c["confidence"]))
            else:
                verdicts.append(None)
        return verdicts

    return detect
