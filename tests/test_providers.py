"""Live-provider adapter (`memfuse_spark.providers`) tests.

A local ThreadingHTTPServer plays the OpenAI-compatible endpoint, so
the full stack — env gate -> HTTPChatProvider -> prompts adapter ->
seam mapInPandas — runs against a REAL HTTP round-trip with zero
external network. Reference behaviors covered:
llm/providers/openai.py (wire shape, auth header, content extraction),
llm/base.py retry ladder (429/5xx backoff, Retry-After), and
llm/config.py from_env.
"""

from __future__ import annotations

import json
import os
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from memfuse_spark import providers as PR


def _chat_payload(text: str) -> bytes:
    return json.dumps(
        {
            "id": "chatcmpl-test",
            "model": "fake-model",
            "choices": [
                {
                    "index": 0,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": "stop",
                }
            ],
            "usage": {
                "prompt_tokens": 1,
                "completion_tokens": 1,
                "total_tokens": 2,
            },
        }
    ).encode()


class _FakeEndpoint:
    """Scriptable chat-completions endpoint: a queue of
    (status, body_text_or_reply, headers) steps; the last step repeats.
    Records every request body + headers for assertions."""

    def __init__(self, steps):
        self.steps = list(steps)
        self.requests = []
        ep = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib name
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n).decode())
                ep.requests.append(
                    {"path": self.path, "body": body, "headers": dict(self.headers)}
                )
                i = min(len(ep.requests) - 1, len(ep.steps) - 1)
                status, reply, headers = ep.steps[i]
                data = _chat_payload(reply) if status == 200 else reply.encode()
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # silence
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.base_url = f"http://127.0.0.1:{self.server.server_address[1]}/v1"

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def _provider(ep, **over):
    kw = dict(
        base_url=ep.base_url,
        api_key="sk-test",
        model="fake-model",
        max_retries=3,
        retry_delay=0.01,
        backoff_factor=2.0,
        timeout=5.0,
    )
    kw.update(over)
    return PR.HTTPChatProvider(PR.ProviderConfig(**kw))


def test_happy_path_wire_shape_and_auth_header():
    ep = _FakeEndpoint([(200, "the answer", None)])
    try:
        out = _provider(ep)("what is 2+2?")
        assert out == "the answer"
        (req,) = ep.requests
        assert req["path"] == "/v1/chat/completions"
        assert req["headers"]["Authorization"] == "Bearer sk-test"
        assert req["body"]["model"] == "fake-model"
        assert req["body"]["messages"] == [
            {"role": "user", "content": "what is 2+2?"}
        ]
        assert req["body"]["temperature"] == pytest.approx(0.3)
        assert req["body"]["max_tokens"] == 150
    finally:
        ep.close()


def test_max_tokens_zero_is_omitted_from_the_wire():
    ep = _FakeEndpoint([(200, "ok", None)])
    try:
        _provider(ep, max_tokens=0)("hi")
        assert "max_tokens" not in ep.requests[0]["body"]
    finally:
        ep.close()


def test_retries_transient_500_then_succeeds():
    ep = _FakeEndpoint([(500, "boom", None), (200, "recovered", None)])
    try:
        assert _provider(ep)("hi") == "recovered"
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_429_honors_retry_after_then_succeeds():
    ep = _FakeEndpoint([(429, "slow down", {"Retry-After": "0.01"}), (200, "ok", None)])
    try:
        assert _provider(ep)("hi") == "ok"
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_429_http_date_retry_after_falls_back_and_retries():
    """RFC 9110 allows Retry-After as an HTTP-date, not just
    delta-seconds; a non-numeric header must ride the retry ladder
    (pre-fix: float('Fri, ...') escaped __call__ as a raw ValueError).
    A past date clamps the computed sleep to 0."""
    ep = _FakeEndpoint(
        [
            (429, "slow down", {"Retry-After": "Fri, 01 Jan 2016 00:00:00 GMT"}),
            (200, "ok", None),
        ]
    )
    try:
        assert _provider(ep)("hi") == "ok"
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_429_unparseable_retry_after_keeps_backoff_schedule():
    ep = _FakeEndpoint(
        [(429, "slow down", {"Retry-After": "soon-ish"}), (200, "ok", None)]
    )
    try:
        assert _provider(ep)("hi") == "ok"
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_429_negative_retry_after_is_clamped_not_fatal():
    """time.sleep(-5) raises ValueError — a hostile/buggy numeric
    Retry-After must be clamped to [0, 60], not escape __call__."""
    ep = _FakeEndpoint(
        [(429, "slow down", {"Retry-After": "-5"}), (200, "ok", None)]
    )
    try:
        assert _provider(ep)("hi") == "ok"
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_exhausted_retries_raise_provider_error():
    ep = _FakeEndpoint([(503, "down", None)])
    try:
        with pytest.raises(PR.ProviderError, match="after 3 attempts"):
            _provider(ep, max_retries=2)("hi")
        assert len(ep.requests) == 3  # initial + 2 retries
    finally:
        ep.close()


def test_non_retryable_http_error_raises_immediately():
    ep = _FakeEndpoint([(401, "bad key", None)])
    try:
        with pytest.raises(PR.ProviderError, match="HTTP 401"):
            _provider(ep)("hi")
        assert len(ep.requests) == 1
    finally:
        ep.close()


def test_malformed_response_body_is_a_provider_error(monkeypatch):
    class _FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b'{"not_choices": []}'

    import urllib.request as _ur

    monkeypatch.setattr(_ur, "urlopen", lambda *a, **k: _FakeResp())
    p = PR.HTTPChatProvider(PR.ProviderConfig(base_url="http://127.0.0.1:1/v1"))
    with pytest.raises(PR.ProviderError, match="malformed"):
        p("hi")


def test_env_gate_returns_none_without_base_url(monkeypatch):
    monkeypatch.delenv("MEMFUSE_SPARK_LLM_BASE_URL", raising=False)
    assert PR.provider_from_env() is None


def test_env_gate_builds_configured_provider(monkeypatch):
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_BASE_URL", "http://127.0.0.1:1/v1")
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_API_KEY", "sk-env")
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_MODEL", "my-model")
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_MAX_RETRIES", "7")
    p = PR.provider_from_env()
    assert isinstance(p, PR.HTTPChatProvider)
    assert p.config.api_key == "sk-env"
    assert p.config.model == "my-model"
    assert p.config.max_retries == 7


def test_provider_pickles_for_executor_shipping():
    p = PR.HTTPChatProvider(
        PR.ProviderConfig(base_url="http://127.0.0.1:1/v1", min_interval=1.0)
    )
    p2 = pickle.loads(pickle.dumps(p))
    assert p2.config.base_url == p.config.base_url
    assert p2._last_request_t == 0.0  # throttle clock reset per process


def test_mock_provider_replays_then_repeats():
    m = PR.MockChatProvider(["a", "b"])
    assert [m("1"), m("2"), m("3")] == ["a", "b", "b"]
    assert m.calls == ["1", "2", "3"]


def test_bind_seams_shapes_all_five_callables():
    facts_json = json.dumps(
        {"facts": [{"content": "x likes y", "entities": ["x"], "confidence": 0.9}]}
    )
    seams = PR.bind_seams(PR.MockChatProvider([facts_json]))
    assert set(seams) == {"extractor", "detector", "validator", "former", "enhancer"}
    [facts] = seams["extractor"](["x likes y a lot"])
    assert facts == [
        {"fact_content": "x likes y", "entities": ["x"], "confidence": 0.9}
    ]


def test_live_provider_through_m2_seam_end_to_end(spark):
    """The full stack the reference runs per chunk: seam mapInPandas
    -> prompt build -> HTTP chat call -> JSON parse -> fact rows. The
    executor IS a separate worker process in local mode, so this also
    proves the provider pickles into workers and opens its own
    connection there."""
    from memfuse_spark.operators.hierarchy import m2_facts_from_m1

    facts = {
        "facts": [
            {"content": "alpha prefers beta", "entities": ["alpha"], "confidence": 0.95}
        ]
    }
    ep = _FakeEndpoint([(200, json.dumps(facts), None)])
    try:
        from memfuse_spark import prompts as P

        provider = _provider(ep)
        m1 = spark.createDataFrame(
            [("c1-0", "c1", "alpha beta gamma")],
            "chunk_id string, conversation_id string, content string",
        )
        rows = m2_facts_from_m1(
            m1, extractor=P.llm_extractor(provider, user_id="u1")
        ).collect()
        assert len(rows) == 1
        assert rows[0].fact_content == "alpha prefers beta"
        assert rows[0].confidence == pytest.approx(0.95)
        # the prompt that went over the wire was the real template build
        sent = ep.requests[0]["body"]["messages"][0]["content"]
        assert "alpha beta gamma" in sent and "User ID: u1" in sent
    finally:
        ep.close()


# ---------------------------------------------------------------------------
# Live embed/rerank model tier (round 9): /embeddings + /rerank clients
# ---------------------------------------------------------------------------


class _FakeJSONEndpoint:
    """Generic scriptable JSON endpoint: reply_fn(request_body) -> dict
    for 200 steps; (status, text) tuples for error steps. Shared by the
    /embeddings and /rerank tests (the chat-shaped _FakeEndpoint bakes
    in the chat payload)."""

    def __init__(self, steps):
        self.steps = list(steps)
        self.requests = []
        ep = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib name
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n).decode())
                ep.requests.append(
                    {"path": self.path, "body": body, "headers": dict(self.headers)}
                )
                i = min(len(ep.requests) - 1, len(ep.steps) - 1)
                step = ep.steps[i]
                if callable(step):
                    status, data = 200, json.dumps(step(body)).encode()
                else:
                    status, text = step
                    data = text.encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.base_url = f"http://127.0.0.1:{self.server.server_address[1]}/v1"

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def _embed_reply(body):
    """OpenAI /embeddings wire shape; vectors derive from text length so
    assertions can tie vector -> input. Data returned REVERSED to prove
    the client re-orders by index."""
    data = [
        {"object": "embedding", "index": i, "embedding": [float(len(t)), 1.0]}
        for i, t in enumerate(body["input"])
    ]
    return {"object": "list", "data": list(reversed(data)), "model": body["model"]}


def _embed_provider(ep, **over):
    kw = dict(base_url=ep.base_url, api_key="sk-embed", model="fake-embed",
              max_retries=2, retry_delay=0.01, timeout=5.0)
    kw.update(over)
    return PR.HTTPEmbeddingProvider(PR.ProviderConfig(**kw))


def test_embeddings_wire_shape_order_and_auth():
    ep = _FakeJSONEndpoint([_embed_reply])
    try:
        vecs = _embed_provider(ep)(["abc", "defgh"])
        assert vecs == [[3.0, 1.0], [5.0, 1.0]]  # re-ordered by index
        (req,) = ep.requests
        assert req["path"] == "/v1/embeddings"
        assert req["headers"]["Authorization"] == "Bearer sk-embed"
        assert req["body"] == {"model": "fake-embed", "input": ["abc", "defgh"]}
    finally:
        ep.close()


def test_embeddings_batch_size_splits_requests():
    ep = _FakeJSONEndpoint([_embed_reply])
    try:
        vecs = _embed_provider(ep, batch_size=2)(["a", "bb", "ccc", "dddd", "eeeee"])
        assert [v[0] for v in vecs] == [1.0, 2.0, 3.0, 4.0, 5.0]
        assert [len(r["body"]["input"]) for r in ep.requests] == [2, 2, 1]
    finally:
        ep.close()


def test_embeddings_retry_ladder_shared_with_chat():
    ep = _FakeJSONEndpoint([(503, "down"), _embed_reply])
    try:
        assert _embed_provider(ep)(["hi"]) == [[2.0, 1.0]]
        assert len(ep.requests) == 2
    finally:
        ep.close()


def test_embeddings_count_mismatch_is_a_provider_error():
    ep = _FakeJSONEndpoint(
        [lambda body: {"data": [{"index": 0, "embedding": [1.0]}]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="1 vectors for 2"):
            _embed_provider(ep)(["a", "b"])
    finally:
        ep.close()


def _rerank_reply(body):
    """Cohere/Jina /rerank wire shape: score = len(document)/10,
    results returned in score order (not index order) like the real
    endpoints."""
    results = [
        {"index": i, "relevance_score": len(d) / 10.0}
        for i, d in enumerate(body["documents"])
    ]
    return {"results": sorted(results, key=lambda r: -r["relevance_score"])}


def _rerank_provider(ep, **over):
    kw = dict(base_url=ep.base_url, api_key="sk-rr", model="fake-rerank",
              max_retries=2, retry_delay=0.01, timeout=5.0)
    kw.update(over)
    return PR.HTTPRerankProvider(PR.ProviderConfig(**kw))


def test_rerank_wire_shape_and_score_alignment():
    ep = _FakeJSONEndpoint([_rerank_reply])
    try:
        scores = _rerank_provider(ep)("q", ["abc", "a", "abcde"])
        assert scores == [0.3, 0.1, 0.5]  # aligned to document order
        (req,) = ep.requests
        assert req["path"] == "/v1/rerank"
        assert req["body"] == {
            "model": "fake-rerank", "query": "q",
            "documents": ["abc", "a", "abcde"], "top_n": 3,
        }
        assert _rerank_provider(ep)("q", []) == []  # no wire call for empty
    finally:
        ep.close()


def test_rerank_missing_index_is_a_provider_error():
    ep = _FakeJSONEndpoint(
        [lambda body: {"results": [{"index": 0, "relevance_score": 0.5}]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="missing"):
            _rerank_provider(ep)("q", ["a", "b"])
    finally:
        ep.close()


def test_embed_env_gate(monkeypatch):
    monkeypatch.delenv("MEMFUSE_SPARK_EMBED_BASE_URL", raising=False)
    assert PR.embed_provider_from_env() is None
    monkeypatch.setenv("MEMFUSE_SPARK_EMBED_BASE_URL", "http://127.0.0.1:1/v1")
    monkeypatch.setenv("MEMFUSE_SPARK_EMBED_BATCH", "33")
    p = PR.embed_provider_from_env()
    assert isinstance(p, PR.HTTPEmbeddingProvider)
    assert p.config.model == "text-embedding-3-small"
    assert p.config.batch_size == 33


def test_rerank_env_gate(monkeypatch):
    monkeypatch.delenv("MEMFUSE_SPARK_RERANK_BASE_URL", raising=False)
    assert PR.rerank_provider_from_env() is None
    monkeypatch.setenv("MEMFUSE_SPARK_RERANK_BASE_URL", "http://127.0.0.1:1/v1")
    p = PR.rerank_provider_from_env()
    assert isinstance(p, PR.HTTPRerankProvider)
    assert p.config.model == "rerank-english-v3.0"


def test_bind_model_seams_none_gates():
    seams = PR.bind_model_seams(None, None)
    assert seams == {"embedder": None, "scorer": None}


def test_live_embedder_through_backfill_seam_end_to_end(spark):
    """The embed twin of the m2 round-trip test: a real HTTP
    /embeddings call from inside the mapInPandas worker, through the
    SAME dedup-before-encode shape as the deterministic tier — three
    rows, two distinct contents -> the endpoint sees each distinct text
    exactly once."""
    ep = _FakeJSONEndpoint([_embed_reply])
    try:
        seams = PR.bind_model_seams(embed=_embed_provider(ep))
        pending = spark.createDataFrame(
            [(1, "alpha"), (2, "alpha"), (3, "gamma!")], "id long, content string"
        )
        rows = {r.id: r.embedding
                for r in seams["embedder"](pending, "content").collect()}
        assert rows == {1: [5.0, 1.0], 2: [5.0, 1.0], 3: [6.0, 1.0]}
        sent = [t for r in ep.requests for t in r["body"]["input"]]
        assert sorted(sent) == ["alpha", "gamma!"]  # dedup-before-encode
    finally:
        ep.close()


def test_live_scorer_through_rerank_seam_end_to_end(spark):
    """rerank(scorer=) with the live /rerank binding: the pandas_udf
    ships the provider into the worker, one wire call per distinct
    query, scores land on the right rows and set the top-k order."""
    from memfuse_spark.operators.rerank import rerank

    ep = _FakeJSONEndpoint([_rerank_reply])
    try:
        seams = PR.bind_model_seams(rerank=_rerank_provider(ep))
        df = spark.createDataFrame(
            [("d1", "ccc"), ("d2", "eeeee"), ("d3", "a")],
            "id string, content string",
        )
        out = rerank(
            df, "the query", k=2,
            content_col="content", id_col="id", scorer=seams["scorer"],
        ).collect()
        assert [(r.id, r.rerank_score) for r in out] == [
            ("d2", 0.5), ("d1", 0.3)
        ]
        assert {r["body"]["query"] for r in ep.requests} == {"the query"}
    finally:
        ep.close()


def test_embeddings_duplicate_index_is_a_provider_error():
    """Self-review r9: a response whose indices are not a permutation
    of 0..n-1 (duplicate + missing) must raise, not silently misassign
    vectors — the count check alone cannot see it."""
    ep = _FakeJSONEndpoint(
        [lambda body: {"data": [
            {"index": 0, "embedding": [1.0]},
            {"index": 0, "embedding": [1.0]},
        ]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="permutation"):
            _embed_provider(ep)(["a", "b"])
    finally:
        ep.close()


def test_null_embedding_field_is_a_provider_error():
    """Self-review r9: structurally-null fields (embedding: null ->
    map(float, None) TypeError) must surface as the documented
    ProviderError, not a raw TypeError out of the worker."""
    ep = _FakeJSONEndpoint(
        [lambda body: {"data": [{"index": 0, "embedding": None}]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="malformed"):
            _embed_provider(ep)(["a"])
    finally:
        ep.close()


def test_error_messages_name_the_endpoint_family():
    """Self-review r9: a 401 from /embeddings must say /embeddings, not
    'LLM endpoint' — the operator debugging env vars needs the right
    family."""
    ep = _FakeJSONEndpoint([(401, "bad key")])
    try:
        with pytest.raises(PR.ProviderError, match="/embeddings"):
            _embed_provider(ep)(["a"])
    finally:
        ep.close()


def test_rerank_duplicate_index_is_a_provider_error():
    """Self-review r9 (high pass): duplicate rerank indices must raise
    (the dict comprehension would silently keep the last score), and an
    out-of-range extra index must fail the coverage check rather than
    be dropped."""
    dup = _FakeJSONEndpoint(
        [lambda body: {"results": [
            {"index": 0, "relevance_score": 0.9},
            {"index": 0, "relevance_score": 0.1},
            {"index": 1, "relevance_score": 0.5},
        ]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="duplicate"):
            _rerank_provider(dup)("q", ["a", "b"])
    finally:
        dup.close()
    oor = _FakeJSONEndpoint(
        [lambda body: {"results": [
            {"index": 0, "relevance_score": 0.9},
            {"index": 2, "relevance_score": 0.5},
        ]}]
    )
    try:
        with pytest.raises(PR.ProviderError, match="out-of-range"):
            _rerank_provider(oor)("q", ["a", "b"])
    finally:
        oor.close()


def test_chat_only_knobs_ignored_for_non_chat_prefixes(monkeypatch):
    """ADVICE r9: a malformed MEMFUSE_SPARK_EMBED_TEMPERATURE must not
    crash embed_provider_from_env — /embeddings and /rerank never send
    temperature/max_tokens, so from_env(chat=False) skips parsing them
    and keeps the dataclass defaults."""
    monkeypatch.setenv("MEMFUSE_SPARK_EMBED_BASE_URL", "http://127.0.0.1:1/v1")
    monkeypatch.setenv("MEMFUSE_SPARK_EMBED_TEMPERATURE", "not-a-float")
    monkeypatch.setenv("MEMFUSE_SPARK_EMBED_MAX_TOKENS", "NaN-ish")
    p = PR.embed_provider_from_env()
    assert isinstance(p, PR.HTTPEmbeddingProvider)
    assert p.config.temperature == 0.3  # default, env garbage untouched

    monkeypatch.setenv("MEMFUSE_SPARK_RERANK_BASE_URL", "http://127.0.0.1:1/v1")
    monkeypatch.setenv("MEMFUSE_SPARK_RERANK_TEMPERATURE", "')(")
    assert isinstance(PR.rerank_provider_from_env(), PR.HTTPRerankProvider)

    # the chat family DOES use the knob, so there it still raises loudly
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_BASE_URL", "http://127.0.0.1:1/v1")
    monkeypatch.setenv("MEMFUSE_SPARK_LLM_TEMPERATURE", "not-a-float")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        PR.provider_from_env()


def test_scaling_probe_mem_floor_parser_units():
    """ADVICE r9: the SLOT_REQUIRES heap-floor parser must understand
    m/g/GB spellings and degrade to None (warn+skip) on garbage instead
    of killing the probe before any measurement."""
    from tools.scaling_probe import _mem_bytes

    assert _mem_bytes("24g") == 24 * (1 << 30)
    assert _mem_bytes("24576m") == 24 * (1 << 30)
    assert _mem_bytes("24 GB") == 24 * (1 << 30)
    assert _mem_bytes("512k") == 512 * (1 << 10)
    assert _mem_bytes("1073741824b") == 1 << 30
    assert _mem_bytes("0g") == 0.0
    assert _mem_bytes("twenty-four gigs") is None
    assert _mem_bytes("") is None


_LIVE_SMOKE_VARS = ("MEMFUSE_SPARK_EMBED_BASE_URL", "MEMFUSE_SPARK_RERANK_BASE_URL")


@pytest.mark.skipif(
    not all(os.environ.get(v) for v in _LIVE_SMOKE_VARS),
    reason="live-provider smoke is opt-in: set MEMFUSE_SPARK_EMBED_BASE_URL "
    "and MEMFUSE_SPARK_RERANK_BASE_URL (+ API keys) to run it",
)
def test_live_provider_smoke_end_to_end(spark):
    """Once-per-round wire-shape drift canary (VERDICT r9 #7): run the
    REAL env-configured endpoints through both model seams over a
    10-row frame — backfill_embeddings(embedder=live) then
    rerank(scorer=live). Skipped by default; the fake-endpoint tests
    above pin the wire SHAPES every run, this catches a live endpoint
    drifting away from them."""
    from memfuse_spark.operators.backfill import backfill_embeddings
    from memfuse_spark.operators.rerank import rerank

    seams = PR.bind_model_seams(
        PR.embed_provider_from_env(), PR.rerank_provider_from_env()
    )
    assert seams["embedder"] is not None and seams["scorer"] is not None

    texts = [
        "spark shuffles narrow rows", "bucketed stores prune reads",
        "mutual knn bounds degree", "thresholds densify quadratically",
        "epoch writes are idempotent", "arrow batches beat row udfs",
        "broadcast only bounded sides", "salting spreads skewed keys",
        "watermarks bound state", "codegen keeps it on the jvm",
    ]
    frame = spark.createDataFrame(
        [(i, t, True) for i, t in enumerate(texts)],
        "id long, content string, needs_embedding boolean",
    )
    out = backfill_embeddings(frame, embedder=seams["embedder"]).collect()
    assert len(out) == 10
    dims = {len(r.embedding) for r in out}
    assert len(dims) == 1 and dims.pop() > 0  # one real model dim, all rows
    assert all(not r.needs_embedding for r in out)

    ranked = rerank(
        frame.select("id", "content"), "how do i keep a join from skewing",
        k=3, content_col="content", id_col="id", scorer=seams["scorer"],
    ).collect()
    assert len(ranked) == 3
    scores = [r.rerank_score for r in ranked]
    assert scores == sorted(scores, reverse=True)
