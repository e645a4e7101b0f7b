"""Env-gated live LLM provider adapter for the engine's five seams.

This closes the last capability gap vs the reference: every seam
(``m2_facts_from_m1(extractor=)``, ``fact_conflicts(detector=)``,
``fact_validation(validator=)``, ``m1_from_m0(former=)``,
``contextual_chunks(enhancer=)``) and the prompt/parse contract twin
(`memfuse_spark.prompts`) already exist and are injection-tested; the
only missing piece was a live ``prompt -> response_text`` binding.

Reference behavior being re-expressed (public wire format only):

- ``llm/providers/openai.py:22-140`` — an OpenAI-compatible
  chat-completions client: POST ``{base_url}/chat/completions`` with
  ``{"model", "messages", "temperature", "max_tokens"}``, read
  ``choices[0].message.content``.
- ``llm/config.py:46-66`` (``LLMConfig.from_env``) — provider
  selection, model, temperature, max_tokens, timeout, retry policy all
  sourced from environment variables; unset -> defaults.
- ``llm/base.py:120-180`` retry ladder — bounded retries with
  exponential backoff on rate-limit / transient errors.
- ``llm/providers/__init__.py`` mock mode — a no-network provider for
  tests.

Design constraints, Spark-first:

- **stdlib only** (``urllib.request``): the container ships no
  ``openai``/``httpx``; a real cluster would have them, but the wire
  format is 30 lines of JSON either way and zero deps means the module
  imports everywhere.
- **Picklable + executor-lazy**: the provider object holds only plain
  config fields, so it serializes into the seams' Arrow-batched
  ``mapInPandas`` workers; each worker opens its own connections
  (connection state is never pickled). One LLM call per chunk — the
  same cost shape as the reference's per-chunk calls.
- **Gated, never default**: ``provider_from_env()`` returns ``None``
  unless ``MEMFUSE_SPARK_LLM_BASE_URL`` is set, so every oracle-checked
  query keeps the deterministic tier (the documented
  no-inference-runtime decision in ``models.py`` stands); a deployment
  flips the env vars and passes the provider through the seams.

Env vars (unset -> default):

- ``MEMFUSE_SPARK_LLM_BASE_URL``  (required to enable; e.g.
  ``https://api.openai.com/v1`` or any OpenAI-compatible endpoint)
- ``MEMFUSE_SPARK_LLM_API_KEY``   (optional; sent as Bearer token)
- ``MEMFUSE_SPARK_LLM_MODEL``     (default ``gpt-4o-mini``)
- ``MEMFUSE_SPARK_LLM_TEMPERATURE`` (default ``0.3``)
- ``MEMFUSE_SPARK_LLM_MAX_TOKENS``  (default ``150``; ``0`` -> omit)
- ``MEMFUSE_SPARK_LLM_TIMEOUT``     (default ``30`` seconds)
- ``MEMFUSE_SPARK_LLM_MAX_RETRIES`` (default ``3``)
- ``MEMFUSE_SPARK_LLM_RETRY_DELAY`` (default ``1.0`` seconds)
- ``MEMFUSE_SPARK_LLM_BACKOFF``     (default ``2.0``)
- ``MEMFUSE_SPARK_LLM_MIN_INTERVAL`` (default ``0``; per-process
  request spacing in seconds — the rate-limit knob, applied
  per executor worker)

The embed/rerank model tier (reference ``rag/encode/MiniLM.py:139-221``
and ``rag/rerank/MiniLM.py:141-260``) has the same env-gated live
binding: ``MEMFUSE_SPARK_EMBED_*`` configures an OpenAI-wire
``/embeddings`` client (``_BASE_URL`` gates it on; ``_MODEL`` default
``text-embedding-3-small``; ``_BATCH`` caps texts per request, default
``256``; the retry/timeout family is identical to the LLM one), and
``MEMFUSE_SPARK_RERANK_*`` a Cohere/Jina-wire ``/rerank`` client
(``_MODEL`` default ``rerank-english-v3.0``). ``bind_model_seams``
wraps them into the two model seam callables
(``backfill_embeddings(embedder=)``, ``rerank(scorer=)``); with the env
unset every gate returns None and the deterministic seeded-projection
tier in ``models.py`` remains the default.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Any, Callable, Optional


class ProviderError(RuntimeError):
    """Raised when the provider exhausts its retries or the endpoint
    returns a non-retryable error (reference LLMProviderError)."""


# HTTP statuses worth retrying: rate limit + transient server errors
# (reference maps 429 -> LLMRateLimitError and retries with backoff).
_RETRYABLE = {429, 500, 502, 503, 504}


@dataclass
class ProviderConfig:
    """Plain-field config, picklable into executors
    (reference ``llm/config.py`` LLMConfig, env-sourced subset).

    One config shape serves all three wire clients (chat / embeddings /
    rerank); ``from_env`` takes the env-var prefix so each client gates
    on its own variable family (``MEMFUSE_SPARK_LLM_*``,
    ``MEMFUSE_SPARK_EMBED_*``, ``MEMFUSE_SPARK_RERANK_*``)."""

    base_url: str = ""
    api_key: str = ""
    model: str = "gpt-4o-mini"
    temperature: float = 0.3
    max_tokens: int = 150
    timeout: float = 30.0
    max_retries: int = 3
    retry_delay: float = 1.0
    backoff_factor: float = 2.0
    min_interval: float = 0.0
    # max texts per /embeddings request: public endpoints cap request
    # size, so one Arrow batch may need several wire calls
    batch_size: int = 256

    @classmethod
    def from_env(
        cls,
        prefix: str = "MEMFUSE_SPARK_LLM",
        default_model: str = "gpt-4o-mini",
        chat: bool = True,
    ) -> "ProviderConfig":
        """Parse the ``{prefix}_*`` variable family. Chat-only knobs
        (temperature, max_tokens) are skipped for non-chat prefixes
        (``chat=False``): /embeddings and /rerank never send them, so a
        malformed MEMFUSE_SPARK_EMBED_TEMPERATURE must not be able to
        crash embed_provider_from_env."""
        e = os.environ.get
        kw: dict[str, Any] = {}
        if chat:
            kw["temperature"] = float(e(f"{prefix}_TEMPERATURE", "0.3"))
            kw["max_tokens"] = int(e(f"{prefix}_MAX_TOKENS", "150"))
        return cls(
            base_url=e(f"{prefix}_BASE_URL", ""),
            api_key=e(f"{prefix}_API_KEY", ""),
            model=e(f"{prefix}_MODEL", default_model),
            timeout=float(e(f"{prefix}_TIMEOUT", "30")),
            max_retries=int(e(f"{prefix}_MAX_RETRIES", "3")),
            retry_delay=float(e(f"{prefix}_RETRY_DELAY", "1.0")),
            backoff_factor=float(e(f"{prefix}_BACKOFF", "2.0")),
            min_interval=float(e(f"{prefix}_MIN_INTERVAL", "0")),
            batch_size=int(e(f"{prefix}_BATCH", "256")),
            **kw,
        )


class _HTTPProviderBase:
    """Shared machinery of the three wire clients (chat / embeddings /
    rerank): Bearer-auth JSON POST, per-process throttle, and the
    reference retry ladder (429/5xx backoff, Retry-After hint,
    transport-error retry, malformed-body -> ProviderError).

    Instances are picklable (config fields only; the per-process
    throttle clock is rebuilt lazily after unpickling), so they pass
    straight through the seam adapters into Arrow-batched
    mapInPandas workers. Subclasses set ``endpoint_path`` and a
    ``_parse(payload)`` for their response shape.
    """

    endpoint_path = "/override-me"

    def __init__(self, config: ProviderConfig):
        if not config.base_url:
            raise ProviderError("base_url is required")
        self.config = config
        self._last_request_t = 0.0

    # -- pickling: drop the throttle clock, it is per-process state
    def __getstate__(self):
        return {"config": self.config}

    def __setstate__(self, state):
        self.config = state["config"]
        self._last_request_t = 0.0

    def _throttle(self) -> None:
        if self.config.min_interval <= 0:
            return
        wait = self.config.min_interval - (time.monotonic() - self._last_request_t)
        if wait > 0:
            time.sleep(wait)
        self._last_request_t = time.monotonic()

    def _parse(self, payload: dict) -> Any:
        raise NotImplementedError

    def _post_once(self, data: bytes) -> Any:
        url = self.config.base_url.rstrip("/") + self.endpoint_path
        headers = {"Content-Type": "application/json"}
        if self.config.api_key:
            headers["Authorization"] = f"Bearer {self.config.api_key}"
        req = urllib.request.Request(url, data=data, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.config.timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return self._parse(payload)

    def _request(self, body: dict[str, Any]) -> Any:
        data = json.dumps(body).encode("utf-8")
        delay = self.config.retry_delay
        last_err: Exception | None = None
        for attempt in range(self.config.max_retries + 1):
            self._throttle()
            try:
                return self._post_once(data)
            except urllib.error.HTTPError as err:
                if err.code not in _RETRYABLE:
                    raise ProviderError(
                        f"{self.endpoint_path} endpoint returned "
                        f"HTTP {err.code}"
                    ) from err
                last_err = err
                # rate-limit hint wins over the backoff schedule.
                # Retry-After is delta-seconds OR an RFC 9110 HTTP-date
                # — a non-numeric value must fall back to the backoff
                # schedule, not escape as a ValueError mid-retry.
                retry_after = err.headers.get("Retry-After") if err.headers else None
                sleep_s = delay
                if retry_after:
                    try:
                        # clamp: a negative value would make
                        # time.sleep raise, and a huge one would stall
                        # the executor worker — the hint is advisory.
                        # DOCUMENTED TRADEOFF (ADVICE r8): a server
                        # legitimately asking for > 60s gets retried
                        # early, and that premature attempt consumes a
                        # rung of the finite ladder. Deliberate: each
                        # provider call sits inside a mapInPandas
                        # worker holding an executor slot — sleeping
                        # minutes per hint (or exempting 429-with-hint
                        # from the budget, letting a saturated endpoint
                        # pin workers indefinitely) costs the cluster
                        # more than the retried request. Deployments
                        # that want longer waits raise the provider
                        # family's _MAX_RETRIES / _RETRY_DELAY env
                        # vars instead (LLM / EMBED / RERANK alike).
                        sleep_s = min(max(0.0, float(retry_after)), 60.0)
                    except ValueError:
                        try:
                            from datetime import timezone
                            from email.utils import parsedate_to_datetime

                            dt = parsedate_to_datetime(retry_after)
                            if dt.tzinfo is None:
                                # '-0000' (unknown zone) parses naive;
                                # RFC 9110 HTTP-dates are GMT — a naive
                                # .timestamp() would apply the HOST
                                # zone and skew the sleep by its UTC
                                # offset
                                dt = dt.replace(tzinfo=timezone.utc)
                            # bound a far-future date: a retry hint,
                            # not a schedule the worker should honor
                            sleep_s = min(
                                max(0.0, dt.timestamp() - time.time()),
                                60.0,
                            )
                        except (TypeError, ValueError, OverflowError):
                            pass  # unparseable hint: keep the schedule
            except (urllib.error.URLError, TimeoutError, ConnectionError) as err:
                last_err = err  # transient transport error
                sleep_s = delay
            except (
                KeyError, IndexError, TypeError,
                json.JSONDecodeError, ValueError,
            ) as err:
                # TypeError included: structurally-null fields (e.g.
                # "embedding": null -> map(float, None)) must surface as
                # the documented ProviderError, not a raw TypeError out
                # of the mapInPandas worker
                raise ProviderError(f"malformed provider response: {err}") from err
            if attempt < self.config.max_retries:
                time.sleep(sleep_s)
                delay *= self.config.backoff_factor
        raise ProviderError(
            f"{self.endpoint_path} request failed "
            f"after {self.config.max_retries + 1} attempts"
        ) from last_err


class HTTPChatProvider(_HTTPProviderBase):
    """``prompt -> response_text`` against any OpenAI-compatible
    chat-completions endpoint, stdlib-only
    (reference ``llm/providers/openai.py:22-140``)."""

    endpoint_path = "/chat/completions"

    def _parse(self, payload: dict) -> str:
        content = payload["choices"][0]["message"]["content"]
        return content if content is not None else ""

    def __call__(self, prompt: str) -> str:
        body: dict[str, Any] = {
            "model": self.config.model,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": self.config.temperature,
        }
        if self.config.max_tokens:
            body["max_tokens"] = self.config.max_tokens
        return self._request(body)


class HTTPEmbeddingProvider(_HTTPProviderBase):
    """``texts -> vectors`` against any OpenAI-compatible
    ``/embeddings`` endpoint, stdlib-only.

    The live twin of the reference's MiniLM encode tier
    (``rag/encode/MiniLM.py:139-221``): POST ``{base_url}/embeddings``
    with ``{"model", "input": [texts]}``, read ``data[*].embedding``
    re-ordered by ``data[*].index`` (the response order is not
    guaranteed to match the input order). Inputs beyond
    ``config.batch_size`` are split across several wire calls — public
    endpoints cap per-request input counts — and each sub-request rides
    the full retry ladder independently.
    """

    endpoint_path = "/embeddings"

    def _parse(self, payload: dict) -> list:
        items = sorted(payload["data"], key=lambda d: d["index"])
        # index coverage must be exactly 0..n-1: a duplicate/missing
        # index that keeps the COUNT intact would otherwise silently
        # misassign vectors to texts (the rerank client has the same
        # guard; caught by the ladder's malformed-body clause)
        if [d["index"] for d in items] != list(range(len(items))):
            raise ValueError(
                "embeddings response indices are not a permutation of "
                "the input positions"
            )
        return [list(map(float, d["embedding"])) for d in items]

    def __call__(self, texts: "list[str]") -> "list[list[float]]":
        texts = list(texts)
        out: list[list[float]] = []
        step = max(1, self.config.batch_size)
        for lo in range(0, len(texts), step):
            chunk = texts[lo : lo + step]
            vecs = self._request({"model": self.config.model, "input": chunk})
            if len(vecs) != len(chunk):
                raise ProviderError(
                    f"embeddings endpoint returned {len(vecs)} vectors "
                    f"for {len(chunk)} inputs"
                )
            out.extend(vecs)
        return out


class HTTPRerankProvider(_HTTPProviderBase):
    """``(query, documents) -> relevance scores`` against a
    Cohere/Jina-wire ``/rerank`` endpoint, stdlib-only.

    The live twin of the reference's cross-encoder rerank tier
    (``rag/rerank/MiniLM.py:141-260``): POST ``{base_url}/rerank`` with
    ``{"model", "query", "documents": [...], "top_n": len(documents)}``,
    read ``results[*].relevance_score`` keyed by ``results[*].index``.
    ``top_n`` is pinned to the full document count because the seam
    contract is one score per (query, content) pair — the engine's own
    top-k happens plan-side.
    """

    endpoint_path = "/rerank"

    def _parse(self, payload: dict) -> dict:
        pairs = [
            (int(r["index"]), float(r["relevance_score"]))
            for r in payload["results"]
        ]
        idxs = [i for i, _ in pairs]
        # duplicate indices would silently keep whichever score comes
        # last — same guard class as the embeddings permutation check
        # (caught by the ladder's malformed-body clause)
        if len(set(idxs)) != len(idxs):
            raise ValueError("rerank response contains duplicate indices")
        return dict(pairs)

    def __call__(self, query: str, documents: "list[str]") -> "list[float]":
        documents = list(documents)
        if not documents:
            return []
        by_index = self._request(
            {
                "model": self.config.model,
                "query": query,
                "documents": documents,
                "top_n": len(documents),
            }
        )
        # exact coverage: every document position scored once, no
        # out-of-range extras (top_n == len(documents) on the wire)
        if sorted(by_index) != list(range(len(documents))):
            missing = [i for i in range(len(documents)) if i not in by_index]
            extras = [i for i in by_index if not 0 <= i < len(documents)]
            raise ProviderError(
                f"rerank endpoint index coverage is wrong (missing "
                f"{missing[:5]}, out-of-range {extras[:5]})"
            )
        return [by_index[i] for i in range(len(documents))]


class MockChatProvider:
    """No-network provider (reference mock mode): replays canned
    responses in order, then repeats the last one. For tests and
    dry-runs of the build->call->parse seam path."""

    def __init__(self, responses: list[str]):
        if not responses:
            raise ProviderError("MockChatProvider needs >= 1 response")
        self.responses = list(responses)
        self.calls: list[str] = []

    def __call__(self, prompt: str) -> str:
        self.calls.append(prompt)
        i = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[i]


def provider_from_env() -> Optional[HTTPChatProvider]:
    """The gate: a configured provider iff MEMFUSE_SPARK_LLM_BASE_URL
    is set, else None (deterministic tier stays the default)."""
    config = ProviderConfig.from_env()
    return HTTPChatProvider(config) if config.base_url else None


def embed_provider_from_env() -> Optional[HTTPEmbeddingProvider]:
    """The embed gate: a configured /embeddings client iff
    MEMFUSE_SPARK_EMBED_BASE_URL is set, else None (models.py's
    deterministic seeded-projection tier stays the default — it is what
    keeps the embedding queries oracle-checkable)."""
    config = ProviderConfig.from_env(
        "MEMFUSE_SPARK_EMBED", default_model="text-embedding-3-small",
        chat=False,
    )
    return HTTPEmbeddingProvider(config) if config.base_url else None


def rerank_provider_from_env() -> Optional[HTTPRerankProvider]:
    """The rerank gate: a configured /rerank client iff
    MEMFUSE_SPARK_RERANK_BASE_URL is set, else None."""
    config = ProviderConfig.from_env(
        "MEMFUSE_SPARK_RERANK", default_model="rerank-english-v3.0",
        chat=False,
    )
    return HTTPRerankProvider(config) if config.base_url else None


def bind_seams(llm: Callable[[str], str], **adapter_kwargs: Any) -> dict[str, Any]:
    """Wrap one ``prompt -> text`` provider into all five seam
    callables via the real prompt/parse contract. Keys match the seam
    keyword names, so call sites can splat the slice they need::

        seams = bind_seams(provider_from_env())
        m2_facts_from_m1(m1, extractor=seams["extractor"])

    ``adapter_kwargs`` forwards per-adapter options (``user_id=``,
    ``min_confidence=``, ...) to ``prompts.llm_extractor``; the other
    adapters take no options today.
    """
    from memfuse_spark import prompts

    return {
        "extractor": prompts.llm_extractor(llm, **adapter_kwargs),
        "detector": prompts.llm_detector(llm),
        "validator": prompts.llm_validator(llm),
        "former": prompts.llm_former(llm),
        "enhancer": prompts.llm_enhancer(llm),
    }


def bind_model_seams(
    embed: Optional[HTTPEmbeddingProvider] = None,
    rerank: Optional[HTTPRerankProvider] = None,
) -> dict[str, Any]:
    """The model-tier sibling of :func:`bind_seams`: wrap the live
    embed/rerank providers into the two model seam callables
    (``backfill_embeddings(embedder=)`` and ``rerank(scorer=)``).
    Keys match the seam keyword names::

        seams = bind_model_seams(embed_provider_from_env(),
                                 rerank_provider_from_env())
        if seams["embedder"]:
            backfill_embeddings(store, pending, embedder=seams["embedder"])

    A key is None when its provider is None (env unset), so callers
    fall through to the deterministic tier without branching on env
    vars themselves.
    """
    from memfuse_spark import models

    return {
        "embedder": models.make_live_embedder(embed) if embed else None,
        "scorer": models.make_live_cross_encoder(rerank) if rerank else None,
    }
