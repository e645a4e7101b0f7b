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
    (reference ``llm/config.py`` LLMConfig, env-sourced subset)."""

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

    @classmethod
    def from_env(cls) -> "ProviderConfig":
        e = os.environ.get
        return cls(
            base_url=e("MEMFUSE_SPARK_LLM_BASE_URL", ""),
            api_key=e("MEMFUSE_SPARK_LLM_API_KEY", ""),
            model=e("MEMFUSE_SPARK_LLM_MODEL", "gpt-4o-mini"),
            temperature=float(e("MEMFUSE_SPARK_LLM_TEMPERATURE", "0.3")),
            max_tokens=int(e("MEMFUSE_SPARK_LLM_MAX_TOKENS", "150")),
            timeout=float(e("MEMFUSE_SPARK_LLM_TIMEOUT", "30")),
            max_retries=int(e("MEMFUSE_SPARK_LLM_MAX_RETRIES", "3")),
            retry_delay=float(e("MEMFUSE_SPARK_LLM_RETRY_DELAY", "1.0")),
            backoff_factor=float(e("MEMFUSE_SPARK_LLM_BACKOFF", "2.0")),
            min_interval=float(e("MEMFUSE_SPARK_LLM_MIN_INTERVAL", "0")),
        )


class HTTPChatProvider:
    """``prompt -> response_text`` against any OpenAI-compatible
    chat-completions endpoint, stdlib-only.

    Instances are picklable (config fields only; the per-process
    throttle clock is rebuilt lazily after unpickling), so they pass
    straight through ``prompts.llm_extractor`` et al. into the seams'
    mapInPandas workers.
    """

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

    def _request_body(self, prompt: str) -> bytes:
        body: dict[str, Any] = {
            "model": self.config.model,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": self.config.temperature,
        }
        if self.config.max_tokens:
            body["max_tokens"] = self.config.max_tokens
        return json.dumps(body).encode("utf-8")

    def _post_once(self, data: bytes) -> str:
        url = self.config.base_url.rstrip("/") + "/chat/completions"
        headers = {"Content-Type": "application/json"}
        if self.config.api_key:
            headers["Authorization"] = f"Bearer {self.config.api_key}"
        req = urllib.request.Request(url, data=data, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.config.timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        content = payload["choices"][0]["message"]["content"]
        return content if content is not None else ""

    def __call__(self, prompt: str) -> str:
        data = self._request_body(prompt)
        delay = self.config.retry_delay
        last_err: Exception | None = None
        for attempt in range(self.config.max_retries + 1):
            self._throttle()
            try:
                return self._post_once(data)
            except urllib.error.HTTPError as err:
                if err.code not in _RETRYABLE:
                    raise ProviderError(
                        f"LLM endpoint returned HTTP {err.code}"
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
                        # that want longer waits raise
                        # MEMFUSE_SPARK_LLM_MAX_RETRIES /
                        # _RETRY_DELAY instead.
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
            except (KeyError, IndexError, json.JSONDecodeError, ValueError) as err:
                raise ProviderError(f"malformed provider response: {err}") from err
            if attempt < self.config.max_retries:
                time.sleep(sleep_s)
                delay *= self.config.backoff_factor
        raise ProviderError(
            f"LLM request failed after {self.config.max_retries + 1} attempts"
        ) from last_err


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
