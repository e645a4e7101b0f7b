"""Property-based tests (hypothesis) for the pure-Python twins of the
engine's core algorithms — the determinism upgrade over the reference's
example-only test strategy (SURVEY.md §5)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from memfuse_spark.operators.chunking import character_chunks_py, word_budget_groups_py
from memfuse_spark.operators.keyword import _py_tokenize
from memfuse_spark.operators.rerank import _stub_scorer

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=500
)


@given(st.lists(st.integers(min_value=0, max_value=1000), max_size=50),
       st.integers(min_value=1, max_value=500))
def test_word_budget_groups_invariants(counts, budget):
    gids = word_budget_groups_py(counts, budget)
    assert len(gids) == len(counts)
    # group ids are 0-based, consecutive, non-decreasing
    assert gids == sorted(gids)
    if gids:
        assert gids[0] == 0
        assert set(gids) == set(range(max(gids) + 1))
    # a group exceeds the budget only if it is a single oversized message
    sums: dict[int, int] = {}
    sizes: dict[int, int] = {}
    for g, c in zip(gids, counts):
        sums[g] = sums.get(g, 0) + c
        sizes[g] = sizes.get(g, 0) + 1
    for g, s in sums.items():
        assert s <= budget or sizes[g] == 1


@given(texts, st.integers(min_value=20, max_value=300))
@settings(max_examples=50)
def test_character_chunks_cover_and_bound(text, size):
    overlap = size // 10
    chunks = character_chunks_py(text, size=size, overlap=overlap)
    if not text:
        assert chunks == []
        return
    assert all(len(c) <= size for c in chunks)
    assert all(c for c in chunks)  # no empty chunks
    # every chunk is a substring; the last chunk reaches the end
    assert all(c in text for c in chunks)
    assert text.endswith(chunks[-1])
    # forward progress: total coverage at least len(text)
    assert sum(len(c) for c in chunks) >= len(text) - overlap * len(chunks)


@given(texts)
@settings(max_examples=100)
def test_tokenizer_contract(text):
    toks = _py_tokenize(text)
    assert all(toks), "no empty tokens"
    assert all(re.fullmatch(r"[a-z0-9]+", t) for t in toks)
    # idempotent under lowercasing
    assert _py_tokenize(text.lower()) == toks


@given(st.lists(st.text(max_size=50), min_size=1, max_size=20), st.text(max_size=50))
def test_stub_scorer_range_and_determinism(contents, query):
    s1 = _stub_scorer([query] * len(contents), contents)
    s2 = _stub_scorer([query] * len(contents), contents)
    assert s1 == s2
    assert all(0.0 <= x <= 1.0 for x in s1)


@given(st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                          allow_infinity=False), min_size=2, max_size=64))
def test_python_norm_matches_sequential_fold(vec):
    """The driver-side query-norm shortcut in similarity_topk must equal
    the sequential fold the Spark expression would compute."""
    qn = 0.0
    for x in vec:
        qn += float(x) * float(x)
    qn = math.sqrt(qn)
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    assert qn == math.sqrt(acc)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    filter_type=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, filter_type, seed):
    """decode_png(encode_png(img, f)) == img for ANY uint8 RGB image and
    any of the five scanline filters — the full codec contract, driver-
    side (no Spark)."""
    import numpy as np

    from memfuse_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type)), img)


@given(
    freq=st.floats(min_value=20.0, max_value=2000.0),
    n=st.integers(min_value=2, max_value=4000),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(freq, n):
    """decode_wav inverts the stdlib wave writer for arbitrary PCM16
    sines: sample count, rate, and waveform within 1-LSB quantization."""
    import io
    import wave

    import numpy as np

    from memfuse_spark.operators.multimodal import decode_wav

    t = np.arange(n) / 8000.0
    x = np.sin(2 * np.pi * freq * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes((x * 32767).astype("<i2").tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert rate == 8000 and len(got) == n
    assert np.max(np.abs(got - (x * 32767).astype("<i2") / 32768.0)) < 1e-9


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    colors=st.integers(min_value=1, max_value=256),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_property(h, w, colors, seed):
    """decode_gif(encode_gif(img)) == img for ANY paletted (<=256-color)
    uint8 RGB image — GIF is lossless on its palette domain."""
    import numpy as np

    from memfuse_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, colors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)
