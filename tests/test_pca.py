"""Distributed PCA top component."""

from __future__ import annotations

import numpy as np


def test_pca_top_matches_numpy_eig(spark, tables):
    """Loadings/eigenvalue agree with numpy's exact eigendecomposition
    of the same covariance (up to sign and power-iteration tolerance)."""
    from memfuse_spark.operators.pca import pca_top_component

    emb = tables["embeddings"]
    got = pca_top_component(emb).collect()
    v = np.array([r["loading"] for r in sorted(got, key=lambda r: r["pos"])])
    eig_got = got[0]["eigenvalue"]

    x = np.stack([r["embedding"] for r in emb.select("embedding").collect()]
                 ).astype("float64")
    c = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    assert abs(eig_got - w[-1]) < 1e-3
    assert np.abs(np.abs(v @ top) - 1.0) < 1e-3  # same direction
    assert np.allclose(v, top, atol=5e-3)


def test_covariance_entries_symmetric_and_match_numpy(spark, tables):
    from memfuse_spark.operators.pca import covariance_entries

    emb = tables["embeddings"]
    entries = {(r["i"], r["j"]): r["cov"]
               for r in covariance_entries(emb).collect()}
    x = np.stack([r["embedding"] for r in emb.select("embedding").collect()]
                 ).astype("float64")
    c = np.cov(x, rowvar=False, bias=True)
    d = c.shape[0]
    for i in range(0, d, 7):
        for j in range(0, d, 7):
            assert abs(entries[(i, j)] - c[i, j]) < 1e-9
            assert abs(entries[(i, j)] - entries[(j, i)]) < 1e-12
