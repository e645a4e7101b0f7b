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


def test_pca_components_match_numpy_top3(spark, tables):
    """Deflation reproduces numpy's top-3 eigenpairs: eigenvalues in
    order, directions aligned, components mutually orthogonal."""
    from memfuse_spark.operators.pca import pca_components

    emb = tables["embeddings"]
    got = pca_components(emb, n_components=3).collect()
    comps = {}
    for r in got:
        comps.setdefault(r["component"], {})[r["pos"]] = (
            r["loading"], r["eigenvalue"]
        )
    x = np.stack([r["embedding"] for r in emb.select("embedding").collect()]
                 ).astype("float64")
    c = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    for k in (1, 2, 3):
        v = np.array([comps[k][i][0] for i in range(c.shape[0])])
        eig = comps[k][0][1]
        assert abs(eig - w[-k]) < 5e-3, (k, eig, w[-k])
        assert abs(abs(v @ vecs[:, -k]) - 1.0) < 5e-2, k
    v1 = np.array([comps[1][i][0] for i in range(c.shape[0])])
    v2 = np.array([comps[2][i][0] for i in range(c.shape[0])])
    v3 = np.array([comps[3][i][0] for i in range(c.shape[0])])
    assert abs(v1 @ v2) < 1e-2 and abs(v1 @ v3) < 1e-2 and abs(v2 @ v3) < 1e-2


def test_embedding_drift_detects_distribution_change(spark, tables):
    """Identical snapshots: aligned loadings, unit eig ratio, zero mean
    shift. A deterministic per-dimension rescale (stretching dim 0)
    rotates the top component and shifts the summary."""
    from pyspark.sql import functions as F

    from memfuse_spark.operators.pca import embedding_drift

    emb = tables["embeddings"]
    same = embedding_drift(emb, emb).collect()[0]
    assert same["loading_cosine"] > 0.99999
    assert abs(same["eig_ratio"] - 1.0) < 1e-4
    assert same["mean_shift"] < 1e-9

    stretched = emb.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * 6.0 + 1.0).otherwise(x),
        ),
    )
    moved = embedding_drift(emb, stretched).collect()[0]
    assert moved["loading_cosine"] < 0.9      # dominant axis rotated
    assert moved["eig_ratio"] > 2.0           # variance scale changed
    assert moved["mean_shift"] > 0.5          # mean moved along dim 0
