"""Scoped cache registry lifecycle (memfuse_spark/cache.py).

The registry's contract: localCheckpoint blocks registered under a
scope survive exactly ONE subsequent begin() — so the previously
RETURNED lazy DataFrame of a scope stays materializable (its lineage
is truncated; a dropped block would be unrecoverable), while older
generations are released and never accumulate.
"""

from memfuse_spark import cache


def _persisted(spark, ids):
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return [i for i in ids if m.containsKey(i)]


def test_checkpoint_id_captured_from_plan(spark):
    # The id must come off the returned plan's LogicalRDD, not a global
    # before/after diff (which misattributes concurrent persists).
    out, ids = cache.tracked_local_checkpoint(spark.range(50), "cache.plan")
    assert len(ids) == 1
    assert cache._plan_rdd_ids(out) == ids
    assert _persisted(spark, ids) == list(ids)
    cache.release("cache.plan")
    assert _persisted(spark, ids) == []


def test_previous_generation_survives_one_begin(spark):
    scope = "cache.gen"
    cache.begin(scope)
    r1, ids1 = cache.tracked_local_checkpoint(spark.range(10), scope)
    cache.begin(scope)
    # r1 was returned lazily by "the previous query" — must still run.
    assert r1.count() == 10
    r2, ids2 = cache.tracked_local_checkpoint(spark.range(20), scope)
    cache.begin(scope)
    # two begins later, r1's generation is gone; r2's survives.
    assert _persisted(spark, ids1) == []
    assert _persisted(spark, ids2) == list(ids2)
    assert r2.count() == 20
    cache.release(scope)
    assert _persisted(spark, ids2) == []


def test_release_all_clears_every_scope(spark):
    _, a = cache.tracked_local_checkpoint(spark.range(5), "cache.a")
    _, b = cache.tracked_local_checkpoint(spark.range(5), "cache.b")
    cache.release_all()
    assert _persisted(spark, a) == [] and _persisted(spark, b) == []

def test_semdedup_scope_rotates_generations(spark):
    """Regression (ADVICE r5): semdedup_clusters must begin() its cache
    scope per call so repeated calls release old corpus-sized
    checkpoints instead of accumulating one per call forever."""
    from memfuse_spark.operators.dedup import semdedup_keep

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0]) for i in range(30)],
        "vec_id long, v array<double>",
    )
    before = len(cache._GENS.get("dedup.semdedup", []))
    for _ in range(3):
        semdedup_keep(emb, id_col="vec_id", vec_col="v", dim=3).count()
    gens = cache._GENS["dedup.semdedup"]
    # begin() keeps at most current + KEEP_PRIOR_GENERATIONS entries
    assert len(gens) <= cache.KEEP_PRIOR_GENERATIONS + 1, (before, len(gens))
    live = [i for (_s, ids) in (p for g in gens for p in g.rdds) for i in ids]
    assert len(_persisted(spark, live)) <= 2 * len(gens)


def test_semdedup_auto_planes_runs_input_subtree_once(spark):
    """Regression (ADVICE r6): num_planes=None must checkpoint the
    (id, vector) projection FIRST and count the checkpointed frame —
    counting the raw input ran the expensive input subtree (e.g. a
    hashed-BoW wordcount aggregation) one extra time per call."""
    import pyspark.sql.functions as F

    from memfuse_spark.operators.dedup import semdedup_keep

    acc = spark.sparkContext.accumulator(0)

    @F.udf("double")
    def counted(x):
        acc.add(1)
        return float(x)

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            counted(F.col("id") % 5),
            (F.col("id") % 7).cast("double"),
            F.lit(1.0),
        ).alias("v"),
    )
    semdedup_keep(
        emb, id_col="vec_id", vec_col="v", dim=3,
        num_planes=None, target_cell_size=10,
    ).count()
    # one evaluation per input row: the subtree ran exactly once (the
    # checkpoint materialization), not again for the planes count nor
    # for any of the four downstream subplans
    assert acc.value == 40, acc.value


def test_semdedup_auto_planes_scales_with_corpus(spark):
    """num_planes=None derives cell count from corpus size (the
    PLANS.md-measured rule): bigger corpora get more cells so the
    within-cell pair work stays ~constant; keep-rule invariants hold
    under the auto mode."""
    import pyspark.sql.functions as F

    from memfuse_spark.operators.dedup import semdedup_keep

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5).cast("double"),
            (F.col("id") % 7).cast("double"),
            F.lit(1.0),
        ).alias("v"),
    )
    out = semdedup_keep(
        emb, id_col="vec_id", vec_col="v", dim=3,
        num_planes=None, target_cell_size=25,
    )
    rows = out.collect()
    assert len(rows) == 200  # one row per vector
    # 200/25 = 8 cells -> 3 planes; at most 2^3 distinct sign-LSH cells
    assert len({r.cell for r in rows}) <= 8
    # keep-rule invariant: exactly one survivor per component
    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    for members in comps.values():
        assert sum(1 for m in members if m.keep) == 1


def test_unpersist_rdd_ids_scrubs_generation_registry(spark):
    """ADVICE r8: ids dropped early at a handoff (the mutual_knn
    celled->split checkpoint pattern) must ALSO leave the scope's
    generation registry, so the later generation release never
    re-issues unpersist on them — double-release was benign only
    because Spark never reuses RDD ids, an invariant the registry no
    longer leans on."""
    cache.begin("t.scrub")
    df1, ids1 = cache.tracked_local_checkpoint(
        spark.range(5).selectExpr("id", "id * 2 as y"), "t.scrub"
    )
    df1.count()
    df2, ids2 = cache.tracked_local_checkpoint(
        df1.selectExpr("id", "y + 1 as z"), "t.scrub"
    )
    df2.count()
    # handoff: the first checkpoint is superseded -> early release
    cache.unpersist_rdd_ids(spark, ids1)
    assert not _persisted(spark, ids1)
    gens = cache._GENS["t.scrub"]
    registered = set().union(*(rids for g in gens for _, rids in g.rdds))
    assert not (registered & set(ids1)), "scrubbed ids still registered"
    assert set(ids2) <= registered, "live ids must stay registered"
    cache.release("t.scrub")
    assert not _persisted(spark, ids2)
