"""MSMG — the reference's Multi-Scale Mental Graph as Spark tables
(reference ``store/pgai_store/schemas/msmg.sql:9-50`` msmg_instances,
``:55-90`` msmg_ontology, ``:95-122`` msmg_relations).

Two layers:

- **Instance layer** (contextual knowledge graph): one instance row per
  extracted entity and per extracted relation/fact, with the schema's
  lineage arrays ``parent_instances`` / ``child_instances`` /
  ``related_instances`` (msmg.sql:31-33) as real ``array<string>``
  columns — traversed J7-style (explode + equi-join), exactly like the
  m0/m1 lineage path.
- **Ontology layer**: a class hierarchy with ``parent_class_id``,
  ``root_class`` and ``hierarchy_level`` (msmg.sql:66-69). The reference
  never populates it from data; here a deterministic classifier maps
  every instance to a leaf class so the cross-layer edge
  (``ontology_class_id``, msmg.sql:28) is exercised end-to-end.

Scale notes (100 TB): instances grow with the corpus and stay fully
distributed (derived from the m2 pipeline with wordcount-shaped
shuffles). The ontology is organizationally small (thousands of classes
at most) — its transitive-ancestor closure is ``max_depth`` broadcast
self-joins built once and broadcast into the instance rollup, so the
rollup costs ONE instance-side aggregation regardless of hierarchy
shape. Lineage traversals are equi-joins on instance_id and would ride
an id-bucketed instance table exactly like the graph edge store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# class_id, description, parent_class_id, root_class, hierarchy_level
# (msmg.sql:55-69 columns; fixed two-level taxonomy under one root)
ONTOLOGY_CLASSES = [
    ("thing", "root of the mental-graph ontology", None, True, 0),
    ("entity", "entity classes", "thing", False, 1),
    ("relation", "relation classes", "thing", False, 1),
    ("numeric", "numeric token entity", "entity", False, 2),
    ("short_term", "lexical entity of at most 4 chars", "entity", False, 2),
    ("long_term", "lexical entity of more than 4 chars", "entity", False, 2),
    ("co_occurrence", "token co-occurrence relation", "relation", False, 2),
]

_ONTOLOGY_SCHEMA = (
    "class_id string, class_description string, parent_class_id string, "
    "root_class boolean, hierarchy_level int"
)


def ontology(spark) -> DataFrame:
    """The ontology-layer table (msmg_ontology twin)."""
    return spark.createDataFrame(ONTOLOGY_CLASSES, _ONTOLOGY_SCHEMA)


def ontology_closure(onto: DataFrame, max_depth: int = 2) -> DataFrame:
    """Transitive self+ancestor closure of the class hierarchy as
    (class_id, ancestor_id) pairs — the rollup join table.

    ``max_depth`` bounded iteration (the ontology's hierarchy_level cap,
    a plan-time constant): each step is a self-join of the tiny class
    table, so the closure is broadcast-sized however deep the taxonomy.
    """
    parents = onto.select(
        F.col("class_id").alias("__c"), F.col("parent_class_id").alias("__p")
    )
    out = onto.select("class_id", F.col("class_id").alias("ancestor_id"))
    frontier = onto.select(
        "class_id", F.col("parent_class_id").alias("ancestor_id")
    ).filter(F.col("ancestor_id").isNotNull())
    for _ in range(max_depth):
        out = out.unionByName(frontier)
        frontier = (
            frontier.join(parents, frontier.ancestor_id == parents.__c)
            .select("class_id", F.col("__p").alias("ancestor_id"))
            .filter(F.col("ancestor_id").isNotNull())
        )
    return out


def classify_entity(col):
    """Deterministic instance→ontology-class mapping (the cross-layer
    edge msmg.sql:28): numeric tokens, short lexical terms (≤ 4 chars),
    long lexical terms."""
    return (
        F.when(col.rlike("^[0-9]+$"), F.lit("numeric"))
        .when(F.length(col) <= 4, F.lit("short_term"))
        .otherwise(F.lit("long_term"))
    )


def instances_from_m2(m2: DataFrame) -> DataFrame:
    """The instance-layer table (msmg_instances twin) from M2 semantic
    facts: one 'relation' instance per fact and one 'entity' instance
    per fact entity, wired together through the schema's lineage arrays
    (msmg.sql:31-33) —

    - relation.child_instances  = its entity instances
    - entity.parent_instances   = [its relation instance]
    - entity.related_instances  = its sibling entity instances

    Expects the m2_facts_from_m1 shape: (chunk_id, conversation_id,
    fact_content, entities array<string>, confidence).
    """
    empty = F.array().cast("array<string>")
    fact_iid = F.concat(F.col("chunk_id"), F.lit(":fact"))
    ent_iid = lambda e: F.concat(F.col("chunk_id"), F.lit(":"), e)  # noqa: E731

    rel = m2.select(
        fact_iid.alias("instance_id"),
        F.lit("relation").alias("instance_type"),
        F.col("fact_content").alias("instance_name"),
        F.col("conversation_id").alias("context_id"),
        F.lit("m2").alias("source_layer"),
        F.col("chunk_id").alias("source_id"),
        F.col("confidence").alias("source_confidence"),
        F.lit("co_occurrence").alias("ontology_class_id"),
        empty.alias("parent_instances"),
        F.transform("entities", ent_iid).alias("child_instances"),
        empty.alias("related_instances"),
    )
    ent = m2.select(
        "chunk_id",
        "conversation_id",
        "confidence",
        "entities",
        F.explode("entities").alias("entity"),
    ).select(
        ent_iid(F.col("entity")).alias("instance_id"),
        F.lit("entity").alias("instance_type"),
        F.col("entity").alias("instance_name"),
        F.col("conversation_id").alias("context_id"),
        F.lit("m2").alias("source_layer"),
        F.col("chunk_id").alias("source_id"),
        F.col("confidence").alias("source_confidence"),
        classify_entity(F.col("entity")).alias("ontology_class_id"),
        F.array(fact_iid).alias("parent_instances"),
        empty.alias("child_instances"),
        F.transform(
            F.filter("entities", lambda e: e != F.col("entity")), ent_iid
        ).alias("related_instances"),
    )
    return ent.unionByName(rel)


def rollup_by_class(instances: DataFrame, onto: DataFrame) -> DataFrame:
    """Instance→ontology rollup: every instance counts toward its class
    AND every ancestor class (so the root row totals the whole instance
    layer). One instance-side aggregation after a broadcast join with
    the closure — the hierarchy never shuffles the big side."""
    closure = ontology_closure(onto)
    return (
        instances.join(
            F.broadcast(closure),
            instances.ontology_class_id == closure.class_id,
        )
        .join(
            F.broadcast(
                onto.select(
                    F.col("class_id").alias("ancestor_id"),
                    "hierarchy_level",
                )
            ),
            "ancestor_id",
        )
        .groupBy("ancestor_id", "hierarchy_level")
        .agg(
            F.count("*").cast("long").alias("n_instances"),
            F.countDistinct("context_id").cast("long").alias("n_contexts"),
            F.round(F.avg("source_confidence"), 6).alias("mean_confidence"),
        )
        .select(
            F.col("ancestor_id").alias("class_id"),
            "hierarchy_level",
            "n_instances",
            "n_contexts",
            "mean_confidence",
        )
        .orderBy("hierarchy_level", "class_id")
    )


def cross_layer_neighborhood(instances: DataFrame) -> DataFrame:
    """Cross-layer 1-hop neighborhood off the lineage arrays: for every
    entity instance, its sibling entity instances (via
    ``related_instances``, J7 explode + equi-join) with BOTH sides'
    ontology classes and the connecting relation instance — the
    "related memories with their classes" read the two-layer schema
    exists for."""
    seeds = instances.filter(F.col("instance_type") == "entity").select(
        F.col("instance_id"),
        F.col("instance_name"),
        F.col("ontology_class_id").alias("instance_class"),
        F.col("context_id"),
        F.element_at("parent_instances", 1).alias("via_relation"),
        F.explode("related_instances").alias("neighbor_id"),
    )
    nbrs = instances.select(
        F.col("instance_id").alias("neighbor_id"),
        F.col("instance_name").alias("neighbor_name"),
        F.col("ontology_class_id").alias("neighbor_class"),
    )
    return seeds.join(nbrs, "neighbor_id").select(
        "instance_id",
        "instance_name",
        "instance_class",
        "neighbor_id",
        "neighbor_name",
        "neighbor_class",
        "via_relation",
        "context_id",
    )
