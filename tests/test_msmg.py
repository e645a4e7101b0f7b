"""MSMG two-layer mental graph (reference schemas/msmg.sql:9-50):
ontology closure, instance lineage-array wiring, rollup conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from memfuse_spark.operators import msmg


def _m2_fixture(spark):
    rows = [
        ("c1-0", "conv1", "alpha co_occurs_with 42", ["alpha", "42"], 0.9),
        ("c1-1", "conv1", "beta co_occurs_with gamma", ["beta", "gamma"], 0.8),
        ("c2-0", "conv2", "hi co_occurs_with longword", ["hi", "longword"], 0.75),
    ]
    return spark.createDataFrame(
        rows,
        "chunk_id string, conversation_id string, fact_content string, "
        "entities array<string>, confidence double",
    )


def test_ontology_closure_contains_all_ancestor_chains(spark):
    onto = msmg.ontology(spark)
    closure = {
        (r.class_id, r.ancestor_id)
        for r in msmg.ontology_closure(onto).collect()
    }
    # leaf → self, parent, root
    assert ("numeric", "numeric") in closure
    assert ("numeric", "entity") in closure
    assert ("numeric", "thing") in closure
    assert ("co_occurrence", "relation") in closure
    assert ("co_occurrence", "thing") in closure
    # root → only itself
    assert [a for c, a in closure if c == "thing"] == ["thing"]
    # no downward edges
    assert ("entity", "numeric") not in closure


def test_instances_lineage_arrays_are_symmetric(spark):
    inst = msmg.instances_from_m2(_m2_fixture(spark)).collect()
    by_id = {r.instance_id: r for r in inst}
    rels = [r for r in inst if r.instance_type == "relation"]
    ents = [r for r in inst if r.instance_type == "entity"]
    assert len(rels) == 3 and len(ents) == 6
    for r in rels:
        # relation children are exactly its entity instances…
        assert len(r.child_instances) == 2
        for cid in r.child_instances:
            child = by_id[cid]
            # …and each child points back via parent_instances
            assert child.parent_instances == [r.instance_id]
            # sibling = the other child
            other = [c for c in r.child_instances if c != cid]
            assert child.related_instances == other
    # classifier: numeric / short / long leaves
    cls = {r.instance_name: r.ontology_class_id for r in ents}
    assert cls["42"] == "numeric"
    assert cls["hi"] == "short_term" and cls["beta"] == "short_term"
    assert cls["longword"] == "long_term"


def test_rollup_root_totals_instance_layer(spark):
    inst = msmg.instances_from_m2(_m2_fixture(spark))
    roll = {
        r.class_id: r
        for r in msmg.rollup_by_class(inst, msmg.ontology(spark)).collect()
    }
    total = inst.count()
    assert roll["thing"].n_instances == total == 9
    assert roll["entity"].n_instances == 6
    assert roll["relation"].n_instances == 3 == roll["co_occurrence"].n_instances
    # level-2 entity leaves partition the entity count
    assert (
        roll["numeric"].n_instances
        + roll["short_term"].n_instances
        + roll["long_term"].n_instances
        == 6
    )
    assert roll["thing"].n_contexts == 2


def test_cross_layer_neighborhood_rides_lineage_arrays(spark):
    inst = msmg.instances_from_m2(_m2_fixture(spark))
    nb = msmg.cross_layer_neighborhood(inst)
    rows = nb.collect()
    # each of the 3 facts yields both directed sibling pairs
    assert len(rows) == 6
    pairs = {(r.instance_name, r.neighbor_name) for r in rows}
    assert ("alpha", "42") in pairs and ("42", "alpha") in pairs
    by_seed = {r.instance_name: r for r in rows}
    assert by_seed["alpha"].neighbor_class == "numeric"
    assert by_seed["alpha"].via_relation == "c1-0:fact"
    # neighborhood never crosses facts
    for r in rows:
        assert r.instance_id.split(":")[0] == r.neighbor_id.split(":")[0]
