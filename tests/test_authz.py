"""Control-plane auth twin (reference database/base.py:980-1093,
sqlite.py:140-151): expiry validation, permission gate, scoping."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from memfuse_spark.operators import authz


def _events(spark):
    return spark.createDataFrame(
        [
            (0, datetime.datetime(2024, 1, 2, 10, 0), 0, "login", 1.0, "{}"),
            (1, datetime.datetime(2024, 1, 3, 10, 0), 0, "purchase", 2.0, "{}"),
            (2, datetime.datetime(2024, 1, 2, 11, 0), 5, "login", 1.0, "{}"),
            (3, datetime.datetime(2024, 1, 2, 12, 0), 25, "error", 0.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )


def test_fixture_shape_and_expiry_rule(spark):
    keys = authz.api_keys_fixture(_events(spark)).collect()
    # 3 users x 2 keys, unique key ids, key 0 never expires
    assert len(keys) == 6
    assert len({r.key_id for r in keys}) == 6
    by_id = {r.key_id: r for r in keys}
    for r in keys:
        if r.name == "key-0":
            assert r.expires_at is None
        else:
            assert r.expires_at == datetime.date(2024, 1, 1) + datetime.timedelta(
                days=r.user_id % authz.EXPIRY_MOD
            )
    # validate_api_key twin: user 5's second key expired Jan 6 < Jan 10
    active_ids = {
        r.key_id
        for r in authz.validate_api_keys(
            authz.api_keys_fixture(_events(spark))
        ).collect()
    }
    assert by_id[11].user_id == 5 and 11 not in active_ids
    # user 25's second key expires Jan 6? 25 % 20 = 5 -> Jan 6: expired
    assert 51 not in active_ids
    # user 0's second key expires Jan 1 (0 days): expired as of Jan 10
    assert 1 not in active_ids
    # never-expiring keys all survive
    assert {0, 10, 50} <= active_ids


def test_scoped_activity_gates_permissions_and_rolls_up(spark):
    ev = _events(spark)
    out = {r.key_id: r for r in authz.scoped_activity(
        authz.api_keys_fixture(ev), ev
    ).collect()}
    # permission sets: (u + k) % 3 -> 0:'read', 1:'read,write', 2:'write'
    # user 0 key 0: 'read' -> in; user 5 key 0: 'write' (5%3=2) -> out
    assert 0 in out and 10 not in out
    # user 25 key 0: (25+0)%3=1 -> 'read,write' -> in (CSV membership)
    assert 50 in out and out[50].permissions == "read,write"
    # rollup is the key's OWN user's activity only
    assert out[0].n_events == 2 and out[0].n_event_types == 2
    assert out[50].n_events == 1 and out[50].n_event_types == 1
    assert out[0].last_ts == datetime.datetime(2024, 1, 3, 10, 0)
    # expired keys never reach the scoped listing
    assert all(
        r.expires_at is None or r.expires_at >= datetime.date(2024, 1, 10)
        for r in authz.validate_api_keys(authz.api_keys_fixture(ev)).collect()
    )
