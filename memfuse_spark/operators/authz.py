"""Control-plane auth twin: api_keys / permissions.

Reference: database/sqlite.py:140-151 (api_keys table: id, user_id,
key, name, permissions, created_at, expires_at) and database/base.py:
980-1093 (create/get/validate_api_key — validate returns None when the
key is unknown or ``expires_at < now``).

The reference validates one presented key per HTTP request; the Spark
twin is the set-based form of the same rules — validate EVERY key as of
a fixed instant and scope each authorized principal's visible activity
— i.e. the batch audit a deployment runs ("which keys can currently
read, and how much data does each see"), built from the identical
expiry/permission predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEYS_PER_USER = 2
EXPIRY_MOD = 20          # second key expires (u % 20) days after epoch
AUTH_EPOCH = "2024-01-01"
AUTH_AS_OF = "2024-01-10"  # validation instant (reference: datetime.now())
PERM_SETS = ("read", "read,write", "write")  # (u + k) % 3 picks one


def api_keys_fixture(events: DataFrame) -> DataFrame:
    """Deterministic api_keys table derived from the event-log user
    population (the driver testdata has no control-plane tables; a real
    deployment reads the actual api_keys table — every downstream
    operator takes the DataFrame, not this derivation).

    Per user: KEYS_PER_USER keys. Key 0 never expires (expires_at
    NULL — the reference's default); key 1 expires (user_id % 20) days
    after the epoch, so relative to AUTH_AS_OF roughly half the
    second keys are already expired. Permissions cycle through
    PERM_SETS on (user_id + k) % 3 — some keys cannot read.
    """
    users = events.select("user_id").distinct()
    ks = F.explode(
        F.sequence(F.lit(0), F.lit(KEYS_PER_USER - 1))
    ).alias("k")
    keys = users.select("user_id", ks)
    key_id = (F.col("user_id") * KEYS_PER_USER + F.col("k")).cast("long")
    perm_idx = (F.col("user_id") + F.col("k")) % len(PERM_SETS)
    perms = F.element_at(
        F.array(*[F.lit(p) for p in PERM_SETS]), (perm_idx + 1).cast("int")
    )
    expires = F.when(
        F.col("k") == 0, F.lit(None).cast("date")
    ).otherwise(
        F.date_add(
            F.to_date(F.lit(AUTH_EPOCH)),
            (F.col("user_id") % EXPIRY_MOD).cast("int"),
        )
    )
    return keys.select(
        key_id.alias("key_id"),
        "user_id",
        F.md5(F.concat(F.lit("key-"), key_id.cast("string"))).alias("key"),
        F.concat(F.lit("key-"), F.col("k").cast("string")).alias("name"),
        perms.alias("permissions"),
        F.to_date(F.lit(AUTH_EPOCH)).alias("created_at"),
        expires.alias("expires_at"),
    )


def validate_api_keys(api_keys: DataFrame, as_of: str = AUTH_AS_OF) -> DataFrame:
    """Set-based validate_api_key (reference database/base.py:1071-1092):
    a key is valid iff it exists and ``expires_at`` is NULL or not in
    the past at the validation instant (the reference rejects only
    ``expires_at < now``). Pure filter — rides the key-table scan."""
    return api_keys.filter(
        F.col("expires_at").isNull()
        | (F.col("expires_at") >= F.to_date(F.lit(as_of)))
    )


def scoped_activity(
    api_keys: DataFrame,
    events: DataFrame,
    as_of: str = AUTH_AS_OF,
    permission: str = "read",
) -> DataFrame:
    """The authorized read path, end-to-end: validate every key as of
    ``as_of``, gate on the required permission (CSV membership — the
    reference stores permissions as TEXT), then scope each surviving
    key to ITS user's activity (the per-user data a request presenting
    that key could read).

    Scale shape: validation + permission gate are scan-side filters on
    the key table; the per-user activity rollup is ONE map-side-combined
    aggregation of the event log; the final join is keys⋈rollup on
    user_id — both sides already reduced (keys: few per user; rollup:
    one row per user). No corpus-sized broadcast; AQE picks the
    strategy by measured size.
    """
    active = validate_api_keys(api_keys, as_of).filter(
        F.array_contains(F.split("permissions", ","), permission)
    )
    rollup = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
        F.max("ts").alias("last_ts"),
    )
    return (
        active.join(rollup, "user_id", "left")
        .select(
            "key_id",
            "user_id",
            "name",
            "permissions",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_event_types", F.lit(0))
            .cast("long")
            .alias("n_event_types"),
            "last_ts",
        )
        .orderBy("key_id")
    )
