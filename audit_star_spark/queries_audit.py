"""Driver-gate queries for the audit/temporal path, with DuckDB oracles.

Each Spark query runs the real engine (CDC feed -> event builder ->
reconstruction views); the paired oracle SQL re-derives the identical
result in ANSI SQL over the same ``events`` parquet, so the whole pipeline
is differentially tested end-to-end (row count + schema + value hash).

Determinism rules shared by both sides:
- doubles are stringified via DECIMAL(10,2) (exact, scale-preserving);
- diff maps are rendered as canonical sorted ``k=v|...`` strings (JSON key
  order is engine-dependent; sorted entries are not);
- decimals are cast to DOUBLE only at the output boundary (exact);
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from audit_star_spark.functions.maps import canonical_diff_string
from audit_star_spark.operators.reconstruct import compare_view, delta_view, snapshot_view

TIME_TRAVEL_TS = "2024-01-15 00:00:00"


def _log(spark: SparkSession, sf_dir: str):
    from audit_star_spark.plans.logstore import cached_users_log

    return cached_users_log(spark, sf_dir)


# --------------------------------------------------------------------------
# Shared oracle CTE prefix: feed derivation + audit log in ANSI SQL
# --------------------------------------------------------------------------
_COLS = ["etype", "k", "val"]  # diffable columns (id never changes per pk)

_FEED_CTE = """
feed AS (
  SELECT event_id, ts, user_id,
         CAST(user_id AS VARCHAR)                         AS cur_id,
         event_type                                       AS cur_etype,
         json_extract_string(props, '$.k')                AS cur_k,
         CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)    AS cur_val,
         LAG(CAST(user_id AS VARCHAR))                      OVER w AS prev_id,
         LAG(event_type)                                    OVER w AS prev_etype,
         LAG(json_extract_string(props, '$.k'))             OVER w AS prev_k,
         LAG(CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)) OVER w AS prev_val
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
ops AS (
  SELECT *,
         CASE WHEN cur_etype = 'error' THEN 'D'
              WHEN cur_etype = 'signup' OR prev_id IS NULL THEN 'I'
              ELSE 'U' END AS op,
         (prev_id IS NOT NULL) AS has_prev
  FROM feed
),
-- flattened diff columns: value NULL unless the diff map holds the key
diffed AS (
  SELECT *,
         CASE WHEN op = 'U' AND prev_etype IS DISTINCT FROM cur_etype THEN TRUE
              WHEN op = 'D' THEN TRUE ELSE FALSE END AS hb_etype,
         CASE WHEN op = 'U' AND prev_k     IS DISTINCT FROM cur_k     THEN TRUE
              WHEN op = 'D' THEN TRUE ELSE FALSE END AS hb_k,
         CASE WHEN op = 'U' AND prev_val   IS DISTINCT FROM cur_val   THEN TRUE
              WHEN op = 'D' THEN TRUE ELSE FALSE END AS hb_val,
         CASE WHEN op = 'D' THEN TRUE ELSE FALSE END AS hb_id
  FROM ops
),
logd AS (
  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS audit_id,
         ts AS changed_at,
         'agent_' || CAST(user_id % 7 AS VARCHAR)   AS changed_by,
         'svc_'   || CAST(user_id % 3 AS VARCHAR)   AS db_user,
         '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS client_addr,
         CAST(5000 + user_id % 100 AS INT)          AS client_port,
         op,
         CAST(user_id AS VARCHAR) AS primary_key,
         user_id,
         -- before values (old images), NULL unless key present in diff
         CASE WHEN hb_etype THEN (CASE WHEN op='D' AND NOT has_prev THEN cur_etype ELSE prev_etype END) END AS b_etype,
         CASE WHEN hb_k     THEN (CASE WHEN op='D' AND NOT has_prev THEN cur_k     ELSE prev_k     END) END AS b_k,
         CASE WHEN hb_val   THEN (CASE WHEN op='D' AND NOT has_prev THEN cur_val   ELSE prev_val   END) END AS b_val,
         CASE WHEN hb_id    THEN (CASE WHEN op='D' AND NOT has_prev THEN cur_id    ELSE prev_id    END) END AS b_id,
         hb_etype, hb_k, hb_val, hb_id,
         -- change values (new images of changed cols), U only
         CASE WHEN op = 'U' AND prev_etype IS DISTINCT FROM cur_etype THEN TRUE ELSE FALSE END AS hc_etype,
         CASE WHEN op = 'U' AND prev_k     IS DISTINCT FROM cur_k     THEN TRUE ELSE FALSE END AS hc_k,
         CASE WHEN op = 'U' AND prev_val   IS DISTINCT FROM cur_val   THEN TRUE ELSE FALSE END AS hc_val,
         CASE WHEN op = 'U' AND prev_etype IS DISTINCT FROM cur_etype THEN cur_etype END AS c_etype,
         CASE WHEN op = 'U' AND prev_k     IS DISTINCT FROM cur_k     THEN cur_k     END AS c_k,
         CASE WHEN op = 'U' AND prev_val   IS DISTINCT FROM cur_val   THEN cur_val   END AS c_val
  FROM diffed
),
live AS (
  SELECT user_id AS id,
         event_type AS etype,
         CAST(json_extract_string(props, '$.k') AS INT) AS k,
         CAST(value AS DECIMAL(10,2)) AS val
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events)
  WHERE rn = 1 AND event_type <> 'error'
)
"""

# next-later-before lookup per column: first later event of the same pk whose
# before map CONTAINS the key; its value may itself be NULL (struct-tagged).
_NB_CTE = """
, nb AS (
  SELECT *,
         (first_value(CASE WHEN hb_etype THEN {'v': b_etype} END IGNORE NULLS)
            OVER wf).v AS nb_etype,
         (first_value(CASE WHEN hb_k     THEN {'v': b_k} END IGNORE NULLS)
            OVER wf).v AS nb_k,
         (first_value(CASE WHEN hb_val   THEN {'v': b_val} END IGNORE NULLS)
            OVER wf).v AS nb_val,
         (first_value(CASE WHEN hb_id    THEN {'v': b_id} END IGNORE NULLS)
            OVER wf).v AS nb_id
  FROM logd
  WINDOW wf AS (PARTITION BY primary_key ORDER BY audit_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
, joined AS (
  SELECT nb.*, live.etype AS live_etype, live.k AS live_k,
         live.val AS live_val, live.id AS live_id
  FROM nb LEFT JOIN live ON CAST(nb.primary_key AS BIGINT) = live.id
)
"""

_VIEW_HEAD = """
  audit_id,
  primary_key,
  changed_at AS audited_changed_at,
  op         AS audited_operation,
  db_user    AS audited_db_user,
  changed_by AS audited_change_agent
"""


def q_audit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full audit event log with canonical diff strings."""
    log, _, _ = _log(spark, sf_dir)
    return log.select(
        "audit_id",
        "changed_at",
        "changed_by",
        "sparse_time",
        "db_user",
        "client_addr",
        "client_port",
        F.col("operation"),
        canonical_diff_string(F.col("before_change")).alias("before_str"),
        canonical_diff_string(F.col("change")).alias("change_str"),
        "primary_key",
    )


SQL_AUDIT_LOG = f"""
WITH {_FEED_CTE}
SELECT audit_id, changed_at, changed_by,
       CASE WHEN audit_id % 1000 = 0 THEN changed_at END AS sparse_time,
       db_user, client_addr, client_port,
       op AS operation,
       CASE WHEN op = 'U' THEN concat_ws('|',
              CASE WHEN hb_etype THEN 'etype=' || coalesce(b_etype, '∅') END,
              CASE WHEN hb_k     THEN 'k='     || coalesce(b_k, '∅')     END,
              CASE WHEN hb_val   THEN 'val='   || coalesce(b_val, '∅')   END)
            WHEN op = 'D' THEN
                 'etype=' || coalesce(b_etype, '∅')
              || '|id='   || coalesce(b_id, '∅')
              || '|k='    || coalesce(b_k, '∅')
              || '|val='  || coalesce(b_val, '∅')
       END AS before_str,
       CASE WHEN op = 'U' THEN concat_ws('|',
              CASE WHEN hc_etype THEN 'etype=' || coalesce(c_etype, '∅') END,
              CASE WHEN hc_k     THEN 'k='     || coalesce(c_k, '∅')     END,
              CASE WHEN hc_val   THEN 'val='   || coalesce(c_val, '∅')   END)
       END AS change_str,
       primary_key
FROM logd
"""


def q_audit_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    log, live, spec = _log(spark, sf_dir)
    d = delta_view(log, live, spec)
    return d.select(
        *[F.col(c) for c in d.columns if not c.endswith("_val")],
        F.col("old_val").cast("double").alias("old_val"),
        F.col("new_val").cast("double").alias("new_val"),
    )


SQL_AUDIT_DELTA = f"""
WITH {_FEED_CTE} {_NB_CTE}
SELECT {_VIEW_HEAD},
  CAST(b_id AS BIGINT) AS old_id,
  CASE WHEN op = 'I' THEN coalesce(CAST(nb_id AS BIGINT), live_id) END AS new_id,
  b_etype AS old_etype,
  CASE WHEN op = 'I' THEN coalesce(nb_etype, live_etype) ELSE c_etype END AS new_etype,
  CAST(b_k AS INT) AS old_k,
  CASE WHEN op = 'I' THEN coalesce(CAST(nb_k AS INT), live_k)
       ELSE CAST(c_k AS INT) END AS new_k,
  CAST(CAST(b_val AS DECIMAL(10,2)) AS DOUBLE) AS old_val,
  CAST(CAST(CASE WHEN op = 'I' THEN coalesce(CAST(nb_val AS DECIMAL(10,2)),
                                             live_val)
                 ELSE CAST(c_val AS DECIMAL(10,2)) END AS DECIMAL(10,2))
       AS DOUBLE) AS new_val
FROM joined
"""


def q_audit_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    log, live, spec = _log(spark, sf_dir)
    s = snapshot_view(log, live, spec)
    return s.select(
        *[F.col(c) for c in s.columns if c != "val"],
        F.col("val").cast("double").alias("val"),
    )


SQL_AUDIT_SNAPSHOT = f"""
WITH {_FEED_CTE} {_NB_CTE}
SELECT {_VIEW_HEAD},
  coalesce(CAST(nb_id AS BIGINT), live_id) AS id,
  coalesce(c_etype, nb_etype, live_etype)  AS etype,
  coalesce(CAST(c_k AS INT), CAST(nb_k AS INT), live_k) AS k,
  CAST(coalesce(CAST(c_val AS DECIMAL(10,2)), CAST(nb_val AS DECIMAL(10,2)),
                live_val) AS DOUBLE) AS val
FROM joined
"""


def q_audit_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    log, live, spec = _log(spark, sf_dir)
    c = compare_view(log, live, spec)
    return c.select(
        *[F.col(x) for x in c.columns if not x.endswith("_val")],
        F.col("old_val").cast("double").alias("old_val"),
        F.col("new_val").cast("double").alias("new_val"),
    )


SQL_AUDIT_COMPARE = f"""
WITH {_FEED_CTE} {_NB_CTE}
SELECT {_VIEW_HEAD},
  coalesce(CAST(b_id AS BIGINT),
           CASE WHEN op = 'I' THEN NULL
                ELSE coalesce(CAST(nb_id AS BIGINT), live_id) END) AS old_id,
  coalesce(CASE WHEN op IN ('D','T') THEN NULL ELSE CAST(nb_id AS BIGINT) END,
           live_id) AS new_id,
  coalesce(b_etype,
           CASE WHEN op = 'I' THEN NULL
                ELSE coalesce(nb_etype, live_etype) END) AS old_etype,
  coalesce(c_etype,
           coalesce(CASE WHEN op IN ('D','T') THEN NULL ELSE nb_etype END,
                    live_etype)) AS new_etype,
  coalesce(CAST(b_k AS INT),
           CASE WHEN op = 'I' THEN NULL
                ELSE coalesce(CAST(nb_k AS INT), live_k) END) AS old_k,
  coalesce(CAST(c_k AS INT),
           coalesce(CASE WHEN op IN ('D','T') THEN NULL ELSE CAST(nb_k AS INT) END,
                    live_k)) AS new_k,
  CAST(coalesce(CAST(b_val AS DECIMAL(10,2)),
           CASE WHEN op = 'I' THEN NULL
                ELSE coalesce(CAST(nb_val AS DECIMAL(10,2)), live_val) END)
       AS DOUBLE) AS old_val,
  CAST(coalesce(CAST(c_val AS DECIMAL(10,2)),
           coalesce(CASE WHEN op IN ('D','T') THEN NULL
                         ELSE CAST(nb_val AS DECIMAL(10,2)) END,
                    live_val)) AS DOUBLE) AS new_val
FROM joined
"""


def q_audit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who-changed-what-when rollup over the audit log (agg coverage)."""
    log, _, _ = _log(spark, sf_dir)
    return (
        log.groupBy("changed_by", "operation")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("primary_key").alias("n_keys"),
            F.min("audit_id").alias("first_audit_id"),
            F.max("audit_id").alias("last_audit_id"),
        )
    )


SQL_AUDIT_ROLLUP = f"""
WITH {_FEED_CTE}
SELECT changed_by, op AS operation,
       COUNT(*) AS n_events,
       COUNT(DISTINCT primary_key) AS n_keys,
       MIN(audit_id) AS first_audit_id,
       MAX(audit_id) AS last_audit_id
FROM logd
GROUP BY changed_by, op
"""


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point query: full table state as of TIME_TRAVEL_TS,
    reconstructed from the log via the snapshot view (not the live table).
    """
    log, live, spec = _log(spark, sf_dir)
    s = snapshot_view(log, live, spec)
    w = Window.partitionBy("primary_key").orderBy(F.col("audit_id").desc())
    return (
        s.filter(F.col("audited_changed_at") <= F.lit(TIME_TRAVEL_TS).cast("timestamp"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("audited_operation") != "D")
        .select(
            "id",
            "etype",
            "k",
            F.col("val").cast("double").alias("val"),
        )
    )


SQL_TIME_TRAVEL = f"""
WITH {_FEED_CTE} {_NB_CTE}
, snap AS (
  SELECT audit_id, primary_key, changed_at, op,
         coalesce(CAST(nb_id AS BIGINT), live_id) AS id,
         coalesce(c_etype, nb_etype, live_etype)  AS etype,
         coalesce(CAST(c_k AS INT), CAST(nb_k AS INT), live_k) AS k,
         CAST(coalesce(CAST(c_val AS DECIMAL(10,2)), CAST(nb_val AS DECIMAL(10,2)),
                       live_val) AS DOUBLE) AS val,
         ROW_NUMBER() OVER (PARTITION BY primary_key ORDER BY audit_id DESC) AS rn_all
  FROM joined
  WHERE changed_at <= TIMESTAMP '{TIME_TRAVEL_TS}'
)
SELECT id, etype, k, val
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY primary_key ORDER BY audit_id DESC) AS rn
      FROM snap)
WHERE rn = 1 AND op <> 'D'
"""


def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current table state rebuilt from the log ALONE (the
    ``store_insert_payload`` upgrade over the reference, which always
    needs the live table: audit.go:1107–1113): one hash aggregation keyed
    by primary_key — per column an argmax-by-audit_id struct max, no
    window, no sort, no join. The oracle re-derives the same state
    independently from the raw events (last row version per surviving
    key), so the whole capture->log->rebuild path is differentially
    tested."""
    from audit_star_spark.operators.reconstruct import latest_state
    from audit_star_spark.plans.logstore import cached_users_log

    log, _, spec = cached_users_log(spark, sf_dir, payload=True)
    st = latest_state(log, spec)
    return st.select(
        "id", "etype", "k", F.col("val").cast("double").alias("val")
    )


SQL_LATEST_STATE = f"""
WITH {_FEED_CTE}
SELECT id, etype, k, CAST(val AS DOUBLE) AS val FROM live
"""


def q_scd2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build (operators/scd.py): one row per row VERSION
    with its validity interval — the materialized complement of the
    reference's per-timestamp snapshot view (audit.go:1262-1359). The
    oracle re-derives the versions independently from the snapshot CTE
    plus a lead() window, so interval edges, tombstone closure (a D
    closes the prior version without opening one) and is_current are all
    hash-checked."""
    from audit_star_spark.operators.scd import scd2_history

    log, live, spec = _log(spark, sf_dir)
    h = scd2_history(log, live, spec)
    return h.select(
        "version_audit_id",
        "primary_key",
        "id",
        "etype",
        "k",
        F.col("val").cast("double").alias("val"),
        "valid_from",
        "valid_to",
        "is_current",
    )


SQL_SCD2_USERS = f"""
WITH {_FEED_CTE} {_NB_CTE}
, snap AS (
  SELECT audit_id, primary_key, changed_at, op,
         coalesce(CAST(nb_id AS BIGINT), live_id) AS id,
         coalesce(c_etype, nb_etype, live_etype)  AS etype,
         coalesce(CAST(c_k AS INT), CAST(nb_k AS INT), live_k) AS k,
         CAST(coalesce(CAST(c_val AS DECIMAL(10,2)), CAST(nb_val AS DECIMAL(10,2)),
                       live_val) AS DOUBLE) AS val
  FROM joined
)
, versions AS (
  SELECT *,
         lead(changed_at) OVER w AS valid_to,
         lead(audit_id)   OVER w AS next_id
  FROM snap
  WINDOW w AS (PARTITION BY primary_key ORDER BY audit_id)
)
SELECT audit_id AS version_audit_id, primary_key, id, etype, k, val,
       changed_at AS valid_from, valid_to,
       (next_id IS NULL) AS is_current
FROM versions
WHERE op NOT IN ('D', 'T')
"""


def q_sparse_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sparse-time index surface (audit.go:882–886 + the partial index
    at audit.go:837): one anchor per 1000 events, queried as coarse
    entry-points into the log. The `sparse_time IS NOT NULL` predicate
    prunes via parquet row-group min/max stats on the sorted log — the
    same O(anchors) access path the reference buys with a partial btree."""
    log, _, _ = _log(spark, sf_dir)
    return (
        log.filter(F.col("sparse_time").isNotNull())
        .groupBy(F.date_trunc("day", "sparse_time").alias("anchor_day"))
        .agg(
            F.count("*").alias("n_anchors"),
            F.min("audit_id").alias("first_anchor_id"),
            F.max("audit_id").alias("last_anchor_id"),
        )
        .orderBy("anchor_day")
    )


SQL_SPARSE_ANCHORS = f"""
WITH {_FEED_CTE}
SELECT CAST(date_trunc('day', changed_at) AS TIMESTAMP) AS anchor_day,
       COUNT(*) AS n_anchors,
       MIN(audit_id) AS first_anchor_id,
       MAX(audit_id) AS last_anchor_id
FROM logd
WHERE audit_id % 1000 = 0
GROUP BY anchor_day
ORDER BY anchor_day
"""


AUDIT_QUERIES = {
    "audit_log": q_audit_log,
    "audit_delta": q_audit_delta,
    "audit_snapshot": q_audit_snapshot,
    "audit_compare": q_audit_compare,
    "audit_rollup": q_audit_rollup,
    "time_travel": q_time_travel,
    "latest_state": q_latest_state,
    "sparse_anchors": q_sparse_anchors,
}

AUDIT_ORACLES = {
    "audit_log": SQL_AUDIT_LOG,
    "audit_delta": SQL_AUDIT_DELTA,
    "audit_snapshot": SQL_AUDIT_SNAPSHOT,
    "audit_compare": SQL_AUDIT_COMPARE,
    "audit_rollup": SQL_AUDIT_ROLLUP,
    "time_travel": SQL_TIME_TRAVEL,
    "latest_state": SQL_LATEST_STATE,
    "sparse_anchors": SQL_SPARSE_ANCHORS,
}
