"""audit_star_spark — a PySpark-native change-data-capture and temporal-query
engine with the capabilities of enova/audit_star, rebuilt Spark-first.

The reference (/root/reference, Go + generated PL/pgSQL) provisions per-table
audit logs, diff-computing triggers, and three temporal reconstruction views
inside PostgreSQL. This package re-expresses those semantics natively on
Spark:

- capture path   -> ``operators.event_builder`` (map-diff algebra over a CDC
  feed, built-in higher-order functions only) + ``streaming.ingest``
  (Structured Streaming micro-batch append with checkpointed sequence state);
- query path     -> ``operators.reconstruct`` (delta / snapshot / compare
  views as window-function DataFrame transforms — one shuffle instead of the
  reference's O(columns) correlated subqueries);
- provisioning   -> ``catalog`` (YAML config + table specs, the part the Go
  code actually does);
- analytics      -> ``analytics`` (dedup, similarity search, text analysis,
  multimodal columns — the LLM-data-pipeline layer).
"""

__version__ = "0.1.0"
