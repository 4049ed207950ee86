"""Provisioning driver — the Spark analogue of the reference's ``RunAll``
pipeline (EP1, audit.go:127–199): config + catalog -> per-table audit
pipelines + registered reconstruction views + control-table upkeep.

What the Go code does with DDL (create audit schema/tables/triggers/views,
audit.go:398–513) becomes: per-table log/checkpoint directory init (C7),
streaming-ingest handles (C9), temp-view registration for the three
reconstruction views (B8), audit_history interval upkeep (C10), error
accounting that continues past per-table failures (C13, audit.go:49,1132).

C11 (security/roles/grants): the reference issues ``GRANT USAGE ON
SCHEMA <schema>_audit_raw TO <grantee>`` per schema
(grantUsageOnSchemas, audit.go:720–731), ``GRANT SELECT ON TABLE ... TO
<grantee>`` (grantSelectOnTable, audit.go:733–745), and appends a
``GRANT SELECT`` to each view's DDL when Grantee is configured
(audit.go:1115–1121) — Postgres then enforces those at query time.
Open-source Spark has NO engine-side SQL authorization layer to hand
that enforcement to, so the equivalent here is split the only way it
can be: grant METADATA is first-class (a persisted ``_audit_acl``
store written at view registration, introspectable via ``grants()`` —
the role_table_grants analogue), and ENFORCEMENT lives at the engine's
own access point (``read_view(name, principal)`` raises
PermissionError unless the principal is the configured owner or holds
a recorded grant). Like the reference, no configured grantee means no
GRANT rows are written and access stays open. The remaining C11
constructs are config-recorded only: ``security`` (DEFINER/INVOKER has
no meaning without a privilege system under the view) and ``set_role``
(audit.go:201–207, a Postgres connection property); ``lock_timeout``
maps to the write-conflict retry policy as surveyed.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.catalog import EngineConfig, TableSpec, ensure_updated_by
from audit_star_spark.operators.reconstruct import (
    compare_view,
    delta_view,
    snapshot_view,
)
from audit_star_spark.streaming.ingest import AuditIngest
from audit_star_spark.util import safe_identifier

VIEW_SUFFIXES = ("delta", "snapshot", "compare")


@dataclass
class ProvisionReport:
    """C13: per-run accounting (errorCounter analogue, audit.go:192–196)."""

    audited: list[str] = field(default_factory=list)
    skipped: list[tuple[str, str]] = field(default_factory=list)
    errors: list[tuple[str, str]] = field(default_factory=list)


class AuditStar:
    def __init__(self, spark: SparkSession, config: EngineConfig):
        self.spark = spark
        self.config = config
        self.ingests: dict[str, AuditIngest] = {}
        # state-snapshot version each table's registered views serve
        self._served_versions: dict[str, int | None] = {}
        # (object, privilege, grantee) -> object_type; rehydrated from
        # the persisted store so a fresh engine instance extends rather
        # than clobbers a prior run's grants
        self._acl: dict[tuple[str, str, str], str] = {
            (r["object_name"], r["privilege"], r["grantee"]): r["object_type"]
            for r in self.grants().collect()
        }

    # -- view ACL (C11 grants, audit.go:720–745, 1115–1121) ---------------
    def _acl_path(self) -> str:
        return os.path.join(self.config.log_root, "_audit_acl")

    def _record_grants(self, spec: TableSpec, view_names: list[str]) -> None:
        """Persist the reference's GRANT set for one provisioned table:
        USAGE on the raw-log schema ``<schema>_audit_raw``, the exact
        object grantUsageOnSchemas names (audit.go:722), + SELECT on each
        reconstruction view (the per-view GRANT the reference appends to
        the view DDL). No-op when no grantee is configured — exactly the
        reference's ``if grantee != ""`` guard. Idempotent: the ACL is
        keyed by (object, privilege, grantee) and rewritten whole (it is
        bounded control metadata: a handful of rows per table)."""
        if not self.config.grantee:
            return
        for name in [
            (f"{spec.schema}_audit_raw", "schema", "USAGE"),
        ] + [(v, "view", "SELECT") for v in view_names]:
            self._acl[(name[0], name[2], self.config.grantee)] = name[1]
        rows = [
            (obj, typ, priv, grantee)
            for (obj, priv, grantee), typ in sorted(self._acl.items())
        ]
        self.spark.createDataFrame(
            rows,
            "object_name string, object_type string, "
            "privilege string, grantee string",
        ).coalesce(1).write.mode("overwrite").parquet(self._acl_path())

    def grants(self) -> DataFrame:
        """The recorded ACL (role_table_grants analogue): one row per
        (object, privilege, grantee); empty when none were issued."""
        if os.path.isdir(self._acl_path()):
            return self.spark.read.parquet(self._acl_path())
        return self.spark.createDataFrame(
            [],
            "object_name string, object_type string, "
            "privilege string, grantee string",
        )

    def read_view(self, name: str, principal: str | None = None) -> DataFrame:
        """The enforcement point: return the registered view's DataFrame
        iff ``principal`` may SELECT from it. A view with NO recorded
        grant is open (the reference issues no GRANTs without a
        grantee); the configured owner always passes (the Postgres
        owner/definer privilege)."""
        acl = {
            (r["object_name"], r["grantee"])
            for r in self.grants().filter(F.col("privilege") == "SELECT").collect()
        }  # bounded: control metadata
        guarded = {obj for obj, _g in acl}
        if name in guarded:
            allowed = principal is not None and (
                (name, principal) in acl or principal == self.config.owner
            )
            if not allowed:
                raise PermissionError(
                    f"principal {principal!r} has no SELECT grant on {name}"
                )
        return self.spark.table(name)

    # -- audit_history control table (C10, audit.go:608–625) --------------
    def _history_path(self) -> str:
        return os.path.join(self.config.log_root, "_audit_history")

    def _record_history(self, spec: TableSpec, start: bool) -> None:
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        row = [(spec.schema, spec.name, now if start else None, None if start else now)]
        df = self.spark.createDataFrame(
            row, "schema_name string, table_name string, start_time timestamp, end_time timestamp"
        )
        df.write.mode("append").parquet(self._history_path())

    def audit_history(self) -> DataFrame:
        return self.spark.read.parquet(self._history_path())

    # -- per-table provisioning (audit(), audit.go:430–513) ---------------
    def provision(
        self,
        specs: list[TableSpec],
        feeds: dict[str, str] | None = None,
        live: dict[str, DataFrame] | None = None,
        views_only: bool = False,
    ) -> ProvisionReport:
        """``feeds`` maps table fqn -> change-feed source directory (the
        trigger analogue needs a feed to read). ``views_only`` mirrors the
        reference's mode that regenerates views without touching capture
        (C12, audit.go:516–545)."""
        report = ProvisionReport()
        for spec in self.config.filter_tables(specs):
            # C6: single-column-PK gate; reference skips but still allows
            # NULL-pk capture if forced (SURVEY §7.5) — we skip like RunAll
            if not spec.has_valid_primary_key():
                report.skipped.append((spec.fqn, "no single-column primary key"))
                continue
            # every audited table gains updated_by (audit.go:431, 648-674)
            spec = ensure_updated_by(spec)
            try:
                if not views_only:
                    self._provision_capture(spec, feeds or {})
                self._register_views(spec, live or {})
                report.audited.append(spec.fqn)
            except Exception as e:  # noqa: BLE001 — C13: keep going
                report.errors.append((spec.fqn, str(e)))
        return report

    def _table_dirs(self, spec: TableSpec) -> tuple[str, str]:
        base = os.path.join(self.config.log_root, spec.schema, spec.name)
        ckpt = os.path.join(self.config.checkpoint_root, spec.schema, spec.name)
        return base, ckpt

    def _provision_capture(self, spec: TableSpec, feeds: dict[str, str]) -> None:
        if spec.fqn not in feeds:
            return
        log_dir, ckpt = self._table_dirs(spec)
        os.makedirs(log_dir, exist_ok=True)  # C7: idempotent init
        ingest = AuditIngest(
            self.spark,
            source_dir=feeds[spec.fqn],
            log_dir=log_dir,
            checkpoint_dir=ckpt,
            pk_col=spec.primary_key,
            log_client_query=self.config.log_client_query,
            # per-table live-state snapshot maintained alongside the log
            # (LatestStateStore); single-PK tables only — the NULL-pk
            # degradation path has no key to compact on
            state_dir=os.path.join(log_dir, "_state") if spec.primary_key else None,
        )
        self.ingests[spec.fqn] = ingest
        ingest.start(available_now=True).awaitTermination()
        self._record_history(spec, start=True)

    def disable(self, spec: TableSpec) -> None:
        """C9 disable path: stop capture, keep checkpoint + definition."""
        if spec.fqn in self.ingests:
            self.ingests[spec.fqn].stop()
        self._record_history(spec, start=False)

    def log_for(self, spec: TableSpec) -> DataFrame:
        log_dir, _ = self._table_dirs(spec)
        df = self.spark.read.parquet(log_dir)
        return df.drop("__batch") if "__batch" in df.columns else df

    def _register_views(self, spec: TableSpec, live: dict[str, DataFrame]) -> None:
        """B8: the view-DDL analogue — register the three reconstruction
        views as temp views named ``<schema>_audit_<table>_audit_<kind>``.

        The live side (B3) prefers a caller-supplied table; without one it
        falls back to the streaming-maintained LatestStateStore snapshot.
        Temp views bind their file listing at registration, so the
        streamed fallback RE-REGISTERS after every further ingest batch
        (ingest.on_batch) — the live side re-resolves to the newest
        snapshot version instead of dangling on a GC'd directory — and
        PINS the version it serves so keep-2 GC can never delete it while
        a registered view still reads it.

        C11 boundary: grant enforcement happens ONLY at ``read_view``.
        ``spark.sql("SELECT ... FROM <temp view>")`` bypasses it — OSS
        Spark has no authorization layer, so a temp view is readable by
        any code holding the SparkSession. The recorded ACL
        (``grants()``) is the reference's GRANT metadata plus an engine
        access point, not SQL-level security."""
        supplied = live.get(spec.fqn)
        ingest = self.ingests.get(spec.fqn)

        view_names = [
            safe_identifier(f"{spec.schema}_audit_{spec.name}_audit_{kind}")
            for kind in VIEW_SUFFIXES
        ]

        def register(_batch_id: int | None = None) -> None:
            log = self.log_for(spec)
            live_df = supplied
            if live_df is not None:
                # a caller-supplied live table may predate provisioned
                # columns (updated_by, schema adds): pad with typed NULLs,
                # exactly the state an ALTER ADD COLUMN leaves behind
                for c, t in spec.columns:
                    if c not in live_df.columns:
                        live_df = live_df.withColumn(c, F.lit(None).cast(t))
            elif ingest is not None and ingest.latest_state() is not None:
                from audit_star_spark.streaming.ingest import typed_state

                store = ingest.state_store
                v = store.current_version()
                prev = self._served_versions.get(spec.fqn)
                if v is not None:
                    store.pin(v)
                if prev is not None and prev != v:
                    store.unpin(prev)
                self._served_versions[spec.fqn] = v
                live_df = typed_state(ingest.latest_state(), spec)
            for name, fn in zip(
                view_names, (delta_view, snapshot_view, compare_view)
            ):
                # quoted/special schema+table names fold to legal
                # identifiers (the reference quotes DDL names; documented
                # deviation)
                fn(log, live_df, spec).createOrReplaceTempView(name)

        register()
        # C11: the reference appends GRANT SELECT to each view's DDL and
        # grants schema USAGE when a grantee is configured
        self._record_grants(spec, view_names)
        if supplied is None and ingest is not None:
            ingest.on_batch.append(register)
