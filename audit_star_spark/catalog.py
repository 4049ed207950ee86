"""Catalog + config layer — the part the reference's Go code actually does.

The reference reads the PG catalog and a YAML config to decide which tables
get audited (Config struct audit.go:20–39; filters audit.go:300–395; column
reflection audit.go:1208–1246; single-column-PK gate audit.go:1173–1204).
Here the same responsibilities are a plain-Python layer: TableSpec carries
the reflected schema + pk metadata; EngineConfig carries the include /
exclude / option surface of audit.yml (audit.yml.example:20–36).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

try:  # yaml is optional: config can be built programmatically
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

# PG format_type() -> Spark type mapping (SURVEY §1.3). The audit log keeps
# everything as text (hstore semantics); these types drive the views' casts.
_PG_TO_SPARK: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "smallint": T.ShortType(),
    "serial": T.IntegerType(),
    "bigserial": T.LongType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "boolean": T.BooleanType(),
    "double precision": T.DoubleType(),
    "real": T.FloatType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamp without time zone": T.TimestampType(),
}


def pg_type_to_spark(pg_type: str) -> T.DataType:
    """Map a PG ``format_type`` string to a Spark type, incl. numeric(p,s)."""
    t = pg_type.strip().lower()
    if t.startswith("numeric") or t.startswith("decimal"):
        if "(" in t:
            inner = t[t.index("(") + 1 : t.rindex(")")]
            p, s = (int(x) for x in inner.split(","))
            return T.DecimalType(p, s)
        return T.DecimalType(38, 18)
    if t.startswith("character varying") or t.startswith("varchar"):
        return T.StringType()
    if t in _PG_TO_SPARK:
        return _PG_TO_SPARK[t]
    return T.StringType()


@dataclass
class TableSpec:
    """Reflected description of one audited table (ref audit.go:1208–1259)."""

    schema: str
    name: str
    columns: list[tuple[str, T.DataType]]
    primary_key: str | None  # None == compound/absent PK -> NULL-pk degradation
    # table owner role (PG pg_class.relowner analog); None = unknown.
    # Quoted owners like "7357:owner" are plain strings here
    # (db/migrate/1496851823_audit_star.up.sql:112, audit_test.go:937)
    owner: str | None = None

    def __post_init__(self) -> None:
        # The reference's rename sad paths (audit_test.go:552-581) are PG
        # parser rejections of malformed identifiers; Spark accepts nearly
        # any name (util.qcol), so the engine-level error path is spec
        # validation: empty or duplicate column names are always invalid.
        names = [c for c, _ in self.columns]
        if any(not c for c in names):
            raise ValueError(f"{self.schema}.{self.name}: empty column name")
        dupes = {c for c in names if names.count(c) > 1}
        if dupes:
            raise ValueError(
                f"{self.schema}.{self.name}: duplicate column names {sorted(dupes)}"
            )

    @property
    def fqn(self) -> str:
        return f"{self.schema}.{self.name}"

    @property
    def column_names(self) -> list[str]:
        return [c for c, _ in self.columns]

    @property
    def pk_type(self) -> T.DataType | None:
        for c, t in self.columns:
            if c == self.primary_key:
                return t
        return None

    def spark_schema(self) -> T.StructType:
        return T.StructType([T.StructField(c, t, True) for c, t in self.columns])

    def has_valid_primary_key(self) -> bool:
        """Single-column PK gate (hasValidPrimaryKey, audit.go:1173–1204)."""
        return self.primary_key is not None and self.primary_key in self.column_names


UPDATED_BY = "updated_by"


def ensure_updated_by(spec: TableSpec) -> TableSpec:
    """Provisioning adds ``updated_by varchar(50)`` to every audited source
    table so applications can record the acting user (addColToTable,
    audit.go:648-674, invoked for every table at :431); idempotent — a
    duplicate column is a no-op (the reference catches duplicate_column).
    """
    if UPDATED_BY in spec.column_names:
        return spec
    return TableSpec(
        spec.schema,
        spec.name,
        spec.columns + [(UPDATED_BY, T.StringType())],
        spec.primary_key,
    )


@dataclass
class EngineConfig:
    """Config surface of audit.yml (ref audit.go:20–39, 69–92).

    DB connectivity / role / grant options from the reference are recorded
    for parity but are no-ops here (no PG server); they are validated so a
    reference config file parses cleanly.
    """

    tables: dict[str, dict] = field(default_factory=dict)
    excluded_tables: list[str] = field(default_factory=list)
    included_tables: list[str] = field(default_factory=list)
    excluded_schemas: list[str] = field(default_factory=list)
    owner: str | None = None
    security: str = "definer"
    log_client_query: bool = False
    views_only: bool = False
    grantee: str | None = None
    lock_timeout: int | None = None
    # engine-specific
    log_root: str = "/tmp/audit_star_spark/logs"
    checkpoint_root: str = "/tmp/audit_star_spark/checkpoints"
    value_truncate_len: int = 500
    client_query_truncate_len: int = 1000
    sparse_every: int = 1000

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        if yaml is None:  # pragma: no cover
            raise RuntimeError("pyyaml not available")
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kwargs = {k: v for k, v in raw.items() if k in known}
        return cls(**kwargs)

    def __post_init__(self) -> None:
        # C11 option validation (the no-op options still parse strictly):
        # SECURITY DEFINER|INVOKER are the only trigger-function modes the
        # reference emits (audit.go:926, exercised audit_test.go:974-1037)
        if self.security not in ("definer", "invoker"):
            raise ValueError(
                f"security must be 'definer' or 'invoker', got {self.security!r}"
            )
        if self.lock_timeout is not None and self.lock_timeout <= 0:
            raise ValueError("lock_timeout must be positive")

    # -- include/exclude filtering (ref audit.go:300–395) ------------------
    @staticmethod
    def _internal_schema(schema: str) -> bool:
        """Schemas the reference never audits regardless of config
        (getAllSchemas, audit.go:218-224): PostgreSQL internals
        (``pg\\_%`` — note ``pgs`` IS auditable, audit_test.go:1059) and
        the engine's own audit schemas (recursion guard). We don't
        exclude ``public`` — the reference only skips it in catalog
        DISCOVERY; explicitly-configured tables stay auditable."""
        return (
            schema.startswith("pg_")
            or schema == "information_schema"
            or "audit" in schema
        )

    def table_included(self, schema: str, table: str) -> bool:
        fqn = f"{schema}.{table}"
        if self._internal_schema(schema):
            return False
        if schema in self.excluded_schemas:
            return False
        if self.included_tables:
            return fqn in self.included_tables or table in self.included_tables
        return fqn not in self.excluded_tables and table not in self.excluded_tables

    def filter_tables(self, specs: list[TableSpec]) -> list[TableSpec]:
        return [
            s
            for s in specs
            if self.table_included(s.schema, s.name) and self._owner_ok(s)
        ]

    def _owner_ok(self, spec: TableSpec) -> bool:
        """Owner gate (audit.go config ``owner``, audit_test.go:1255-1364):
        with ``owner`` configured, only tables owned by that role are
        audited; unset audits everything. A spec with UNKNOWN owner stays
        auditable — our catalog is config-declared, not reflected, so
        absence of owner metadata must not silently drop tables."""
        return (
            self.owner is None or spec.owner is None or spec.owner == self.owner
        )
