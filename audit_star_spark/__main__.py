"""Provisioning CLI — the EP1 surface of the reference (``./audit_star``,
audit_star.go:16–38): parse flags, load YAML config, apply CLI overrides,
run provisioning over the configured tables, print the run report.

Table declarations live in the config (the reference reflects them from
the PG catalog, audit.go:1208–1246; our catalog IS the config):

    log_root: /data/audit/logs
    checkpoint_root: /data/audit/ckpts
    tables:
      app.users:
        primary_key: id
        columns:           # PG format_type strings, mapped per catalog.py
          id: bigint
          name: text
          balance: numeric(10,2)
        feed: /data/feeds/app.users      # change-event source directory
        live: /data/live/app.users       # optional live-table parquet

Usage:  python -m audit_star_spark -cfg audit.yml [-table app.users]
                                   [--views-only] [--master local[*]]
"""

from __future__ import annotations

import argparse
import sys

from audit_star_spark.catalog import EngineConfig, TableSpec, pg_type_to_spark


def specs_from_config(config: EngineConfig) -> tuple[list[TableSpec], dict[str, str], dict[str, str]]:
    """(specs, feeds, live_paths) from the config's ``tables`` mapping."""
    specs, feeds, live_paths = [], {}, {}
    for fqn, decl in config.tables.items():
        schema, _, name = fqn.rpartition(".")
        schema = schema or "public"
        cols = [(c, pg_type_to_spark(t)) for c, t in (decl.get("columns") or {}).items()]
        specs.append(
            TableSpec(schema, name, cols, decl.get("primary_key"), decl.get("owner"))
        )
        if decl.get("feed"):
            feeds[fqn] = decl["feed"]
        if decl.get("live"):
            live_paths[fqn] = decl["live"]
    return specs, feeds, live_paths


def corpus_main(argv: list[str]) -> int:
    """``python -m audit_star_spark corpus`` — run the composed corpus
    cleaning pipeline (quality gate -> exact dedup -> near-dup dedup ->
    chunk/pack layouts -> JSONL export) over a documents parquet."""
    ap = argparse.ArgumentParser(prog="audit_star_spark corpus")
    ap.add_argument("--in", dest="in_path", required=True,
                    help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", dest="out_dir", required=True)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--chunk-tokens", type=int, default=64)
    ap.add_argument("--overlap", type=int, default=8)
    ap.add_argument("--budget-tokens", type=int, default=256)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument(
        "--substring-dedup", type=int, default=0, metavar="K",
        help="also cut duplicated >=K-token runs out of all but their "
             "first occurrence (exact-substring removal) before layouts. "
             "Matching is case-insensitive; surviving text keeps its "
             "original case but is trimmed and whitespace-collapsed "
             "(token-level rewrite)",
    )
    ap.add_argument(
        "--substring-engine", choices=("hash", "suffix"), default="hash",
        help="window-identity engine for --substring-dedup: 'hash' (md5 "
             "window hashes) or 'suffix' (prefix-doubling rank pairs — "
             "collision-free, O(1)/window; prefer at large K)",
    )
    ap.add_argument(
        "--mix", action="append", default=[], metavar="SOURCE=WEIGHT",
        help="target mix weight for a source (repeatable; unlisted "
             "sources default to 1.0; downsample-only)",
    )
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)
    mix_weights = {}
    for item in args.mix:
        src, _, w = item.partition("=")
        if not _ or not src:
            ap.error(f"--mix expects SOURCE=WEIGHT, got {item!r}")
        try:
            mix_weights[src] = float(w)
        except ValueError:
            ap.error(f"--mix weight must be numeric, got {item!r}")

    from audit_star_spark.pipeline import run_corpus_pipeline
    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-corpus", master=args.master)
    stats = run_corpus_pipeline(
        spark,
        args.in_path,
        args.out_dir,
        near_dup_threshold=args.near_dup_threshold,
        chunk_tokens=args.chunk_tokens,
        overlap=args.overlap,
        budget_tokens=args.budget_tokens,
        shards=args.shards,
        mix_weights=mix_weights or None,
        substring_k=args.substring_dedup or None,
        substring_engine=args.substring_engine,
    )
    for k, v in stats.items():
        print(f"{k:22s} {v}")
    return 0


def layout_main(argv: list[str]) -> int:
    """``python -m audit_star_spark layout`` — data-layout ops: inspect
    parquet row-group statistics (what WILL a predicate prune?) or
    rewrite a table Z-order-clustered on multiple columns."""
    ap = argparse.ArgumentParser(prog="audit_star_spark layout")
    sub = ap.add_subparsers(dest="cmd", required=True)
    st = sub.add_parser("stats", help="row-group footer statistics")
    st.add_argument("--path", required=True)
    st.add_argument("--column", default=None, help="restrict to one column")
    zo = sub.add_parser("zorder", help="rewrite clustered on a Z-curve")
    zo.add_argument("--in", dest="in_path", required=True)
    zo.add_argument("--out", dest="out_path", required=True)
    zo.add_argument("--by", required=True, help="comma-separated columns")
    zo.add_argument("--files", type=int, default=8)
    for p in (st, zo):
        p.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-layout", master=args.master)
    if args.cmd == "stats":
        from audit_star_spark.plans.footer_stats import parquet_footer_stats

        stats = parquet_footer_stats(spark, args.path)
        if args.column:
            stats = stats.filter(stats["column"] == args.column)
        stats.orderBy("file", "row_group", "column").show(1000, truncate=False)
        return 0
    from audit_star_spark.plans.zorder import write_zordered

    cols = [c.strip() for c in args.by.split(",") if c.strip()]
    write_zordered(
        spark.read.parquet(args.in_path), args.out_path, cols, n_files=args.files
    )
    print(f"zordered  {args.in_path} -> {args.out_path} by {cols}")
    return 0


def index_main(argv: list[str]) -> int:
    """``python -m audit_star_spark index`` — persisted IVF ANN index
    ops: build (train-once) and probe (partition-pruned, zero k-means
    jobs) against an embeddings parquet (vec_id, label, embedding)."""
    ap = argparse.ArgumentParser(prog="audit_star_spark index")
    sub = ap.add_subparsers(dest="cmd", required=True)
    bu = sub.add_parser("build", help="train centroids + write assignments")
    bu.add_argument("--embeddings", required=True)
    bu.add_argument("--out", dest="index_dir", required=True)
    bu.add_argument("--cells", type=int, default=16)
    bu.add_argument("--iters", type=int, default=3)
    bu.add_argument("--pq", action="store_true",
                    help="also write PQ codebooks + codes (IVF-PQ)")
    bu.add_argument("--pq-sub", type=int, default=4)
    bu.add_argument("--pq-codes", type=int, default=16)
    pr = sub.add_parser("probe", help="top-k neighbors for query vec_ids")
    pr.add_argument("--index", dest="index_dir", required=True)
    pr.add_argument("--embeddings", required=True,
                    help="parquet holding the query vectors")
    pr.add_argument("--queries", required=True,
                    help="comma-separated vec_ids to use as queries")
    pr.add_argument("-k", type=int, default=10)
    pr.add_argument("--probes", type=int, default=4)
    pr.add_argument("--pq", action="store_true",
                    help="rank by asymmetric distance over PQ codes "
                         "(requires an index built with --pq)")
    pr.add_argument("--rerank", type=int, default=0,
                    help="two-stage serving: exact-cosine re-rank of the "
                         "top-N ADC candidates (implies --pq)")
    for p in (bu, pr):
        p.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-index", master=args.master)
    if args.cmd == "build":
        from audit_star_spark.analytics.ivf_index import build_ivf_index

        emb = spark.read.parquet(args.embeddings)
        idx = build_ivf_index(
            emb,
            args.index_dir,
            n_cells=args.cells,
            iters=args.iters,
        )
        if args.pq:
            from audit_star_spark.analytics.ivf_index import add_pq_codes

            add_pq_codes(idx, emb, m_sub=args.pq_sub, k_codes=args.pq_codes)
            print(f"pq           m_sub={args.pq_sub} k_codes={args.pq_codes}")
        for k, v in idx.meta().items():
            print(f"{k:12s} {v}")
        return 0
    from audit_star_spark.analytics.ivf_index import (
        IVFIndex,
        probe_pq,
        probe_pq_rerank,
    )
    from audit_star_spark.analytics.similarity import VEC_EXPR

    ids = [int(v) for v in args.queries.split(",") if v.strip()]
    q = (
        spark.read.parquet(args.embeddings)
        .filter(F.col("vec_id").isin(ids))
        .select(F.col("vec_id").alias("query_id"), F.expr(VEC_EXPR).alias("qvec"))
    )
    idx = IVFIndex(args.index_dir)
    if args.rerank:
        out = probe_pq_rerank(
            idx, q, k=args.k, rerank=args.rerank, n_probe=args.probes
        )
    elif args.pq:
        out = probe_pq(idx, q, k=args.k, n_probe=args.probes)
    else:
        out = idx.probe(q, k=args.k, n_probe=args.probes)
    out.orderBy("query_id", "rank").show(1000, truncate=False)
    return 0


def diff_main(argv: list[str]) -> int:
    """``python -m audit_star_spark diff`` — per-source corpus snapshot
    diff (added/removed/changed/unchanged by normalized-text md5)."""
    ap = argparse.ArgumentParser(prog="audit_star_spark diff")
    ap.add_argument("old", help="old snapshot parquet (doc_id, text, source)")
    ap.add_argument("new", help="new snapshot parquet")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from audit_star_spark.analytics.snapshot import snapshot_diff
    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-diff", master=args.master)
    out = snapshot_diff(
        spark.read.parquet(args.old), spark.read.parquet(args.new)
    ).orderBy("source")
    out.show(1000, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "corpus":
        return corpus_main(argv[1:])
    if argv and argv[0] == "layout":
        return layout_main(argv[1:])
    if argv and argv[0] == "index":
        return index_main(argv[1:])
    if argv and argv[0] == "diff":
        return diff_main(argv[1:])
    # flag names mirror the reference CLI (audit.go:46–47)
    ap = argparse.ArgumentParser(prog="audit_star_spark")
    ap.add_argument("-cfg", default="audit.yml", help="path to YAML config")
    ap.add_argument("-table", default=None, help="audit only this table (fqn)")
    ap.add_argument("--views-only", action="store_true",
                    help="re-register views without touching capture (C12)")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    config = EngineConfig.from_yaml(args.cfg)
    if args.table:  # ParseCLIOverrides analogue (audit.go:84–92)
        config.included_tables = [args.table]
    if args.views_only:
        config.views_only = True

    from audit_star_spark.provision import AuditStar
    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-provision", master=args.master)
    star = AuditStar(spark, config)
    specs, feeds, live_paths = specs_from_config(config)
    live = {fqn: spark.read.parquet(p) for fqn, p in live_paths.items()}
    report = star.provision(specs, feeds=feeds, live=live, views_only=config.views_only)

    for fqn in report.audited:
        print(f"audited   {fqn}")
    for fqn, why in report.skipped:
        print(f"skipped   {fqn}: {why}")
    for fqn, err in report.errors:
        print(f"ERROR     {fqn}: {err}")
    # C13: errors don't abort the run but do fail the exit code
    return 1 if report.errors else 0


if __name__ == "__main__":
    sys.exit(main())
