"""spark-submit entrypoints — the reference's app pair re-expressed.

``osi-compare-create`` (``apps/mainc.cpp``) → ``create``: build and
serialize the index tables for a corpus into a catalog directory, printing
one JSON line per snapshot (lineage + row/byte/wall metrics).

``osi-compare-query`` / ``osi-compare`` (``apps/mainq.cpp``, benchmark loop
``:175-376``) → ``query``: open the serialized catalog (checkpoint-gated —
an up-to-date table is never rebuilt) and run op-tree queries from ``-q`` or
a query file, with per-query wall times.

``stats`` → the snapshot log (``apps/mainq.cpp`` ``stats`` mode analog).

Launch (cluster):

    spark-submit --py-files oscar_spatial_index_compare_spark.zip \
        -m oscar_spatial_index_compare_spark create --corpus ... --catalog ...

or locally: ``python -m oscar_spatial_index_compare_spark <cmd> ...``.
The master/conf comes from spark-submit when present; standalone runs fall
back to ``local[$SPARK_GRAFT_CPUS]`` via :func:`session.get_spark`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--corpus", required=True, help="corpus dir (parquet tables)")
    p.add_argument("--catalog", required=True, help="catalog root dir")
    p.add_argument("--grid", default="s2", help="grid id (s2|h3|htm|zxy)")
    p.add_argument("--res", type=int, default=10, help="grid resolution")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="oscar_spatial_index_compare_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="build + serialize the index (mainc)")
    _add_common(c)
    c.add_argument("--hcqr", action="store_true",
                   help="also materialize the per-token HCQR payload table "
                        "(the reference's `hcqr` create mode)")
    c.add_argument("--dedup", action="store_true",
                   help="content-addressed posting store "
                        "(setDeduplication(true), apps/main.cpp:154)")

    q = sub.add_parser("query", help="query the serialized index (mainq)")
    _add_common(q)
    q.add_argument("-q", "--query", action="append", default=[],
                   help="op-tree query string (repeatable)")
    q.add_argument("--query-file", type=int, default=0, metavar="N",
                   help="also run the built-in N-polygon region query file")
    q.add_argument("--hcqr", action="store_true",
                   help="evaluate through the static HCQR index")
    q.add_argument("--count-only", action="store_true",
                   help="print result counts instead of doc ids")

    s = sub.add_parser("stats", help="print the catalog snapshot log")
    s.add_argument("--catalog", required=True)
    return ap


def cmd_create(args) -> int:
    from .engine import Engine
    from .session import get_spark

    spark = get_spark(app_name="osi-create")
    eng = Engine(spark, args.corpus, catalog_root=args.catalog,
                 posting_store=args.dedup)
    seen = {s["snapshot_id"] for s in eng.catalog.snapshots()}
    eng.context(args.grid, args.res)
    if args.hcqr:
        eng.hcqr_context(args.grid, args.res)
    for snap in eng.catalog.snapshots():
        if snap["snapshot_id"] not in seen:
            print(json.dumps(snap))
    return 0


def cmd_query(args) -> int:
    from .engine import Engine
    from .session import get_spark

    spark = get_spark(app_name="osi-query")
    eng = Engine(spark, args.corpus, catalog_root=args.catalog,
                 posting_store=False)
    run = eng.hcqr_docs if args.hcqr else eng.query_docs
    for q in args.query:
        t0 = time.perf_counter()
        df = run(q, grid=args.grid, res=args.res)
        if args.count_only:
            out = {"query": q, "n_docs": df.count()}
        else:
            out = {"query": q,
                   "doc_ids": sorted(r.doc_id for r in df.collect())}
        out["wall_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(out))
    if args.query_file:
        from .operators.region_query import region_query_batch_counts
        from .sources.regions import region_query_file

        ctx = eng.context(args.grid, args.res)
        t0 = time.perf_counter()
        rows = region_query_batch_counts(
            spark, ctx.mcells, region_query_file(args.query_file),
            args.grid, args.res).collect()
        print(json.dumps({
            "query_file": args.query_file,
            "wall_sec": round(time.perf_counter() - t0, 3),
            "counts": {r.region: r.n_docs for r in rows},
        }))
    return 0


def cmd_stats(args) -> int:
    from .session import get_spark
    from .sources.catalog import Catalog

    cat = Catalog(get_spark(app_name="osi-stats"), args.catalog)
    for snap in cat.snapshots():
        print(json.dumps(snap))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return {"create": cmd_create, "query": cmd_query, "stats": cmd_stats}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
