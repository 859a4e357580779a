"""Op-tree → DataFrame planner (SURVEY E2, §4).

Recursively lowers a parsed op-tree to ONE lazy Catalyst plan over the
postings tables.  Reproduces the reference evaluators' structure
(``SgOpTree::calc`` ``include/hic/static-htm-index.h:197-299``,
``HcqrOpTree::calc`` ``src/HcqrOpTree.cpp:13-153``) with their
empty-operand short-circuits (``src/HcqrOpTree.cpp:106-135``) done at plan
time: a statically-empty leaf (no dictionary token matches the pattern)
propagates ``None`` upward, pruning whole subtrees before Spark sees them.

The planner is deliberately driver-side-only Python — no Catalyst extension
needed (SURVEY §4 decision): leaves are filters on postings tables, inner
nodes are the cqr_* joins, and Catalyst/AQE handle the physical plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cqr import (
    cqr_all_to_full,
    cqr_difference,
    cqr_dilate,
    cqr_flatten,
    cqr_intersect,
    cqr_symdiff,
    cqr_union,
)
from ..operators.token_index import DEFAULT_MAX_KEY_LEN, match_tokens, resolve_qt
from ..sources.regions import region_by_id, region_by_name
from .optree import Node, parse

ALL_QTS = frozenset({"exact", "prefix", "suffix", "substring"})

# dictionary-expansion leaves lower to Column.isin(<literals>); above this
# many matches the literal list itself becomes the bottleneck (plan size,
# py4j transfer) and the leaf takes the distributed predicate instead
MAX_PLAN_LITERAL_TOKENS = 10_000


def _token_pred(pat: str, qt: str):
    """Distributed leaf predicate on the postings token column — the
    no-driver-dictionary path (dictionary > Engine.MAX_DRIVER_TOKENS)."""
    c = F.col("token")
    if qt == "exact":
        return c == F.lit(pat)
    if qt == "prefix":
        return c.startswith(pat)
    if qt == "suffix":
        return c.endswith(pat)
    if qt == "substring":
        return c.contains(pat)
    raise ValueError(qt)


@dataclass
class QueryContext:
    """Everything a query needs, for one (grid, res)."""

    spark: SparkSession
    grid: str
    res: int
    mcells: DataFrame          # (grid,res,doc_id,name,lat,lon,cell_id)
    ctotals: DataFrame         # (cell_id, doc_ids, n_docs) at (grid,res)
    tpostings: DataFrame       # token_postings at (grid,res), qt='exact'
    # driver-side token dictionary for plan-time expansion + static
    # empty-leaf pruning; None → leaves become distributed postings filters
    tokens: list[str] | None = None
    # query types with materialized payloads; a requested qt missing here
    # falls back down the reference chain substring→prefix→suffix→exact
    # (resolve_qt; src/OscarSearchWithSg.cpp:71-86)
    available_qts: frozenset = ALL_QTS
    # MATERIALIZED non-exact payload tables (token_index.
    # materialize_qt_postings) — a leaf with one becomes a single
    # key-equality lookup, the reference's per-trie-node payload read
    # (include/hic/OscarSearchSgIndex.h:29-35)
    qt_tables: dict | None = None
    # MATERIALIZED per-token HCQR payloads (hcqr.hcqr_postings_build — the
    # static HCQR index, ``src/static-htm-index.cpp:250-449``): single-token
    # HCQR leaves become one pushed-filter scan instead of a CQR lift +
    # compaction per query (r03 VERDICT item 4).  Populated by
    # Engine.hcqr_context; None → leaves lift their CQR as before.
    hcqr_tbl: DataFrame | None = None
    _pop_anc: DataFrame | None = None

    def pop_anc(self) -> DataFrame:
        """Cached populated-leaf counts per ancestor (HCQR compactify)."""
        if self._pop_anc is None:
            from ..operators.hcqr import pop_ancestor_counts

            self._pop_anc = pop_ancestor_counts(
                self.ctotals, self.grid, self.res
            ).cache()
        return self._pop_anc


class Planner:
    def __init__(self, ctx: QueryContext):
        self.ctx = ctx

    # -- public -------------------------------------------------------------
    def cqr(self, query: str) -> DataFrame | None:
        """Query string → CQR DataFrame (None == statically empty)."""
        return self._eval(parse(query))

    def docs(self, query: str) -> DataFrame:
        """Query string → flattened distinct doc_id DataFrame (Q10).

        The CQR is lazily checkpointed before flatten: cqr_flatten
        references it twice (fm branch joining cell_totals + pm explode),
        and without a plan boundary the whole op-tree join DAG executes
        once per reference (r06 — measured ~25% off every optree entry)."""
        c = self.cqr(query)
        if c is None:
            return self.ctx.spark.range(0).select(F.col("id").alias("doc_id"))
        return cqr_flatten(c.localCheckpoint(eager=False), self.ctx.ctotals)

    # -- HCQR evaluation (SURVEY E3) -----------------------------------------
    def hcqr(self, query: str) -> DataFrame | None:
        """Query → compactified HCQR DataFrame (pixel_id, level, is_fm,
        doc_ids).  Mirrors HcqrOpTree::calc (src/HcqrOpTree.cpp:13-153);
        '^' raises like the reference (src/HcqrOpTree.cpp:136-137).

        Inner set ops run WITHOUT per-node re-compaction (they preserve the
        normal form); one compactify at the root restores maximality —
        4x fewer Spark jobs per tree than the r01 per-op scheme."""
        n = parse(query)
        h = self._eval_hcqr(n)
        if h is None or n.op in ("token", "region", "poly", "rect", "cell", "dilate"):
            return h  # leaves come pre-compacted from hcqr_from_cqr
        from ..operators.hcqr import compactify

        ctx = self.ctx
        return compactify(
            h, ctx.grid, ctx.res, ctx.ctotals, pop_anc=ctx.pop_anc()
        ).localCheckpoint(eager=False)

    def hcqr_docs(self, query: str) -> DataFrame:
        """items() of the HCQR evaluation WITHOUT the root compactify: set
        ops preserve disjointness of their normal-form inputs (see
        operators/hcqr.py section comment), and items() only needs
        disjointness plus its own final dedup — compaction is a
        canonical-form/stats concern, ~4 shuffles a docs query can skip.
        Equality with hcqr()→items and with the flat CQR is asserted in
        tests/test_hcqr.py."""
        from ..operators.hcqr import hcqr_items

        h = self._eval_hcqr(parse(query))
        if h is None:
            return self.ctx.spark.range(0).select(F.col("id").alias("doc_id"))
        return hcqr_items(h, self.ctx.ctotals, self.ctx.grid, self.ctx.res, self.ctx.spark)

    def _eval_hcqr(self, n: Node) -> DataFrame | None:
        from ..operators.hcqr import hcqr_all_to_full, hcqr_from_cqr, hcqr_op

        ctx = self.ctx
        if n.op == "token" and ctx.hcqr_tbl is not None:
            # materialized static-HCQR index: a single-token leaf is ONE
            # pushed-filter scan of pre-compacted rows (reference loads the
            # serialized per-token tree, ``src/static-htm-index.cpp:202-207``)
            pat, qt = n.args
            qt = resolve_qt(qt, ctx.available_qts)
            if ctx.tokens is not None:
                matched = match_tokens(ctx.tokens, pat, qt)
                if not matched:
                    return None
                if len(matched) == 1:
                    # lazy checkpoint: the hcqr set ops reference each leaf
                    # up to 5x (fm/pm splits + broadcast f-sides) — without
                    # a boundary every reference rescans the postings table
                    # (r06; same rationale as docs()'s flatten boundary)
                    return ctx.hcqr_tbl.where(
                        F.col("token") == F.lit(matched[0])
                    ).select("pixel_id", "level", "is_fm", "doc_ids"
                             ).localCheckpoint(eager=False)
            elif qt == "exact":
                return ctx.hcqr_tbl.where(F.col("token") == F.lit(pat)).select(
                    "pixel_id", "level", "is_fm", "doc_ids"
                ).localCheckpoint(eager=False)
            # multi-token pattern: fall through to the CQR-lift path below
            # (a union of per-token compacted trees is not normal-form)
        if n.op in ("token", "region", "poly", "rect", "cell", "dilate"):
            # dilate has no structural HCQR form — like the spatial leaves,
            # its CQR result is lifted (and compacted) into the hierarchy
            c = self._eval(n)
            if c is None:
                return None
            return hcqr_from_cqr(
                c, ctx.grid, ctx.res, ctx.ctotals, pop_anc=ctx.pop_anc()
            )
        if n.op == "fm":
            h = self._eval_hcqr(n.args[0])
            return None if h is None else hcqr_all_to_full(h)
        if n.op == "sym":
            raise NotImplementedError(
                "HCQR does not support '^' (reference parity: HcqrOpTree.cpp:136)"
            )
        l = self._eval_hcqr(n.args[0])
        r = self._eval_hcqr(n.args[1])
        if n.op == "union":
            if l is None:
                return r
            if r is None:
                return l
        elif n.op == "inter":
            if l is None or r is None:
                return None
        elif n.op == "diff":
            if l is None:
                return None
            if r is None:
                return l
        return hcqr_op(n.op, l, r, ctx.grid, ctx.res, ctx.spark, ctx.ctotals,
                       pop_anc=ctx.pop_anc(), compact=False)

    # -- node lowering --------------------------------------------------------
    def _eval(self, n: Node) -> DataFrame | None:
        ctx = self.ctx
        if n.op == "token":
            pat, qt = n.args
            # reference qt-fallback chain when the requested payload is
            # unavailable (OscarSearchWithSg.cpp:71-86; VERDICT r01 item 4)
            qt = resolve_qt(qt, ctx.available_qts)
            if qt != "exact" and ctx.qt_tables and qt in ctx.qt_tables:
                # materialized payload: one key-equality row group per cell.
                # Entries are df or (df, max_key_len); a pattern longer than
                # the table's trie-depth cap is NOT in the payload — fall
                # through to the dictionary/distributed path (ADVICE r02:
                # the capped lookup silently returned empty)
                entry = ctx.qt_tables[qt]
                tbl, cap = (
                    entry if isinstance(entry, tuple) else (entry, DEFAULT_MAX_KEY_LEN)
                )
                if len(pat) <= cap:
                    tp = tbl.where(F.col("token") == F.lit(pat))
                    return tp.select("cell_id", "is_fm", "doc_ids")
            if ctx.tokens is not None:
                matched = match_tokens(ctx.tokens, pat, qt)
                if not matched:
                    return None
                if len(matched) > MAX_PLAN_LITERAL_TOKENS:
                    # a broad pattern (e.g. '*e*') over a large dictionary
                    # would lower to ONE In-expression carrying 10^5+ string
                    # literals through py4j — minutes of driver plan-build,
                    # potentially OOM.  The distributed postings-filter twin
                    # is plan-size O(1) and verified row-equivalent
                    # (tests/test_corpus_dictionary.py exercises both paths)
                    tp = ctx.tpostings.where(_token_pred(pat, qt))
                    single = qt == "exact"
                else:
                    tp = ctx.tpostings.where(F.col("token").isin(matched))
                    single = len(matched) == 1
            else:
                # web-scale dictionary: lower to a distributed filter on the
                # postings table (no driver-side token scan at all)
                tp = ctx.tpostings.where(_token_pred(pat, qt))
                single = qt == "exact"
            if single:
                return tp.select("cell_id", "is_fm", "doc_ids")
            # multi-token (prefix/suffix/substring) → per-cell union; fm wins
            return tp.groupBy("cell_id").agg(
                F.max("is_fm").alias("is_fm"),
                F.when(
                    F.max("is_fm"), F.lit(None)
                ).otherwise(
                    F.array_sort(F.array_distinct(F.flatten(F.collect_list("doc_ids"))))
                ).alias("doc_ids"),
            )
        if n.op in ("region", "poly", "rect"):
            if n.op == "rect":
                la0, la1, lo0, lo1 = n.args
                poly = np.array(
                    [[la0, lo0], [la0, lo1], [la1, lo1], [la1, lo0]], np.float64)
            else:
                poly = region_by_id(n.args[0]) if n.op == "region" else region_by_name(n.args[0])
            return self._region_cqr(poly)
        if n.op == "dilate":
            c = self._eval(n.args[0])
            # dilating the empty result is empty (no cells → no neighbors)
            if c is None:
                return None
            return cqr_dilate(c, ctx.grid, ctx.res, ctx.ctotals)
        if n.op == "cell":
            return ctx.spark.createDataFrame(
                [(int(n.args[0]), True, None)], "cell_id long, is_fm boolean, doc_ids array<long>"
            )
        if n.op == "fm":
            c = self._eval(n.args[0])
            return None if c is None else cqr_all_to_full(c)
        l = self._eval(n.args[0])
        r = self._eval(n.args[1])
        # empty-operand short-circuits (reference: HcqrOpTree.cpp:106-135)
        if n.op == "union":
            if l is None:
                return r
            if r is None:
                return l
            return cqr_union(l, r)
        if n.op == "inter":
            if l is None or r is None:
                return None
            return cqr_intersect(l, r)
        if n.op == "diff":
            if l is None:
                return None
            if r is None:
                return l
            return cqr_difference(l, r, self.ctx.ctotals)
        if n.op == "sym":
            if l is None:
                return r
            if r is None:
                return l
            return cqr_symdiff(l, r, self.ctx.ctotals)
        raise ValueError(n.op)

    def _region_cqr(self, poly: np.ndarray) -> DataFrame:
        """Polygon leaf → CQR: res-level fm cells inside + pm boundary cells
        with exact-PIP doc lists (the CQR face of operators/region_query)."""
        from ..functions.geo import pip_col
        from ..functions.udfs import parent_col
        from ..grids.base import get_grid
        from ..operators.region_query import (
            MAX_BROADCAST_CELLS,
            cached_covering,
            cells_df,
            expand_full_to_populated,
            populated_cells,
        )

        ctx = self.ctx
        g = get_grid(ctx.grid)
        full, boundary = cached_covering(ctx.grid, poly, ctx.res)
        spark = ctx.spark
        parts: list[DataFrame] = []
        pop = populated_cells(
            ctx.ctotals, (id(ctx.ctotals), ctx.grid, ctx.res), source=ctx.ctotals
        )
        fulls = None
        if pop is not None:
            fulls = expand_full_to_populated(ctx.grid, full, pop, ctx.res)
            if len(fulls) + len(boundary) > MAX_BROADCAST_CELLS:
                pop, fulls = None, None  # too big to ship — distributed path
            elif len(boundary):
                boundary = boundary[np.isin(boundary, pop)]
        if len(full):
            if pop is not None:
                # driver-side exact pruning: emit the populated fm cells
                # directly — zero Spark work for the full-match side
                if len(fulls):
                    parts.append(cells_df(spark, fulls, "cell_id").select(
                        "cell_id", F.lit(True).alias("is_fm"),
                        F.lit(None).cast("array<long>").alias("doc_ids"),
                    ))
            else:
                # distributed fallback: per-level ancestor equi-joins
                present = ctx.ctotals.select("cell_id")
                lvls = g.level(full)
                for lvl in np.unique(lvls):
                    cells = [(int(c),) for c in full[lvls == lvl]]
                    cdf = F.broadcast(spark.createDataFrame(cells, "fcell long"))
                    if int(lvl) == ctx.res:
                        cond = F.col("cell_id") == F.col("fcell")
                        parts.append(present.join(cdf, cond).select(
                            "cell_id", F.lit(True).alias("is_fm"),
                            F.lit(None).cast("array<long>").alias("doc_ids"),
                        ))
                    else:
                        anc = present.withColumn(
                            "anc", parent_col(ctx.grid, F.col("cell_id"), int(lvl), from_res=ctx.res)
                        )
                        parts.append(anc.join(cdf, F.col("anc") == F.col("fcell")).select(
                            "cell_id", F.lit(True).alias("is_fm"),
                            F.lit(None).cast("array<long>").alias("doc_ids"),
                        ))
        if len(boundary):
            bdf = F.broadcast(spark.createDataFrame(
                [(int(c),) for c in boundary], "bcell long"
            ))
            cand = ctx.mcells.join(bdf, F.col("cell_id") == F.col("bcell"))
            # PIP form choice mirrors region_query._batch_dim: when the
            # memoized mention-cell row counts (populated by any earlier
            # region query over the same table) bound the boundary rows
            # below PIP_HOF_MAX_ROWS, the polygon-independent interpreted
            # form skips the per-polygon codegen; otherwise the unrolled
            # codegen form that scales.  Bit-identical either way.
            from ..functions.geo import pip_hof_sql
            from ..operators.region_query import (
                PIP_HOF_MAX_ROWS,
                _pop_row_bound,
            )
            bnd_rows = _pop_row_bound(
                (id(ctx.mcells), ctx.grid, ctx.res),
                np.asarray(boundary, np.int64))
            pip_gate = (
                F.expr(pip_hof_sql("lat", "lon", poly))
                if bnd_rows is not None and bnd_rows <= PIP_HOF_MAX_ROWS
                else pip_col(F.col("lat"), F.col("lon"), poly))
            pm = (
                cand.where(pip_gate)
                .groupBy("cell_id")
                .agg(F.array_sort(F.collect_set("doc_id")).alias("m_docs"))
            )
            # a boundary cell where *every* doc matches is fm (classification
            # invariant, reference src/OscarSearchSgIndex.cpp:178-197)
            pm = pm.join(
                ctx.ctotals.select("cell_id", F.col("n_docs").alias("n_total")), "cell_id"
            ).select(
                "cell_id",
                (F.size("m_docs") == F.col("n_total")).alias("is_fm"),
                F.when(F.size("m_docs") == F.col("n_total"), F.lit(None))
                .otherwise(F.col("m_docs")).alias("doc_ids"),
            )
            parts.append(pm)
        if not parts:
            return self.ctx.spark.createDataFrame(
                [], "cell_id long, is_fm boolean, doc_ids array<long>"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
