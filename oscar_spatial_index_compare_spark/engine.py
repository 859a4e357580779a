"""Engine facade: assemble tables + query contexts for one corpus.

This is the ``OsmCompleter::energize()`` analog (``apps/main.cpp:111-121``):
given a corpus directory it wires the one-pass index base (doc_index_base) →
cell_totals → token_postings and hands out Planner-ready QueryContexts.
Tables are cached on first use (the reference mmaps + preloads, SURVEY S7).

Token dictionary (r01 VERDICT fix): the query-time dictionary is derived
from the CORPUS (distinct text tokens), not a hardcoded gazetteer list —
mirroring the reference's full trie (``src/OscarSearchWithSg.cpp:53-102``).
Below ``MAX_DRIVER_TOKENS`` it is collected once per Engine and reused for
plan-time leaf expansion + static empty-leaf pruning; above the cap the
Planner falls back to distributed postings-filter leaves (no driver-side
dictionary at all — the 100 TB path).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.index_build import (
    cell_totals_from_base,
    doc_index_full,
    mention_cells_from_full,
)
from .operators.mentions import extract_mentions
from .operators.token_index import token_postings_from_base
from .plans.planner import Planner, QueryContext
from .sources.tables import load

# Largest token dictionary worth holding on the driver for plan-time leaf
# expansion; beyond it leaves lower to distributed filters on token_postings.
MAX_DRIVER_TOKENS = 1_000_000


class Engine:
    """``catalog_root`` switches the engine into the reference's
    create→query split (``apps/mainc.cpp`` → ``src/static-htm-index.cpp:
    202-207``): every QueryContext table is MATERIALIZED (written sorted,
    then read back), so query leaves are pruned parquet scans over a static
    index instead of recomputed session-cached lineage (r02 VERDICT missing
    #1).  Without it, tables stay lazy cached frames (the in-memory
    ``osi-compare`` mode, ``apps/main.cpp``)."""

    # bounded driver-side result cache — the HCQRIndexWithCache analog
    # (``apps/mainq.cpp:495-497``): repeated identical queries return the
    # same localCheckpointed frame, so re-execution is a block read
    RESULT_CACHE_CAP = 64

    def __init__(self, spark: SparkSession, sf_dir: str, cache: bool = True,
                 catalog_root: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = cache
        self.catalog = None
        if catalog_root is not None:
            from .sources.catalog import Catalog

            self.catalog = Catalog(spark, catalog_root)
        self._ctx: dict[tuple[str, int], QueryContext] = {}
        self._tokens: list[str] | None = None
        self._tokens_loaded = False
        self._n_docs: int | None = None
        self._results: "OrderedDict[tuple, DataFrame]" = OrderedDict()
        self.docs = load(spark, sf_dir, "documents")
        self.mentions = extract_mentions(spark, self.docs)
        if cache:
            self.mentions = self.mentions.cache()

    def n_docs(self) -> int:
        """Corpus size, counted once per Engine — the exact bound that lets
        cell_totals skip its hot-cell pre-pass (a cell can never hold more
        rows than the corpus has docs; VERDICT r02 item 1)."""
        if self._n_docs is None:
            self._n_docs = self.docs.count()
        return self._n_docs

    def corpus_tokens(self) -> list[str] | None:
        """Sorted distinct corpus tokens, or None when the dictionary exceeds
        MAX_DRIVER_TOKENS (callers then use the distributed leaf path)."""
        if not self._tokens_loaded:
            rows = (
                self.docs.select(
                    F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t")
                )
                .distinct()
                .limit(MAX_DRIVER_TOKENS + 1)
                .collect()
            )
            self._tokens = (
                None if len(rows) > MAX_DRIVER_TOKENS else sorted(r.t for r in rows)
            )
            self._tokens_loaded = True
        return self._tokens

    def context(self, grid: str = "s2", res: int = 10) -> QueryContext:
        key = (grid, res)
        if key not in self._ctx:
            # ONE cached frame feeds every index table (the gazetteer match
            # runs once per corpus pass); mention_cells is an explode view
            full = doc_index_full(self.docs, grid, res)
            if self.cache or self.catalog is not None:
                full = full.cache()
            mc = mention_cells_from_full(full, grid, res)
            ct = cell_totals_from_base(full, grid, res, n_docs_hint=self.n_docs())
            tp = token_postings_from_base(full, ct, grid, res)
            if self.catalog is not None:
                # create→query split: write each table sorted (postings by
                # cell/token → parquet min-max prune leaf filters) and hand
                # the STORED tables to the planner; the one-pass base is
                # only needed during the build and is dropped after
                suffix = f"{grid}_{res}"
                params = {"grid": grid, "res": res}
                mc = self.catalog.materialize(
                    mc, f"mention_cells_{suffix}", "mention_cells",
                    [self.sf_dir], sort_within=["cell_id"], params=params)
                ct = self.catalog.materialize(
                    ct, f"cell_totals_{suffix}", "cell_totals",
                    [self.sf_dir], sort_within=["cell_id"], params=params)
                tp = self.catalog.materialize(
                    tp, f"token_postings_{suffix}", "token_postings",
                    [self.sf_dir], sort_within=["token", "cell_id"], params=params)
                full.unpersist()
            elif self.cache:
                ct = ct.cache()
                tp = tp.cache()
            self._ctx[key] = QueryContext(
                spark=self.spark, grid=grid, res=res,
                mcells=mc, ctotals=ct, tpostings=tp,
                tokens=self.corpus_tokens(),
            )
        return self._ctx[key]

    def planner(self, grid: str = "s2", res: int = 10) -> Planner:
        return Planner(self.context(grid, res))

    def query_docs(self, query: str, grid: str = "s2", res: int = 10,
                   use_cache: bool = True) -> DataFrame:
        """Flagship entry: op-tree query → distinct doc_id DataFrame.

        Repeated identical queries return the SAME localCheckpointed frame
        (bounded LRU) — the reference's ``HCQRIndexWithCache`` wrapper
        (``apps/mainq.cpp:495-497``); the checkpoint materializes on first
        action and later executions are block reads."""
        return self._cached(("docs", query, grid, res),
                            lambda: self.planner(grid, res).docs(query),
                            use_cache)

    def hcqr_docs(self, query: str, grid: str = "s2", res: int = 10,
                  use_cache: bool = True) -> DataFrame:
        """HCQR-path flagship entry, result-cached like query_docs."""
        return self._cached(("hcqr", query, grid, res),
                            lambda: self.planner(grid, res).hcqr_docs(query),
                            use_cache)

    def _cached(self, key: tuple, build, use_cache: bool) -> DataFrame:
        if not use_cache:
            return build()
        if key in self._results:
            self._results.move_to_end(key)
            return self._results[key]
        df = build().localCheckpoint(eager=False)
        self._results[key] = df
        while len(self._results) > self.RESULT_CACHE_CAP:
            self._results.popitem(last=False)
        return df
