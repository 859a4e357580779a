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
    def __init__(self, spark: SparkSession, sf_dir: str, cache: bool = True):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = cache
        self._ctx: dict[tuple[str, int], QueryContext] = {}
        self._tokens: list[str] | None = None
        self._tokens_loaded = False
        self.docs = load(spark, sf_dir, "documents")
        self.mentions = extract_mentions(spark, self.docs)
        if cache:
            self.mentions = self.mentions.cache()

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
            if self.cache:
                full = full.cache()
            mc = mention_cells_from_full(full, grid, res)
            ct = cell_totals_from_base(full, grid, res)
            tp = token_postings_from_base(full, ct, grid, res)
            if self.cache:
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

    def query_docs(self, query: str, grid: str = "s2", res: int = 10) -> DataFrame:
        """Flagship entry: op-tree query → distinct doc_id DataFrame."""
        return self.planner(grid, res).docs(query)
