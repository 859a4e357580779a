"""Engine facade: assemble tables + query contexts for one corpus.

This is the ``OsmCompleter::energize()`` analog (``apps/main.cpp:111-121``):
given a corpus directory it wires mentions → mention_cells → cell_totals →
token_postings and hands out Planner-ready QueryContexts.  Tables are cached
on first use (the reference mmaps + preloads, SURVEY S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.index_build import cell_totals, doc_cells, mention_cells
from .operators.mentions import extract_mentions
from .operators.token_index import token_docs, token_postings
from .plans.planner import Planner, QueryContext
from .sources.gazetteer import VOCAB
from .sources.tables import load


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str, cache: bool = True):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = cache
        self._ctx: dict[tuple[str, int], QueryContext] = {}
        self.docs = load(spark, sf_dir, "documents")
        self.mentions = extract_mentions(spark, self.docs)
        if cache:
            self.mentions = self.mentions.cache()

    def context(self, grid: str = "s2", res: int = 10) -> QueryContext:
        key = (grid, res)
        if key not in self._ctx:
            mc = mention_cells(self.mentions, grid, res)
            dc = doc_cells(mc)
            ct = cell_totals(dc)
            tp = token_postings(token_docs(self.docs), dc, ct)
            if self.cache:
                mc = mc.cache()
                ct = ct.cache()
                tp = tp.cache()
            self._ctx[key] = QueryContext(
                spark=self.spark, grid=grid, res=res,
                mcells=mc, ctotals=ct, tpostings=tp, tokens=list(VOCAB),
            )
        return self._ctx[key]

    def planner(self, grid: str = "s2", res: int = 10) -> Planner:
        return Planner(self.context(grid, res))

    def query_docs(self, query: str, grid: str = "s2", res: int = 10) -> DataFrame:
        """Flagship entry: op-tree query → distinct doc_id DataFrame."""
        return self.planner(grid, res).docs(query)
