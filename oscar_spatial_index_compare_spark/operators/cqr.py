"""Cell-query-result (CQR) algebra — SURVEY §2.4, Q4-Q10.

A CQR is a DataFrame ``(cell_id long, is_fm boolean, doc_ids array<long>)``
with doc_ids NULL iff is_fm (reference: ``include/hic/static-htm-index.h:
302-313``).  The set operations reproduce the fm/pm case analysis of the
reference evaluators (``src/OscarSearchWithSg.cpp:190-198``,
``src/HcqrOpTree.cpp:106-141``):

  * union        — full-outer join; fm wins
  * intersection — inner join; fm∩fm→fm, fm∩pm→pm(other side), pm∩pm→array_intersect
  * difference   — left join; X−∅=X, fm−fm=∅, pm−fm=∅, fm−pm needs cell totals
  * symdiff      — native one-pass xor via full-outer join (reference
                   ``apps/mainq.cpp:416-481``; HCQR doesn't support ^ at all —
                   ``src/HcqrOpTree.cpp:136-137``)
  * all_to_full  — Q8 FM_CONVERSION ``*`` (``src/HcqrOpTree.cpp:70-79``)
  * flatten      — Q10: fm cells pull their full posting list from
                   cell_totals, pm arrays explode; distinct doc set

Laziness: every op returns an unevaluated DataFrame, so an op-tree becomes
ONE Catalyst plan — the reference's TreedCQR deferred evaluation
(``src/static-htm-index.cpp:213-215``) for free (SURVEY Q11/E2).

Scale: joins are equi-joins on cell_id; CQRs inherit the bucketing of the
postings tables, so same-key joins avoid re-shuffles; AQE handles the hot
metro cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CQR_COLS = ["cell_id", "is_fm", "doc_ids"]


def _norm(df: DataFrame) -> DataFrame:
    return df.select("cell_id", "is_fm", "doc_ids")


def cqr_union(left: DataFrame, right: DataFrame) -> DataFrame:
    l = _norm(left).alias("l")
    r = _norm(right).alias("r")
    j = l.join(r, F.col("l.cell_id") == F.col("r.cell_id"), "full_outer")
    is_fm = F.coalesce(F.col("l.is_fm"), F.lit(False)) | F.coalesce(
        F.col("r.is_fm"), F.lit(False)
    )
    doc_ids = (
        F.when(is_fm, F.lit(None))
        .when(F.col("l.doc_ids").isNull(), F.col("r.doc_ids"))
        .when(F.col("r.doc_ids").isNull(), F.col("l.doc_ids"))
        .otherwise(F.array_sort(F.array_union(F.col("l.doc_ids"), F.col("r.doc_ids"))))
    )
    return j.select(
        F.coalesce(F.col("l.cell_id"), F.col("r.cell_id")).alias("cell_id"),
        is_fm.alias("is_fm"),
        doc_ids.alias("doc_ids"),
    )


def cqr_intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    l = _norm(left).alias("l")
    r = _norm(right).alias("r")
    j = l.join(r, F.col("l.cell_id") == F.col("r.cell_id"), "inner")
    is_fm = F.col("l.is_fm") & F.col("r.is_fm")
    doc_ids = (
        F.when(is_fm, F.lit(None))
        .when(F.col("l.is_fm"), F.col("r.doc_ids"))
        .when(F.col("r.is_fm"), F.col("l.doc_ids"))
        .otherwise(F.array_sort(F.array_intersect(F.col("l.doc_ids"), F.col("r.doc_ids"))))
    )
    out = j.select(
        F.col("l.cell_id").alias("cell_id"), is_fm.alias("is_fm"), doc_ids.alias("doc_ids")
    )
    return out.where(F.col("is_fm") | (F.size("doc_ids") > 0))


def cqr_difference(left: DataFrame, right: DataFrame, ctotals: DataFrame) -> DataFrame:
    """L − R.  ``ctotals``: (cell_id, doc_ids) full per-cell lists — joined
    lazily and only for the fm−pm cells (SURVEY §7 hard-part 3)."""
    l = _norm(left).alias("l")
    r = _norm(right).alias("r")
    # the case analysis below references the join THREE times — a lazy
    # plan boundary computes it once instead of once per branch (r06)
    j = l.join(r, F.col("l.cell_id") == F.col("r.cell_id"), "left"
               ).localCheckpoint(eager=False)
    passthrough = j.where(F.col("r.cell_id").isNull()).select(
        F.col("l.cell_id").alias("cell_id"),
        F.col("l.is_fm").alias("is_fm"),
        F.col("l.doc_ids").alias("doc_ids"),
    )
    pm_pm = (
        j.where(F.col("r.cell_id").isNotNull() & ~F.col("l.is_fm") & ~F.col("r.is_fm"))
        .select(
            F.col("l.cell_id").alias("cell_id"),
            F.lit(False).alias("is_fm"),
            F.array_sort(F.array_except(F.col("l.doc_ids"), F.col("r.doc_ids"))).alias("doc_ids"),
        )
        .where(F.size("doc_ids") > 0)
    )
    fm_pm = (
        j.where(F.col("r.cell_id").isNotNull() & F.col("l.is_fm") & ~F.col("r.is_fm"))
        .select(F.col("l.cell_id").alias("cell_id"), F.col("r.doc_ids").alias("r_docs"))
        .join(ctotals.select("cell_id", F.col("doc_ids").alias("t_docs")), "cell_id")
        .select(
            "cell_id",
            F.lit(False).alias("is_fm"),
            F.array_sort(F.array_except(F.col("t_docs"), F.col("r_docs"))).alias("doc_ids"),
        )
        .where(F.size("doc_ids") > 0)
    )
    # fm−fm and pm−fm vanish
    return passthrough.unionByName(pm_pm).unionByName(fm_pm)


def cqr_symdiff(left: DataFrame, right: DataFrame, ctotals: DataFrame) -> DataFrame:
    """L ^ R — native one-pass xor (reference ``apps/mainq.cpp:416-481``).

    ONE full-outer join computing the xor cases directly (r02 VERDICT item 4:
    the previous ``(L∪R)−(L∩R)`` composition evaluated each operand subtree
    twice and ran three joins):

      * cell only in one side  → pass through unchanged
      * fm ^ fm                → cancels (drop)
      * fm ^ pm                → totals − pm docs (ctotals joined lazily, for
                                 exactly these cells — SURVEY §7 hard-part 3)
      * pm ^ pm                → (L−R) ∪ (R−L), drop when empty
    """
    l = _norm(left).alias("l")
    r = _norm(right).alias("r")
    # four references below (only_l/only_r/pm_pm/fm_pm) — one boundary
    # instead of four evaluations of the operand subtrees (r06)
    j = l.join(r, F.col("l.cell_id") == F.col("r.cell_id"), "full_outer"
               ).localCheckpoint(eager=False)
    only_l = j.where(F.col("r.cell_id").isNull()).select(
        F.col("l.cell_id").alias("cell_id"),
        F.col("l.is_fm").alias("is_fm"),
        F.col("l.doc_ids").alias("doc_ids"),
    )
    only_r = j.where(F.col("l.cell_id").isNull()).select(
        F.col("r.cell_id").alias("cell_id"),
        F.col("r.is_fm").alias("is_fm"),
        F.col("r.doc_ids").alias("doc_ids"),
    )
    both = j.where(F.col("l.cell_id").isNotNull() & F.col("r.cell_id").isNotNull())
    pm_pm = (
        both.where(~F.col("l.is_fm") & ~F.col("r.is_fm"))
        .select(
            F.col("l.cell_id").alias("cell_id"),
            F.lit(False).alias("is_fm"),
            F.array_sort(
                F.array_union(
                    F.array_except(F.col("l.doc_ids"), F.col("r.doc_ids")),
                    F.array_except(F.col("r.doc_ids"), F.col("l.doc_ids")),
                )
            ).alias("doc_ids"),
        )
        .where(F.size("doc_ids") > 0)
    )
    fm_pm = (
        both.where(F.col("l.is_fm") != F.col("r.is_fm"))
        .select(
            F.col("l.cell_id").alias("cell_id"),
            F.coalesce(F.col("l.doc_ids"), F.col("r.doc_ids")).alias("pm_docs"),
        )
        .join(ctotals.select("cell_id", F.col("doc_ids").alias("t_docs")), "cell_id")
        .select(
            "cell_id",
            F.lit(False).alias("is_fm"),
            F.array_sort(F.array_except(F.col("t_docs"), F.col("pm_docs"))).alias("doc_ids"),
        )
        .where(F.size("doc_ids") > 0)
    )
    # fm ^ fm cancels
    return only_l.unionByName(only_r).unionByName(pm_pm).unionByName(fm_pm)


def cqr_dilate(cqr: DataFrame, grid: str, res: int, ctotals: DataFrame) -> DataFrame:
    """One-ring CELL_DILATION: every cell adjacent to a result cell joins
    the result as a full-match cell (its whole population matches).

    The reference enumerates CELL_DILATION but stubs it in every evaluator
    (``src/OscarSearchWithSg.cpp:167-181``); implemented here for the
    closed-form zxy grid: the 8-neighborhood is pure column bit math
    (x wraps around the antimeridian, y clamps at the poles — slippy-map
    semantics).  Cells already in the CQR keep their rows (a pm cell is NOT
    promoted by being its neighbor's neighbor); added cells are semi-joined
    against the populated-cell set — an unpopulated fm cell flattens to
    nothing, so dropping it early is result-identical and avoids growing
    the CQR with dead rows at scale.
    """
    if grid != "zxy":
        raise NotImplementedError(
            "CELL_DILATION is implemented for the zxy grid (closed-form "
            "neighbors); the reference stubs it everywhere "
            "(src/OscarSearchWithSg.cpp:167-181)"
        )
    c = _norm(cqr)
    n = F.lit(1 << res).cast("long")
    x = F.shiftright(F.col("cell_id"), 28).bitwiseAND(F.lit((1 << 28) - 1))
    y = F.col("cell_id").bitwiseAND(F.lit((1 << 28) - 1))
    nbrs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx = F.pmod(x + F.lit(dx), n)
            ny = y + F.lit(dy)
            nid = (
                F.lit(res).cast("long") * F.lit(1 << 56).cast("long")
                + nx * F.lit(1 << 28).cast("long") + ny
            )
            nbrs.append(F.when((ny >= 0) & (ny < n), nid))
    nb = c.select(
        F.explode(F.array_compact(F.array(*nbrs))).alias("cell_id")
    ).dropDuplicates(["cell_id"])
    added = (
        nb.join(c.select("cell_id"), "cell_id", "left_anti")
        .join(ctotals.select("cell_id"), "cell_id", "left_semi")
        .select(
            "cell_id", F.lit(True).alias("is_fm"),
            F.lit(None).cast("array<long>").alias("doc_ids"),
        )
    )
    return c.unionByName(added)


def cqr_all_to_full(cqr: DataFrame) -> DataFrame:
    return _norm(cqr).select(
        "cell_id", F.lit(True).alias("is_fm"),
        F.lit(None).cast("array<long>").alias("doc_ids"),
    )


def cqr_flatten(cqr: DataFrame, ctotals: DataFrame) -> DataFrame:
    """→ DataFrame(doc_id) distinct — Q10 ``flaten``."""
    c = _norm(cqr)
    fm = (
        c.where(F.col("is_fm"))
        .join(ctotals.select("cell_id", F.col("doc_ids").alias("t_docs")), "cell_id")
        .select(F.explode("t_docs").alias("doc_id"))
    )
    pm = c.where(~F.col("is_fm")).select(F.explode("doc_ids").alias("doc_id"))
    return fm.unionByName(pm).dropDuplicates(["doc_id"])


def cqr_stats(cqr: DataFrame) -> DataFrame:
    """Q12-ish metrics: cell count, fm/pm split, pm item total."""
    return _norm(cqr).agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.col("is_fm").cast("long")).cast("long").alias("n_fm"),
        F.sum(F.when(F.col("is_fm"), 0).otherwise(F.size("doc_ids"))).cast("long").alias("pm_items"),
    )
