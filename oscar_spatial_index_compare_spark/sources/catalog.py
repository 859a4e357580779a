"""Table catalog with snapshot lineage + resumable checkpoints (SURVEY S3,
M8; north_rule: "resumable from checkpoint with per-partition lineage +
metrics logged per snapshot").

Reference analog: ``osi-compare-create`` serializes the index to
``outdir/index`` + ``outdir/search`` and re-opens them read-only
(``apps/mainc.cpp:84-125``, ``src/static-htm-index.cpp:202-207``).  Here a
"serialized index" is a table directory; production target is Iceberg
(``writeTo(...).createOrReplace()`` — used automatically when a Spark
catalog is configured); the sandbox fallback is parquet + a JSON snapshot
log carrying the same information Iceberg snapshots would:

  snapshots.json: [{snapshot_id, table, stage, inputs (lineage),
                    n_rows, n_files, bytes, partition_columns, wall_sec}]

Resume semantics: ``materialize`` is a no-op returning the stored table when
a snapshot for (table, fingerprint) already exists — a pipeline re-run after
a crash skips every completed stage (checkpoint gating).  The fingerprint
covers the stage name + input lineage, so changed inputs re-materialize.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.log_path = os.path.join(root, "snapshots.json")
        # materialize() may be called from concurrent build threads (the
        # driver submits independent table writes in parallel to fill the
        # cluster through stage tails); the log append is read-modify-write
        self._log_lock = threading.Lock()
        if use_iceberg is None:
            use_iceberg = bool(
                spark.conf.get("spark.sql.catalog.osi", None)
            )
        self.use_iceberg = use_iceberg

    # -- snapshot log --------------------------------------------------------
    def _log(self) -> list[dict]:
        if os.path.exists(self.log_path):
            with open(self.log_path) as f:
                return json.load(f)
        return []

    def _append(self, entry: dict) -> None:
        with self._log_lock:
            log = self._log()
            log.append(entry)
            tmp = self.log_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(log, f, indent=1)
            os.replace(tmp, self.log_path)

    def snapshots(self, table: str | None = None) -> list[dict]:
        return [s for s in self._log() if table is None or s["table"] == table]

    @staticmethod
    def fingerprint(stage: str, inputs: list[str], params: dict | None = None) -> str:
        payload = json.dumps({"stage": stage, "inputs": sorted(inputs),
                              "params": params or {}}, sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def has(self, table: str, fp: str) -> bool:
        return any(s["table"] == table and s["fingerprint"] == fp for s in self._log())

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # -- materialize (checkpoint-gated write) ---------------------------------
    def materialize(
        self,
        df,  # DataFrame | Callable[[], DataFrame] (thunk: built only on write)
        table: str,
        stage: str,
        inputs: list[str],
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
        params: dict | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Write ``df`` as a snapshot of ``table`` unless an identical
        (stage, lineage, params) snapshot already exists; return the stored
        table either way.  ``sort_within`` pre-sorts partitions (postings
        sorted by cell_id → parquet min/max stats prune range queries).

        ``df`` may be a zero-arg callable returning the DataFrame: it is
        invoked only when a build is actually needed, so plan constructions
        that run eager Spark actions (the token build's vocab/collision
        audit) cost nothing on the checkpoint-gated resume path."""
        fp = self.fingerprint(stage, inputs, params)
        if not force and self.has(table, fp):
            return self.read(table)
        t0 = time.perf_counter()
        out = df() if callable(df) else df
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        if self.use_iceberg:
            w = out.writeTo(f"osi.{table}")
            if partition_by:
                from pyspark.sql import functions as F
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            writer = out.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.path(table))
        wall = time.perf_counter() - t0
        stored = self.read(table)
        n_rows = stored.count()
        n_files, nbytes = self._file_stats(table)
        self._append({
            "snapshot_id": f"{table}-{len(self.snapshots(table))}-{fp}",
            "table": table,
            "stage": stage,
            "fingerprint": fp,
            "inputs": inputs,
            "params": params or {},
            "n_rows": n_rows,
            "n_files": n_files,
            "bytes": nbytes,
            "partition_columns": partition_by or [],
            "wall_sec": round(wall, 3),
        })
        return stored

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"osi.{table}")
        return self.spark.read.parquet(self.path(table))

    def _file_stats(self, table: str) -> tuple[int, int]:
        n, b = 0, 0
        for dirpath, _dirs, files in os.walk(self.path(table)):
            for fn in files:
                if fn.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(dirpath, fn))
        return n, b


def build_index_checkpointed(spark: SparkSession, sf_dir: str, root: str,
                             grid: str = "s2", res: int = 10) -> Catalog:
    """The E1 build pipeline (documents → mentions → doc_cells →
    cell_totals → token_postings) as checkpoint-gated snapshots: rerunning
    after an interruption skips completed stages."""
    from ..engine import Engine
    from ..operators.index_build import cell_totals, doc_cells, mention_cells
    from ..operators.token_index import token_docs, token_postings

    cat = Catalog(spark, root)
    eng = Engine(spark, sf_dir, cache=False)
    m = cat.materialize(
        eng.mentions, "mentions", "extract_mentions", [sf_dir],
    )
    mc = cat.materialize(
        mention_cells(m, grid, res), "mention_cells", "mention_cells",
        ["mentions"], partition_by=["grid", "res"], sort_within=["cell_id"],
        params={"grid": grid, "res": res},
    )
    dc = doc_cells(mc)
    ct = cat.materialize(
        cell_totals(dc), "cell_totals", "cell_totals", ["mention_cells"],
        partition_by=["grid", "res"], sort_within=["cell_id"],
        params={"grid": grid, "res": res},
    )
    cat.materialize(
        token_postings(token_docs(eng.docs), dc, ct),
        "token_postings", "token_postings", ["mention_cells", "cell_totals"],
        partition_by=["grid", "res"], sort_within=["token", "cell_id"],
        params={"grid": grid, "res": res},
    )
    return cat
