"""create/query/stats CLI (``apps/mainc.cpp`` / ``apps/mainq.cpp`` analog).

Runs ``cli.main`` in-process — ``get_spark`` reuses the active test session
via ``getOrCreate`` — so the tests cover arg plumbing, the create→query
split, and the printed snapshot/result JSON without extra JVM spins.
"""

from __future__ import annotations

import json
import tempfile

from oscar_spatial_index_compare_spark import cli
from tests.conftest import SF_DIR


def _run(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    return [json.loads(x) for x in capsys.readouterr().out.splitlines() if x]


def test_create_then_query_then_stats(spark, engine, capsys):
    root = tempfile.mkdtemp(prefix="osi_cli_")
    snaps = _run(capsys, ["create", "--corpus", SF_DIR, "--catalog", root,
                          "--grid", "s2", "--res", "10"])
    tables = {s["table"] for s in snaps}
    assert {"index_base_s2_10", "mention_cells_s2_10", "cell_totals_s2_10",
            "token_postings_s2_10"} <= tables
    assert all(s["n_rows"] > 0 and s["wall_sec"] >= 0 for s in snaps)

    # second create is checkpoint-gated: nothing new to write
    assert _run(capsys, ["create", "--corpus", SF_DIR, "--catalog", root]) == []

    out = _run(capsys, ["query", "--corpus", SF_DIR, "--catalog", root,
                        "-q", "join / window", "--count-only"])
    want = engine.planner("s2", 10).docs("join / window").count()
    assert out[0]["n_docs"] == want

    log = _run(capsys, ["stats", "--catalog", root])
    assert {s["table"] for s in log} == tables


def test_create_dedup_mode(spark, capsys):
    root = tempfile.mkdtemp(prefix="osi_cli_ps_")
    snaps = _run(capsys, ["create", "--corpus", SF_DIR, "--catalog", root,
                          "--dedup"])
    tables = {s["table"] for s in snaps}
    assert "posting_lists_s2_10" in tables
    assert "token_postings_refs_s2_10" in tables
    assert "token_postings_s2_10" not in tables
