#!/bin/bash
# min-of-3 bench protocol for the noisy shared host: fresh tmpfs per run,
# per-query minima printed as one JSON line.  Usage:
#   tools/bench_min3.sh <sf_dir> <out_prefix>
set -e
SF=${1:-/root/testdata/sf0.1}
PREFIX=${2:-/tmp/bench_min3}
for i in 1 2 3; do
  rm -rf /dev/shm/sparktmp && mkdir -p /dev/shm/sparktmp
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 timeout 900 python bench.py \
    2>/dev/null | tr '\r' '\n' | grep '"metric"' > ${PREFIX}_$i.json
done
python - "$PREFIX" <<'EOF'
import json, sys
p = sys.argv[1]
runs = [json.load(open(f"{p}_{i}.json")) for i in (1, 2, 3)]
mins = {k: min(r["queries"][k] for r in runs) for k in runs[0]["queries"]}
out = {
    "e2e_min": min(r["value"] for r in runs),
    "e2e_all": [r["value"] for r in runs],
    "queries_min": mins,
    "n_mentions": {r["n_mentions"] for r in runs}.pop(),
    "region_docs_matched": {r["region_docs_matched"] for r in runs}.pop(),
}
print(json.dumps(out))
EOF
