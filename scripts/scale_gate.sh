#!/usr/bin/env bash
# One-command 100x collapse-family regression gate (VERDICT r18 ask #5).
#
# Builds the two 100x replica corpora if missing (target/scale100:
# 100 id-shifted copies of every sf0.1 document; target/emb100: 100
# copies of every sf0.1 embedding), then runs the collapse-family
# ONLY-subsets through graft.Bench on each and checks every row
# against a generous upper bound derived from the r18/r19 measured
# band (roughly 2x the loaded-host medians). A breach means the
# duplicate-mass-gated collapse routing regressed — the direct forms
# measured 87.7 s (minhash) and did-not-finish-in-40-min (embedding
# family) on these corpora, so a regression is unmistakable.
#
# Usage: scripts/scale_gate.sh   (from the repo root; ~6-10 min)
# Env: SPARK_GRAFT_SF_DIR0 to override the sf0.1 source dir.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR0:-/root/testdata/sf0.1}

[ -f target/scale100/documents.parquet ] || \
  python3 scripts/make_scale10.py "$SF" target/scale100 100
[ -f target/emb100/embeddings.parquet ] || \
  python3 scripts/make_emb100.py "$SF" target/emb100 100

run_subset() { # dir only outfile
  local dir=$1 only=$2 out=$3
  # retries pinned off: a 100x subset's own tail pushes load_post past
  # the noise gate's last-resort bar, so the retry would re-measure
  # every board against self-induced load; the caps below carry 2x
  # slack precisely so single-board weather cannot false-alarm
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$only" SPARK_GRAFT_REPS=2 \
    SPARK_GRAFT_BOARD_RETRIES=0 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric":"total"' \
    | tail -1 > "$out"
}

echo "== scale100 (text collapse family) =="
run_subset target/scale100 \
  "minhash_lsh_pairs,simhash_pairs,neardup_clusters,minhash_incremental_pairs,minhash_incremental_prebuilt,dedup_exact_clusters,j4_cartesian" \
  target/scale_gate_text.json
echo "== emb100 (embedding collapse family) =="
run_subset target/emb100 \
  "embedding_neardup_pairs,semantic_dedup,embedding_incremental_pairs,embedding_incremental_prebuilt,j4_cartesian" \
  target/scale_gate_emb.json

python3 - <<'EOF'
import json, sys

# Upper bounds: ~2x the r18/r19 measured loaded-host medians. The
# regression being guarded is 5-100x past these (direct banding:
# 87.7 s; direct IVF at emb100: DNF), so the slack never masks it.
BOUNDS = {
    "text": {
        "minhash_lsh_pairs": 50.0,        # r18: 14.7-18.9 s; r19 loaded run 29.4
        "simhash_pairs": 12.0,            # r18: 3.75 s
        "neardup_clusters": 16.0,         # r18: 6.34 s
        "minhash_incremental_pairs": 50.0, # r18: 19.6-23.5 s
        "minhash_incremental_prebuilt": 50.0,  # r19 v2 serving index
        "dedup_exact_clusters": 5.0,      # r18: 0.79 s
    },
    "emb": {
        "embedding_neardup_pairs": 50.0,  # r18: 14.65 s; r19 loaded run 35.1
        "semantic_dedup": 20.0,           # r18: 7.23 s
        "embedding_incremental_pairs": 15.0,   # r18: 5.87 s
        "embedding_incremental_prebuilt": 30.0,  # r19 v2 serving index
    },
}
fail = 0
for kind, path in (("text", "target/scale_gate_text.json"),
                   ("emb", "target/scale_gate_emb.json")):
    b = json.load(open(path))
    qs = b["queries"]
    if b.get("failed", 0):
        print(f"[{kind}] FAILED rows present: "
              f"{[k for k, v in qs.items() if v is None]}")
        fail = 1
    for name, cap in BOUNDS[kind].items():
        got = qs.get(name)
        if got is None:
            print(f"[{kind}] {name}: MISSING/FAILED (cap {cap})")
            fail = 1
        elif got > cap:
            print(f"[{kind}] {name}: {got:.2f} s BREACHES cap {cap}")
            fail = 1
        else:
            print(f"[{kind}] {name}: {got:.2f} s <= {cap} ok")
print("SCALE_GATE " + ("FAIL" if fail else "OK"))
sys.exit(fail)
EOF
