#!/usr/bin/env bash
# One-command 100x collapse-family regression gate (r18 ask #5; caps
# load-normalized in r20 — VERDICT r19 ask #1).
#
# Builds the two 100x replica corpora if missing (target/scale100:
# 100 id-shifted copies of every sf0.1 document; target/emb100: 100
# copies of every sf0.1 embedding), then runs the collapse-family
# ONLY-subsets through graft.Bench on each and checks every row
# against a TIGHT cap (~2x the measured idle medians, r20 run)
# scaled by the AMBIENT LOAD measured in the same run: each subset
# carries j4_cartesian, a data-independent canary whose idle floor is
# committed below, and every cap is multiplied by
# clamp(j4_measured / J4_IDLE, 1.0, 1.5). A loaded host therefore
# widens the band only as far as its own measured inflation — the
# r19 fixed 2x-slack caps let a creeping 1.5-2x regression hide
# behind weather; these cannot — while the guarded catastrophes
# (direct banding: 87.7 s; direct IVF at emb100: DNF in 40 min) stay
# 5-100x past any reachable cap.
#
# Usage:
#   scripts/scale_gate.sh                  # the gate (~15-25 min: two
#                                          # sbt boards over the 100x
#                                          # corpora; first run also
#                                          # builds corpora + indexes)
#   scripts/scale_gate.sh --inject-selftest
#       # sensitivity demonstration (~4-6 min): re-runs the banded
#       # pair row with SPARK_GRAFT_INJECT_DIRECT=1 (SparkEntry pins
#       # every dup-mass gate to the DIRECT route — a synthetic
#       # routing regression) and exits 0 only if the caps TRIP.
#
# Env:
#   SPARK_GRAFT_SF_DIR0      override the sf0.1 source dir
#   SPARK_GRAFT_GATE_SCALE   extra cap multiplier, default 1.0 — for
#                            hosts of a different class than the one
#                            the idle medians were measured on (the
#                            committed caps and J4_IDLE come from the
#                            32-thread/128G round host; a slower box
#                            inflates j4 and big rows together, so
#                            the normalization absorbs most of it,
#                            but a clamped factor can't absorb >2x)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR0:-/root/testdata/sf0.1}
MODE=${1:-gate}
# reject unknown arguments instead of silently running the full
# ~15-25 min gate on a typo of --inject-selftest
if [ "$MODE" != gate ] && [ "$MODE" != "--inject-selftest" ]; then
  echo "unknown mode '$MODE' (expected no argument or --inject-selftest)" >&2
  exit 2
fi

[ -f target/scale100/documents.parquet ] || \
  python3 scripts/make_scale10.py "$SF" target/scale100 100

run_subset() { # dir only outfile  (env overrides via command prefix)
  local dir=$1 only=$2 out=$3
  # retries pinned off: a 100x subset's own tail pushes load_post past
  # the noise gate's last-resort bar, so the retry would re-measure
  # every board against self-induced load; the load normalization
  # below absorbs single-board weather instead
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ONLY="$only" \
    SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-2}" \
    SPARK_GRAFT_BOARD_RETRIES=0 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric":"total"' \
    | tail -1 > "$out"
}

if [ "$MODE" = "--inject-selftest" ]; then
  echo "== inject-selftest: direct-route injection must BREACH the caps =="
  # minhash_lsh_pairs is the demonstration row: its direct form has
  # measured 75.8-180.6 s at scale100 against the 47 s base cap (the
  # checker turns load normalization OFF in inject mode - the
  # injected run saturates the host and would peg the canary itself),
  # so the trip is unambiguous and the run stays short
  SPARK_GRAFT_INJECT_DIRECT=1 SPARK_GRAFT_REPS=1 run_subset target/scale100 \
    "minhash_lsh_pairs,j4_cartesian" \
    target/scale_gate_inject.json
  # exit-code contract with the checker: 0 = all caps passed,
  # 1 = a present row BREACHED a cap, 2 = row missing/failed or the
  # board JSON is unreadable. Only a genuine breach proves the gate
  # can trip — a crashed injected run must NOT report selftest OK.
  set +e
  python3 scripts/scale_gate_check.py inject
  rc=$?
  set -e
  case $rc in
    1) echo "INJECT_SELFTEST OK — synthetic regression tripped the gate"
       exit 0 ;;
    0) echo "INJECT_SELFTEST FAIL — synthetic regression did NOT trip the gate"
       exit 1 ;;
    *) echo "INJECT_SELFTEST FAIL — injected run crashed or board unreadable (rc=$rc)"
       exit 1 ;;
  esac
fi

[ -f target/emb100/embeddings.parquet ] || \
  python3 scripts/make_emb100.py "$SF" target/emb100 100

echo "== scale100 (text collapse family) =="
run_subset target/scale100 \
  "minhash_lsh_pairs,simhash_pairs,neardup_clusters,minhash_incremental_pairs,minhash_incremental_prebuilt,dedup_exact_clusters,j4_cartesian" \
  target/scale_gate_text.json
echo "== emb100 (embedding collapse family) =="
run_subset target/emb100 \
  "embedding_neardup_pairs,semantic_dedup,embedding_incremental_pairs,embedding_incremental_prebuilt,j4_cartesian" \
  target/scale_gate_emb.json

python3 scripts/scale_gate_check.py gate
