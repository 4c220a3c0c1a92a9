"""Cap checker for scripts/scale_gate.sh (r20: load-normalized).

Modes:
  gate    - check target/scale_gate_text.json + target/scale_gate_emb.json
  inject  - check target/scale_gate_inject.json (the sensitivity
            selftest: the caller EXPECTS a nonzero exit here)

Base caps are ~2x the idle medians measured on the round host (r20
measurement run, 32 threads / 128 GiB; see SCALING.md). Every cap is
scaled by the subset's own ambient inflation, measured in the SAME
run: j4_cartesian is data-independent (a 24-row cartesian of ranges),
so j4_median / J4_IDLE is pure host weather. The factor is clamped to
[1.0, 2.0]: uniform ambient contention observed across rounds is
1.2-1.8x, while the guarded regressions (direct banding 87.7 s,
direct IVF DNF, 657 s raw embedding serving vs a 2.5 s cap) sit 2.5-260x
past the base caps - so a clamped factor can never wave one through.
SPARK_GRAFT_GATE_SCALE multiplies all caps for a different host class.
"""
import json
import os
import sys

# Committed idle floor of j4_cartesian under the gate's REPS=2 subset
# protocol on the round host (r20 measurement run).
J4_IDLE = 0.075

# ~2x idle medians (r20 measurement run on the post-bump indexes).
BOUNDS = {
    "text": {
        "minhash_lsh_pairs": 38.0,         # idle 14.7-18.9 s (r18/r19)
        "simhash_pairs": 9.0,              # idle 3.75 s
        "neardup_clusters": 14.0,          # idle 6.34 s
        "minhash_incremental_pairs": 45.0, # idle 19.6-23.5 s
        "minhash_incremental_prebuilt": 11.0,  # v2 serving idle 4.5 s
        "dedup_exact_clusters": 3.0,       # idle 0.79 s
    },
    "emb": {
        "embedding_neardup_pairs": 32.0,   # idle 14.65 s
        "semantic_dedup": 16.0,            # idle 7.23 s
        "embedding_incremental_pairs": 13.0,   # idle 5.87 s
        "embedding_incremental_prebuilt": 10.0,  # v2 serving idle 3.7 s
    },
}

CAP_SCALE = float(os.environ.get("SPARK_GRAFT_GATE_SCALE", "1.0"))


def check(kind, path, bounds):
    b = json.load(open(path))
    qs = b["queries"]
    fail = 0
    j4 = qs.get("j4_cartesian")
    if j4 is None:
        print(f"[{kind}] j4_cartesian canary MISSING - cannot normalize")
        return 1
    factor = min(2.0, max(1.0, j4 / J4_IDLE))
    print(f"[{kind}] j4_cartesian {j4:.3f} s vs idle {J4_IDLE} "
          f"-> load factor {factor:.2f} (caps x{factor * CAP_SCALE:.2f})")
    if b.get("failed", 0):
        print(f"[{kind}] FAILED rows present: "
              f"{[k for k, v in qs.items() if v is None]}")
        fail = 1
    for name, base in bounds.items():
        cap = base * factor * CAP_SCALE
        got = qs.get(name)
        if got is None:
            print(f"[{kind}] {name}: MISSING/FAILED (cap {cap:.1f})")
            fail = 1
        elif got > cap:
            print(f"[{kind}] {name}: {got:.2f} s BREACHES cap {cap:.1f} "
                  f"(base {base})")
            fail = 1
        else:
            print(f"[{kind}] {name}: {got:.2f} s <= {cap:.1f} ok")
    return fail


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "gate"
    if mode == "inject":
        fail = check("inject", "target/scale_gate_inject.json",
                     {"minhash_lsh_pairs":
                      BOUNDS["text"]["minhash_lsh_pairs"]})
        print("SCALE_GATE " + ("FAIL" if fail else "OK"))
        sys.exit(fail)
    fail = 0
    fail |= check("text", "target/scale_gate_text.json", BOUNDS["text"])
    fail |= check("emb", "target/scale_gate_emb.json", BOUNDS["emb"])
    print("SCALE_GATE " + ("FAIL" if fail else "OK"))
    sys.exit(fail)


if __name__ == "__main__":
    main()
