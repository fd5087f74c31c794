"""Round-3 scaling bisect (VERDICT r2 #2): run the pinned 2→8-core
scaling block back-to-back TWICE (same persisted input, best-of-3 per
level per set) and print per-set efficiencies — evidence for whether
the r01→r02 score-stage drop (0.976→0.773) is engine code or host
variance. Usage: python scripts/scaling_bisect.py [n_sets] [repeats]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench._materialize_scaling_input()
    out = []
    for s in range(n_sets):
        lo = bench._best_of(bench.SCALE_LO, repeats)
        hi = bench._best_of(bench.SCALE_HI, repeats)
        span = hi["cores"] / lo["cores"]
        row = {
            "set": s,
            "lo": {k: lo[k] for k in ("sec", "construct_sec", "encode_sec", "score_sec")},
            "hi": {k: hi[k] for k in ("sec", "construct_sec", "encode_sec", "score_sec")},
            "eff_encode": round((hi["names_per_sec"] / lo["names_per_sec"]) / span, 3),
            "eff_score": round((hi["pairs_per_sec"] / lo["pairs_per_sec"]) / span, 3),
            "eff_construct": round((hi["pages_per_sec"] / lo["pages_per_sec"]) / span, 3),
            "eff_e2e": round((hi["triples_per_sec"] / lo["triples_per_sec"]) / span, 3),
        }
        print(json.dumps(row), flush=True)
        out.append(row)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
