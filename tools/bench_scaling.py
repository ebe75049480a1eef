"""Two-cluster-size scaling evidence (north rule).

Runs bench.py twice on the SAME input — local[8] (N) and local[32] (4N) —
and reports throughput at both plus scaling efficiency:

    efficiency = (T_N / T_4N) / 4

(perfect linear scaling -> 1.0; north-rule target >= 0.8). Results are
appended to BENCH/BASELINE.md-ready markdown on stdout and saved as JSON.

Usage: python tools/bench_scaling.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_scaling.json")

    r8 = run_at(8, sf_dir)
    r32 = run_at(32, sf_dir)

    # headline = the end-to-end KG pipeline stage
    t8 = r8["queries"]["kg_pipeline"]
    t32 = r32["queries"]["kg_pipeline"]
    eff = (t8 / t32) / 4.0
    tot_eff = (r8["value"] / r32["value"]) / 4.0

    result = {
        "sf_dir": sf_dir,
        "local8": r8,
        "local32": r32,
        "kg_pipeline_sec_n8": t8,
        "kg_pipeline_sec_n32": t32,
        "triples_per_sec_n8": r8["triples_per_sec"],
        "triples_per_sec_n32": r32["triples_per_sec"],
        "scaling_efficiency_kg_pipeline": round(eff, 3),
        "scaling_efficiency_total": round(tot_eff, 3),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)

    print(f"""
| metric | local[8] (N) | local[32] (4N) | efficiency (N→4N) |
|---|---|---|---|
| kg_pipeline wall (s) | {t8} | {t32} | {eff:.3f} |
| triples/sec | {r8['triples_per_sec']} | {r32['triples_per_sec']} | — |
| full suite wall (s) | {r8['value']} | {r32['value']} | {tot_eff:.3f} |
""")


if __name__ == "__main__":
    main()
