"""Full parallelism ladder for scaling evidence: best-of-k replay at each
local[N] level (fresh JVM per level, warmup + k repetitions), JSON per level.

    python scripts_dev/ladder.py "1,2,4,8,16,32" [n_events] [epochs] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_events: int, epochs: int, repeats: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_EVENTS": str(n_events),
        "SPARK_GRAFT_BENCH_EPOCHS": str(epochs),
        "SPARK_GRAFT_BENCH_REPEATS": str(repeats),
        "SPARK_GRAFT_SKIP_QUERIES": "1",
        "SPARK_GRAFT_DRIVER_MEM": "32g",
        "SPARK_GRAFT_WARMUP_FRAC": "0.5",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16,32").split(",")]
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    results = {}
    for c in levels:
        r = run(c, n_events, epochs, repeats)["replay"]
        results[c] = r
        print(json.dumps({"cpus": c, "best_eps": r["events_per_sec"], "all": r["runs_events_per_sec"]}), flush=True)
    for n in levels:
        if 4 * n in results:
            eff = results[4 * n]["events_per_sec"] / results[n]["events_per_sec"] / 4
            print(json.dumps({"pair": f"{n}->{4*n}", "efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
