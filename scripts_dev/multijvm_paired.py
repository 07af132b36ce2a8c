"""Paired-design multi-JVM scaling measurement — VERDICT r4 Next #3.

The independent-session design (multijvm_scaling.py) measures the N level and
the 4N level minutes apart, so slow host drift (shared-VM contention) lands
entirely in one level and shows up as efficiency noise — r4 saw 0.675 → 0.857
across three sessions of IDENTICAL code. Here both levels run as resident
warm workers and the timed replays ALTERNATE within one session:

    warmup(N) … warmup(4N) … [N₁ 4N₁] [N₂ 4N₂] … [N_k 4N_k]

Each pair is adjacent in time (~1 min apart instead of ~10), so drift cancels
pairwise; the reported estimator is the MEDIAN of per-pair efficiencies
eff_i = (rate4N_i / rateN_i) / 4, robust to any single disturbed pair. Both
workers stay resident (idle JVMs cost memory, not CPU) and replays never
overlap, so the levels see the same machine.

    python scripts_dev/multijvm_paired.py [cores_per_worker] [n_events] [epochs] [pairs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class Worker:
    def __init__(self, master: str, n_events: int, epochs: int):
        self.master = master
        self.proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts_dev", "scaling_worker.py"),
             master, str(n_events), str(epochs)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1,
            cwd=REPO,
        )

    def _read_json(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker {self.master} died")
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)

    def wait_ready(self) -> dict:
        r = self._read_json()
        assert r.get("ready"), r
        return r

    def replay(self) -> dict:
        self.proc.stdin.write("go\n")
        self.proc.stdin.flush()
        return self._read_json()

    def quit(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    mem_mb = 8192

    lo = Worker(f"local-cluster[1,{cores},{mem_mb}]", n_events, epochs)
    lo.wait_ready()  # warm sequentially: concurrent warmups would contend
    print(f"# N-level worker warm (1x{cores})", flush=True)
    hi = Worker(f"local-cluster[4,{cores},{mem_mb}]", n_events, epochs)
    hi.wait_ready()
    print(f"# 4N-level worker warm (4x{cores})", flush=True)

    results = []
    try:
        for i in range(pairs):
            r_lo = lo.replay()
            r_hi = hi.replay()
            assert r_lo["final_rows"] == r_hi["final_rows"], "state mismatch"
            eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / 4
            results.append({
                "pair": i + 1,
                "N_events_per_sec": r_lo["events_per_sec"],
                "x4N_events_per_sec": r_hi["events_per_sec"],
                "efficiency": round(eff, 3),
            })
            print(json.dumps(results[-1]), flush=True)
    finally:
        lo.quit()
        hi.quit()

    effs = sorted(r["efficiency"] for r in results)
    n = len(effs)
    median_eff = effs[n // 2] if n % 2 else round((effs[n // 2 - 1] + effs[n // 2]) / 2, 3)
    out = {
        "design": "paired_interleaved",
        "cores_per_worker": cores,
        "n_events": n_events,
        "epochs": epochs,
        "pairs": results,
        "per_pair_efficiencies": [r["efficiency"] for r in results],
        "median_pair_efficiency": median_eff,
        "min_pair_efficiency": effs[0],
        "max_pair_efficiency": effs[-1],
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
