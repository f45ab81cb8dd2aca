"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors; sandbox stand-in: local[8] vs local[32] on
the same input — per driver instruction in the round brief).

Runs the SAME flagship extraction workload at both parallelism levels
in separate subprocesses (a fresh JVM each, so no warm-cache bias in
either direction beyond the OS page cache, which favors neither level)
and writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    code = (
        "import json, sys; sys.path.insert(0, %r); "
        "from bench import run_bench; "
        "print('RESULT::' + json.dumps(run_bench(cpus=%d, sf_dir=%r)))"
        % (REPO, cpus, sf_dir)
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"no result line in output:\n{out.stdout[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    # warm the media render cache once so neither run pays it
    run_at(n_high, sf_dir)
    low = run_at(n_low, sf_dir)
    high = run_at(n_high, sf_dir)
    tl, th = low["queries"]["extract"], high["queries"]["extract"]
    dl, dh = low["n_docs"] / tl, high["n_docs"] / th
    eff = (dh / dl) / (n_high / n_low)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured numbers

Workload: flagship extraction pipeline (interleaved docs -> explode ->
distinct media refs -> join media bytes -> Arrow OCR UDF -> join back ->
reassemble), identical input at both parallelism levels.

Input: `{sf_dir}` ({low['n_docs']} documents).

| parallelism | extract wall (s) | docs/sec |
|---|---|---|
| local[{n_low}] (N) | {tl:.2f} | {dl:.1f} |
| local[{n_high}] (4N) | {th:.2f} | {dh:.1f} |

**Scaling efficiency (N -> 4N)** = (docs/sec@{n_high} / docs/sec@{n_low}) / {n_high // n_low}
= **{eff:.3f}** (north-rule target: >= 0.8)

Full per-query timings:

- local[{n_low}]: `{json.dumps(low['queries'])}`
- local[{n_high}]: `{json.dumps(high['queries'])}`

Spark confs: AQE on (coalesce + skew join), shuffle.partitions = cores,
Arrow batches capped at 256 rows, UTC session tz
(easyocr_spark/session.py). Evidence produced by tools/scaling_bench.py
as the sandbox stand-in for an N vs 4N executor cluster (no real
multi-node cluster available; see round brief).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3), "low": low, "high": high}))


if __name__ == "__main__":
    main()
