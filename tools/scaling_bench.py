"""Two-parallelism scaling evidence for the north rule.

Runs the flagship image pipeline at local[8] and local[32] (the in-sandbox
stand-in for N vs 4N executors) in SEPARATE JVMs (fresh process each, so
parallelism genuinely differs), and writes throughput + scaling efficiency
to BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_images: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-only", str(n_images)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    lo = run_at(8, n_images)
    hi = run_at(32, n_images)
    t_lo = n_images / lo["seconds"]
    t_hi = n_images / hi["seconds"]
    eff = t_hi / (4 * t_lo)
    md = f"""# BENCH/BASELINE — scaling evidence (north rule)

Flagship image pipeline (deterministic synthetic image+caption table ->
GeoTIFF decode -> footprint extraction -> geocell encode -> broadcast PIP
join vs polygon layer -> z/x/y tile assignment), same input size at two
parallelism levels in separate JVMs (the in-sandbox stand-in for N vs 4N
executors per BASELINE.json north_rule).

| parallelism | images | wall s | images/sec |
|---|---|---|---|
| local[8]  (N)  | {n_images} | {lo['seconds']:.2f} | {t_lo:,.1f} |
| local[32] (4N) | {n_images} | {hi['seconds']:.2f} | {t_hi:,.1f} |

**Scaling efficiency** = throughput(4N) / (4 x throughput(N)) =
{t_hi:,.1f} / (4 x {t_lo:,.1f}) = **{eff:.3f}** (target >= 0.8).

Notes on why this scales: generation + decode + join are one narrow
mapInPandas stage over `spark.range(n, parts)` partitions (no shuffle
until the final count); the polygon side broadcasts; tile assignment is a
Catalyst-only explode. The only barrier is the final aggregation.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({"n_images": n_images, "local8": lo, "local32": hi,
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
