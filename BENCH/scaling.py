#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N -> 4N executor scaling
criterion is evidenced by running the IDENTICAL pages pipeline at
local[8] and local[32] on the same input size and reporting throughput
at both plus the scaling efficiency.  Each run is a fresh JVM
(subprocess) with a fresh workdir; timing comes from inside the
pipeline (excludes session startup).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "300000"))


def run_at(cores: int) -> dict:
    workdir = f"/tmp/geotile_scaling_{cores}"
    shutil.rmtree(workdir, ignore_errors=True)
    out = subprocess.run(
        [sys.executable, "-m", "geotile.pipeline", "--n", str(N_PAGES),
         "--workdir", workdir, "--cores", str(cores)],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "16g"})
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    m["cores"] = cores
    shutil.rmtree(workdir, ignore_errors=True)
    return m


def main() -> None:
    low = run_at(8)
    high = run_at(32)
    eff = (high["pages_per_sec"] / low["pages_per_sec"]) / (32 / 8)
    result = {
        "n_pages": N_PAGES,
        "local8_pages_per_sec": round(low["pages_per_sec"], 1),
        "local32_pages_per_sec": round(high["pages_per_sec"], 1),
        "local8_total_sec": round(low["t_total"], 2),
        "local32_total_sec": round(high["t_total"], 2),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "stage_sec_local32": {k: round(high[k], 2) for k in
                              ("t_pages", "t_points", "t_join", "t_rollup")},
    }
    md = f"""# BENCH/BASELINE.md — scaling evidence

Identical pages pipeline (synth -> extract -> mention parse -> cell/tile
assignment -> POI radius join -> salted rollup), n = {N_PAGES:,} pages,
fresh JVM + fresh workdir per run.  This evidences the north_rule's
"N -> 4N executors, scaling efficiency >= 0.8" in-sandbox (no real
cluster available): parallelism 8 vs 32 cores on the same input.

| parallelism | total sec | pages/sec |
|---|---|---|
| local[8]  | {result['local8_total_sec']} | {result['local8_pages_per_sec']} |
| local[32] | {result['local32_total_sec']} | {result['local32_pages_per_sec']} |

**Scaling efficiency (8 -> 32, ideal 4.0x): {result['scaling_efficiency_8_to_32']:.3f}**

Stage breakdown at local[32] (sec): {json.dumps(result['stage_sec_local32'])}

Correctness across parallelism: `tests/test_pipeline.py::
test_join_rows_identical_across_parallelism` asserts byte-identical join
output rows between different partitionings; the reference's geohash
golden vectors are pinned in tests/test_geohash_kernel.py.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
