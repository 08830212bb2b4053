"""Host scaling-ceiling control: a pure-compute Ray map with ZERO engine
code, run at each width in a fresh process — the upper bound any real
job can reach on this one-box sandbox at that width pair.

The burn is Python-hash/string work (the profile of the extract stage,
the KG build's largest scalable component). If THIS job scales at e.g.
0.67 from 4→16 cpus, no amount of engine work can push kg_build past
that: the residual is SMT-sibling/memory-bus capacity, not barriers.
On a real N-vs-4N-node cluster each node brings its own cores, bus and
object store, so the ceiling is ~1.0 there.

Usage: python tools/host_ceiling.py [widths...]   (default 2 4 8 16 32)
Prints one JSON line: per-width seconds + per-pair ceiling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import sys, time, logging
import ray
import ray.data as rd

ncpu = int(sys.argv[1])

def burn(b):
    for v in b["id"]:
        h = hash(str(v))
        for _ in range(4000):
            h = hash(str(h))
    return b

ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
rd.range(256, override_num_blocks=2 * ncpu).map_batches(
    burn, batch_size=8).count()          # warm the worker pool
best = None
for _ in range(2):
    t0 = time.time()
    rd.range(160000, override_num_blocks=4 * ncpu).map_batches(
        burn, batch_size=128).count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(round(best, 3))
ray.shutdown()
"""


def main():
    widths = [int(w) for w in sys.argv[1:]] or [2, 4, 8, 16, 32]
    import time
    secs = {}
    for w in widths:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        time.sleep(10)   # let the previous width's teardown load settle
        out = subprocess.run([sys.executable, "-c", _CHILD, str(w)],
                             capture_output=True, text=True, check=True,
                             env=dict(os.environ))
        secs[w] = float(out.stdout.strip().splitlines()[-1])
    pairs = {}
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        if lo in secs and hi in secs:
            pairs[f"{lo}v{hi}"] = round((secs[lo] / secs[hi]) / (hi / lo), 3)
    print(json.dumps({
        "what": ("pure python-hash Ray map, zero engine code, fresh "
                 "process per width, min-of-2 warm"),
        "burn_sec": {str(w): s for w, s in secs.items()},
        "ceiling_efficiency": pairs,
        "loadavg_1min": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
