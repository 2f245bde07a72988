"""Hit-heavy secondary benchmark: bob close-framed, ~60% of pixels hit.

The headline 1080p framing is miss-dominated (~92% primary rays, most miss
bob); this config is the throughput number that cannot lean on cheap
background lanes. Runs bench.py with the hit-heavy camera enabled and a
small repeat count (frames are ~10x slower than the headline).

Usage: python benchmarks/bench_hitheavy.py   (TPU; headline measured and
emitted first, hit-heavy second, headline re-emitted last — same order as
plain bench.py, which now runs the hit-heavy leg by default anyway)
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RT_BENCH_HITHEAVY", "1")
# (no RT_BENCH_REPEATS override: the headline leg keeps its full repeat
# count; bench.py already shortens only the hit-heavy leg)

import bench

if __name__ == "__main__":
    bench.main()
