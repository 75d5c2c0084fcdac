"""Quick host-ceiling probe: measures the 8->32-core speedup of a pure
in-register compute loop (no Spark, no IO). Dev tool for spotting a quiet
host window before launching tools/bench_scaling.py.

Prints one JSON line {"probe8": s, "probe32": s, "speedup": x}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time


def _burn(args) -> int:
    core, iters = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    h = b"x" * 64
    for _ in range(iters):
        h = hashlib.sha256(h).digest()
    return h[0]


def _run(cores: int, iters: int = 4_000_000) -> float:
    with mp.Pool(cores) as pool:
        t0 = time.time()
        pool.map(_burn, [(c, iters) for c in range(cores)])
        return time.time() - t0


def main() -> None:
    _run(8, 50_000)  # warm pool/forks
    p8 = min(_run(8) for _ in range(2))
    p32 = min(_run(32) for _ in range(2))
    print(json.dumps({"probe8": round(p8, 3), "probe32": round(p32, 3),
                      "speedup": round(p8 / p32 * 4, 2)}))


if __name__ == "__main__":
    main()
