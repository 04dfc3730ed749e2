#!/usr/bin/env python
"""Wait for a clean (low co-tenant-steal) window, then exec a command.

The steal canary is bench.py's fixed-work matmul timer: ~0.18-0.22 s on a
quiet box, 0.3-1.0 s under co-tenant steal. Polls until the canary lands
under the threshold (default 0.26 s) twice in a row, then execs argv.

Usage: python tools/clean_window.py [--max-wait SECS] [--thresh S] cmd ...
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def canary() -> float:
    import numpy as np

    a = np.full((2000, 2000), 0.5)
    a @ a
    t0 = time.perf_counter()
    for _ in range(3):
        a @ a
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    args = sys.argv[1:]
    max_wait = 1800.0
    thresh = 0.26
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--max-wait":
            max_wait = float(args.pop(0))
        elif flag == "--thresh":
            thresh = float(args.pop(0))
        else:
            raise SystemExit(f"unknown flag {flag}")
    if not args:
        # flags-only / empty invocation: polling for a window and then
        # crashing in subprocess.call([]) with an IndexError is useless —
        # fail fast with the usage text instead (r17 ADVICE #4)
        raise SystemExit(__doc__)
    t_start = time.time()
    streak = 0
    while time.time() - t_start < max_wait:
        c = canary()
        streak = streak + 1 if c < thresh else 0
        print(f"[clean_window] canary={c} streak={streak}", file=sys.stderr)
        if streak >= 2:
            break
        time.sleep(20)
    else:
        print("[clean_window] max-wait hit; running anyway", file=sys.stderr)
    rc = subprocess.call(args, env=os.environ)
    sys.exit(rc)


if __name__ == "__main__":
    main()
