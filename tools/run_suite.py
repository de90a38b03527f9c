#!/usr/bin/env python
"""Crash-isolated test-suite runner: chunk test files across fresh
pytest processes.

Why this exists: XLA:CPU has (rarely) segfaulted long-lived processes
after several hundred compilations in one interpreter — both through
executable (de)serialization (tests/conftest.py history: the persistent
cache is opt-in for exactly this reason) and, observed once on a
1-vCPU box, inside `backend_compile_and_load` itself with the cache
off.  A native crash cannot be caught from Python, and a correctness
gate must never be killable by runtime instability — so this runner
bounds the blast radius: test FILES are grouped into chunks, each chunk
runs in a fresh `pytest` process, results are aggregated, and a chunk
that dies abnormally is retried once file-by-file so a one-off crash
costs one retry instead of the whole gate.

Usage:
    python tools/run_suite.py                 # default (fast) tier
    python tools/run_suite.py --runslow       # full suite
    python tools/run_suite.py -k pattern      # forwarded to pytest
    python tools/run_suite.py --chunk-size 6

Exit status: 0 iff every chunk (after retries) passed.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUMMARY_RE = re.compile(
    r"(?:(\d+) failed)?(?:, )?(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?"
    r"(?:, )?(?:(\d+) deselected)?(?:, )?(?:(\d+) error)?")


def run_chunk(files, extra, label):
    cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
           *extra, *files]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    crashed = proc.returncode not in (0, 1, 5)   # 5 = nothing collected
    status = ("CRASH" if crashed
              else "FAIL" if proc.returncode == 1 else "ok")
    print(f"[{label}] {status:5s} {dt:6.1f}s  {tail}", flush=True)
    if proc.returncode == 1 or crashed:
        # surface the failure detail once, at the point it happened
        sys.stdout.write(proc.stdout[-4000:] + "\n")
        if crashed:
            sys.stdout.write(proc.stderr[-2000:] + "\n")
    return proc.returncode, crashed


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-size", type=int, default=5,
                    help="test files per pytest process (default 5)")
    ap.add_argument("--runslow", action="store_true")
    args, extra = ap.parse_known_args(argv)
    if args.runslow:
        extra = ["--runslow", *extra]

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    files = [os.path.relpath(f, REPO) for f in files]
    chunks = [files[i:i + args.chunk_size]
              for i in range(0, len(files), args.chunk_size)]

    failures = []
    for i, chunk in enumerate(chunks):
        rc, crashed = run_chunk(chunk, extra, f"{i + 1}/{len(chunks)}")
        if crashed:
            # native crash: isolate per file, one retry each — a one-off
            # compiler fault costs one retry, a real crasher is named
            for f in chunk:
                rc2, crashed2 = run_chunk([f], extra, f"retry {f}")
                if rc2 not in (0, 5):
                    failures.append(f)
        elif rc == 1:
            failures.append(" ".join(chunk))

    if failures:
        print(f"\nFAILED groups ({len(failures)}):")
        for f in failures:
            print("  ", f)
        return 1
    print("\nall chunks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
