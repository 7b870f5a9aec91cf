"""Run the test suite one process per test file, a few files at a time.

Why not plain `pytest tests/`: long-lived CPU processes on this machine
flakily SIGSEGV inside XLA:CPU once enough programs have been compiled
(observed in executable serialize, deserialize, and plain compilation —
always ~40 tests into a monolithic run, never in a fresh process).
Per-file processes keep every process short-lived, and the persistent
compilation cache keeps repeat wall-clock low. Files run on a small
process pool (XLA:CPU compiles are mostly single-threaded, so 3 workers
on 4 cores roughly third the wall clock).

Usage:  python scripts/run_tests.py [--jobs N] [extra pytest args...]
        python scripts/run_tests.py -m heavy       # heavy tier
Exit code: 0 iff every file's pytest run passed (5 = "no tests
collected" is treated as success, e.g. files whose tests are all in the
other tier).
"""
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    extra = list(sys.argv[1:])
    jobs = max(1, (os.cpu_count() or 4) - 1)
    if "--jobs" in extra:
        i = extra.index("--jobs")
        jobs = int(extra[i + 1])
        del extra[i:i + 2]
    files = sorted((ROOT / "tests").glob("test_*.py"))
    t0 = time.time()
    failed = []

    def run_one(f):
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", *extra],
            cwd=ROOT, capture_output=True, text=True,
        )
        status = ("ok" if proc.returncode in (0, 5)
                  else f"FAIL({proc.returncode})")
        print(f"[{time.time()-t0:7.1f}s] {f.name}: {status} "
              f"({time.time()-t1:.1f}s)", flush=True)
        if proc.returncode not in (0, 5):
            failed.append(f.name)
            sys.stdout.write(proc.stdout[-4000:] + proc.stderr[-2000:])
            sys.stdout.flush()

    with ThreadPoolExecutor(max_workers=jobs) as pool:
        list(pool.map(run_one, files))
    print(f"TOTAL {time.time()-t0:.1f}s  "
          f"{'FAILED: ' + ', '.join(failed) if failed else 'all green'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
