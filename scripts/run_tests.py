"""Run the test suite one process per test file.

Why not plain `pytest tests/`: long-lived CPU processes on this machine
flakily SIGSEGV inside XLA:CPU once enough programs have been compiled
(observed in executable serialize, deserialize, and plain compilation —
always ~40 tests into a monolithic run, never in a fresh process).
Per-file processes keep every process short-lived, and the persistent
compilation cache keeps repeat wall-clock low.

Usage:  python scripts/run_tests.py [extra pytest args...]
        python scripts/run_tests.py -m heavy       # heavy tier
Exit code: 0 iff every file's pytest run passed (5 = "no tests
collected" is treated as success, e.g. files whose tests are all in the
other tier).
"""
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    extra = sys.argv[1:]
    files = sorted((ROOT / "tests").glob("test_*.py"))
    t0 = time.time()
    failed = []
    for f in files:
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", *extra],
            cwd=ROOT,
        )
        status = "ok" if proc.returncode in (0, 5) else f"FAIL({proc.returncode})"
        print(f"[{time.time()-t0:7.1f}s] {f.name}: {status} "
              f"({time.time()-t1:.1f}s)", flush=True)
        if proc.returncode not in (0, 5):
            failed.append(f.name)
    print(f"TOTAL {time.time()-t0:.1f}s  "
          f"{'FAILED: ' + ', '.join(failed) if failed else 'all green'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
