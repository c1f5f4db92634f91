"""Process-isolated suite driver.

Full runs of `python -m pytest tests/` in ONE process hard-SIGSEGV in
native XLA:CPU code after ~90-100 tests — at MOVING crash sites
(`executable.serialize()`, `backend_compile_and_load`, MLIR
`_walk_operations` over an op tree), while every module passes in a fresh
process. That signature is accumulated heap corruption in the bundled
XLA:CPU stack under many-compile workloads — an upstream bug this repo
cannot patch. The engineering-around (the reference project would call
this CI sharding): `tests/conftest.py` re-execs whole-suite invocations
into this driver, which runs the test FILES in small process-isolated
groups and prints an honest aggregated total. Targeted invocations
(specific files/tests) are left on the normal single-process path.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

GROUP_FILES = 4  # ~files per process; full-suite crashes began near 10+


def discover_files(tests_dir: str) -> list:
    out = [
        os.path.join(tests_dir, f)
        for f in os.listdir(tests_dir)
        if f.startswith("test_") and f.endswith(".py")
    ]
    # one-file-per-bug issue-regression battery (reference:
    # unittests/regression/test_Issue*.cpp)
    reg = os.path.join(tests_dir, "regression")
    if os.path.isdir(reg):
        out += [
            os.path.join(reg, f)
            for f in os.listdir(reg)
            if f.startswith("test_") and f.endswith(".py")
        ]
    return sorted(out)


_SUMMARY_RE = re.compile(r"(\d+) (passed|failed|error|errors|skipped|xfailed|xpassed|deselected|warning|warnings)")


def main() -> int:
    argv = sys.argv[1:]
    tests_dir = os.environ.get("NIMBLE_TPU_SUITE_DIR", "tests")
    passthrough = [a for a in argv if a.startswith("-")]
    files = discover_files(tests_dir)
    groups = [files[i:i + GROUP_FILES] for i in range(0, len(files), GROUP_FILES)]
    print(
        f"[suite driver] running {len(files)} test files in {len(groups)} "
        "process-isolated groups (single-process runs hit an upstream "
        "XLA:CPU native crash after ~90 tests; see tests/_suite_driver.py)",
        flush=True,
    )
    totals: dict = {}
    t0 = time.time()
    worst_rc = 0
    for gi, group in enumerate(groups):
        cmd = [sys.executable, "-m", "pytest", *group, *passthrough]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        out = proc.stdout
        sys.stdout.write(out)
        sys.stdout.flush()
        if proc.returncode not in (0, 1, 5):  # crash/internal error
            sys.stderr.write(proc.stderr[-4000:])
            print(f"[suite driver] group {gi} CRASHED rc={proc.returncode}",
                  flush=True)
            worst_rc = max(worst_rc, 2)
            totals["crashed-groups"] = totals.get("crashed-groups", 0) + 1
            continue
        if proc.returncode == 1:
            worst_rc = max(worst_rc, 1)
        # accumulate from the summary line
        tail = "\n".join(out.splitlines()[-5:])
        for n, kind in _SUMMARY_RE.findall(tail):
            kind = {"errors": "error", "warnings": "warning"}.get(kind, kind)
            if kind == "warning":
                continue
            totals[kind] = totals.get(kind, 0) + int(n)
    dt = time.time() - t0
    parts = [f"{v} {k}" for k, v in sorted(totals.items())]
    print(f"[suite driver] TOTAL: {', '.join(parts)} in {dt:.0f}s "
          f"across {len(groups)} isolated groups", flush=True)
    return worst_rc


if __name__ == "__main__":
    sys.exit(main())
