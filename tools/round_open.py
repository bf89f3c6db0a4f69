"""One-command round open (round 12 — kills the recurring r8-r11
bookkeeping gap): the driver's per-round artifacts (CORRECTNESS_r{N},
BENCH_r{N}, VERDICT/ADVICE, a refreshed BENCH_DETAIL.json) land AFTER
the builder's last commit of the previous round, so every round used to
open with them untracked.  Run this first thing each round:

    python tools/round_open.py            # stage + commit + window test
    python tools/round_open.py --dry-run  # report only

It stages any untracked or modified round artifacts, commits them with
a uniform message, and runs the driver-window rotation tests so a
stale/never-green ordering problem surfaces on turn one, not at the
driver's next hash pass.  Exit code is nonzero if the window tests
fail; a clean tree with nothing to track is a successful no-op.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: artifact name patterns the driver (or judge) writes between rounds
ARTIFACT_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_DETAIL.json",
    "COPYCHECK.json",
    "LEAKCHECK.json",
    "VERDICT.md",
    "ADVICE.md",
    "PROGRESS.jsonl",
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def pending_artifacts() -> list[str]:
    """Round-artifact paths that are untracked or modified at HEAD."""
    out = _git("status", "--porcelain", "--", *ARTIFACT_GLOBS)
    return [line[3:].strip() for line in out.splitlines() if line.strip()]


def newest_round() -> int:
    """Highest N across committed+pending CORRECTNESS_r{N} artifacts."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def main() -> int:
    dry = "--dry-run" in sys.argv[1:]
    pending = pending_artifacts()
    if pending:
        print(f"round artifacts to track: {pending}")
        if not dry:
            _git("add", "--", *pending)
            # pathspec-limited commit: anything the builder had staged
            # for other work stays staged, never swept into the
            # bookkeeping commit
            _git(
                "commit",
                "-m",
                f"round {newest_round()}: track driver artifacts "
                "(round-open)",
                "--only",
                "--",
                *pending,
            )
            print("committed")
    else:
        print("no pending round artifacts — tree already tracks them")
    print("running driver-window rotation tests ...")
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_driver_window.py", "-q"],
        cwd=REPO,
    ).returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
