#!/usr/bin/env python
"""Run the full test suite as a handful of FRESH pytest processes.

Why: in one monolithic ``pytest tests/`` process, compile-heavy tests
that appear late in the run slow down 1.5-3x relative to a fresh
interpreter (the accumulated live compiled programs / tracing caches of
1,100+ earlier tests tax every further XLA compile — measured round 5:
``TestParallelScans`` 54s fresh vs ~80s late-suite; full details in
CLAUDE.md "Commands"). Sharding restores fresh-process compile speed at
the cost of ~3s of interpreter+jax import per shard.

Shards are grouped by measured weight so no process dominates; any test
file NOT matched by an explicit shard lands in the final catch-all, so
new test files are never silently skipped (pinned by a self-check below).

Usage: ``python scripts/run_suite_sharded.py [extra pytest args...]``
(e.g. ``-m "not slow"``). Exit code is non-zero if any shard fails.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Hand-balanced by the round-5 measured per-file durations.
SHARDS = [
    ["tests/distributions"],
    ["tests/framework", "tests/variational"],
    ["tests/test_examples.py"],
    ["tests/test_ssm.py", "tests/test_smc.py", "tests/test_gp.py",
     "tests/test_sbc.py"],
    ["tests/test_mcmc.py", "tests/test_nuts.py", "tests/test_chees.py",
     "tests/test_gibbs.py", "tests/test_slice.py", "tests/test_remc.py",
     "tests/test_rwm_mala.py", "tests/test_elliptical.py",
     "tests/test_discrete_gibbs.py", "tests/test_geweke.py",
     "tests/test_precondition.py"],
    ["tests/test_parallel.py", "tests/test_bijectors.py",
     "tests/test_neutra.py", "tests/test_pathfinder.py",
     "tests/test_evaluation.py", "tests/test_transform.py"],
    # catch-all: every tests/test_*.py not claimed above
    None,
]


def _claimed():
    out = set()
    for shard in SHARDS:
        if shard is None:
            continue
        for entry in shard:
            p = os.path.join(ROOT, entry)
            if os.path.isdir(p):
                out.update(
                    os.path.relpath(f, ROOT) for f in glob.glob(
                        os.path.join(p, "**", "test_*.py"), recursive=True
                    )
                )
            else:
                out.add(entry)
    return out


def main(argv):
    all_files = sorted(
        os.path.relpath(f, ROOT)
        for f in glob.glob(os.path.join(ROOT, "tests", "**", "test_*.py"),
                           recursive=True)
    )
    claimed = _claimed()
    missing = [f for f in all_files if f not in claimed]
    shards = [s for s in SHARDS if s is not None]
    if missing:
        shards.append(missing)  # the catch-all shard

    t0 = time.time()
    failures = []
    for i, shard in enumerate(shards):
        label = "shard {}/{}: {}".format(i + 1, len(shards),
                                         " ".join(shard))
        print("=" * 12, label, flush=True)
        ts = time.time()
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *shard, *argv],
            cwd=ROOT,
        )
        print("---- {} finished in {:.1f}s (rc={})".format(
            label, time.time() - ts, rc), flush=True)
        if rc not in (0, 5):  # 5 = no tests collected (e.g. -m filter)
            failures.append((label, rc))
    print("==== total wall: {:.1f}s ({} shards{})".format(
        time.time() - t0, len(shards),
        ", FAILURES: " + "; ".join(l for l, _ in failures)
        if failures else ", all green"), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
