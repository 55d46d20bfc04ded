"""Round-close gatekeeper (r10 verdict Next #1): make the close
SELF-AUDITING. Round 10 closed with commit messages claiming "249/249
self-check" while the committed CORRECTNESS_SELF.json still held round
9's 230 entries — the exact "prose claim the committed artifact can't
back" failure the SCALE.md discipline already fixed for bench numbers.
This script is now the only sanctioned producer of close-commit counts:

  1. REGENERATES the artifacts — the full registry self-check
     (scripts/check_correctness.py → CORRECTNESS_SELF.json) and, unless
     --reuse-tests, the full test suite (counts → CLOSE.json);
  2. VALIDATES the invariants against the FILES, never against prose:
       * CORRECTNESS_SELF.json holds exactly len(REGISTRY) entries,
       * every entry is green (hash_match, or rows-only with rows),
       * BENCH_FULL.json parses with zero errors and a quality probe,
       * the registry count in SURVEY.md §2's coverage line (if the
         marker is present) matches the live registry;
  3. EMITS the close commit message to stdout with every count derived
     from the validated files — paste it verbatim; editing a number by
     hand is the failure mode this script exists to kill.

Exit codes: 0 = close is clean; 2 = an invariant failed (the close
must not proceed); the offending check is named on stderr.

Usage (from the repo root):
  python scripts/close_round.py                 # full: selfcheck + tests
  python scripts/close_round.py --reuse-selfcheck --reuse-tests
  python scripts/close_round.py --check         # validate only, run nothing
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, ".")

SELF = "CORRECTNESS_SELF.json"
CLOSE = "CLOSE.json"
BENCH = "BENCH_FULL.json"


def fail(msg: str) -> int:
    print(f"CLOSE REFUSED: {msg}", file=sys.stderr)
    return 2


def run_selfcheck(sf: str) -> int:
    print(f"# regenerating {SELF} (full registry self-check at {sf})",
          file=sys.stderr)
    return subprocess.call(
        [sys.executable, "scripts/check_correctness.py", "--sf", sf,
         "--out", SELF]
    )


def run_tests() -> dict | None:
    print("# running the full test suite", file=sys.stderr)
    proc = subprocess.run(
        # `-o addopts=` clears the bounded-default `-m "not slow"`
        # filter (pyproject): the CLOSE runs the FULL suite including
        # the slow store-lifecycle / property / oracle-compare suites
        # the driver's windowed default pass skips (r15).
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line",
         "-p", "no:cacheprovider", "-o", "addopts="],
        capture_output=True, text=True,
    )
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    print(f"# pytest: {summary}", file=sys.stderr)
    m_pass = re.search(r"(\d+) passed", summary)
    m_skip = re.search(r"(\d+) skipped", summary)
    m_fail = re.search(r"(\d+) (?:failed|error)", summary)
    if proc.returncode != 0 or m_fail or not m_pass:
        return None
    return {
        "tests_passed": int(m_pass.group(1)),
        "tests_skipped": int(m_skip.group(1)) if m_skip else 0,
        "pytest_summary": summary,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reuse-selfcheck", action="store_true",
                    help="do not re-run the self-check; STILL validate "
                         "the existing file (a stale file refuses)")
    ap.add_argument("--reuse-tests", action="store_true",
                    help="reuse the test counts in CLOSE.json")
    ap.add_argument("--check", action="store_true",
                    help="validate only (implies both --reuse flags)")
    args = ap.parse_args()
    if args.check:
        args.reuse_selfcheck = args.reuse_tests = True

    from go_fish_spark.queries import REGISTRY

    n_reg = len(REGISTRY)

    # -- 1. self-check artifact -------------------------------------------
    if not args.reuse_selfcheck:
        if run_selfcheck(args.sf) != 0:
            return fail("self-check run reported failures")
    if not os.path.exists(SELF):
        return fail(f"{SELF} does not exist")
    self_doc = json.load(open(SELF))
    if len(self_doc) != n_reg:
        return fail(
            f"{SELF} holds {len(self_doc)} entries but the registry has "
            f"{n_reg} — the artifact is stale; rerun without "
            f"--reuse-selfcheck"
        )
    bad = [
        k for k, v in self_doc.items()
        if not (
            v.get("hash_match") is True
            or (v.get("err") == "no_oracle" and v.get("spark_rows") is not None)
        )
    ]
    if bad:
        return fail(f"{SELF} has non-green entries: {bad[:10]}")
    n_oracle = sum(1 for v in self_doc.values() if v.get("hash_match") is True)
    n_rows_only = len(self_doc) - n_oracle

    # -- 2. test suite ------------------------------------------------------
    close_doc: dict = {}
    if args.reuse_tests and os.path.exists(CLOSE):
        close_doc = json.load(open(CLOSE))
    if not args.reuse_tests:
        t = run_tests()
        if t is None:
            return fail("test suite did not pass cleanly")
        close_doc.update(t)
    if "tests_passed" not in close_doc:
        return fail(
            f"no test counts: run without --reuse-tests or provide {CLOSE}"
        )

    # -- 3. bench artifact ---------------------------------------------------
    if not os.path.exists(BENCH):
        return fail(f"{BENCH} does not exist — run bench.py first")
    bench = json.load(open(BENCH))
    if bench.get("errors"):
        return fail(f"{BENCH} records errors: {sorted(bench['errors'])[:5]}")
    if "bench_quality" not in bench:
        return fail(f"{BENCH} lacks the run-quality probe")

    # -- 4. SURVEY coverage-line count (when the marker exists) ---------------
    if os.path.exists("SURVEY.md"):
        s = open("SURVEY.md").read()
        m = re.search(r"(\d+)\s+registry entries", s)
        if m and int(m.group(1)) != n_reg:
            return fail(
                f"SURVEY.md claims {m.group(1)} registry entries; the "
                f"registry has {n_reg} — regenerate with "
                f"scripts/gen_inventory.py"
            )

    # -- 5. persist CLOSE.json + emit the message -----------------------------
    close_doc.update(
        registry_entries=n_reg,
        selfcheck_entries=len(self_doc),
        selfcheck_oracle_green=n_oracle,
        selfcheck_rows_only=n_rows_only,
        bench_total_sec=bench.get("value"),
        bench_n_queries=len(bench.get("queries", {})),
        bench_quality=bench.get("bench_quality", {}).get("status"),
    )
    with open(CLOSE, "w") as fh:
        json.dump(close_doc, fh, indent=1, sort_keys=True)

    print(
        f"""Round close artifacts: {len(self_doc)}/{n_reg} self-check, \
{close_doc['tests_passed']}-test suite, final bench

Self-check: {len(self_doc)}/{n_reg} registry entries green at sf0.01 \
({n_oracle} oracle hash-verified, {n_rows_only} rows-only) — \
CORRECTNESS_SELF.json regenerated this close.
Tests: {close_doc['tests_passed']} passed, \
{close_doc.get('tests_skipped', 0)} skipped.
Bench: {close_doc['bench_total_sec']} s over \
{close_doc['bench_n_queries']} entries at sf0.1, 0 errors, \
quality={close_doc['bench_quality']}.
Counts generated by scripts/close_round.py from the committed \
artifacts; a count that disagrees with a file fails the close."""
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
