#!/usr/bin/env python
"""Recount driver-graded coverage from the committed artifacts.

VERDICT r8 found COVERAGE.md's union arithmetic off by one (hand-added
45 fresh names as 46). This tool derives the numbers nobody should
ever hand-add again: it reads every CORRECTNESS_r*.json (a later green
supersedes an earlier fail), intersects with the live registry, and
prints the union / residue / per-module residue breakdown — plus a
machine-readable line that COVERAGE.md embeds as an HTML comment and
``tests/test_registry.py::test_coverage_ledger_matches_artifacts``
re-derives, so the ledger can no longer drift from the artifacts.

Usage: python tools/recount_union.py [--update-coverage]
With --update-coverage, rewrites the `<!-- union-recount: ... -->`
line in COVERAGE.md in place.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = "union-recount"


def grade_verdicts() -> dict[str, bool]:
    """name -> latest driver grade, LAST ROUND WINS in both directions:
    a later green supersedes an earlier fail (q_inverted_index r7→r8)
    AND a later fail supersedes an earlier green — each round grades
    the code as it stood, so a re-graded regression must turn the
    union red, not ride a stale green (code-review r9 finding). The
    single source of truth for the green predicate; the registry
    module-coverage test imports it."""
    verdict: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                verdict[name] = bool(row.get("hash_match")) or (
                    row.get("hash_match") is None
                    and bool(row.get("rows_match"))
                )
    return verdict


def green_names() -> set[str]:
    return {n for n, ok in grade_verdicts().items() if ok}


def recount() -> dict:
    verdict = grade_verdicts()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))

    from bigdata_deepfakeanalysis_spark.registry import all_queries

    registry = all_queries()
    names = set(registry)
    green = {n for n, ok in verdict.items() if ok} & names
    failed = {n for n, ok in verdict.items() if not ok} & names
    residue = names - set(verdict)
    by_module: dict[str, list[str]] = defaultdict(list)
    for n in sorted(residue):
        by_module[registry[n].__module__.split(".")[-1]].append(n)
    return {
        "registry": len(names),
        "green": len(green),
        "failed": sorted(failed),
        "residue": len(residue),
        "residue_by_module": dict(by_module),
        "rounds": len(rounds),
    }


def machine_line(r: dict) -> str:
    return (
        f"<!-- {MARKER}: green={r['green']}/{r['registry']}"
        f" residue={r['residue']} failed={len(r['failed'])}"
        f" rounds={r['rounds']} -->"
    )


def main() -> int:
    r = recount()
    print(f"registry: {r['registry']}")
    print(f"hash-green union: {r['green']}")
    print(f"still-failed: {r['failed']}")
    print(f"never graded: {r['residue']}")
    for mod, names in sorted(r["residue_by_module"].items()):
        print(f"  {mod} ({len(names)}): {', '.join(names)}")
    line = machine_line(r)
    print(line)
    if "--update-coverage" in sys.argv:
        path = os.path.join(REPO, "COVERAGE.md")
        with open(path) as f:
            text = f.read()
        pat = re.compile(rf"<!-- {MARKER}:.*?-->")
        if pat.search(text):
            text = pat.sub(line, text, count=1)
        else:
            text = text.rstrip() + "\n\n" + line + "\n"
        with open(path, "w") as f:
            f.write(text)
        print(f"updated {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
