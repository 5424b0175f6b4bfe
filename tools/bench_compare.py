#!/usr/bin/env python
"""Compare two bench JSON artifacts (BENCH_r*.json or a fresh bench.py
line): per-query ratios, median ratio, and regressions past a
threshold, for both the sf0.1 census and the sf1 section.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.25]

Exit 1 if any common query regresses past the threshold (so the round
workflow can gate on it before the driver snapshots BENCH_r{N}).
Sub-0.15 s rows are reported but never counted as regressions: at that
scale the measurement is scheduler jitter, not plan cost.
"""
import json
import re
import statistics
import sys

FLOOR_SEC = 0.15


def _from_tail(tail: str) -> dict:
    """The driver's BENCH_r*.json keeps only the LAST ~4k chars of the
    bench stdout line, so the head of the JSON is usually cut off.
    Regex-extract the per-query timings that survived, and split the
    sf1 section (complete at the end of the line) from the sf0.1
    census by position."""
    out: dict = {"queries": {}, "sf1": {"queries": {}}}
    m = re.search(r'"sf1"\s*:\s*', tail)
    head, sf1_part = (tail[: m.start()], tail[m.start():]) if m else (tail, "")
    pair = re.compile(r'"(q[a-z0-9_]+)"\s*:\s*([0-9.]+)')
    for name, val in pair.findall(head):
        out["queries"][name] = float(val)
    for name, val in pair.findall(sf1_part):
        out["sf1"]["queries"][name] = float(val)
    return out


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    d = json.loads(txt)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    if "tail" in d:  # driver artifact with a truncated stdout tail
        tail = d["tail"]
        start = tail.find("{")
        try:
            return json.loads(tail[start:].strip())
        except json.JSONDecodeError:
            return _from_tail(tail)
    raise ValueError(f"{path}: no queries/parsed/tail section")


def section(d: dict, sf1: bool) -> dict:
    if sf1:
        return (d.get("sf1") or {}).get("queries", {})
    return d.get("queries", {})


def compare(old: dict, new: dict, label: str, threshold: float) -> int:
    common = sorted(set(old) & set(new))
    if not common:
        print(f"[{label}] no common queries")
        return 0
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(
        f"[{label}] {len(common)} common, median new/old ratio"
        f" {med:.3f} (old-only {len(set(old) - set(new))},"
        f" new-only {len(set(new) - set(old))})"
    )
    bad = 0
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r <= threshold:
            break
        jitter = max(old[q], new[q]) < FLOOR_SEC
        tag = "jitter-floor" if jitter else "REGRESSION"
        print(f"  {tag:12s} {q}: {old[q]:.3f} -> {new[q]:.3f} ({r:.2f}x)")
        if not jitter:
            bad += 1
    improved = [q for q, r in ratios.items() if r < 1 / threshold]
    if improved:
        best = sorted(improved, key=lambda q: ratios[q])[:5]
        print(
            f"  improved >{threshold}x: {len(improved)} "
            + ", ".join(f"{q} {ratios[q]:.2f}x" for q in best)
        )
    return bad


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else a.replace("--threshold", "") or sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    bad = compare(section(old, False), section(new, False), "sf0.1", threshold)
    bad += compare(section(old, True), section(new, True), "sf1", threshold)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
