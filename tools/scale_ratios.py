#!/usr/bin/env python3
"""Driver-side tooling: parse a ScaleStress full-sweep log into per-query
1x vs 10x wall/shuffle growth ratios, sorted by shuffle ratio descending.

Usage: python3 tools/scale_ratios.py /tmp/sweep_r12.log [--md]
"""
import re, sys

pat = re.compile(
    r"scale=\s*(\d+)\s+(\S+)\s+([\d.]+|FAIL)\s*s\s+shuffle=\s*([\d.]+|FAIL)\s*MiB")

def main():
    path = sys.argv[1]
    md = "--md" in sys.argv
    data = {}
    for line in open(path):
        m = pat.search(line)
        if not m:
            continue
        n, q, t, s = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        data.setdefault(q, {})[n] = (
            None if t == "FAIL" else float(t),
            None if s == "FAIL" else float(s))
    rows = []
    for q, by in sorted(data.items()):
        if 1 not in by or 10 not in by:
            continue
        (t1, s1), (t10, s10) = by[1], by[10]
        if t1 is None or t10 is None:
            rows.append((q, t1, t10, None, s1, s10, None))
            continue
        tr = t10 / t1 if t1 > 0 else float("inf")
        sr = (s10 / s1) if (s1 or 0) > 0.005 else (0.0 if (s10 or 0) <= 0.005 else float("inf"))
        rows.append((q, t1, t10, tr, s1, s10, sr))
    rows.sort(key=lambda r: (-(r[6] if r[6] is not None else 1e9)))
    if md:
        print("| query | wall 1x (s) | wall 10x (s) | wall ratio | shuffle 1x (MiB) | shuffle 10x (MiB) | shuffle ratio |")
        print("|---|---|---|---|---|---|---|")
    for q, t1, t10, tr, s1, s10, sr in rows:
        f = (lambda v, n=2: "FAIL" if v is None else f"{v:.{n}f}")
        if md:
            print(f"| {q} | {f(t1)} | {f(t10)} | {f(tr,1)} | {f(s1)} | {f(s10)} | {f(sr,1)} |")
        else:
            print(f"{q:28s} wall {f(t1):>8} -> {f(t10):>8} ({f(tr,1):>6}x)  "
                  f"shuffle {f(s1):>9} -> {f(s10):>9} MiB ({f(sr,1):>6}x)")

if __name__ == "__main__":
    main()
