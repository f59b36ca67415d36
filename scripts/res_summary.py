"""Summarize the randomized-evidence record (docs/res.log by default).

Per family: run count, failure count at the family's contract tolerance,
and the worst recorded diff. Families and tolerances mirror the autotest
drivers in tpuimg/cli.py (the reference's autoTestDemo discipline,
Integral/main.cpp:154-237, applied to every op family).

Usage: python scripts/res_summary.py [path/to/res.log ...]
"""
import re
import sys

# (family, line tag regex, tolerance)
FAMILIES = [
    ("integral", r"of tpuimg (\(bucket [^)]*\) )?and oracle", 0.0),
    ("he", r"tpuimg-he\b", 0.0),
    ("gaussian", r"tpuimg-gauss\b", 1e-5),
    ("erode", r"tpuimg-erode\b", 0.0),
    ("dilate", r"tpuimg-dilate\b", 0.0),
    ("clahe", r"tpuimg-clahe\b", 1.0),
    ("guided reflect101", r"tpuimg-guided r\d+ \(", 1e-4),
    ("guided shrink", r"tpuimg-guided r\d+ shrink", 1e-3),
    ("guided cn1", r"tpuimg-guided-cn1", 1e-3),
    ("enhance", r"tpuimg-enhance\b", 2.0),
]
DIFF_RE = re.compile(r"and oracle: ([0-9.eE+-]+)")


def main(paths):
    lines = []
    for p in paths:
        with open(p) as f:
            lines += f.readlines()
    total = fail_total = 0
    print(f"{'family':20s} {'runs':>6s} {'fail':>5s} {'worst diff':>12s} {'tol':>8s}")
    for name, tag, tol in FAMILIES:
        tag_re = re.compile(tag)
        diffs = [float(DIFF_RE.search(ln).group(1))
                 for ln in lines if tag_re.search(ln) and DIFF_RE.search(ln)]
        fails = sum(d > tol for d in diffs)
        total += len(diffs)
        fail_total += fails
        worst = max(diffs) if diffs else float("nan")
        print(f"{name:20s} {len(diffs):6d} {fails:5d} {worst:12g} {tol:8g}")
    print(f"{'TOTAL':20s} {total:6d} {fail_total:5d}")
    return 1 if fail_total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["docs/res.log"]))
