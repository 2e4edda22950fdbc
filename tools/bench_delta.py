#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage:
  python3 tools/bench_delta.py save <bench_stderr_or_json> <round-tag>
      extract the [bench-full] JSON line and persist it as
      docs/bench/<round-tag>.json (full per-query detail, unlike the
      driver's truncated stdout tail)
  python3 tools/bench_delta.py diff [tagA tagB]
      write docs/bench_trend.md comparing two saved rounds (default:
      the two most recent by mtime) — per-query seconds, delta, and
      shuffle-write MB, sorted by regression size
"""
import json
import os
import re
import sys

HERE = os.path.dirname(__file__)
BENCH_DIR = os.path.join(HERE, "..", "docs", "bench")
OUT = os.path.join(HERE, "..", "docs", "bench_trend.md")


def load_full(path):
    body = open(path).read()
    m = re.search(r"\[bench-full\] (\{.*\})", body)
    return json.loads(m.group(1) if m else body)


def save(src, tag):
    os.makedirs(BENCH_DIR, exist_ok=True)
    doc = load_full(src)
    dst = os.path.join(BENCH_DIR, f"{tag}.json")
    json.dump(doc, open(dst, "w"))
    print(f"saved {dst}: {len(doc.get('queries', {}))} queries, "
          f"total {doc.get('value')}s")


def diff(tag_a=None, tag_b=None):
    tags = sorted(
        (f[:-5] for f in os.listdir(BENCH_DIR) if f.endswith(".json")),
        key=lambda t: os.path.getmtime(os.path.join(BENCH_DIR, t + ".json")))
    if tag_a is None:
        if len(tags) < 2:
            print("need two saved rounds"); return
        tag_a, tag_b = tags[-2], tags[-1]
    a = load_full(os.path.join(BENCH_DIR, tag_a + ".json"))
    b = load_full(os.path.join(BENCH_DIR, tag_b + ".json"))
    qa, qb = a.get("queries", {}), b.get("queries", {})
    sw = b.get("shuffle_write_mb", {})
    rows = []
    for q in sorted(set(qa) | set(qb)):
        va, vb = qa.get(q), qb.get(q)
        delta = (vb - va) if (va is not None and vb is not None and
                              va >= 0 and vb >= 0) else None
        rows.append((q, va, vb, delta, sw.get(q)))
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else float("-inf")))
    fmt = lambda v, suf="": ("" if v is None else f"{v:.2f}{suf}")
    lines = [
        f"# Bench trend: {tag_a} -> {tag_b}",
        "",
        f"Totals: {a.get('value')}s -> {b.get('value')}s "
        f"({len(qa)} -> {len(qb)} queries). Sorted by regression.",
        "",
        "| query | " + tag_a + " s | " + tag_b + " s | delta s | shuffle MB |",
        "|---|---|---|---|---|",
    ]
    for q, va, vb, d, s in rows:
        lines.append(f"| {q} | {fmt(va)} | {fmt(vb)} | "
                     f"{'' if d is None else f'{d:+.2f}'} | {fmt(s)} |")
    open(OUT, "w").write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {len(rows)} queries")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "save":
        save(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 2 and sys.argv[1] == "diff":
        diff(*sys.argv[2:4])
    else:
        print(__doc__)
