#!/usr/bin/env python3
"""Pre-fill BENCH_NOTES.md's committed-clean-run record for a round from
the committed BENCH_LOCAL.json — one command at snapshot time, so bench
adjudication never depends on the driver artifact's (repeatedly
truncated) tail for the per-query map or the calibration yardstick.

Usage: tools/snapshot_bench_notes.py <round> [bench_json] [notes_md]

Appends (or idempotently replaces) an auto-snapshot section for the
round carrying: total / query count / error count / calib / io_calib /
re-run + clamp lists, and the FULL per-query seconds map as a fenced
JSON block. Driver-side tooling only (python is not available to
library code).
"""
import json
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = sys.argv[1].lstrip("r")
    bench_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL.json"
    notes_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_NOTES.md"
    with open(bench_path) as f:
        b = json.loads(f.readline())
    queries = b.get("queries", {})
    header = f"## r{rnd} committed clean run (auto-snapshot)"
    summary = (
        f"total {b.get('value'):.1f} s, {b.get('n_queries')} queries + "
        f"{b.get('n_builds')} builds (build {b.get('build_sec'):.1f} s), "
        f"{b.get('n_errors')} errors, calib {b.get('calib_sec')}, "
        f"io_calib {b.get('io_calib_sec')}, "
        f"reruns {sorted(b.get('reruns', {}).keys())}, "
        f"clamped {b.get('clamped', [])}, sf {b.get('sf')}"
    )
    per_query = json.dumps(dict(sorted(queries.items())), indent=None)
    section = (
        f"\n{header}\n\n{summary}\n\nPer-query seconds "
        f"(the committed `BENCH_LOCAL.json`'s map, snapshot-time copy):\n\n"
        f"```json\n{per_query}\n```\n"
    )
    with open(notes_path) as f:
        text = f.read()
    pat = re.compile(
        re.escape(header) + r".*?(?=\n## |\Z)", re.S)
    if pat.search(text):
        # callable replacement: the section text may contain
        # backslashes (error strings, paths) that re.sub would
        # otherwise interpret as escapes
        repl = section.lstrip("\n").rstrip("\n") + "\n"
        text = pat.sub(lambda _m: repl, text)
    else:
        text = text.rstrip("\n") + "\n" + section
    with open(notes_path, "w") as f:
        f.write(text)
    print(f"BENCH_NOTES: wrote auto-snapshot section for r{rnd} "
          f"({len(queries)} per-query entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
