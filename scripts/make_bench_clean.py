#!/usr/bin/env python3
"""Seed BENCH_clean.json: per-query MIN across a fresh clean bench line
and every prior official record at the same sf (round-12 directive
item 4b — rounds 9-11's official records were contamination-inflated,
so the retry floor they provide is too soft; this file gives every
query an honest clean floor that Bench.priorRecord min-merges in).

Usage: make_bench_clean.py <clean_line_file> [repo_dir]
  clean_line_file: file holding the bench's final stdout JSON line
                   (short query ids), e.g. captured from a quiet run.
"""
import json
import re
import sys
from pathlib import Path


def parse_times(content: str, sf: str):
    s = content.replace('\\"', '"')
    m = re.search(r'"sf":"([^"]+)"', s)
    if not m or m.group(1) != sf:
        return {}
    qm = re.search(r'"queries":\{([^}]*)\}', s)
    if not qm:
        return {}
    out = {}
    for k, v in re.findall(r'"([A-Za-z0-9_]+)":([0-9][0-9.]*)', qm.group(1)):
        if not k.startswith("_"):
            out[k] = float(v)
    return out


def main():
    clean_file = Path(sys.argv[1])
    repo = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(".")
    sf = "/root/testdata/sf0.1"
    best = parse_times(clean_file.read_text(), sf)
    if not best:
        sys.exit("clean line did not parse at sf0.1")
    n_fresh = len(best)
    for rec in sorted(repo.glob("BENCH_r*.json")):
        for k, v in parse_times(rec.read_text(), sf).items():
            if k in best:
                best[k] = min(best[k], v)
            # Queries that no longer exist are NOT carried: the floor
            # must only ever judge live queries.
    line = (
        '{"metric":"total","value":%.3f,"unit":"sec","queries":{%s},'
        '"errors":{},"suspect":[],"sf":"%s"}'
        % (
            sum(best.values()),
            ",".join('"%s":%.3f' % (k, v) for k, v in sorted(best.items())),
            sf,
        )
    )
    (repo / "BENCH_clean.json").write_text(line + "\n")
    print(f"BENCH_clean.json: {len(best)} queries ({n_fresh} fresh), "
          f"total floor {sum(best.values()):.1f}s")


if __name__ == "__main__":
    main()
