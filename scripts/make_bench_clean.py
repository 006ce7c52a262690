#!/usr/bin/env python3
"""Seed BENCH_clean.json: per-query MIN across a fresh clean bench line
and every prior official record at the same sf (round-12 directive
item 4b — rounds 9-11's official records were contamination-inflated,
so the retry floor they provide is too soft; this file gives every
query an honest clean floor that Bench.priorRecord min-merges in).

Usage: make_bench_clean.py <clean_line_file> [repo_dir] [sf_dir]
  clean_line_file: file holding the bench's final stdout JSON line
                   (short query ids), e.g. captured from a quiet run.
  sf_dir: the sf the floor judges (default /root/testdata/sf0.1).
"""
import json
import re
import sys
from pathlib import Path


def parse_times(content: str, sf: str):
    """Per-query times from one record. The summary line is valid JSON
    (possibly escape-wrapped inside the driver's "tail" string), so
    parse it as JSON first; the regex path remains only for damaged
    lines (round-13 ADVICE: regex-only parsing would silently yield an
    empty floor if the line format ever grew nested braces)."""
    s = content.replace('\\"', '"')
    # JSON path: decode the first summary object in place (raw_decode
    # ignores whatever wrapper content follows it on the line).
    start = s.find('{"metric"')
    if start >= 0:
        try:
            obj, _ = json.JSONDecoder().raw_decode(s[start:])
            if obj.get("sf") != sf:
                return {}
            qs = obj.get("queries", {})
            return {k: float(v) for k, v in qs.items()
                    if not k.startswith("_")
                    and isinstance(v, (int, float))}
        except (json.JSONDecodeError, TypeError, ValueError):
            pass  # fall through to the regex salvage path
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


def parse_fps(content: str, sf: str):
    """Per-query plan fingerprints from one record (only the bench full
    JSON and regenerated clean files carry them). Same sf guard as
    parse_times."""
    s = content.replace('\\"', '"')
    start = s.find('{"metric"')
    if start >= 0:
        try:
            obj, _ = json.JSONDecoder().raw_decode(s[start:])
            if obj.get("sf") != sf:
                return {}
            return {k: v for k, v in obj.get("fingerprints", {}).items()
                    if isinstance(v, str)}
        except (json.JSONDecodeError, TypeError, ValueError):
            pass
    m = re.search(r'"sf":"([^"]+)"', s)
    if not m or m.group(1) != sf:
        return {}
    fm = re.search(r'"fingerprints":\{([^}]*)\}', s)
    if not fm:
        return {}
    return dict(re.findall(r'"([A-Za-z0-9_]+)":"([0-9a-f]+)"', fm.group(1)))


def main():
    clean_file = Path(sys.argv[1])
    repo = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(".")
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # Refuse a BENCH_ONLY-filtered input outright (round-17, closing
    # the loop on the in-band marker): a partial run's floors would
    # silently reseed only its keys and carry stale floors for the
    # rest — a full-surface clean run is the regeneration contract.
    if re.search(r'"only":true', clean_file.read_text()):
        sys.exit("refusing to seed floors from a BENCH_ONLY-filtered "
                 "run (the input carries \"only\":true) — regenerate "
                 "from a full-surface clean run")
    best = parse_times(clean_file.read_text(), sf)
    if not best:
        sys.exit(f"clean line did not parse at sf {sf}")
    # The fresh input may be the bench's FULL-name json
    # (/tmp/graft_bench_full.json) or a short-id summary line; floors
    # are keyed by SHORT id (what Bench.priorRecord looks up), so
    # normalize here (short-id uniqueness across the surface is
    # spec-pinned by BenchRenderSpec).
    best = {k.split("_")[0]: v for k, v in best.items()}
    n_fresh = len(best)
    # FLOOR RATCHET (round-16): a floor recorded under a DIFFERENT plan
    # fingerprint judges a plan that no longer exists — min-merging a
    # legitimately-grown plan (cur18 after the boilerplate fold) across
    # the change would hold it permanently suspect-prone. Keys whose
    # fresh fingerprint differs from the committed clean one are
    # RESEEDED: the fresh clean number stands, prior records are not
    # merged in. Conservative: reseed only when BOTH sides carry a
    # fingerprint (a pre-fingerprint clean file ratchets nothing).
    fresh_fps = parse_fps(clean_file.read_text(), sf)
    old_clean = repo / "BENCH_clean.json"
    old_fps = parse_fps(old_clean.read_text(), sf) if old_clean.is_file() else {}
    reseed = {k for k in fresh_fps
              if k in old_fps and old_fps[k] != fresh_fps[k] and k in best}
    if reseed:
        print("floor ratchet: plan fingerprint changed, floors reseeded "
              "from the fresh run only: " + ", ".join(sorted(reseed)))
    # Min-merge official records AND the previous clean file: a floor
    # captured by an earlier clean run (never matched by an official
    # record) must survive regeneration, or the gate softens each round.
    #
    # WATERMARK (round-16 review): each official record is merged
    # exactly ONCE — at the regeneration following it, when the plan it
    # measured still matches the current fingerprints. Official lines
    # carry no fingerprints, so re-merging history would resurrect a
    # reseeded (plan-changed) floor at the very next regeneration and
    # revert the ratchet. The previous clean file subsumes everything
    # merged before the watermark. One DELIBERATE forfeit: a reseed
    # key's entries in the officials consumed THIS regeneration are
    # skipped too (we cannot tell which plan an official measured), so
    # a same-cycle new-plan official time is lost for that key — its
    # floor then tightens only from fresh clean runs, which every
    # round produces; the alternative (not advancing the watermark)
    # would re-merge old-plan times later, which is the bug itself.
    old_clean_text = old_clean.read_text() if old_clean.is_file() else ""
    # The watermark is PER SF (round-16 ADVICE): a single value guarded
    # by the old file's sf reset to -1 whenever the previous
    # regeneration ran at a different sf, so an sf-switch-and-back
    # regeneration re-merged ALL official records at the original sf —
    # including the pre-reseed old-plan times the watermark exists to
    # exclude. The map preserves every sf's watermark across
    # regenerations at any sf. (Floors themselves remain single-sf: an
    # sf-switch still discards the other sf's floors, and switching
    # back rebuilds them from the fresh clean run + post-watermark
    # officials only — the conservative direction.) Legacy single-int
    # form is honored only when the old file judges THIS sf.
    wm_map = {}
    wm_m = re.search(r'"merged_through":\{([^}]*)\}', old_clean_text)
    if wm_m:
        wm_map = {k: int(v) for k, v in
                  re.findall(r'"([^"]+)":(\d+)', wm_m.group(1))}
    else:
        old_sf = re.search(r'"sf":"([^"]+)"', old_clean_text)
        wm = re.search(r'"merged_through":(\d+)', old_clean_text)
        if wm and old_sf:
            wm_map[old_sf.group(1)] = int(wm.group(1))
    merged_through = wm_map.get(sf, -1)
    def round_no(p: Path) -> int:
        m = re.match(r"BENCH_r(\d+)\.json", p.name)
        return int(m.group(1)) if m else -1
    officials = [p for p in sorted(repo.glob("BENCH_r*.json"))
                 if round_no(p) > merged_through]
    # Advance the watermark only over officials that actually PARSED at
    # this sf (a record contributing nothing must stay eligible — it
    # may be a different-sf or degraded line today, but skipping it
    # forever on that evidence would silently discard its floors if a
    # parseable copy ever appears).
    new_watermark = max([merged_through] + [
        round_no(p) for p in officials
        if parse_times(p.read_text(), sf)])
    prior = officials + list(repo.glob("BENCH_clean.json"))
    carried = set()
    for rec in prior:
        for k, v in parse_times(rec.read_text(), sf).items():
            if k in reseed:
                continue
            # UNION of keys, min where both exist: a query that errored
            # or was absent in the fresh run must not silently lose its
            # historical floor — that is exactly the "gate softens each
            # round" failure this merge exists to prevent (round-14
            # ADVICE). Carried keys are restricted to the SHORT-id
            # naming the gate actually looks up ('_'-free — rounds 1-7
            # recorded full query names, which would otherwise union in
            # as 40+ stale aliases of live queries and inflate the
            # floor total); a short key for a since-removed query is
            # harmless clutter, never consulted.
            if k in best:
                best[k] = min(best[k], v)
            elif "_" not in k:
                best[k] = v
                carried.add(k)
    if carried:
        print("WARNING: floors carried from prior records only (absent "
              "from the fresh clean run): " + ", ".join(sorted(carried)))
    # The headline total sums the LIVE surface only (keys present in the
    # fresh run): carried floors stay in the map for per-query gate
    # lookups, but a since-removed query's stale floor must not inflate
    # the round-over-round total-floor comparison.
    live_total = sum(v for k, v in best.items() if k not in carried)
    # Fingerprints ride the clean file so the NEXT regeneration (and the
    # bench's in-run ratchet) can compare: fresh wins, carried-only keys
    # keep the fingerprint their floor was recorded under.
    out_fps = {k: v for k, v in old_fps.items() if k in best}
    out_fps.update({k: v for k, v in fresh_fps.items() if k in best})
    wm_map[sf] = new_watermark
    line = (
        '{"metric":"total","value":%.3f,"unit":"sec","queries":{%s},'
        '"fingerprints":{%s},"merged_through":{%s},"errors":{},"suspect":[],"sf":"%s"}'
        % (
            live_total,
            ",".join('"%s":%.3f' % (k, v) for k, v in sorted(best.items())),
            ",".join('"%s":"%s"' % (k, v) for k, v in sorted(out_fps.items())),
            ",".join('"%s":%d' % (k, v) for k, v in sorted(wm_map.items())),
            sf,
        )
    )
    (repo / "BENCH_clean.json").write_text(line + "\n")
    print(f"BENCH_clean.json: {len(best)} queries ({n_fresh} fresh, "
          f"{len(reseed)} reseeded), total floor {sum(best.values()):.1f}s")


if __name__ == "__main__":
    main()
