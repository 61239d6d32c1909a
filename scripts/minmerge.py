#!/usr/bin/env python3
"""Baseline min-merge under the round-17 integrity policy.

VERDICT r16 item 1: rebaselining each round from that round's own
recordings lets a loud round silently inflate the authoritative table
and thereby WEAKEN the 2x gate for every future round. This script
implements the fix:

  - the candidate value for every query is the MIN across this round's
    recording sessions (min is robust to load spikes);
  - a candidate may always LOWER a historical row (a quiet observation
    is valid evidence at any time);
  - a candidate may RAISE a historical row ONLY when
      (a) the query's implementation changed this round (--changed), or
      (b) every contributing session's load sentinels read <= 1.3x of
          the historical sentinel rows (a sentinel-clean window proves
          the rise is real, not ambient load);
    otherwise the historical min is kept — for an unchanged query a
    historical quiet min is still a valid min.

Inputs: one or more recording-session JSONs (graft.Bench output lines),
one or more historical baseline tables (baseline.json, possibly from
git history), and the changed-query list. Output: target/bench.json
ready for scripts/rebaseline.py, plus a per-row provenance report.

Usage:
  python3 scripts/minmerge.py --sessions bench_records/r17_rec*.json \
      --history baseline.json /tmp/r15_baseline.json \
      --changed q1,q2,... [--out target/bench.json]
"""
import argparse
import glob
import json
import sys

SENTINEL_CLEAN = 1.3

ap = argparse.ArgumentParser()
ap.add_argument("--sessions", nargs="+", required=True)
ap.add_argument("--history", nargs="+", required=True)
ap.add_argument("--changed", default="")
ap.add_argument("--out", default="target/bench.json")
args = ap.parse_args()

changed = set(q for q in args.changed.split(",") if q)


def load_session(path):
    line = [l for l in open(path).read().splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def qsec(v):
    return v if isinstance(v, (int, float)) else v["sec"]


sessions = [load_session(p) for pat in args.sessions for p in sorted(glob.glob(pat))]
assert sessions, "no sessions"
hists = []
for p in args.history:
    h = json.load(open(p))
    hists.append(h["queries"] if "queries" in h else h)

# historical per-query min (only over tables that contain the query)
hist_min = {}
for h in hists:
    for q, v in h.items():
        s = qsec(v)
        if q not in hist_min or s < hist_min[q]:
            hist_min[q] = s

# historical sentinel rows (for the clean-window test)
sent_names = sessions[0].get("sentinel", {}).get("queries", [])
sent_hist = {n: hist_min.get(n) for n in sent_names}


def session_clean(s):
    """True when every sentinel sample of the session reads <= 1.3x of
    the HISTORICAL sentinel min — the sentinel-clean window test."""
    sent = s.get("sentinel", {})
    names = sent.get("queries", [])
    samples = sent.get("start", []) + sent.get("mid", []) + sent.get("end", [])
    per = len(names)
    if not names or not samples:
        return False
    ratios = []
    for i, v in enumerate(samples):
        base = sent_hist.get(names[i % per])
        if base:
            ratios.append(v / base)
    return bool(ratios) and max(ratios) <= SENTINEL_CLEAN


clean = [session_clean(s) for s in sessions]
all_clean = all(clean)

merged = {}
prov = {"lowered": 0, "kept_hist": 0, "raised_changed": 0,
        "raised_clean": 0, "new": 0}
raised_kept = []
names = set()
for s in sessions:
    names.update(s["queries"])
for q in sorted(names):
    cand = min(s["queries"][q] for s in sessions if q in s["queries"])
    if q not in hist_min:
        merged[q] = cand
        prov["new"] += 1
    elif cand <= hist_min[q]:
        merged[q] = cand
        prov["lowered"] += 1
    elif q in changed:
        merged[q] = cand
        prov["raised_changed"] += 1
    elif all_clean:
        merged[q] = cand
        prov["raised_clean"] += 1
    else:
        merged[q] = hist_min[q]
        prov["kept_hist"] += 1
        raised_kept.append((q, hist_min[q], cand))

out = dict(sessions[-1])
out["queries"] = merged
out["value"] = sum(merged.values())
json.dump(out, open(args.out, "w"), indent=1)

print(f"sessions: {len(sessions)} (sentinel-clean per session: {clean})")
print(f"history tables: {len(hists)}; changed queries declared: {len(changed)}")
print(f"provenance: {prov}")
print(f"total: {out['value']:.1f} s over {len(merged)} queries -> {args.out}")
if raised_kept:
    worst = sorted(raised_kept, key=lambda t: t[2] - t[1], reverse=True)[:10]
    print("kept historical min (unchanged query, window not sentinel-clean):")
    for q, h, c in worst:
        print(f"  {q}: hist {h:.2f} vs session-min {c:.2f} ({c / h:.2f}x)")
