#!/usr/bin/env python3
"""Rewrite BASELINE.md around one authoritative per-query table.

Reads target/bench.json (the closing quiet-box recording run) and the
existing BASELINE.md, and emits a new BASELINE.md:

  - header + reference operational constants + rebuild contract (kept)
  - ONE authoritative per-query table from the recording run, with the
    run's load-sentinel samples printed beside it so the artifact is
    self-adjudicating — the 2x perf gate is computable by summing this
    single table
  - the streaming / ingest / ts-operator throughput sections (kept)
  - an appendix holding the full recording-history prose of rounds 2-9

Usage: python3 scripts/rebaseline.py [bench_json] [baseline_md]
"""
import json
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
md_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
round_label = sys.argv[3] if len(sys.argv) > 3 else "round 11"
runs_label = sys.argv[4] if len(sys.argv) > 4 else "THREE"

b = json.load(open(bench_path))
queries = b["queries"]
sentinel = b.get("sentinel", {})
total = sum(queries.values())
assert b.get("failures", 0) == 0, "recording run must have zero failures"
# a targeted re-record (SPARK_GRAFT_ONLY) also writes target/bench.json;
# rebaselining from one would silently replace the full-suite table with
# a partial one — require a plausibly-full run
assert len(queries) >= 150, (
    f"bench.json holds only {len(queries)} queries — looks like a targeted "
    "SPARK_GRAFT_ONLY run, not a full recording run")

old = open(md_path).read()

AUTH = "## Authoritative per-query baseline"
rewritten = AUTH in old

if rewritten:
    # idempotent re-run: replace only the authoritative section, keep
    # everything after the streaming header (incl. the appendix) as-is
    head = old[: old.index(AUTH)]
else:
    head = old[: old.index("## Round-7 perf baseline")]
head = head.replace(
    "| Perf baseline per query | see table below (round 2 first green run) | sf0.1 | BENCH run 2026-08-12 |",
    "| Perf baseline per query | the authoritative table below (round-10 recording run) | sf0.1 | BENCH run 2026-08-14, `target/bench.json` |")
streaming = old[old.index("## Streaming throughput") :]

names = sorted(queries)
rows = [f" {n} | {queries[n]:.2f} " for n in names]
# 3 pairs per line
lines = []
for i in range(0, len(rows), 3):
    chunk = rows[i : i + 3]
    while len(chunk) < 3:
        chunk.append("  |  ")
    lines.append("|" + "|".join(chunk) + "|")

sent_q = sentinel.get("queries", [])
def sent_fmt(k):
    return ", ".join(f"{v:.2f}" for v in sentinel.get(k, []))

table = f"""## Authoritative per-query baseline ({round_label}: {len(names)} queries, sf0.1, local[32])

Method: `java -cp classes:/opt/spark/jars/* graft.Bench` — one shared
warmed session, each query a full noop-sink materialization, reported
seconds = MIN OF {runs_label} back-to-back runs (discards one-off load spikes
and first-run codegen cost; see the appendix for why). Each row is the
per-query minimum over every recording artifact merged into
target/bench.json for this round (one zero-failure full-suite run plus
targeted SPARK_GRAFT_ONLY re-records of load-suspect rows and rows for
same-round query additions — raw artifacts under `bench_records/`; this
box carries bursty ambient load, so the merge, not any single run, is
the authoritative source). The full recording run's co-measured load
sentinel ({", ".join(sent_q)}; one untimed warm pass, then one sample
each at run start / middle / end) reads:

  start [{sent_fmt("start")}] · mid [{sent_fmt("mid")}] · end [{sent_fmt("end")}]

— compare each sample against the sentinel's own table row to judge
the run's load windows (CHARACTERIZE THE SAMPLES HONESTLY in this
prose after regenerating: flat-at-baseline means a quiet box; inflated
stretches mean the affected rows need targeted re-records merged in).
The 2× perf gate is computable by summing THIS table; no other row
source is authoritative. `baseline.json` is this table's machine twin
— `graft.Bench` loads it at run time and self-adjudicates any >2× row. Rows for queries whose scaladoc prices a deliberate
re-derivation (bench queries are independent: the dedup_clusters
family, ivfpq_*, semantic_*, neardup_families re-train or re-derive
shared chains per query) are expected suite maxima, not regressions;
the *_served rows price the train-once serving path against their
retraining twins.

| Query | sec | Query | sec | Query | sec |
|---|---|---|---|---|---|
{chr(10).join(lines)}

**Total: {total:.1f} s over {len(names)} queries, 0 failures.**

"""

# appendix: everything between the rebuild contract and the streaming
# section in the OLD file (the round-7 table + rounds 2-9 prose)
appendix_body = ("" if rewritten else
    old[old.index("## Round-7 perf baseline") : old.index("## Streaming throughput")].rstrip())
appendix = f"""## Appendix: recording history (rounds 2–9)

Pre-round-10 rows accreted across sessions (each paragraph names its
run and load window). Superseded by the authoritative table above —
kept because the per-row notes document WHY each query costs what it
costs and what load windows looked like before the sentinel existed.

{appendix_body}

"""

if rewritten:
    open(md_path, "w").write(head + table + streaming.rstrip() + "\n")
else:
    open(md_path, "w").write(head + table + streaming.rstrip() + "\n\n" + appendix)
print(f"wrote {md_path}: {len(names)} rows, total {total:.1f}s")

# machine-readable twin for graft.Bench's self-adjudication: the bench
# loads this at run time and auto-re-measures any row >2x its entry.
# Written BESIDE the BASELINE.md being rewritten (not the process cwd),
# so running the script from elsewhere can't leave the repo's twin stale.
import os
bjson_path = os.path.join(os.path.dirname(os.path.abspath(md_path)), "baseline.json")
bjson = "{" + ",".join(f'"{n}":{queries[n]}' for n in names) + "}"
open(bjson_path, "w").write(bjson + "\n")
print(f"wrote {bjson_path}: {len(names)} rows")
