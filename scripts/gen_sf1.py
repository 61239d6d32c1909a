#!/usr/bin/env python3
"""Generate an sf1-equivalent fixture slice for the SCALING.md study's
4th decade (SCALING.md round-12 extension). Only the three tables that
drive the steep-exponent queries are scaled; everything else is copied
from sf0.1 so FKs and non-scaled joins stay valid:

  documents  5,000 -> 50,000   bootstrap-resampled from the sf0.1
                               fixture: per-doc word count drawn from the
                               empirical length distribution, words drawn
                               i.i.d. from the empirical unigram
                               distribution (same 31-token vocabulary,
                               same frequencies), (source, lang) drawn
                               jointly from the fixture rows; exact-dup
                               mass planted at the fixture's rate
                               (8/5,000 -> 80/50,000).
  lineitem   600k -> 6M        10 copies; copy k keeps every FK
                               (l_orderkey/l_partkey/l_suppkey point into
                               the UNSCALED sf0.1 dimensions - the
                               realistic shape: fact tables grow 10x,
                               dimensions don't) and stays PK-unique via
                               l_linenumber += 10*k.
  events     100k -> 1M        10 copies; copy k shifts event_id and
                               user_id into fresh ranges (10x events AND
                               10x users, per-user activity preserved).
  embeddings 2,000 -> 20,000   (round-13 extension, for the similarity
                               families' 4th decade) base vectors copied
                               verbatim (vec_id 0..1999 — the fixed
                               query set vec_id < 10 and the %4 / %10
                               lifecycle slices keep their meaning);
                               9 jittered copies per base vector
                               (Gaussian noise at 5% of the per-vector
                               scale) in fresh id ranges, labels
                               inherited — cluster structure preserved
                               so IVF routing/recall work stays
                               realistic, not uniform noise.

Deterministic (seed 1912). Output dir is the single CLI arg
(default /tmp/testdata_sf1). Do NOT write into /root/testdata.

Usage: python3 scripts/gen_sf1.py [outdir]
"""
import os, shutil, sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
SEED = 1912
COPIES = 10
N_DOCS = 50_000
N_PLANTED_DUPS = 80  # fixture rate: 8 exact dups per 5,000 docs

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
rng = np.random.default_rng(SEED)

# ── documents: unigram bootstrap ──────────────────────────────────────
toks = con.sql(f"""
    SELECT tok, count(*) AS c FROM (
      SELECT unnest(regexp_extract_all(
        lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '[a-z0-9]+')) AS tok
      FROM '{SRC}/documents.parquet') GROUP BY tok ORDER BY tok
""").df()
vocab = toks["tok"].to_numpy()
probs = (toks["c"] / toks["c"].sum()).to_numpy()
lens = con.sql(f"""
    SELECT len(regexp_extract_all(
      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '[a-z0-9]+')) AS n
    FROM '{SRC}/documents.parquet'
""").df()["n"].to_numpy()
meta = con.sql(
    f"SELECT source, lang FROM '{SRC}/documents.parquet'").df()

doc_lens = rng.choice(lens, size=N_DOCS, replace=True)
total_words = int(doc_lens.sum())
words = rng.choice(vocab, size=total_words, replace=True, p=probs)
texts, pos = [], 0
for n in doc_lens:
    texts.append(" ".join(words[pos:pos + int(n)]))
    pos += int(n)
# plant exact duplicates at the fixture's rate. Targets come from the
# SECOND half of the id space and sources from the FIRST half: src < t
# always holds (the "recrawl of a seen page" ordering), no source is
# itself a target (a later overwrite would silently un-duplicate an
# earlier planted pair), so exactly N_PLANTED_DUPS duplicate pairs land.
dup_to = rng.choice(np.arange(N_DOCS // 2, N_DOCS), size=N_PLANTED_DUPS,
                    replace=False)
dup_src = rng.integers(0, N_DOCS // 2, size=N_PLANTED_DUPS)
for t, src_doc in zip(dup_to, dup_src):
    texts[t] = texts[int(src_doc)]
meta_pick = rng.integers(0, len(meta), size=N_DOCS)
import pandas as pd
docs = pd.DataFrame({
    "doc_id": np.arange(N_DOCS, dtype=np.int64),
    "source": meta["source"].to_numpy()[meta_pick],
    "lang": meta["lang"].to_numpy()[meta_pick],
    "text": texts,
})
docs["n_chars"] = docs["text"].str.len().astype("int64")
# column order matches the fixture
docs = docs[["doc_id", "source", "lang", "n_chars", "text"]]
con.register("docs_df", docs)
con.sql(f"COPY (SELECT * FROM docs_df) TO '{OUT}/documents.parquet' (FORMAT parquet)")

# ── lineitem: 10 FK-preserving copies ─────────────────────────────────
con.sql(f"""
    COPY (
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(l_linenumber + 10 * c.k AS INTEGER) AS l_linenumber,
             l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{SRC}/lineitem.parquet', (SELECT unnest(range({COPIES})) AS k) c
    ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)
""")

# ── events: 10 copies in fresh id/user ranges ─────────────────────────
con.sql(f"""
    COPY (
      WITH m AS (SELECT max(event_id) + 1 AS eid, max(user_id) + 1 AS uid
                 FROM '{SRC}/events.parquet')
      SELECT event_id + c.k * m.eid AS event_id, ts,
             user_id + c.k * m.uid AS user_id,
             event_type, value, props
      FROM '{SRC}/events.parquet', (SELECT unnest(range({COPIES})) AS k) c, m
    ) TO '{OUT}/events.parquet' (FORMAT parquet)
""")

# ── embeddings: base copied verbatim + 9 jittered copies per vector ──
emb = con.sql(
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
    "ORDER BY vec_id").df()
base_ids = emb["vec_id"].to_numpy()
base_vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
base_labels = emb["label"].to_numpy()
n_base, dim = base_vecs.shape
# per-vector jitter scale: 5% of that vector's RMS component magnitude,
# so copies stay inside their source's cluster neighborhood
rms = np.sqrt((base_vecs ** 2).mean(axis=1, keepdims=True))
copies_ids, copies_vecs, copies_labels = [base_ids], [base_vecs], [base_labels]
for k in range(1, COPIES):
    noise = rng.standard_normal((n_base, dim)).astype(np.float32) * (0.05 * rms)
    copies_ids.append(base_ids + k * (base_ids.max() + 1))
    copies_vecs.append(base_vecs + noise)
    copies_labels.append(base_labels)
emb_out = pd.DataFrame({
    "vec_id": np.concatenate(copies_ids).astype(np.int64),
    "embedding": list(np.concatenate(copies_vecs)),
    "label": np.concatenate(copies_labels).astype(np.int32),
})
con.register("emb_df", emb_out)
con.sql(f"""COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding,
                  CAST(label AS INTEGER) AS label FROM emb_df)
            TO '{OUT}/embeddings.parquet' (FORMAT parquet)""")

# ── everything else: verbatim sf0.1 copies (FK targets) ──────────────
for t in ("region", "nation", "customer", "supplier", "part", "orders"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

for t in ("documents", "lineitem", "events", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"wrote {OUT}")
