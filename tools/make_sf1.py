#!/usr/bin/env python3
"""Upsample sf0.1 documents/embeddings 10x -> an sf1-scale stress dir.

Deterministic, density-preserving upsample (r9 verdict #4: scale-stress
the heavy family once at sf1):

- documents: 10 copies per doc; copy k > 0 rewrites the text through a
  per-copy CHARACTER SUBSTITUTION CIPHER (letters+digits permuted,
  whitespace/punct fixed). A bijection on characters maps each doc's
  char-shingle set 1:1, so WITHIN-copy Jaccard/minhash/simhash
  structure is preserved EXACTLY while cross-copy shingles are
  disjoint: rows grow 10x, near-dup pairs grow 10x => expected cost
  growth ~linear. (A first attempt suffixed every token with '_k<N>';
  that planted the same handful of shingles in every doc of a copy --
  viral LSH buckets, quadratic pair blowup. Cipher avoids it.)

- embeddings: 10 copies per vector; copy k > 0 flips coordinate signs
  by a per-(k, dim) hash pattern. Norms preserved exactly, cross-copy
  cosine structure destroyed, within-copy geometry replicated.

- part/lineitem/orders: 10 DISJOINT copies via key offsets (orders
  shares lineitem's l_orderkey offsets, so joins keep their foreign
  keys); part names go through the same per-copy cipher.

Remaining tables are symlinked from sf0.1. Output dir is NOT
committed; docs/bench/sf1*.json are.
"""
import os
import random
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
# Seed base for the per-copy ciphers. MUST differ between chained
# decades (sf0.1->sf1 then sf1->sf10): with the same seeds, second-hop
# copy (j, first-hop 0) and (0, first-hop j) are the SAME cipher image
# of the base text — 2*(COPIES-1) whole slices become exact twins, so
# near-dup pair counts jump super-linearly and the density-preserving
# claim (and any scale-ratio read off the fixture) breaks.
SEED_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
COPIES = 10

ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def cipher(k: int) -> str:
    # deterministic per-copy permutation of the alphabet (seeded rng,
    # stable across python versions for random.Random().shuffle)
    chars = list(ALPHA)
    random.Random(SEED_BASE + k).shuffle(chars)
    return "".join(chars)


os.makedirs(DST, exist_ok=True)

# A previous script version symlinked part/lineitem/orders from SRC;
# COPY TO would WRITE THROUGH such a stale symlink and destroy the
# source table. Remove any symlink at a path we are about to write.
for t in ("documents", "embeddings", "part", "lineitem", "orders"):
    p = f"{DST}/{t}.parquet"
    if os.path.islink(p):
        os.remove(p)

con = duckdb.connect()

n_docs = con.execute(
    f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
).fetchone()[0]
n_vecs = con.execute(
    f"SELECT max(vec_id)+1 FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0]

cases = " ".join(
    f"WHEN k.k = {k} THEN translate(d.text, '{ALPHA}', '{cipher(k)}')"
    for k in range(1, COPIES)
)
con.execute(f"""
COPY (
  SELECT d.doc_id + k.k * {n_docs} AS doc_id,
         CASE {cases} ELSE d.text END AS text,
         d.lang, d.source, d.n_chars
  FROM read_parquet('{SRC}/documents.parquet') d,
       (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + k.k * {n_vecs} AS vec_id,
         CASE WHEN k.k = 0 THEN e.embedding
              ELSE list_transform(
                list_zip(e.embedding,
                         generate_series(1, len(e.embedding))),
                z -> CASE WHEN hash(k.k * 1000003 + z[2] + {SEED_BASE}) % 2 = 0
                          THEN z[1] ELSE -z[1] END)
         END AS embedding
  FROM read_parquet('{SRC}/embeddings.parquet') e,
       (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")

# part/lineitem upsample (r10 fourth session: q_er_clusters /
# q_triangle_count read these). Copies are DISJOINT via key offsets —
# density-preserving: 10x nodes, 10x edges, 10x name vocabulary; the
# per-copy cipher keeps within-copy levenshtein structure exact while
# cross-copy names stay unrelated (same reasoning as documents).
n_parts = con.execute(
    f"SELECT max(p_partkey)+1 FROM read_parquet('{SRC}/part.parquet')"
).fetchone()[0]
n_orders = con.execute(
    f"SELECT max(l_orderkey)+1 FROM read_parquet('{SRC}/lineitem.parquet')"
).fetchone()[0]

name_cases = " ".join(
    f"WHEN k.k = {k} THEN translate(p.p_name, '{ALPHA}', '{cipher(k)}')"
    for k in range(1, COPIES)
)
con.execute(f"""
COPY (
  SELECT p.* REPLACE (p.p_partkey + k.k * {n_parts} AS p_partkey,
                      CASE {name_cases} ELSE p.p_name END AS p_name)
  FROM read_parquet('{SRC}/part.parquet') p,
       (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
) TO '{DST}/part.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT l.* REPLACE (l.l_orderkey + k.k * {n_orders} AS l_orderkey,
                      l.l_partkey + k.k * {n_parts} AS l_partkey)
  FROM read_parquet('{SRC}/lineitem.parquet') l,
       (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")

# orders upsamples with the SAME o_orderkey offsets so lineitem's
# foreign keys stay intact (a symlinked sf0.1 orders would orphan
# 90% of sf1 lineitem rows and silently shrink every join);
# o_custkey is left as-is — customer stays shared across copies.
con.execute(f"""
COPY (
  SELECT o.* REPLACE (o.o_orderkey + k.k * {n_orders} AS o_orderkey)
  FROM read_parquet('{SRC}/orders.parquet') o,
       (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
) TO '{DST}/orders.parquet' (FORMAT PARQUET)
""")

for t in ("region", "nation", "customer", "supplier", "events"):
    src = f"{SRC}/{t}.parquet"
    dst = f"{DST}/{t}.parquet"
    if os.path.exists(src) and not os.path.exists(dst):
        os.symlink(src, dst)

for t in ("documents", "embeddings", "part", "lineitem", "orders"):
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")
print(f"wrote {DST}")
