#!/usr/bin/env python3
"""One-off scale-rehearsal data generator (round-14 judge item 2).

Builds a factor-N documents/embeddings slice that is statistically
faithful to sf0.1, for measuring the dedup/similarity family's wall-time
scaling exponents above the largest driver-shipped SF:

- documents: N shards; shard 0 is sf0.1 verbatim. Two modes for how
  shards k>0 rewrite tokens, chosen by the third argument:
  * grow (default): word w -> "w_k" — each shard gets a DISJOINT
    vocabulary, so per-shard shingle/Jaccard structure reproduces sf0.1
    exactly and shards share no shingles. This models a real corpus
    growing with new content: shingle space grows with the data, true
    near-dup output scales linearly, and any super-linear runtime is
    the engine's fault.
  * saturate: a shard-seeded BIJECTIVE permutation of the SHARED
    31-word vocabulary. Per-shard structure is again exact, but the
    trigram space is capped at 31^3 = 29,791 — it saturates around 30k
    docs (measured: at 10x every trigram's df exceeds the rare cutoff
    and unrelated docs band-collide at ~1.6e-4). This stresses the
    degenerate dense-shingle regime no real corpus reaches; see the
    PLANS.md appendix for what each operator does there.
- embeddings: shard 0 verbatim, shard k>0 right-multiplied by a
  shard-seeded random orthogonal matrix — all intra-shard norms and
  cosines are preserved bit-for-bit in structure (float rounding aside),
  cross-shard geometry decorrelates.

Usage: python3 tools/gen_scale10.py [factor] [outdir] [grow|saturate]
Writes <outdir>/documents.parquet and <outdir>/embeddings.parquet
(default /tmp/graft_scale<factor>). Uses driver-side python libs
(duckdb/pyarrow/numpy) — tooling only, not engine code, same as
tools/check.py.
"""
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def gen_documents(con, factor, out, mode):
    docs = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    vocab = sorted({w for _, t, _, _ in docs for w in t.split(" ")})
    n_docs = len(docs)
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for k in range(factor):
        rng = random.Random(1000 + k)
        if k == 0:
            perm = dict(zip(vocab, vocab))
        elif mode == "saturate":
            perm = dict(zip(vocab, rng.sample(vocab, len(vocab))))
        else:
            perm = {w: f"{w}{k}" for w in vocab}
        for (i, t, lang, srcname) in docs:
            nt = t if k == 0 else " ".join(perm[w] for w in t.split(" "))
            ids.append(k * n_docs + i)
            texts.append(nt)
            langs.append(lang)
            sources.append(srcname)
            nchars.append(len(nt))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    }), f"{out}/documents.parquet")
    return factor * n_docs


def gen_embeddings(con, factor, out):
    emb = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    X = np.array([e for _, e, _ in emb], dtype=np.float32)
    vids = np.array([v for v, _, _ in emb], dtype=np.int64)
    labels = np.array([l for _, _, l in emb], dtype=np.int32)
    n_vec, dim = X.shape
    all_ids, all_vecs, all_labels = [], [], []
    for k in range(factor):
        if k == 0:
            Xk = X
        else:
            q, _ = np.linalg.qr(
                np.random.RandomState(2000 + k).randn(dim, dim))
            Xk = (X @ q.astype(np.float32)).astype(np.float32)
        all_ids.append(vids + k * n_vec)
        all_vecs.append(Xk)
        all_labels.append(labels)
    vecs = np.concatenate(all_vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels), pa.int32()),
    }), f"{out}/embeddings.parquet")
    return factor * n_vec


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mode = sys.argv[3] if len(sys.argv) > 3 else "grow"
    out = (sys.argv[2] if len(sys.argv) > 2
           else f"/tmp/graft_scale{factor}_{mode}")
    assert mode in ("grow", "saturate"), mode
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n_docs = gen_documents(con, factor, out, mode)
    n_vec = gen_embeddings(con, factor, out)
    print(f"[gen_scale] wrote {out}: {n_docs} docs, {n_vec} vectors")


if __name__ == "__main__":
    main()
