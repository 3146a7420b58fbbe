#!/usr/bin/env python
"""Generate the NATURAL-corpus fixture tier (r11, VERDICT r10 task 3).

The shipped testdata is the adversarial worst case for every pruning
strategy: embeddings are uniform-random 64-d (k-means cells provably
cannot prune, hyperplane-LSH keep-rate f >= 0.99, ANN recall floors
0.84) and documents share a 31-word vocabulary (prefix filtering
reduced candidates only 1.99x — the measured negative result,
BASELINE.md §r10). Real 100 TB corpora are the opposite: embeddings
cluster (they come from models applied to topical data) and text is
Zipfian (a fat head of stopwords, a long tail of rare tokens — the
exact skew prefix ordering exploits). This generator produces that
shape, seeded and deterministic:

- ``embeddings.parquet`` (vec_id, embedding float[dim], label):
  ``n_clusters`` unit centers ~ N(0,1) normalized; each member is
  normalize(center + noise * N(0,1)) — within-cluster cosines ~0.9+,
  cross-cluster ~0 at 64-d. label = cluster id (same schema as the
  shipped tier).
- ``documents.parquet`` (doc_id, text, lang, source, n_chars):
  vocabulary of ``vocab`` tokens with Zipf(s) frequencies; doc length
  lognormal (median ~60 words); 8 sources, 5 langs. Duplicate
  structure mirrors a scraped corpus: ~4% exact dups and ~8% near
  dups (a few word substitutions) of earlier documents.

Usage: python tools/make_natural_corpus.py [out_dir] [n_docs] [n_vecs] [seed]
Defaults: /tmp/natural 5000 2000 1411  (the sf0.1 bench sizes)

tools/natural_corpus_report.py measures the pruning paths on this
tier side by side with the shipped worst case; the table lives in
BASELINE.md §r11.
"""

from __future__ import annotations

import os
import sys

import numpy as np

DIM = 64
N_CLUSTERS = 32
NOISE = 0.06  # per-dim; noise NORM ~0.06*sqrt(64)=0.48 -> ~25 deg cluster radius
VOCAB = 20000
ZIPF_S = 1.07


def gen_embeddings(n_vecs: int, rng: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, N_CLUSTERS, size=n_vecs)
    X = centers[labels] + NOISE * rng.randn(n_vecs, DIM)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X.astype(np.float32), labels.astype(np.int32)


def gen_documents(n_docs: int, rng) -> list[tuple]:
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    words = np.array([f"w{i}" for i in range(VOCAB)])
    langs = ["en", "de", "fr", "zh", "es"]
    rows: list[tuple] = []
    for doc_id in range(n_docs):
        u = rng.rand()
        if doc_id > 20 and u < 0.04:  # exact dup of an earlier doc
            src = rows[rng.randint(0, len(rows))]
            text = src[1]
        elif doc_id > 20 and u < 0.12:  # near dup: substitute ~5% of words
            src = rows[rng.randint(0, len(rows))]
            toks = src[1].split(" ")
            n_sub = max(1, len(toks) // 20)
            for pos in rng.choice(len(toks), size=n_sub, replace=False):
                toks[pos] = words[rng.choice(VOCAB, p=p)]
            text = " ".join(toks)
        else:
            n_words = max(8, int(rng.lognormal(np.log(60), 0.6)))
            text = " ".join(words[rng.choice(VOCAB, size=n_words, p=p)])
        rows.append(
            (
                doc_id,
                text,
                langs[rng.randint(0, len(langs))],
                f"src{rng.randint(0, 8)}",
                len(text),
            )
        )
    return rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/natural"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 1411
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    import pyarrow as pa
    import pyarrow.parquet as pq

    X, labels = gen_embeddings(n_vecs, rng)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array([row.tolist() for row in X], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    rows = gen_documents(n_docs, rng)
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote {out_dir}: {n_docs} docs, {n_vecs} vecs (seed {seed})")


if __name__ == "__main__":
    main()
