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

Usage: python tools/make_natural_corpus.py [out_dir] [n_docs] [n_vecs] [seed] [n_clusters] [vocab]
Defaults: /tmp/natural 5000 2000 1411 32 20000  (the sf0.1 bench sizes)
For decade-sweep tiers scale n_clusters with n_vecs (constant ~62
members/cluster: 20k vecs -> 320, 200k -> 3200; see gen_embeddings)
and vocab with corpus tokens (Heaps' law, ~36*sqrt(60*n_docs): 50k
docs -> 62000, 500k -> 197000; see gen_documents).

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


def gen_embeddings(
    n_vecs: int, rng: np.ndarray, n_clusters: int = N_CLUSTERS
) -> tuple[np.ndarray, np.ndarray]:
    """``n_clusters`` parametrized in r12 for the decade sweep: a
    growing corpus adds TOPICS, it does not pack 10x the mass into
    the same 32 — a fixed cluster count at 200k vectors would make
    within-cluster candidate mass quadratic in n, the same
    data-shape artifact make_sf_scale.py's docstring documents for
    its first-cut replication schemes. Scaling clusters with n keeps
    members-per-cluster (the LOCAL density every pruning strategy
    actually faces) constant at ~62, so per-decade ratios measure
    the OPERATOR, not the generator."""
    centers = rng.randn(n_clusters, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n_vecs)
    X = centers[labels] + NOISE * rng.randn(n_vecs, DIM)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X.astype(np.float32), labels.astype(np.int32)


def gen_documents(n_docs: int, rng, vocab: int = VOCAB) -> list[tuple]:
    """``vocab`` parametrized in r12 (Heaps' law): a fixed 20k
    vocabulary at 500k docs makes every token's document frequency
    grow linearly with n, so even prefix-filtered posting lists go
    quadratic — a generator artifact, not an operator property. Real
    corpora grow vocabulary ~ K·sqrt(total tokens); K≈36 reproduces
    the r11 default exactly (36·sqrt(5000·60) ≈ 20k), so decade
    tiers use vocab ≈ 36·sqrt(n_docs·60): 62k at 50k docs, 197k at
    500k. Token draws are inverse-CDF searchsorted (the previous
    per-doc rng.choice(p=...) was O(vocab) per call — 1e11 ops at
    the 100x tier)."""
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    cum = np.cumsum(p)
    words = np.array([f"w{i}" for i in range(vocab)])
    langs = ["en", "de", "fr", "zh", "es"]

    def draw(k: int) -> np.ndarray:
        return np.minimum(np.searchsorted(cum, rng.rand(k)), vocab - 1)

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
            subs = draw(n_sub)
            for i, pos in enumerate(rng.choice(len(toks), size=n_sub, replace=False)):
                toks[pos] = words[subs[i]]
            text = " ".join(toks)
        else:
            n_words = max(8, int(rng.lognormal(np.log(60), 0.6)))
            text = " ".join(words[draw(n_words)])
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
    n_clusters = int(sys.argv[5]) if len(sys.argv) > 5 else N_CLUSTERS
    vocab = int(sys.argv[6]) if len(sys.argv) > 6 else VOCAB
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    import pyarrow as pa
    import pyarrow.parquet as pq

    X, labels = gen_embeddings(n_vecs, rng, n_clusters)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array([row.tolist() for row in X], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    rows = gen_documents(n_docs, rng, vocab)
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
