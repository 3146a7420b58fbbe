"""Natural-corpus fixture generator + pruning-path measurements
(tools/make_natural_corpus.py, tools/natural_corpus_report.py): the
r11 BASELINE.md claims — clustered embeddings prune, Zipfian text
prefix-filters — must keep reproducing from the seeded generator."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def natural_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nat") / "corpus")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_natural_corpus.py"),
         out, "600", "400", "1411"],
        check=True, capture_output=True,
    )
    return out


def test_generator_is_deterministic(natural_dir, tmp_path):
    out2 = str(tmp_path / "corpus2")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_natural_corpus.py"),
         out2, "600", "400", "1411"],
        check=True, capture_output=True,
    )
    for t in ("documents.parquet", "embeddings.parquet"):
        a = open(os.path.join(natural_dir, t), "rb").read()
        b = open(os.path.join(out2, t), "rb").read()
        assert a == b, f"{t} not byte-identical across runs"


def test_embeddings_are_clustered(natural_dir):
    """Within-label cosine must be far above cross-label (the shipped
    random tier has neither structure)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT embedding, label FROM '{natural_dir}/embeddings.parquet'"
    ).fetchall()
    X = np.array([r[0] for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    labels = np.array([r[1] for r in rows])
    sims = X @ X.T
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(X), k=1)
    within = sims[iu][same[iu]].mean()
    cross = sims[iu][~same[iu]].mean()
    assert within > 0.75, within
    assert abs(cross) < 0.2, cross


def test_pruning_measurements_reproduce(natural_dir):
    """Cell pruning and prefix filtering must fire on the natural tier
    (exact values live in NATURAL_r11.jsonl; these are floors)."""
    import natural_corpus_report as R

    X = R._load_vectors(natural_dir)
    # n_cells matched to the generator's 32 clusters — fewer cells
    # merge distinct clusters, radii blow out, and the provable bound
    # weakens (measured 0.008 at n_cells=16 on 400 vecs): the bound
    # prunes when cells are angularly tight, exactly the SemDeDup
    # configuration (n_cells scales with corpus topic count).
    cell = R.cell_prune_fraction(X, 0.9, n_cells=32)
    assert cell["cell_blocks_pruned"] > 0
    assert cell["pair_fraction_pruned"] > 0.1

    pf = R.prefix_filter_reduction(natural_dir, 0.8)
    assert pf["reduction_x"] > 10, pf

    lsh = R.lsh_keep_rate(X, 0.9)
    assert lsh["measured"] is not None and lsh["measured"] < 0.5
