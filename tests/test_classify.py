"""Distributed linear classifier (pipelines/classify.py): exact
partition invariance, learnability, streaming inference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd
from bigdime_ray.pipelines.classify import (extract_features,
                                            hashed_ngram_buckets,
                                            score_logreg, train_logreg,
                                            train_logreg_table)

DIM = 1 << 16


def _synthetic_task(n_per_class: int = 300, seed: int = 7) -> pa.Table:
    """Separable two-class corpus: vowel-heavy vs digit-heavy words."""
    rng = np.random.default_rng(seed)

    def words(alpha: str) -> str:
        return " ".join(
            "".join(rng.choice(list(alpha), rng.integers(3, 9)))
            for _ in range(rng.integers(5, 15)))

    texts = [words("aeioulmnrst") for _ in range(n_per_class)] + \
        [words("0123456789xyz") for _ in range(n_per_class)]
    labels = [1] * n_per_class + [0] * n_per_class
    perm = rng.permutation(len(texts))
    return pa.table({
        "text": pa.array([texts[i] for i in perm]),
        "label": pa.array([labels[i] for i in perm], type=pa.int8())})


def test_hashed_buckets_every_row_nonempty():
    vals, off = hashed_ngram_buckets(
        pa.array(["", "ab", "a much longer line of text"]), dim=DIM)
    counts = np.diff(off)
    assert (counts >= 1).all()
    assert vals.min() >= 0 and vals.max() < DIM


def test_train_partition_invariant_and_matches_reference():
    """The distributed trainer must be BIT-IDENTICAL to the
    single-process reference at any block count — per-occurrence
    fixed-point gradient quantization makes the integer partial sums
    order- and partition-independent."""
    tbl = _synthetic_task()
    ref_w = train_logreg_table(tbl, dim=DIM, iters=12)
    for nblocks in (1, 3, 5):
        feats = extract_features(rd.from_arrow(tbl).repartition(nblocks),
                                 dim=DIM)
        w = train_logreg(feats, dim=DIM, iters=12)
        np.testing.assert_array_equal(w, ref_w)


def test_learns_separable_task_and_generalizes():
    train = _synthetic_task(seed=7)
    test = _synthetic_task(seed=99)
    w = train_logreg_table(train, dim=DIM, iters=15)
    scored = score_logreg(rd.from_arrow(test), w, dim=DIM).to_pandas()
    acc = ((scored["prob"] > 0.5).astype(int) == scored["label"]).mean()
    assert acc >= 0.95, acc
    # inference preserves all input columns and row count
    assert len(scored) == test.num_rows
    assert {"text", "label", "prob"} <= set(scored.columns)


def test_empty_and_degenerate_inputs():
    # all-one-class training stays finite; empty text rows score
    tbl = pa.table({"text": pa.array(["aaa bbb", "", "ccc"]),
                    "label": pa.array([1, 1, 1], type=pa.int8())})
    w = train_logreg_table(tbl, dim=DIM, iters=3)
    assert np.isfinite(w).all()
    scored = score_logreg(rd.from_arrow(tbl), w, dim=DIM).to_pandas()
    assert np.isfinite(scored["prob"]).all()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_keyword_classifier_query_deterministic(sf_dir):
    import __ray_entry__ as e
    q = e.queries()["doc_keyword_classifier"]
    a = q(sf_dir)
    b = q(sf_dir)
    pa_a = a if isinstance(a, pa.Table) else pa.Table.from_pandas(
        a.to_pandas() if hasattr(a, "to_pandas") else a)
    pa_b = b if isinstance(b, pa.Table) else pa.Table.from_pandas(
        b.to_pandas() if hasattr(b, "to_pandas") else b)
    assert pa_a.equals(pa_b)
    df = pa_a.to_pandas()
    assert (df["pred"] == df["label"]).mean() > 0.8
