"""Sequence packing: first-fit-decreasing invariants + determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from bigdime_ray.pipelines.pack import (pack_block, pack_sequences,
                                        packing_stats)


def test_pack_block_invariants():
    rng = np.random.default_rng(3)
    lengths = rng.integers(10, 900, 500)
    packs, offsets = pack_block(lengths, max_len=1000)
    df = pd.DataFrame({"p": packs, "o": offsets, "l": lengths})
    # every pack fits the budget
    assert (df.groupby("p")["l"].sum() <= 1000).all()
    # offsets tile each pack without overlap
    for _, g in df.groupby("p"):
        g = g.sort_values("o")
        assert g.o.iloc[0] == 0
        assert (g.o.iloc[1:].to_numpy()
                == (g.o + g.l).iloc[:-1].to_numpy()).all()
    # FFD is near-optimal: within 25% of the lower bound
    assert df.p.nunique() <= np.ceil(lengths.sum() / 1000) * 1.25


def test_pack_block_oversized_rows_isolated():
    packs, offsets = pack_block(np.asarray([5000, 10, 20]), max_len=100)
    assert offsets[0] == 0
    # the oversized row shares its pack with nothing
    assert (packs[1:] != packs[0]).all()


def test_pack_sequences_deterministic_and_complete():
    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "n_tok": pa.array(rng.integers(5, 1500, n), type=pa.int32())})
    ds = ray.data.from_arrow(tbl).repartition(6)
    out1 = (pack_sequences(ds, max_len=2048).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    out2 = (pack_sequences(ds, max_len=2048).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert out1.equals(out2)                       # deterministic
    assert len(out1) == n                          # every doc assigned
    fill = out1.groupby("pack_id")["n_tok"].sum()
    assert (fill <= 2048).all()
    stats = packing_stats(pack_sequences(ds, max_len=2048), 2048)
    assert stats["n_docs"] == n
    assert stats["fill_rate"] > 0.8                # FFD packs tightly


def test_token_ngram_decontaminate_matches_brute_force():
    """Token-level windows == per-row Python brute force: planted exact
    8-token overlap found, short rows absent, no cross-row windows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from bigdime_ray.pipelines.curate import token_ngram_decontaminate

    rng = np.random.default_rng(5)
    evals = [rng.integers(0, 1000, 30).tolist() for _ in range(3)]
    train = [rng.integers(0, 1000, 40).tolist() for _ in range(6)]
    train[1] = train[1][:10] + evals[0][5:13] + train[1][18:]  # planted
    train[4] = evals[2][:25]                                   # big overlap
    train.append(list(range(5)))                               # < n tokens? no, 5 < 8 yes
    n = 8

    def wins(seq):
        return [tuple(seq[i:i + n]) for i in range(len(seq) - n + 1)]

    ev = set()
    for s in evals:
        ev.update(wins(s))
    expect = {}
    for i, s in enumerate(train):
        w = wins(s)
        if w:
            expect[f"t{i}"] = (len(w), sum(x in ev for x in w))

    def tbl(seqs, prefix):
        return pa.table({
            "doc_id": [f"{prefix}{i}" for i in range(len(seqs))],
            "tokens": pa.array(seqs, type=pa.list_(pa.int32()))})

    tr = rd.from_arrow(tbl(train, "t")).repartition(2)
    ev_ds = rd.from_arrow(tbl(evals, "e"))
    out = token_ngram_decontaminate(tr, ev_ds, n=n).to_pandas()
    got = {r.doc_id: (r.n_windows, r.n_hits) for r in out.itertuples()}
    assert got == expect
    assert got["t1"][1] >= 1 and got["t4"][1] >= 18
    assert "t6" not in got  # 5 tokens < n
