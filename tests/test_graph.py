"""Integer-exact PageRank (pipelines/graph.py)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from bigdime_ray.pipelines.graph import (HITS_SCALE, RANK_SCALE, hits,
                                         pagerank)


def _reference(edge_list, iterations):
    """Straight-from-the-update-rule single-process reference."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    ni = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for u, _ in edge_list:
        deg[ni[u]] += 1
    r = np.full(n, RANK_SCALE // n, dtype=np.int64)
    base = (3 * RANK_SCALE) // (20 * n)
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.int64)
        for u, v in edge_list:
            contrib[ni[v]] += r[ni[u]] // deg[ni[u]]
        dang = int(r[deg == 0].sum())
        r = base + (17 * (contrib + dang // n)) // 20
    return dict(zip(nodes, r.tolist()))


def _edges_ds(edge_list, nblocks=1):
    t = pa.table({"src": [u for u, _ in edge_list],
                  "dst": [v for _, v in edge_list]})
    return ray.data.from_arrow(t).repartition(nblocks)


def test_matches_reference_and_block_invariant():
    rng = np.random.default_rng(11)
    names = [f"h{i:02d}" for i in range(30)]
    edge_list = [(names[a], names[b]) for a, b in
                 rng.integers(0, 30, (400, 2)) if a != b]
    ref = _reference(edge_list, iterations=8)
    for nblocks in (1, 5):
        out = pagerank(_edges_ds(edge_list, nblocks),
                       iterations=8).to_pydict()
        got = dict(zip(out["node"], out["rank_fp"]))
        assert got == ref, f"nblocks={nblocks}"  # BIT-exact


def test_star_graph_center_wins_and_dangling():
    # every spoke links to the center; the center links nowhere
    # (dangling) — its mass redistributes uniformly
    edge_list = [(f"s{i}", "center") for i in range(10)]
    out = pagerank(_edges_ds(edge_list), iterations=15).to_pydict()
    ranks = dict(zip(out["node"], out["rank_fp"]))
    assert ranks["center"] == max(ranks.values())
    spokes = [v for k, v in ranks.items() if k != "center"]
    assert len(set(spokes)) == 1          # symmetry preserved exactly
    assert ranks["center"] > 3 * spokes[0]
    # mass approximately conserved (integer floors only lose ulps)
    assert abs(sum(ranks.values()) - RANK_SCALE) < RANK_SCALE * 0.01


def _hits_reference(edge_list, iterations):
    """Straight-from-the-update-rule single-process reference, exact
    arbitrary-precision Python ints for the normalization totals."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    ni = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = [HITS_SCALE // n] * n
    a = [0] * n
    for _ in range(iterations):
        a = [0] * n
        for u, v in edge_list:
            a[ni[v]] += h[ni[u]]
        d = max(1, sum(a) // HITS_SCALE)
        a = [x // d for x in a]
        h = [0] * n
        for u, v in edge_list:
            h[ni[u]] += a[ni[v]]
        d = max(1, sum(h) // HITS_SCALE)
        h = [x // d for x in h]
    return {v: (h[ni[v]], a[ni[v]]) for v in nodes}


def test_hits_matches_reference_and_block_invariant():
    rng = np.random.default_rng(13)
    names = [f"h{i:02d}" for i in range(25)]
    edge_list = [(names[u], names[v]) for u, v in
                 rng.integers(0, 25, (300, 2)) if u != v]
    ref = _hits_reference(edge_list, iterations=6)
    for nblocks in (1, 5):
        out = hits(_edges_ds(edge_list, nblocks), iterations=6).to_pydict()
        got = dict(zip(out["node"],
                       zip(out["hub_fp"], out["auth_fp"])))
        assert got == ref, f"nblocks={nblocks}"  # BIT-exact


def test_hits_hub_authority_separation():
    # directory d links to every article; articles link nowhere:
    # d is the pure hub, articles the pure authorities
    edge_list = [("directory", f"art{i}") for i in range(8)]
    out = hits(_edges_ds(edge_list), iterations=10).to_pydict()
    hub = dict(zip(out["node"], out["hub_fp"]))
    auth = dict(zip(out["node"], out["auth_fp"]))
    assert hub["directory"] == max(hub.values())
    assert auth["directory"] == 0
    arts = [auth[f"art{i}"] for i in range(8)]
    assert len(set(arts)) == 1 and arts[0] > 0   # exact symmetry
    assert hub[f"art{0}"] == 0


def test_hits_empty():
    empty = hits(ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.string()),
                  "dst": pa.array([], type=pa.string())})))
    assert len(empty) == 0
    assert empty.column_names == ["node", "hub_fp", "auth_fp",
                                  "hub", "auth"]


def _ppr_reference(edge_list, iterations, seeds):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    ni = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for u, _ in edge_list:
        deg[ni[u]] += 1
    sd = [1 if v in seeds else 0 for v in nodes]
    ns = sum(sd)
    r = [(RANK_SCALE // ns) * s for s in sd]
    for _ in range(iterations):
        contrib = [0] * n
        for u, v in edge_list:
            contrib[ni[v]] += r[ni[u]] // int(deg[ni[u]])
        dang = sum(r[i] for i in range(n) if deg[i] == 0)
        r = [((3 * RANK_SCALE) // (20 * ns)) * sd[i]
             + (17 * (contrib[i] + (dang // ns) * sd[i])) // 20
             for i in range(n)]
    return dict(zip(nodes, r))


def test_personalized_pagerank():
    import pytest
    rng = np.random.default_rng(29)
    names = [f"h{i:02d}" for i in range(20)]
    edge_list = [(names[a], names[b]) for a, b in
                 rng.integers(0, 20, (200, 2)) if a != b]
    seeds = {"h00", "h01"}
    ref = _ppr_reference(edge_list, 6, seeds)
    for nblocks in (1, 4):
        out = pagerank(_edges_ds(edge_list, nblocks), iterations=6,
                       seed_nodes=sorted(seeds)).to_pydict()
        got = dict(zip(out["node"], out["rank_fp"]))
        assert got == ref, f"nblocks={nblocks}"  # BIT-exact
    # seeds (and their neighborhoods) dominate; distant mass decays
    top = sorted(ref, key=ref.get, reverse=True)[:4]
    assert "h00" in top or "h01" in top
    # seeds = ALL nodes must equal the uniform variant bit-for-bit
    uni = pagerank(_edges_ds(edge_list), iterations=4).to_pydict()
    per = pagerank(_edges_ds(edge_list), iterations=4,
                   seed_nodes=names).to_pydict()
    assert uni == per
    with pytest.raises(ValueError):
        pagerank(_edges_ds(edge_list), seed_nodes=["absent"])


def test_degree_stats():
    from bigdime_ray.pipelines.graph import degree_stats
    edge_list = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("a", "b")]  # duplicate edge counts twice
    for nblocks in (1, 3):
        out = degree_stats(_edges_ds(edge_list, nblocks)).to_pydict()
        got = {v: (o, i) for v, o, i in
               zip(out["node"], out["out_deg"], out["in_deg"])}
        assert got == {"a": (3, 1), "b": (1, 2), "c": (1, 2)}, \
            f"nblocks={nblocks}"
    empty = degree_stats(ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.string()),
                  "dst": pa.array([], type=pa.string())})))
    assert len(empty) == 0


def test_empty_and_self_loop():
    out = pagerank(_edges_ds([("a", "a"), ("a", "b")]), iterations=5)
    assert set(out["node"].to_pylist()) == {"a", "b"}
    empty = pagerank(ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.string()),
                  "dst": pa.array([], type=pa.string())})))
    assert len(empty) == 0
