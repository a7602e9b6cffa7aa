"""Oracle-independent validation of the graph family: the co-activity
graph rebuilt with plain Python sets/dicts from the raw events, then
triangle counts, k-core peeling, BFS hop distances, and integer
PageRank replayed with literal loops. Tenth module of the independence
campaign — the engine side runs over materialized artifacts and
degree-oriented joins, so an error in artifact plumbing or orientation
would agree with its mirrored oracle but not with these.

All at sf0.001.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def activity() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    mins = pd.to_datetime(df.ts).dt.floor("us").values.astype("datetime64[m]")
    return pd.DataFrame({"b": mins, "user_id": df.user_id}).drop_duplicates()


@pytest.fixture(scope="module")
def exact_edges(activity) -> set:
    """Distinct id-ordered co-activity pairs (uncapped)."""
    e = set()
    for _, sub in activity.groupby("b"):
        us = sorted(sub.user_id)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                e.add((int(us[i]), int(us[j])))
    return e


def _adj(edges):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def test_triangle_counts_match_set_intersection(spark, exact_edges):
    adj = _adj(exact_edges)
    tri = Counter()
    for a, b in exact_edges:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once at its max vertex scan
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    rows = {r.user_id: r for r in QUERIES["triangle_count_graph"](spark, SF_DIR).collect()}
    expected = {u for u, nb in adj.items() if len(nb) >= 2}
    assert set(rows) == expected
    for u in expected:
        r = rows[u]
        assert r.degree == len(adj[u]), u
        assert r.n_triangles == tri[u], u
        want = 2.0 * tri[u] / (len(adj[u]) * (len(adj[u]) - 1))
        assert abs(r.clustering_coeff - want) < 1e-6, u


def test_kcore_matches_literal_peel(spark, exact_edges):
    from iot_etl_spark.plans.queries_audit import KCORE_K, KCORE_ROUNDS

    alive = set(_adj(exact_edges))
    for _ in range(KCORE_ROUNDS):
        deg = Counter()
        for a, b in exact_edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        alive = {u for u in alive if deg[u] >= KCORE_K}
    fin = Counter()
    for a, b in exact_edges:
        if a in alive and b in alive:
            fin[a] += 1
            fin[b] += 1
    rows = {r.user_id: r for r in QUERIES["kcore_membership"](spark, SF_DIR).collect()}
    assert set(rows) == set(_adj(exact_edges))
    for u, r in rows.items():
        assert bool(r.in_core) == (u in alive), u
        assert r.core_degree == fin.get(u, 0), u


def test_bfs_matches_literal_frontier(spark, activity):
    from iot_etl_spark.plans.graphedges import COACT_BUCKET_CAP
    from iot_etl_spark.plans.queries_analytics4 import BFS_MAX_HOPS

    capped = set()
    for _, sub in activity.groupby("b"):
        us = sorted(sub.user_id)[:COACT_BUCKET_CAP]
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                capped.add((int(us[i]), int(us[j])))
    adj = _adj(capped)
    seed = int(activity.user_id.min())
    dist = {seed: 0}
    frontier = {seed}
    for d in range(1, BFS_MAX_HOPS + 1):
        frontier = {
            v for u in frontier for v in adj[u] if v not in dist
        }
        for v in frontier:
            dist[v] = d
        if not frontier:
            break
    hist = defaultdict(list)
    for u, d in dist.items():
        hist[d].append(u)
    rows = {r.hop: r for r in QUERIES["bfs_hop_distance"](spark, SF_DIR).collect()}
    assert set(rows) == set(hist)
    for d, us in hist.items():
        r = rows[d]
        assert r.n_users == len(us), d
        assert (r.min_user, r.max_user) == (min(us), max(us)), d


def test_pagerank_matches_integer_loop(spark, activity):
    from iot_etl_spark.plans.queries_mlprep import PR_ITERS, PR_SCALE, _PR_DEN, _PR_NUM

    ev = pd.read_parquet(EVENTS)
    all_users = sorted(int(u) for u in ev.user_id.unique())
    n = len(all_users)
    out_edges = defaultdict(set)
    for _, sub in activity.groupby("b"):
        us = [int(u) for u in sub.user_id]
        for a in us:
            for b in us:
                if a != b:
                    out_edges[a].add(b)
    deg = {u: len(vs) for u, vs in out_edges.items()}
    base = (15 * PR_SCALE) // (100 * n)
    r = {u: PR_SCALE // n for u in all_users}
    for _ in range(PR_ITERS):
        nxt = {u: base for u in all_users}
        for src, dsts in out_edges.items():
            contrib = (_PR_NUM * r[src]) // (_PR_DEN * deg[src])
            for dst in dsts:
                nxt[dst] += contrib
        r = nxt
    rows = {row.user_id: row for row in QUERIES["pagerank_device_graph"](spark, SF_DIR).collect()}
    assert set(rows) == set(all_users)
    for u in all_users:
        row = rows[u]
        assert row.degree == deg.get(u, 0), u
        assert row.rank_units == r[u], u
        assert abs(row.pagerank - r[u] / PR_SCALE) < 1e-6, u
