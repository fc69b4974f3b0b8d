"""Connected components (large-star/small-star) + near-dup clustering.

Every graph shape is checked against a plain-python union-find oracle;
the path graph pins the O(log n) round count that motivates the
star algorithm over min-label propagation (whose rounds = diameter).
"""

from __future__ import annotations

import random

import pytest

from ckanext_extractor_spark.functions.dedup import (
    connected_components,
    dedup_representatives,
    jaccard_candidate_pairs,
    neardup_clusters,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = component min (find() roots at the min because
    # unions always parent the larger root under the smaller)
    return {n: find(n) for n in parent}


def _cc_spark(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, **kw).collect()
    return {int(r["node"]): int(r["cluster_id"]) for r in out}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4)],                      # path
        [(10, 20), (30, 40), (20, 30)],                # merged path
        [(1, 2), (3, 4), (5, 6)],                      # three pairs
        [(5, 1), (5, 2), (5, 3), (5, 4)],              # star at non-min
        [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9)],      # cycle + path
        [(2, 1), (1, 2), (2, 2)],                      # dup/reversed/self
    ],
)
def test_cc_matches_union_find_shapes(spark, edges):
    expect = _uf_components([(a, b) for a, b in edges if a != b])
    assert _cc_spark(spark, edges) == expect


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_spark(spark, edges) == _uf_components(edges), trial


def test_cc_path_graph_converges_logarithmically(spark):
    # a 64-node path has diameter 63; star rounds must stay O(log n) —
    # max_iter=12 would fail under label propagation
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_spark(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(64)}


def test_cc_empty_and_selfloop_only(spark):
    assert _cc_spark(spark, [(7, 7)]) == {}


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


@pytest.fixture(scope="module")
def neardup_docs(spark):
    # two near-dup families + distinct docs; family A chains 0-1-2
    # (0~1 and 1~2 similar, 0~2 less so) to force a transitive cluster
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "alpha beta gamma delta theta eta"),
        (10, "spark index engine query postings"),
        (11, "spark index engine query merge"),
        (20, "completely different words entirely unique"),
        (21, "another unrelated document body here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_neardup_clusters_transitive(spark, neardup_docs):
    pairs = jaccard_candidate_pairs(neardup_docs, threshold=0.5)
    got = {
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in neardup_clusters(
            neardup_docs, threshold=0.5, candidates=pairs
        ).collect()
    }
    # family A is one cluster THROUGH the chain even if (0,2) < threshold
    assert got == {(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)}


def test_neardup_clusters_include_singletons(spark, neardup_docs):
    pairs = jaccard_candidate_pairs(neardup_docs, threshold=0.5)
    got = {
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in neardup_clusters(
            neardup_docs, threshold=0.5, candidates=pairs,
            include_singletons=True,
        ).collect()
    }
    assert got == {
        (0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (20, 20), (21, 21),
    }


def test_neardup_clusters_via_lsh(spark, neardup_docs):
    # default path: LSH candidates -> verify -> components; LSH recall
    # may drop weak pairs but the two strong families must survive
    got = {
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in neardup_clusters(neardup_docs, threshold=0.5).collect()
    }
    assert (10, 10) in got and (11, 10) in got
    clusters_a = {c for d, c in got if d in (0, 1, 2)}
    assert clusters_a == {0}


def test_dedup_representatives(spark, neardup_docs):
    pairs = jaccard_candidate_pairs(neardup_docs, threshold=0.5)
    clusters = neardup_clusters(neardup_docs, threshold=0.5, candidates=pairs)
    kept = sorted(
        int(r["doc_id"])
        for r in dedup_representatives(neardup_docs, clusters).collect()
    )
    # cluster mins 0 and 10 survive; unpaired 20/21 survive
    assert kept == [0, 10, 20, 21]
