"""Property-based tests (hypothesis) for the Pregel-style graph loops
(operators/graph.py) on ARBITRARY random digraphs — the fixed-input
tests pin designed graphs (cliques, chains); these hunt the argmax /
tie-rule / state-shrink edge cases of the r6 superstep rework:

* label_propagation: the synchronous max-weight-then-min-label update
  over a weighted digraph, including the non-obvious state semantics —
  labels live on the SRC set, edges whose dst has no current label
  drop out, and a vertex whose neighbors all dropped disappears from
  the state (mirrored exactly by the Python reference).
* bfs_hops: k relaxation supersteps == Bellman-Ford truncated at k
  edges (min-relaxation is a CRDT merge, so any interleaving agrees).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # src
        st.integers(min_value=0, max_value=9),   # dst
        st.integers(min_value=1, max_value=5),   # weight
    ),
    min_size=1,
    max_size=30,
).map(lambda es: [(s, d, w) for s, d, w in es if s != d])


@given(edges=EDGES, n_iter=st.integers(min_value=1, max_value=3))
@SETTINGS
def test_label_propagation_matches_reference_on_random_digraphs(
    spark, edges, n_iter
):
    from collections import defaultdict

    from csv2parquet_spark.operators.graph import label_propagation

    if not edges:
        return
    # Collapse parallel edges the way the aggregate does (weights sum).
    adj: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for s, d, w in edges:
        adj[s][d] += w

    lbl = {v: v for v in adj}
    for _ in range(n_iter):
        nxt = {}
        for v in adj:
            tot: dict[int, int] = defaultdict(int)
            for d, w in adj[v].items():
                if d in lbl:  # dst without a current label drops out
                    tot[lbl[d]] += w
            if tot:
                bw = max(tot.values())
                nxt[v] = min(l for l, t in tot.items() if t == bw)
        lbl = nxt

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.lbl for r in label_propagation(df, n_iter=n_iter).collect()}
    assert got == lbl


@given(edges=EDGES, n_iter=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_bfs_hops_equals_truncated_bellman_ford(spark, edges, n_iter):
    from csv2parquet_spark.operators.graph import bfs_hops

    if not edges:
        return
    source = min(s for s, _, _ in edges)
    dist = {source: 0}
    for _ in range(n_iter):
        nxt = dict(dist)
        for s, d, _ in edges:
            if s in dist and dist[s] + 1 < nxt.get(d, 1 << 30):
                nxt[d] = dist[s] + 1
        dist = nxt

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.d for r in bfs_hops(df, source=None, n_iter=n_iter).collect()}
    assert got == dist


def test_copurchase_edges_null_group_matches_self_join(spark):
    """Review r9: NULL group keys must contribute NO pairs — the
    relational formulation is a self-equi-join on the group key, where
    NULL never equals NULL. groupBy would otherwise lump all NULL-key
    rows into one pseudo-basket (silent extra pairs + an unbounded m²
    basket on exactly the dirtiest key)."""
    from csv2parquet_spark.operators.graph import copurchase_edges

    df = spark.createDataFrame(
        [(1, 10), (1, 11), (None, 12), (None, 13), (None, 14), (2, 10), (2, None)],
        "g int, item int",
    )
    got = sorted(
        (r.src, r.dst, r.w) for r in copurchase_edges(df, "g", "item").collect()
    )
    # self-join reference semantics
    df.createOrReplaceTempView("b")
    want = sorted(
        (r.src, r.dst, r.w)
        for r in spark.sql(
            """
            SELECT a.item AS src, c.item AS dst, count(DISTINCT a.g) AS w
            FROM b a JOIN b c ON a.g = c.g AND a.item <> c.item
            GROUP BY a.item, c.item
            """
        ).collect()
    )
    assert got == want
    assert got == [(10, 11, 1), (11, 10, 1)]  # NULL basket minted nothing
