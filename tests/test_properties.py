"""Property-based tests (hypothesis) for the iterative/layout operators
— the two places where a hand-picked example could miss a topology.

Settings note: each Spark round-trip is ~seconds, so examples are kept
small and few; the value is random TOPOLOGY (graph shapes, size mixes),
not volume.
"""

from __future__ import annotations

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Round-13 suite-runtime fix (VERDICT r12 item 1): each example is
# several Spark round-trips, and the driver's pytest budget is the
# binding constraint. SPARK_GRAFT_HYP_SCALE scales every suite's
# example count (default 0.5 = half, floor 2 — random TOPOLOGY is the
# value here, not volume); set it to 1 for the thorough profile.
_HYP_SCALE = float(os.environ.get("SPARK_GRAFT_HYP_SCALE", "0.5"))


def _scaled(n: int) -> int:
    return max(2, math.ceil(n * _HYP_SCALE))


def _cc_reference(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label by min reachable id (roots are
    # mins because we always attach the larger root under the smaller)
    return {i: find(i) for i in range(n_nodes)}


@settings(max_examples=_scaled(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=14).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ).filter(lambda e: e[0] != e[1]),
                max_size=20,
            ),
        )
    )
)
def test_dedup_clusters_matches_union_find(spark, case):
    """Random graphs (chains, cycles, stars, forests): the iterative
    min-label propagation must agree with exact union-find, including
    convergence on paths longer than one hop."""
    from file_indexer_spark.operators import dedup as dd

    n, edges = case
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in dd.dedup_clusters(docs, pairs).collect()
    }
    assert got == _cc_reference(n, edges)


def test_dedup_clusters_chain_converges_logarithmically(spark):
    """Adversarial worst case for label propagation: a 64-node chain
    (diameter 63). Large-star/small-star must (a) still produce the
    single correct component and (b) converge in O(log n) star rounds —
    min-label propagation would need 63 rounds here."""
    from file_indexer_spark.operators import dedup as dd

    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels, rounds = dd._connected_components(pairs, max_iter=25)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 14, f"expected O(log n) rounds on a chain, got {rounds}"


def test_sessionize_skew_safe_matches_plain_on_giant_user(spark):
    """One bot user holds ~90% of events, spread over several days with
    sessions that straddle midnight (the fragment-merge edge case).
    The skew-safe two-pass path must reproduce the plain single-window
    output exactly."""
    from datetime import datetime, timedelta

    from file_indexer_spark.operators import events as ev

    rows = []
    eid = 0
    t = datetime(2024, 3, 1, 23, 0, 0)
    # giant user 0: 900 events in bursts that repeatedly cross midnight;
    # alternating 5-min (same session) and 90-min (new session) gaps.
    for i in range(900):
        t += timedelta(minutes=5 if i % 7 else 90)
        rows.append((eid, t, 0, ["view", "click", "purchase"][i % 3], float(i % 10) / 4))
        eid += 1
    # 10 normal users with a handful of events each
    for u in range(1, 11):
        base = datetime(2024, 3, 2, 8, u)
        for i in range(10):
            rows.append((eid, base + timedelta(minutes=31 * i), u, "view", 1.5))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    plain = [r.asDict() for r in ev.sessionize(events).collect()]
    skew = [r.asDict() for r in ev.sessionize_skew_safe(events).collect()]
    assert len(plain) == len(skew)
    for p, s in zip(plain, skew):
        assert p == s, (p, s)

    # e1c: same sessions and stats, ordinal-free contract — must equal
    # plain output minus session_seq on the identical skewed corpus
    # (midnight-straddlers exercise the edge-fragment merge leg;
    # interior fragments take the no-second-pass leg).
    stats = [
        r.asDict()
        for r in ev.session_stats_skew_safe(events)
        .orderBy("user_id", "session_start")
        .collect()
    ]
    plain_no_seq = [
        {k: v for k, v in p.items() if k != "session_seq"} for p in plain
    ]
    assert len(stats) == len(plain_no_seq)
    for p, s in zip(plain_no_seq, stats):
        assert p == s, (p, s)


@settings(max_examples=_scaled(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=30))
def test_sequence_pack_matches_serial_packer(spark, sizes):
    """Random token-size mixes: every packer stream's layout must equal
    a serial concat-and-chunk walk of that stream."""
    import hashlib

    from file_indexer_spark.operators import sampling as sp

    budget = 17
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in sp.sequence_pack(docs, budget=budget).collect()}

    streams: dict[str, list[int]] = {}
    for i in sorted(range(len(sizes))):
        packer = hashlib.md5(str(i).encode()).hexdigest()[0]
        streams.setdefault(packer, []).append(i)
    for packer, ids in streams.items():
        cum = 0
        for i in ids:
            r = rows[i]
            assert r["packer"] == packer
            assert r["n_tokens"] == sizes[i]
            assert r["seq_first"] == cum // budget
            assert r["seq_offset"] == cum % budget
            cum += sizes[i]
            assert r["seq_last"] == (cum - 1) // budget


def _asof_reference(rows):
    """Per-user brute force: for each probe, max match ts <= probe ts."""
    out = {}
    for eid, uid, ts, etype in rows:
        if etype != "purchase":
            continue
        cands = [t for _, u, t, e in rows if u == uid and e == "view" and t <= ts]
        out[eid] = max(cands) if cands else None
    return out


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 50),  # seconds offset (collisions on purpose)
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_join_matches_bruteforce(spark, raw):
    """Random event tapes incl. ts collisions between views and
    purchases: the union-and-window as-of must equal per-probe brute
    force with at-or-before semantics."""
    import datetime as dt

    from file_indexer_spark.operators import events as ev

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, uid, base + dt.timedelta(seconds=sec), etype)
        for i, (uid, sec, etype) in enumerate(raw)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["event_id"]: r["last_match_ts"]
        for r in ev.asof_last_match(events).collect()
    }
    assert got == _asof_reference(rows)


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 7200),
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_preceding_window_counts_match_bruteforce(spark, raw):
    """The RANGE-window interval join must count exactly the matches in
    [probe - 1h, probe), strictly excluding the probe instant."""
    import datetime as dt

    from file_indexer_spark.operators import events as ev

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, uid, base + dt.timedelta(seconds=sec), etype)
        for i, (uid, sec, etype) in enumerate(raw)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["event_id"]: r["n_matches"]
        for r in ev.preceding_window_counts(events).collect()
    }
    expected = {
        eid: sum(
            1
            for _, u, t, e in rows
            if u == uid and e == "view" and ts - dt.timedelta(hours=1) <= t < ts
        )
        for eid, uid, ts, etype in rows
        if etype == "purchase"
    }
    assert got == expected


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=3, max_value=14).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ).filter(lambda e: e[0] != e[1]),
                max_size=20,
            ),
            st.integers(min_value=2, max_value=4),  # every k-th node is "new"
        )
    )
)
def test_incremental_refresh_matches_union_find(spark, case):
    """dd13 on random topologies: split nodes into base/new by a random
    modulus, build the base assignment from base-base edges only, feed
    the >=1-new-side edges through the refresh — the result must equal
    exact union-find on the FULL graph for every node (the chain /
    cycle / multi-bridge merge shapes a hand-picked example misses)."""
    from file_indexer_spark.operators import dedup as dd

    n, edges, k = case
    is_new = lambda v: v % k == 0  # noqa: E731
    base_nodes = [i for i in range(n) if not is_new(i)]
    new_nodes = [i for i in range(n) if is_new(i)]
    norm = {(min(a, b), max(a, b)) for a, b in edges}
    base_edges = [e for e in norm if not (is_new(e[0]) or is_new(e[1]))]
    new_edges = [e for e in norm if is_new(e[0]) or is_new(e[1])]

    base_docs = spark.createDataFrame([(i,) for i in base_nodes], "doc_id long")
    base_pairs = spark.createDataFrame(
        base_edges or [], "doc_a long, doc_b long"
    )
    old_assign = dd.dedup_clusters(base_docs, base_pairs)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.incremental_cluster_refresh(
            old_assign,
            spark.createDataFrame(new_edges or [], "doc_a long, doc_b long"),
            spark.createDataFrame([(i,) for i in new_nodes], "doc_id long"),
        ).collect()
    }
    assert got == _cc_reference(n, list(norm))


@settings(max_examples=_scaled(5), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=4).flatmap(
        lambda nb: st.tuples(
            st.just(nb),
            # cut points partitioning 24 vectors into nb ordered batches
            st.lists(
                st.integers(1, 23), min_size=nb - 1, max_size=nb - 1, unique=True
            ),
            # after each fold: 0 = nothing, 1 = replay a random earlier
            # version, 2 = compact
            st.lists(st.integers(0, 2), min_size=nb, max_size=nb),
            st.randoms(use_true_random=False),
        )
    )
)
def test_ann_ingest_random_replay_compact_equals_rebuild(spark, tmp_path_factory, case):
    """sim13's maintenance protocol under random schedules: fold batches
    in order with replays and compactions interleaved anywhere — the
    final served codes must equal one bootstrap build plus a single
    frozen-quantizer append of everything later, regardless of the
    maintenance schedule."""
    from pyspark.sql import functions as F

    from file_indexer_spark.operators import similarity as sim
    from file_indexer_spark.streaming import ann as sann

    nb, cuts, ops, rng = case
    bounds = [0, *sorted(cuts), 24]
    spark_ = spark
    # deterministic 64-dim vectors with 4 labels (hypothesis drives the
    # TOPOLOGY — batch boundaries and maintenance schedule — not floats)
    rows = [
        (i, [float(((i * 7 + d * 3) % 13) - 6) for d in range(64)], i % 4)
        for i in range(24)
    ]
    emb = spark_.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    state = str(tmp_path_factory.mktemp("ann_state"))
    slices = [
        emb.filter(
            (F.col("vec_id") >= bounds[k]) & (F.col("vec_id") < bounds[k + 1])
        )
        for k in range(nb)
    ]
    for k in range(nb):
        sann.ingest_batch(spark_, slices[k], state, k)
        op = ops[k]
        if op == 1:
            j = rng.randrange(k + 1)
            sann.ingest_batch(spark_, slices[j], state, j)  # replay
        elif op == 2:
            sann.compact_state(spark_, state)

    got = {
        r["vec_id"]: (tuple(r["codes"]), r["centroid_id"])
        for r in sann.load_index(spark_, state)["codes"].collect()
    }
    boot = sim.ivfpq_index_tables(slices[0])
    later = slices[1]
    for s in slices[2:]:
        later = later.unionByName(s)
    want_index = sim.ivfpq_append(boot, later) if nb > 1 else boot
    want = {
        r["vec_id"]: (tuple(r["codes"]), r["centroid_id"])
        for r in want_index["codes"].collect()
    }
    assert got == want and len(got) == 24


@settings(max_examples=_scaled(4), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # per commit: for each of 8 PKs an action — 0 keep, 1 upsert with a
    # new value, 2 upsert unchanged (no-op), 3 delete (if present),
    # 4 insert (if absent; otherwise treated as upsert-new-value)
    st.lists(
        st.lists(st.integers(0, 4), min_size=8, max_size=8),
        min_size=2,
        max_size=3,
    )
)
def test_change_feed_matches_bruteforce_diff(spark, tmp_path_factory, actions):
    """w14 under random mutation histories: for consecutive generation
    pairs AND the full (first, last) window, changes(i, j) must equal
    the brute-force dict diff of the two snapshots — inserts/deletes
    classified by key presence, update image pairs exactly for value
    changes, silence for no-ops."""
    import pyspark.sql.functions as F

    from file_indexer_spark.indexer.files_table import FilesTable

    tmp = tmp_path_factory.mktemp("cdf_prop")
    t = FilesTable(spark, str(tmp / "db"), buckets=4, keep_history=True)

    def mk(rows):
        return spark.createDataFrame(
            [
                (p, f, c, "2024-01-01 00:00:00", s, "2024-06-01 00:00:00")
                for p, f, c, s in rows
            ],
            "path string, filename string, checksum string, mtime string,"
            " file_size long, ia string",
        ).select(
            "path", "filename", "checksum",
            F.col("mtime").cast("timestamp").alias("modification_datetime"),
            "file_size",
            F.col("ia").cast("timestamp").alias("indexed_at"),
        )

    pks = [(f"/p{i % 3}", f"f{i}") for i in range(8)]
    # snapshot model: pk -> (checksum, size)
    state = {pks[i]: (f"c{i}", 10 + i) for i in range(5)}  # 5 initial rows
    t.overwrite(mk([(p, f, c, s) for (p, f), (c, s) in state.items()]))
    snapshots = {1: dict(state)}
    gen = 1
    ver = 0
    for commit in actions:
        ver += 1
        ups, dels = [], []
        for i, act in enumerate(commit):
            pk = pks[i]
            if act == 0 or (act == 3 and pk not in state):
                continue
            if act == 3:
                dels.append(pk)
            elif act == 2 and pk in state:
                c, s = state[pk]
                ups.append((pk, c, s))  # byte-identical rewrite
            else:  # new value / insert
                ups.append((pk, f"v{ver}", 100 * ver + i))
        # the model state must mutate in COMMIT order: the upsert
        # commit's snapshot must still contain rows the later delete
        # commit removes
        if ups:
            for pk, c, s in ups:
                state[pk] = (c, s)
            t.upsert(mk([(*pk, c, s) for pk, c, s in ups]))
            gen += 1
            snapshots[gen] = dict(state)
        if dels:
            for pk in dels:
                state.pop(pk)
            t.delete(
                spark.createDataFrame(list(dels), "path string, filename string")
            )
            gen += 1
            snapshots[gen] = dict(state)
    gens = sorted(snapshots)
    pairs = {(gens[k], gens[k + 1]) for k in range(len(gens) - 1)}
    if gens[0] < gens[-1]:
        pairs.add((gens[0], gens[-1]))
    for i, j in sorted(pairs):
        a, b = snapshots[i], snapshots[j]
        expect = set()
        for pk in set(a) | set(b):
            if pk not in a:
                expect.add(("insert", *pk, *b[pk]))
            elif pk not in b:
                expect.add(("delete", *pk, *a[pk]))
            elif a[pk] != b[pk]:
                expect.add(("update_preimage", *pk, *a[pk]))
                expect.add(("update_postimage", *pk, *b[pk]))
        got = {
            (r["change_type"], r["path"], r["filename"], r["checksum"], r["file_size"])
            for r in t.changes(i, j).collect()
        }
        assert got == expect, (i, j)


def _pagerank_reference(n_nodes: int, edges: list[tuple[int, int]]):
    """Independent pure-Python rendition of dd18's fixed-point
    recurrence (adjacency dicts + integer division, no DataFrames)."""
    from file_indexer_spark.operators import graph as gr

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ranks = {v: gr.R0_E6 for v in adj}
    for _ in range(gr.ITERATIONS):
        ranks = {
            v: gr.BASE_E6
            + (gr.DAMPING_E2 * sum(ranks[u] // len(adj[u]) for u in adj[v])) // 100
            for v in adj
        }
    return {
        i: (len(adj.get(i, ())), ranks.get(i, gr.BASE_E6))
        for i in range(n_nodes)
    }


@settings(max_examples=_scaled(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ).filter(lambda e: e[0] != e[1]),
                max_size=18,
            ),
        )
    )
)
def test_pagerank_matches_adjacency_reference(spark, case):
    """Random graphs (stars, cycles, forests, multi-edges): the
    DataFrame vertex program must agree with an independent
    adjacency-dict rendition of the same integer recurrence — degs,
    dedup of parallel edges, isolated-node base rank and all."""
    from file_indexer_spark.operators import graph as gr

    n, edges = case
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["deg"], r["rank_e6"])
        for r in gr.pagerank(docs, pairs).collect()
    }
    assert got == _pagerank_reference(n, edges)


def _ppr_reference(n_nodes: int, edges: list[tuple[int, int, float]]):
    """Independent pure-Python rendition of dd20's weighted
    personalized recurrence (adjacency dicts + integer division)."""
    from file_indexer_spark.operators import graph as gr

    w_of = {}
    for s, d, cos in edges:
        w = round(cos * 1_000_000)
        if w > 0:
            w_of[(s, d)] = w
    out = {}
    for (s, d), w in w_of.items():
        out.setdefault(s, {})[d] = w
    w_tot = {s: sum(ds.values()) for s, ds in out.items()}
    nodes = {v for e in w_of for v in e} | set(
        range(min(n_nodes, gr.PPR_SEED_MAX))
    )
    ranks = {v: gr.R0_E6 if v < gr.PPR_SEED_MAX else 0 for v in nodes}
    for _ in range(gr.ITERATIONS):
        ranks = {
            v: (gr.BASE_E6 if v < gr.PPR_SEED_MAX else 0)
            + (
                gr.DAMPING_E2
                * sum(
                    (ranks[u] * w) // w_tot[u]
                    for u, ds in out.items()
                    for d, w in ds.items()
                    if d == v
                )
            )
            // 100
            for v in nodes
        }
    return {i: ranks.get(i, 0) for i in range(n_nodes)}


@settings(max_examples=_scaled(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=14).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(-3, 10),  # cosine = w/10: negatives exercise the filter
                ).filter(lambda e: e[0] != e[1]),
                max_size=18,
                unique_by=lambda e: (e[0], e[1]),
            ),
        )
    )
)
def test_personalized_pagerank_matches_reference(spark, case):
    """dd20 on random directed weighted graphs (negative/zero weights,
    dangling seeds, unreached vertices): the DataFrame vertex program
    must agree with an independent adjacency-dict rendition of the
    weighted personalized integer recurrence."""
    from file_indexer_spark.operators import graph as gr

    n, raw = case
    edges = [(s, d, w / 10.0) for s, d, w in raw]
    knn = spark.createDataFrame(
        [(s, d, 1, c) for s, d, c in edges] or [],
        "vec_id long, neighbor_id long, rank int, cosine double",
    )
    corpus = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    got = {
        r["vec_id"]: r["rank_e6"]
        for r in gr.personalized_pagerank(knn, corpus).collect()
    }
    assert got == _ppr_reference(n, edges)


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(-3, 10),
                ).filter(lambda e: e[0] != e[1]),
                max_size=14,
                unique_by=lambda e: (e[0], e[1]),
            ),
            st.integers(0, 12),  # old seed bound (may exceed n: fine)
            st.integers(0, 12),  # new seed bound
        )
    )
)
def test_ppr_refresh_equals_scratch(spark, case):
    """dd21 on random directed weighted graphs and ARBITRARY seed-set
    edits (grow, shrink, disjoint-range, no-op): refreshing a stored
    old-seed walk via affected-components must equal the from-scratch
    walk with the new seeds, row for row."""
    from file_indexer_spark.operators import graph as gr

    n, raw, old_max, new_max = case
    knn = spark.createDataFrame(
        [(s, d, 1, w / 10.0) for s, d, w in raw] or [],
        "vec_id long, neighbor_id long, rank int, cosine double",
    )
    corpus = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    stored = gr.personalized_pagerank(knn, corpus, seed_max=old_max)
    refreshed = {
        r["vec_id"]: r["rank_e6"]
        for r in gr.personalized_pagerank_refresh(
            knn, corpus, stored, old_seed_max=old_max, seed_max=new_max
        ).collect()
    }
    scratch = {
        r["vec_id"]: r["rank_e6"]
        for r in gr.personalized_pagerank(knn, corpus, seed_max=new_max).collect()
    }
    assert refreshed == scratch


def _lp_reference(n_nodes: int, edges: list[tuple[int, int, float]], rounds: int):
    """Independent pure-Python rendition of dd22's synchronous
    weighted-majority recurrence (adjacency dicts, min-label ties)."""
    w_of = {}
    for s, d, cos in edges:
        w = round(cos * 1_000_000)
        if w > 0:
            w_of[(s, d)] = w
    nodes = {v for e in w_of for v in e}
    lbl = {v: v for v in nodes}
    for _ in range(rounds):
        votes = {}
        for (s, d), w in w_of.items():
            votes.setdefault(d, {}).setdefault(lbl[s], 0)
            votes[d][lbl[s]] += w
        lbl = {
            v: (
                min(
                    (label for label, ws in votes[v].items()
                     if ws == max(votes[v].values()))
                )
                if v in votes
                else lbl[v]
            )
            for v in nodes
        }
    return {i: lbl.get(i, i) for i in range(n_nodes)}


@settings(max_examples=_scaled(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=14).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(-3, 10),
                ).filter(lambda e: e[0] != e[1]),
                max_size=18,
                unique_by=lambda e: (e[0], e[1]),
            ),
        )
    )
)
def test_label_propagation_matches_reference(spark, case):
    """dd22 on random directed weighted graphs (negative/zero weights,
    no-inflow vertices, isolated corpus ids): the DataFrame rounds must
    agree with an independent adjacency-dict rendition of the
    synchronous weighted-majority min-tie recurrence."""
    from file_indexer_spark.operators import graph as gr

    n, raw = case
    edges = [(s, d, w / 10.0) for s, d, w in raw]
    knn = spark.createDataFrame(
        [(s, d, 1, c) for s, d, c in edges] or [],
        "vec_id long, neighbor_id long, rank int, cosine double",
    )
    corpus = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    got = {
        r["vec_id"]: r["community"]
        for r in gr.label_propagation(knn, corpus).collect()
    }
    assert got == _lp_reference(n, edges, gr.LP_ITERATIONS)


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=5, max_size=60),
    st.integers(min_value=2, max_value=6),
)
def test_heavy_hitters_matches_bruteforce(spark, users, t):
    """e20 on random streams at minimal legal capacity (== t): the
    sketch-then-verify result equals the brute-force global groupBy
    for every threshold — the MG superset guarantee, exercised."""
    from collections import Counter

    from file_indexer_spark.operators import events as evo

    ev = spark.createDataFrame(
        [(i, u) for i, u in enumerate(users)], "event_id long, user_id long"
    ).coalesce(2)
    got = [
        (r["user_id"], r["n_events"])
        for r in evo.heavy_hitters(ev, t=t, capacity=t).collect()
    ]
    thr = len(users) // t
    want = sorted(
        ((u, c) for u, c in Counter(users).items() if c > thr),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want


@settings(max_examples=_scaled(5), deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 359), min_size=6, max_size=12, unique=True))
def test_mmr_matches_bruteforce_greedy(spark, angles):
    """sim16 on random 2-D unit vectors: the Arrow-batch greedy equals
    an independent pure-python MMR with the same tie-breaks."""
    import math

    from file_indexer_spark.operators import similarity as sim

    lam, n_sel = 0.5, 3
    vecs = {0: 0.0}
    for j, a in enumerate(angles):
        vecs[100 + j] = math.radians(a)
    rows = [
        (vid, [math.cos(th), math.sin(th)] + [0.0] * 62, 0)
        for vid, th in vecs.items()
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = [
        r["neighbor_id"]
        for r in sim.mmr_rerank(emb, lam=lam, n_select=n_sel).collect()
        if r["query_id"] == 0
    ]

    # independent reference on float32-rounded cosines (the engine
    # computes on float arrays cast to double — replicate by casting
    # through float32 per component)
    import numpy as np

    fv = {vid: np.array([math.cos(th), math.sin(th)], dtype=np.float32).astype(float)
          for vid, th in vecs.items()}

    def cos(a, b):
        va, vb = fv[a], fv[b]
        return float(
            (va[0] * vb[0] + va[1] * vb[1])
            / (math.sqrt(va[0] ** 2 + va[1] ** 2) * math.sqrt(vb[0] ** 2 + vb[1] ** 2))
        )

    cands = sorted(v for v in vecs if v != 0)
    cands = sorted(cands, key=lambda c: (-cos(0, c), c))[: sim.MMR_CANDIDATES]
    sel = []
    for _ in range(min(n_sel, len(cands))):
        best, best_m = None, None
        for c in cands:
            if c in sel:
                continue
            ms = max((cos(c, s) for s in sel), default=0.0)
            m = lam * cos(0, c) - (1.0 - lam) * ms
            if best is None or m > best_m or (m == best_m and c < best):
                best, best_m = c, m
        sel.append(best)
    assert got == sel


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.integers(1, n),  # base corpus size (union adds the rest)
            st.lists(  # base edges (over base ids only)
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(-3, 10),
                ).filter(lambda e: e[0] != e[1]),
                max_size=14,
                unique_by=lambda e: (e[0], e[1]),
            ),
            st.lists(  # union edges (arbitrary add/remove/reweight)
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(-3, 10),
                ).filter(lambda e: e[0] != e[1]),
                max_size=14,
                unique_by=lambda e: (e[0], e[1]),
            ),
        )
    )
)
def test_lp_refresh_equals_scratch(spark, case):
    """dd23 on random directed weighted graph pairs: refreshing a
    stored base-graph propagation via affected components must equal
    the from-scratch propagation on the union graph, row for row —
    for ARBITRARY edge edits (adds, removals, reweights, new
    vertices, vertices going isolated)."""
    from file_indexer_spark.operators import graph as gr

    n, n_base, raw_base, raw_union = case
    base_raw = [(s, d, w) for s, d, w in raw_base if s < n_base and d < n_base]
    knn_schema = "vec_id long, neighbor_id long, rank int, cosine double"
    knn_base = spark.createDataFrame(
        [(s, d, 1, w / 10.0) for s, d, w in base_raw] or [], knn_schema
    )
    knn_union = spark.createDataFrame(
        [(s, d, 1, w / 10.0) for s, d, w in raw_union] or [], knn_schema
    )
    corpus_base = spark.createDataFrame(
        [(i,) for i in range(n_base)], "vec_id long"
    )
    corpus = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    stored_labels = gr.label_propagation(knn_base, corpus_base)
    refreshed = {
        r["vec_id"]: r["community"]
        for r in gr.label_propagation_refresh(
            knn_union, corpus, gr.lp_edges(knn_base), stored_labels
        ).collect()
    }
    scratch = {
        r["vec_id"]: r["community"]
        for r in gr.label_propagation(knn_union, corpus).collect()
    }
    assert refreshed == scratch


@settings(max_examples=_scaled(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.tuples(
        # per later batch: an action per vec_id — 0 none, 1 upsert
        # (batch-salted re-embed), 2 delete
        st.lists(
            st.lists(st.integers(0, 2), min_size=24, max_size=24),
            min_size=1,
            max_size=2,
        ),
        # maintenance op after each later batch: 0 none, 1 replay, 2 compact
        st.lists(st.integers(0, 2), min_size=2, max_size=2),
        st.randoms(use_true_random=False),
    )
)
def test_cdc_random_ops_equal_batch_upserts(spark, tmp_path_factory, case):
    """st19 under random CDC schedules: arbitrary per-id upsert/delete
    mixes across batches, with replays and compactions interleaved —
    the mask-folded state must equal composing sim17's batch-path
    ivfpq_upsert calls in the same order (last write wins, deletes of
    absent ids harmless, re-upserts override)."""
    from pyspark.sql import functions as F

    from file_indexer_spark.operators import similarity as sim
    from file_indexer_spark.streaming import ann as sann

    batches, maint, rng = case

    def vec(i: int, salt: int) -> list[float]:
        return [float(((i * 7 + d * 3 + salt * 5) % 13) - 6) for d in range(64)]

    rows = [(i, vec(i, 0), i % 4) for i in range(24)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    state = str(tmp_path_factory.mktemp("cdc_state"))
    up = F.lit("upsert").alias("op")
    base_feed = emb.select("vec_id", up, "embedding", "label")
    sann.ingest_cdc_batch(spark, base_feed, state, 0)

    ref = sim.ivfpq_index_tables(emb)
    for k, actions in enumerate(batches, start=1):
        ups_rows = [
            (i, "upsert", vec(i, k), None)
            for i, a in enumerate(actions)
            if a == 1
        ]
        del_rows = [
            (i, "delete", None, None) for i, a in enumerate(actions) if a == 2
        ]
        if not ups_rows and not del_rows:
            ups_rows = [(0, "upsert", vec(0, k), None)]  # keep versions dense
        feed = spark.createDataFrame(
            ups_rows + del_rows,
            "vec_id long, op string, embedding array<float>, label int",
        )
        sann.ingest_cdc_batch(spark, feed, state, k)
        m = maint[k - 1] if k - 1 < len(maint) else 0
        if m == 1:
            j = rng.randrange(1, k + 1)
            # replays re-present the CURRENT batch's feed under an old
            # version id — the monotone guard must drop it
            sann.ingest_cdc_batch(spark, feed, state, j - 1)
        elif m == 2:
            sann.compact_cdc_state(spark, state)
        ups_df = spark.createDataFrame(
            [(i, e) for i, _, e, _ in ups_rows],
            "vec_id long, embedding array<float>",
        )
        dels_df = spark.createDataFrame(
            [(i,) for i, *_ in del_rows] or [], "vec_id long"
        )
        ref = sim.ivfpq_upsert(ref, ups_df, dels_df if del_rows else None)

    got = {
        r["vec_id"]: (tuple(r["codes"]), r["centroid_id"])
        for r in sann.load_cdc_index(spark, state)["codes"].collect()
    }
    want = {
        r["vec_id"]: (tuple(r["codes"]), r["centroid_id"])
        for r in sim.ivfpq_effective_codes(ref).collect()
    }
    assert got == want


@settings(max_examples=_scaled(10), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # dense leg: per query (up to 3), a permutation-ranked candidate
    # list over doc ids 0..11; lexical leg: one ranked list
    st.tuples(
        st.lists(
            st.lists(st.integers(0, 11), min_size=0, max_size=6, unique=True),
            min_size=1,
            max_size=3,
        ),
        st.lists(st.integers(0, 11), min_size=0, max_size=6, unique=True),
    )
)
def test_rrf_fuse_matches_reference(spark, case):
    """sim19 against a pure-Python RRF reference over random rank
    lists: fused scores, per-query ordering, doc_id tie-breaks, and
    the missing-leg-contributes-zero rule."""
    from file_indexer_spark.operators import similarity as sim

    dense_lists, lex_list = case
    dense_rows = [
        (q, d, r + 1)
        for q, lst in enumerate(dense_lists)
        for r, d in enumerate(lst)
    ]
    if not dense_rows:
        return  # rrf needs at least one dense query row
    lex_rows = [(d, r + 1) for r, d in enumerate(lex_list)]
    dense = spark.createDataFrame(
        dense_rows, "query_id long, neighbor_id long, rank int"
    )
    lex = spark.createDataFrame(
        lex_rows or [], "doc_id long, rank int"
    )
    got = [
        (r["query_id"], r["doc_id"], r["rank"], r["rrf_score"])
        for r in sim.rrf_fuse(dense, lex, k=60, topk=5).collect()
    ]
    # pure-Python reference
    want = []
    qids = sorted({q for q, *_ in dense_rows})
    dmap = {(q, d): r for q, d, r in dense_rows}
    lmap = dict(lex_rows)
    for q in qids:
        cands = {d for (qq, d) in dmap if qq == q} | set(lmap)
        scored = sorted(
            (
                -(
                    (1.0 / (60 + dmap[(q, d)]) if (q, d) in dmap else 0.0)
                    + (1.0 / (60 + lmap[d]) if d in lmap else 0.0)
                ),
                d,
            )
            for d in cands
        )
        for rank, (neg, d) in enumerate(scored[:5], start=1):
            want.append((q, d, rank, round(-neg, 6)))
    assert got == want
