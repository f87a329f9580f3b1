"""Transitive closure: iterative large-star / small-star connected
components over the match-edge set, as pure DataFrame operations.

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC 2014) — alternate

* large-star: for every node u, connect every strictly-larger neighbor to
  the minimum of N(u) u {u};
* small-star: for every node u over its smaller-or-equal neighborhood,
  connect all of them (and u) to the minimum;

until the edge set is a fixed point.  Converges in O(log n) rounds and, at
the fixed point, every node points directly at its component's minimum
node — deterministic cluster ids (= min rec_id) for free.

Driver involvement is the convergence loop only; each round is shuffled
group-by work.  ``localCheckpoint`` truncates lineage per round so plans
don't grow with iterations (SURVEY §4).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidirectional(edges: DataFrame) -> DataFrame:
    # Callers pass canonically-oriented (src > dst) duplicate-free edges,
    # so the union with the reversal is still duplicate-free — no distinct
    # (a full extra shuffle per CC round) needed.
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).where(F.col("src") != F.col("dst"))


def _large_star(edges_bi: DataFrame) -> DataFrame:
    # m(u) = min(N(u) u {u}); emit (v, m) for neighbors v > u.
    mins = edges_bi.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    # No distinct here: the only consumer is _small_star, whose min
    # aggregation is duplicate-idempotent and whose own final distinct
    # restores the canonical set — dropping it removes one full-width
    # shuffle per CC round at the cost of modest duplicate inflation
    # (distinct centers can emit the same (dst, m) pair).
    return (
        edges_bi.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # Orient each edge large->small, group by the large end: connect the
    # whole small neighborhood and u itself to the minimum.
    # Input (large-star output) may contain duplicates (its distinct was
    # elided — see _large_star); min aggregation is duplicate-idempotent
    # and the final distinct below restores the canonical set.
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    to_min = oriented.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_to_min = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_min.unionByName(self_to_min)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges (src, dst string ids) -> (rec_id, cluster_id).

    cluster_id is the component's minimum id.  Nodes appearing only as a
    component minimum are included; isolated vertices are the caller's
    concern (see ``assign_clusters``).
    """
    # canonical store: undirected edges oriented large->small, deduped
    current = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _fingerprint(df: DataFrame):
        # Canonical deduped edge set -> order-invariant (count, hash-xor)
        # fingerprint in ONE lightweight aggregation job — replaces a
        # 2x exceptAll symmetric-difference check that cost two extra
        # wide shuffles per round.  bit_xor is overflow-free under ANSI
        # mode and order-invariant; xor-cancellation needs duplicate
        # edges, which the distinct'ed canonical set excludes.  64-bit
        # collisions between consecutive CC iterates are not a realistic
        # failure mode, and max_iterations still bounds the loop.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_fp = _fingerprint(current)
    for _ in range(max_iterations):
        after_large = _large_star(_bidirectional(current))
        after_small = _small_star(after_large).localCheckpoint(eager=True)
        fp = _fingerprint(after_small)
        current = after_small
        if fp == prev_fp:
            break
        prev_fp = fp
    labels = current.select(
        F.col("src").alias("rec_id"), F.col("dst").alias("cluster_id")
    )
    roots = current.select(F.col("dst").alias("rec_id")).distinct().withColumn(
        "cluster_id", F.col("rec_id")
    )
    return labels.unionByName(roots).groupBy("rec_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def _forest_reduce(edges: DataFrame) -> DataFrame:
    """Map-side partial closure: union-find WITHIN each Arrow batch
    replaces the batch's edges by a spanning forest — at most one
    (node -> batch-component-min) edge per distinct node — before any
    shuffle.  Connectivity is exactly preserved (a spanning forest of an
    edge subset connects precisely what the subset connects, and the
    union over batches restores every cross-batch link through shared
    nodes), so downstream labels are identical and independent of batch
    boundaries.

    Why it exists (measured, scripts/stress_bench.py): same-entity match
    edges form CLIQUES — an entity mentioned k times contributes ~k²/2
    above-threshold edges, all carrying one block_key.  A "HQ address"
    with 5k mentions puts 12.5M edges into ONE ``close_block`` group:
    quadratic Arrow transfer + single-task Python union-find that no
    join-side salting can spread, because the serialization is in the
    closure groupBy, not the pair join.  The forest reduction is narrow
    (mapInPandas over whatever partitioning the scored edges already
    have — for salted hot blocks, the n_salt-way join spread), so the
    quadratic work parallelizes and the final group receives
    <= (#nodes x #batches) edges instead of ~k²/2.  Normal blocks
    benefit too: a size-s entity clique (~s²/2 edges) ships s-1 edges.
    """
    import pandas as pd

    def reduce_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids: dict = {}
            parent: list = []
            names: list = []
            blocks: list = []

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            src = pdf["src"].to_numpy(dtype=object)
            dst = pdf["dst"].to_numpy(dtype=object)
            blk = pdf["block_key"].to_numpy(dtype=object)
            # rec_ids are globally unique and no edge crosses blocks, so
            # one union-find over the mixed-block batch can never merge
            # two blocks' components.
            for a, b, k in zip(src, dst, blk):
                for v in (a, b):
                    if v not in ids:
                        ids[v] = len(names)
                        names.append(v)
                        blocks.append(k)
                        parent.append(len(parent))
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[rb] = ra
            root_min: dict = {}
            for i, name in enumerate(names):
                r = find(i)
                cur = root_min.get(r)
                if cur is None or name < cur:
                    root_min[r] = name
            out = {"src": [], "dst": [], "block_key": []}
            for i, name in enumerate(names):
                m = root_min[find(i)]
                if m != name:  # the min itself rides as every dst
                    out["src"].append(name)
                    out["dst"].append(m)
                    out["block_key"].append(blocks[i])
            yield pd.DataFrame(out)

    return edges.mapInPandas(
        reduce_batches, schema="src string, dst string, block_key string"
    )


def connected_components_blocked(edges: DataFrame) -> DataFrame:
    """Transitive closure for BLOCK-LOCAL edge sets, in one shuffle.

    The linkage pipeline's candidate edges carry the ``block_key`` they
    were generated under, and a mention belongs to exactly one block — so
    components can NEVER span blocks.  That graph property turns global
    iterative CC into an embarrassingly-parallel per-block closure: one
    ``groupBy(block_key).applyInPandas`` running union-find with
    path-halving over each block's (small, size-capped by the pairing
    guardrails) edge list.  Versus the ~6-round large/small-star loop this
    removes ~35 scheduler stages and every driver round-trip — the
    dominant fixed cost at high parallelism — while producing the
    identical labeling (asserted against :func:`connected_components` in
    tests/test_cluster.py).

    A narrow map-side spanning-forest reduction (:func:`_forest_reduce`)
    runs first, so a dense same-entity edge clique is parallel-collapsed
    to ~one edge per node before the single closure shuffle — without it,
    one heavily-mentioned entity serializes the whole job in this
    operator's groupBy (measured: scripts/stress_bench.py).

    Input: (src, dst, block_key).  Output: (rec_id, cluster_id=min id of
    the component).  Use :func:`connected_components` for general edge
    sets without the block-disjointness guarantee.
    """
    import pandas as pd

    def close_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids: dict = {}
        parent: list = []

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        srcs = pdf["src"].to_numpy(dtype=object)
        dsts = pdf["dst"].to_numpy(dtype=object)
        names: list = []
        for arr in (srcs, dsts):
            for v in arr:
                if v not in ids:
                    ids[v] = len(names)
                    names.append(v)
                    parent.append(len(parent))
        for a, b in zip(srcs, dsts):
            ra, rb = find(ids[a]), find(ids[b])
            if ra != rb:
                parent[rb] = ra
        # min name per root = deterministic cluster id
        root_min: dict = {}
        for i, name in enumerate(names):
            r = find(i)
            cur = root_min.get(r)
            if cur is None or name < cur:
                root_min[r] = name
        return pd.DataFrame(
            {
                "rec_id": names,
                "cluster_id": [root_min[find(i)] for i in range(len(names))],
            }
        )

    return _forest_reduce(edges).groupBy("block_key").applyInPandas(
        close_block, schema="rec_id string, cluster_id string"
    )


def assign_clusters_blocked(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """All vertices -> (rec_id, cluster_id) via the per-block closure;
    singletons (no edge) keep their own id."""
    labels = connected_components_blocked(edges)
    return (
        vertices.select("rec_id")
        .join(labels, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce("cluster_id", "rec_id").alias("cluster_id"),
        )
    )


def assign_clusters(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """All vertices (rec_id) -> (rec_id, cluster_id); singletons get their
    own id.  Left join against the CC labels, coalesce to self."""
    labels = connected_components(edges)
    return (
        vertices.select("rec_id")
        .join(labels, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce("cluster_id", "rec_id").alias("cluster_id"),
        )
    )


def bridge_edges(
    edges: DataFrame,
    assignments: DataFrame,
    max_cluster_edges: int = 100_000,
) -> DataFrame:
    """Per-edge bridge flag over the match-edge graph: an edge is a
    BRIDGE when removing it disconnects its cluster — the weakest-link
    diagnostic (Splink's ``is_bridge``) a review queue keys on, since a
    single wrong bridge edge is all that holds two sub-entities together
    (``cluster_graph_stats``'s low-density signal says "somewhere in this
    cluster"; this says "this exact pair").

    Input: canonical duplicate-free edges (src, dst) and the
    (rec_id, cluster_id) assignment over them.  Output one row per edge
    of every audited cluster: ``cluster_id, src, dst, is_bridge``.

    Scale shape: bridge finding is whole-component work, so it runs as
    ``groupBy(cluster_id).applyInPandas`` with iterative (stack-based)
    Tarjan low-link — linear in the cluster's edge count, one shuffle
    keyed on cluster_id, per-group memory bounded by
    ``max_cluster_edges`` (oversized clusters are EXCLUDED from the
    audit, like cluster_cohesion's quadratic bound: they are themselves
    the pathology and surface via the graph/size stats first).

    Tarjan is iterative-deterministic but not SQL-expressible, so the
    driver query (``er_bridge_edges``) is rows-only; correctness is
    pinned by tests/test_cluster.py against a brute-force
    remove-edge-and-BFS oracle on planted and randomized graphs.
    """
    import pandas as pd

    asg = assignments.select(
        F.col("rec_id").alias("src"), F.col("cluster_id").alias("cluster_id")
    )
    tagged = edges.select("src", "dst").join(asg, "src")
    sizes = tagged.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_ne"))
    eligible = sizes.where(F.col("_ne") <= max_cluster_edges).select(
        "cluster_id"
    )
    audited = tagged.join(F.broadcast(eligible), "cluster_id")

    def find_bridges(pdf: pd.DataFrame) -> pd.DataFrame:
        srcs = pdf["src"].to_numpy(dtype=object)
        dsts = pdf["dst"].to_numpy(dtype=object)
        ids: dict = {}
        names: list = []
        adj: list = []
        for arr in (srcs, dsts):
            for v in arr:
                if v not in ids:
                    ids[v] = len(names)
                    names.append(v)
                    adj.append([])
        for ei in range(len(srcs)):
            a, b = ids[srcs[ei]], ids[dsts[ei]]
            adj[a].append((b, ei))
            adj[b].append((a, ei))
        n = len(names)
        disc = [-1] * n
        low = [0] * n
        timer = 0
        is_bridge = [False] * len(srcs)
        for s in range(n):
            if disc[s] != -1:
                continue
            disc[s] = low[s] = timer
            timer += 1
            stack = [(s, -1, iter(adj[s]))]
            while stack:
                u, pe, it = stack[-1]
                advanced = False
                for v, ei in it:
                    if ei == pe:
                        continue  # don't ride the tree edge back up
                    if disc[v] == -1:
                        disc[v] = low[v] = timer
                        timer += 1
                        stack.append((v, ei, iter(adj[v])))
                        advanced = True
                        break
                    if disc[v] < low[u]:
                        low[u] = disc[v]
                if not advanced:
                    stack.pop()
                    if stack:
                        pu = stack[-1][0]
                        if low[u] < low[pu]:
                            low[pu] = low[u]
                        if low[u] > disc[pu]:
                            is_bridge[pe] = True
        return pd.DataFrame(
            {
                "cluster_id": pdf["cluster_id"],
                "src": pdf["src"],
                "dst": pdf["dst"],
                "is_bridge": is_bridge,
            }
        )

    return audited.groupBy("cluster_id").applyInPandas(
        find_bridges,
        schema="cluster_id string, src string, dst string, is_bridge boolean",
    )


def cluster_at_thresholds(
    vertices: DataFrame,
    scored_edges: DataFrame,
    thresholds,
    score_col: str = "score",
) -> DataFrame:
    """Cluster membership at SEVERAL admission thresholds in one sweep —
    the cluster-level threshold-selection evidence (Splink's
    "cluster at multiple thresholds" workflow): per record and per
    threshold, the component-min cluster label, so a practitioner can
    watch entities merge as the cutoff loosens and pick the knee.
    ``fs_pattern_truth`` gives this evidence at PAIR granularity; this
    gives it at the granularity that ships.

    ``thresholds`` are ascending DISTANCE cutoffs (an edge is admitted at
    threshold t when ``score_col <= t``; pass negated similarities for
    the other orientation).  Output: (rec_id, threshold, cluster_id),
    one row per vertex per threshold.

    Scale shape — contraction, not k closures: clusterings at nested
    edge sets are themselves nested, so level i runs CC on the CONTRACTED
    graph: nodes = level-(i-1) cluster ids, edges = only the DELTA
    (t_{i-1} < score <= t_i) mapped through the previous assignment.
    Each successive closure therefore touches #clusters nodes and
    #new-edges edges instead of the full graph — the whole sweep costs
    about one closure plus deltas.  Because cluster labels are component
    MINIMUM ids, the contracted closure's labels equal the direct
    closure's at every level exactly (min over cluster-min ids = min over
    member ids; equivalence pytest-pinned and, at the driver gate,
    hash-matched against three independent recursive-CTE closures).

    Each level's assignment is eagerly localCheckpoint'ed: it feeds both
    the output union and the next level's contraction, and k chained
    iterative closures would otherwise stack lineage that re-runs the
    whole tower per action (engine rule 10's materialization discipline).
    """
    ts = list(thresholds)
    if not ts or any(b <= a for a, b in zip(ts, ts[1:])):
        raise ValueError("thresholds must be non-empty and strictly ascending")
    out = None
    prev = None
    for i, t in enumerate(ts):
        if i == 0:
            edges = scored_edges.where(F.col(score_col) <= F.lit(t)).select(
                "src", "dst"
            )
            asg = assign_clusters(vertices, edges)
        else:
            delta = scored_edges.where(
                (F.col(score_col) > F.lit(ts[i - 1]))
                & (F.col(score_col) <= F.lit(t))
            ).select("src", "dst")
            ca = prev.select(
                F.col("rec_id").alias("src"), F.col("cluster_id").alias("ca")
            )
            cb = prev.select(
                F.col("rec_id").alias("dst"), F.col("cluster_id").alias("cb")
            )
            super_edges = (
                delta.join(ca, "src")
                .join(cb, "dst")
                .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
                .where(F.col("src") != F.col("dst"))
                .distinct()
            )
            merged = connected_components(super_edges).select(
                F.col("rec_id").alias("cluster_id"),
                F.col("cluster_id").alias("merged_id"),
            )
            asg = (
                prev.join(merged, "cluster_id", "left")
                .select(
                    "rec_id",
                    F.coalesce("merged_id", "cluster_id").alias("cluster_id"),
                )
            )
        asg = asg.localCheckpoint(eager=True)
        prev = asg
        level = asg.withColumn("threshold", F.lit(t))
        out = level if out is None else out.unionByName(level)
    return out.select("rec_id", "threshold", "cluster_id")


def membership_history(
    assignments: DataFrame,
    version_col: str = "version",
    id_col: str = "rec_id",
    label_col: str = "cluster_id",
) -> DataFrame:
    """Versioned assignments -> consolidated SCD2-style membership
    intervals: per record, one row per maximal run of consecutive
    OBSERVED versions carrying the same cluster label —
    ``(rec_id, cluster_id, version_from, version_to, n_versions)``.

    This is the entity-timeline view every warehouse keeps next to a
    linkage (when did these records merge? when did the review split
    them?): feed it batch ids from the incremental pipeline, run ids
    from repeated relinks, or thresholds from
    :func:`cluster_at_thresholds` (membership intervals over the
    loosening cutoff = the dendrogram flattened to rows).

    Spark shape: classic gaps-and-islands — one window over
    (id, version) marks label changes (``lag``), a running sum numbers
    the islands, one aggregation collapses them.  Both the window and
    the aggregation key on ``id_col``, so Catalyst reuses a single
    Exchange; everything is codegen, all output columns are the input's
    integers/strings (oracle-replayable bit-for-bit).

    Versions are whatever ordered integers the caller supplies; a
    version where a record is simply absent does not split a run (only
    an observed label CHANGE does) — consolidation is over observed
    rows, documented SCD2-lite semantics.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(version_col)
    changed = F.when(
        F.lag(label_col).over(w) == F.col(label_col), F.lit(0)
    ).otherwise(F.lit(1))
    islanded = assignments.select(
        id_col, version_col, label_col
    ).withColumn(
        "_island",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islanded.groupBy(id_col, "_island", label_col)
        .agg(
            F.min(version_col).alias("version_from"),
            F.max(version_col).alias("version_to"),
            F.count(F.lit(1)).alias("n_versions"),
        )
        .drop("_island")
    )


def stable_entity_ids(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "rec_id",
    entity_col: str = "entity_id",
    cluster_col: str = "cluster_id",
    fresh_prefix: str = "e:",
) -> DataFrame:
    """Persistent entity-ID carryover between linkage runs — the piece
    that turns a clustering into a PUBLISHABLE entity table.  Closure
    labels (component-min rec_ids) are unstable by construction: one new
    mention, one review decision, and half the labels move even though
    the entities barely changed, breaking every downstream foreign key.
    Production ER therefore keeps a durable ``entity_id`` that follows
    the entity, not the label: each new cluster inherits the old entity
    it overlaps MOST, and each old entity is inherited by at most ONE
    new cluster (when a review splits an entity, exactly one fragment
    keeps its id and the others mint fresh ones — the warehouse-side
    contract `membership_history` and `cluster_diff` assume).

    Inputs: ``old`` — last run's published ``(id_col, entity_col)``
    assignment; ``new`` — this run's ``(id_col, cluster_col)``
    clustering.  Output, one row per NEW cluster::

        cluster_id   this run's (unstable) label
        entity_id    the durable id: the inherited old entity, or
                     ``fresh_prefix || cluster_id`` when none is won
        n_members    new cluster size
        n_overlap    members shared with the CANDIDATE old entity
                     (the argmax; 0 when the cluster is all-new)
        status       'inherited' | 'contended' (its best old entity
                     was won by a larger fragment) | 'new'

    Resolution is two deterministic argmaxes: per new cluster the old
    entity with max overlap (ties -> smallest entity id), then per old
    entity the claiming cluster with max overlap (ties -> smallest
    cluster id) — both as ``min(struct(-n, id))`` aggregations, which
    combine partially map-side (no window over the full cell relation).
    Fresh ids are ``fresh_prefix || cluster_id``; pick a prefix outside
    the old entity-id namespace (collisions are the caller's contract,
    exactly like closure labels).  Scale: one rec_id equi-join + three
    aggregations over the (cluster, entity) contingency cells — output
    cardinality = new cluster count, nothing quadratic.  All columns are
    strings/integers, so the driver hash-grades the full table against a
    DuckDB replay (``er_stable_ids``).
    """
    o = old.select(
        F.col(id_col).alias("_rid"), F.col(entity_col).alias("_ent")
    )
    n = new.select(F.col(id_col).alias("_rid"), F.col(cluster_col).alias("_cl"))
    sizes = n.groupBy("_cl").agg(F.count(F.lit(1)).alias("n_members"))
    cells = (
        n.join(o, "_rid")
        .groupBy("_cl", "_ent")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    cand = cells.groupBy("_cl").agg(
        F.min(
            F.struct((-F.col("_n")).alias("neg"), F.col("_ent").alias("ent"))
        ).alias("_top")
    ).select(
        "_cl",
        F.col("_top.ent").alias("_cand_ent"),
        (-F.col("_top.neg")).alias("n_overlap"),
    )
    winners = cand.groupBy("_cand_ent").agg(
        F.min(
            F.struct(
                (-F.col("n_overlap")).alias("neg"), F.col("_cl").alias("cl")
            )
        ).alias("_win")
    ).select(
        F.col("_cand_ent").alias("_went"), F.col("_win.cl").alias("_wcl")
    )
    resolved = cand.join(
        winners,
        (cand["_cand_ent"] == winners["_went"]) & (cand["_cl"] == winners["_wcl"]),
        "left",
    ).select(
        "_cl",
        "_cand_ent",
        "n_overlap",
        F.col("_wcl").isNotNull().alias("_won"),
    )
    zero = F.lit(0).cast("long")
    return (
        sizes.join(resolved, "_cl", "left")
        .select(
            F.col("_cl").alias(cluster_col),
            F.when(F.col("_won"), F.col("_cand_ent"))
            .otherwise(F.concat(F.lit(fresh_prefix), F.col("_cl")))
            .alias(entity_col),
            F.col("n_members").cast("long").alias("n_members"),
            F.coalesce(F.col("n_overlap"), zero).cast("long").alias(
                "n_overlap"
            ),
            F.when(F.col("_cand_ent").isNull(), F.lit("new"))
            .when(F.col("_won"), F.lit("inherited"))
            .otherwise(F.lit("contended"))
            .alias("status"),
        )
    )


def with_entity_split(
    assignments: DataFrame,
    cluster_col: str = "cluster_id",
    train_pct: int = 80,
    valid_pct: int = 10,
    method: str = "xxhash",
    salt: int = 2024,
    key: "Column | None" = None,
) -> DataFrame:
    """Leakage-safe train/valid/test split for MATCHER training data:
    the split is a pure function of the CLUSTER id, so no entity ever
    straddles a split — pairs, comparison vectors or features derived
    within an entity can never leak from train into eval (the
    record-level split would leak on every within-entity pair; the same
    trap with_conversation_split closes for multi-turn context).

    Delegates to the corpus split primitives (`split_assign`): zero
    shuffle, coordination-free, re-runs and late shards agree.
    ``method='lcg'`` (the portable oracle path) needs an INTEGER key —
    pass ``key`` (e.g. the numeric part of the min-id label); xxhash
    (production) hashes the label directly.
    """
    from .corpus import split_assign

    bucket = split_assign(
        key if key is not None else F.col(cluster_col),
        100,
        method=method,
        salt=salt,
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return assignments.withColumn("split", split)
