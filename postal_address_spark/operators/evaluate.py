"""Linkage-quality evaluation: clustering-vs-truth metrics as pure
DataFrame aggregations.

The reference library ships no evaluation module — its tests pin golden
outputs instead (postal-address/tests/test_address.py) — but every
production linkage engine reports clustering-vs-truth quality, and the
engine's own e2e tests need it (tests/test_pipeline_e2e.py asserts F1).
This operator promotes that to a first-class, driver-gradable surface:

* ``pairwise_metrics`` — precision / recall / F1 over RECORD PAIRS
  (Menestrina, Whang, Garcia-Molina, "Evaluating entity resolution
  results", VLDB 2010): a pair is a true positive when predicted AND
  truth co-cluster it.
* ``b_cubed`` — per-record B³ precision / recall (Bagga & Baldwin 1998),
  the standard complement that doesn't square-weight large clusters.

Scale design (the whole point — NEVER materialize pairs):

* Pair counts come from CELL SIZES: for contingency cell (pred p,
  truth t) with n records, tp_pairs = sum n*(n-1)/2; pred_pairs /
  truth_pairs are the same formula over the marginal sizes.  Three
  map-side-combinable aggregations — the widest shuffle key is
  (pred, truth), cardinality <= n_records, usually tiny.  A 10^9-record
  clustering with 10^8 clusters evaluates in three cheap reduce stages;
  an explicit-pair formulation would be 10^18 rows dead on arrival.
* The marginals are re-aggregated FROM the cells frame, not from the
  input, so the input is scanned exactly once.
* All hashed outputs are integers or single int/int double divisions —
  bit-identical across engines (no float summation whose order could
  differ), which is what lets the driver hash-grade this against DuckDB.
* B³ averages are genuine float sums (sum over cells of n^2/|P|) whose
  bit pattern depends on Spark's partial-agg order, so ``b_cubed`` is
  pytest-graded with tolerance rather than oracle-hashed — documented
  here, asserted in tests/test_evaluate.py.  ``b_cubed_stats`` exposes
  the same computation's per-record INTEGER sufficient statistics,
  which IS oracle-hashable (driver query ``er_bcubed_stats``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_sum(sizes: DataFrame, size_col: str, out: str) -> DataFrame:
    # sum over groups of C(n, 2), kept EXACT in integer arithmetic: sum
    # n*(n-1) (even, fits a long up to n ~ 3e9) then one bit-shift — a
    # double division by 2 would silently round past 2^53 (~9e15 pairs,
    # reached by a single 1.3e8-record cluster).
    n = F.col(size_col)
    return sizes.agg(
        F.coalesce(
            F.shiftright(F.sum(n * (n - F.lit(1).cast("long"))), 1),
            F.lit(0).cast("long"),
        ).alias(out)
    )


def pairwise_metrics(
    assignments: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
) -> DataFrame:
    """One-row frame of pairwise precision/recall/F1 plus the exact
    integer tallies they derive from.

    ``assignments``: one row per record carrying its predicted cluster id
    and its ground-truth entity id (caller joins them; NULL in either
    column is a contract violation and is counted in ``n_null_labels``
    but excluded from the metrics rather than silently conflated —
    errors are data, rule 5).

    Output columns (stable names for the driver gate):
    n_records, n_pred_clusters, n_truth_entities, tp_pairs, pred_pairs,
    truth_pairs, precision, recall, f1, n_null_labels.

    precision = tp/pred_pairs, recall = tp/truth_pairs,
    f1 = 2*tp/(pred_pairs + truth_pairs) — each a SINGLE int/int double
    division, bit-stable across engines.
    """
    p, t = F.col(pred_col), F.col(truth_col)
    labeled = assignments.select(p.alias("p"), t.alias("t"))

    # ONE scan of the input: groupBy keeps NULL keys as their own groups,
    # so null-label rows ride the same aggregation and everything below
    # (marginals, tallies, null count) derives from the tiny cells frame.
    cells_all = labeled.groupBy("p", "t").agg(F.count(F.lit(1)).alias("n"))
    is_null = F.col("p").isNull() | F.col("t").isNull()
    nulls = cells_all.agg(
        F.coalesce(
            F.sum(F.when(is_null, F.col("n"))), F.lit(0).cast("long")
        ).alias("n_null_labels")
    )
    cells = cells_all.where(~is_null)
    pred_sizes = cells.groupBy("p").agg(F.sum("n").alias("n"))
    truth_sizes = cells.groupBy("t").agg(F.sum("n").alias("n"))

    tp = _pair_sum(cells, "n", "tp_pairs")
    pred = _pair_sum(pred_sizes, "n", "pred_pairs")
    truth = _pair_sum(truth_sizes, "n", "truth_pairs")
    counts = cells.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n_records")
    )
    npred = pred_sizes.agg(F.count(F.lit(1)).alias("n_pred_clusters"))
    ntruth = truth_sizes.agg(F.count(F.lit(1)).alias("n_truth_entities"))

    # Six one-row frames; cross-joining them is driver-trivial.
    row = (
        counts.crossJoin(npred).crossJoin(ntruth)
        .crossJoin(tp).crossJoin(pred).crossJoin(truth).crossJoin(nulls)
    )
    tpc = F.col("tp_pairs")
    return row.select(
        "n_records",
        "n_pred_clusters",
        "n_truth_entities",
        "tp_pairs",
        "pred_pairs",
        "truth_pairs",
        (tpc / F.nullif(F.col("pred_pairs"), F.lit(0))).alias("precision"),
        (tpc / F.nullif(F.col("truth_pairs"), F.lit(0))).alias("recall"),
        (
            (tpc * F.lit(2).cast("long"))
            / F.nullif(F.col("pred_pairs") + F.col("truth_pairs"), F.lit(0))
        ).alias("f1"),
        F.coalesce(F.col("n_null_labels"), F.lit(0).cast("long")).alias(
            "n_null_labels"
        ),
    )


def b_cubed(
    assignments: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
) -> DataFrame:
    """One-row frame: B³ precision / recall / F1 (Bagga & Baldwin 1998).

    Per record r in contingency cell (p, t) of size n with predicted
    cluster size |P| and truth entity size |T|:
    precision(r) = n/|P|, recall(r) = n/|T|; B³ metrics are the averages.
    Aggregated cell-wise (sum n^2/|P| etc.) — same never-materialize-pairs
    discipline as pairwise_metrics.  Float sums: pytest-graded with
    tolerance, not oracle-hashed (see module docstring).
    """
    p, t = F.col(pred_col), F.col(truth_col)
    clean = assignments.select(p.alias("p"), t.alias("t")).where(
        p.isNotNull() & t.isNotNull()
    )
    cells = clean.groupBy("p", "t").agg(F.count(F.lit(1)).alias("n"))
    pred_sizes = cells.groupBy("p").agg(F.sum("n").alias("np"))
    truth_sizes = cells.groupBy("t").agg(F.sum("n").alias("nt"))
    joined = cells.join(pred_sizes, "p").join(truth_sizes, "t")
    sums = joined.agg(
        F.sum(F.col("n") * F.col("n") / F.col("np")).alias("sp"),
        F.sum(F.col("n") * F.col("n") / F.col("nt")).alias("sr"),
        F.sum("n").alias("n_records"),
    )
    prec = F.col("sp") / F.col("n_records")
    rec = F.col("sr") / F.col("n_records")
    return sums.select(
        F.col("n_records"),
        prec.alias("b3_precision"),
        rec.alias("b3_recall"),
        (F.lit(2.0) * prec * rec / F.nullif(prec + rec, F.lit(0.0))).alias(
            "b3_f1"
        ),
    )


def b_cubed_stats(
    assignments: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
    id_col: str = "rec_id",
) -> DataFrame:
    """Per-record B³ SUFFICIENT STATISTICS, all integers: for record r in
    contingency cell (p, t), its predicted cluster size, truth entity
    size, and cell (intersection) size.  B³ precision/recall are the
    averages of inter_size/pred_size and inter_size/truth_size — genuine
    float sums whose bit pattern depends on aggregation order, which is
    why ``b_cubed`` itself is pytest-graded; THIS frame is the
    hash-gradable projection of the same computation (the driver oracle
    replays it cell-for-cell), and any consumer can finish the division
    downstream.

    Same scale discipline as the rest of the module: sizes come from the
    cells frame (one input scan, three map-side-combinable aggregations);
    the per-record join keys are cluster/entity ids, never pairs.
    Records with a NULL label on either side are excluded, mirroring
    ``pairwise_metrics``/``b_cubed``.
    """
    lab = assignments.select(
        F.col(id_col).alias("rec_id"),
        F.col(pred_col).alias("p"),
        F.col(truth_col).alias("t"),
    ).where(F.col("p").isNotNull() & F.col("t").isNotNull())
    cells = lab.groupBy("p", "t").agg(F.count(F.lit(1)).alias("inter_size"))
    pred_sizes = cells.groupBy("p").agg(F.sum("inter_size").alias("pred_size"))
    truth_sizes = cells.groupBy("t").agg(
        F.sum("inter_size").alias("truth_size")
    )
    return (
        lab.join(cells, ["p", "t"])
        .join(pred_sizes, "p")
        .join(truth_sizes, "t")
        .select(
            "rec_id",
            F.col("p").alias(pred_col),
            F.col("t").alias(truth_col),
            "pred_size",
            "truth_size",
            "inter_size",
        )
    )


def cluster_graph_stats(
    assignments: DataFrame,
    edges: DataFrame,
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-cluster graph diagnostics over the match-edge graph: node and
    edge counts, density, and degree extremes — the standard
    cluster-quality dashboard a linkage engine reports next to the
    truth-based metrics (Splink's ``compute_graph_metrics`` exposes the
    same cluster size / density / degree family; this is the
    contingency-free complement to ``cluster_cohesion``, usable when no
    ground truth exists).

    A low-density large cluster (few edges relative to C(n,2)) was merged
    by a long chain and is the first over-merge suspect; a min_degree of 1
    pinpoints leaf records attached by a single borderline edge.

    Contract: ``edges`` is the post-closure match-edge set, i.e. both
    endpoints of every edge share a cluster (true by construction for
    ``assign_clusters`` output over those same edges) and each undirected
    pair appears exactly once.  Edge->cluster attribution joins the SRC
    endpoint only, keeping it to one shuffle; a cross-cluster edge would
    violate the contract, not be detected.

    Scale design: never materializes pairs beyond the already-materialized
    edge relation — degrees come from exploding each edge into its two
    endpoints and aggregating (map-side combinable, shuffle keyed on
    record id), per-cluster rollups shuffle on cluster id.  Output
    cardinality = number of clusters.

    All output columns are integers or SINGLE int/int double divisions
    (density = n_edges / C(n,2), avg_degree = 2*n_edges / n), so the
    driver hash-grades this bit-for-bit against a DuckDB oracle.
    Singleton clusters report density NULL (0/0) rather than a fake 0 —
    errors/absences are data, rule 5.
    """
    asg = assignments.select(
        F.col(id_col).alias("_rid"), F.col(cluster_col).alias(cluster_col)
    )
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    endpoints = e.select(F.col("s").alias("_rid")).unionAll(
        e.select(F.col("d").alias("_rid"))
    )
    degrees = endpoints.groupBy("_rid").agg(F.count(F.lit(1)).alias("deg"))
    node_stats = (
        asg.join(degrees, "_rid", "left")
        .select(cluster_col, F.coalesce("deg", F.lit(0).cast("long")).alias("deg"))
        .groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_degree"),
            F.max("deg").alias("max_degree"),
        )
    )
    edge_counts = (
        e.join(asg, e.s == asg._rid)
        .groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    n = F.col("n_nodes")
    possible = F.shiftright(n * (n - F.lit(1).cast("long")), 1)
    return (
        node_stats.join(edge_counts, cluster_col, "left")
        .select(
            cluster_col,
            "n_nodes",
            F.coalesce("n_edges", F.lit(0).cast("long")).alias("n_edges"),
            "min_degree",
            "max_degree",
        )
        .select(
            cluster_col,
            "n_nodes",
            "n_edges",
            possible.alias("possible_edges"),
            (F.col("n_edges") / F.nullif(possible, F.lit(0))).alias("density"),
            (
                (F.col("n_edges") * F.lit(2).cast("long")) / F.col("n_nodes")
            ).alias("avg_degree"),
            "min_degree",
            "max_degree",
        )
        .orderBy(cluster_col)
    )


def cluster_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Clustering-churn report: for every cluster of the OLD clustering,
    how the NEW clustering redistributed its members — the stability
    dashboard an incremental / review-driven linkage deployment reads
    after every run (did the new batch quietly shatter last week's
    entities? did a confirmed review edge glue two big ones together?).

    Per old cluster:

    * ``n_members`` / ``n_surviving`` / ``n_removed`` — size, members
      still present in ``new``, members that disappeared.
    * ``n_fragments`` — distinct new clusters its surviving members land
      in (>1 = the cluster was split).
    * ``largest_fragment`` / ``main_new_cluster`` — size and id of the
      biggest landing cluster (ties broken by smallest new id, the same
      (count DESC, value ASC) argmax as survivorship).
    * ``n_external`` — records in those landing clusters that did NOT
      come from this old cluster (>0 = the cluster was merged with
      others; summing ``n_new - cell`` over distinct fragments counts
      each external record once per fragment it is adjacent to).
    * ``status`` — 'unchanged' | 'split' | 'merged' | 'mixed' |
      'removed', derived from the integers above.

    Scale design: one rec_id-keyed join of the two assignment relations,
    then contingency-cell aggregations exactly like ``pairwise_metrics``
    — nothing quadratic, output cardinality = old cluster count.  All
    columns are integers or strings, so the driver hash-grades the whole
    report against a DuckDB replay (``er_cluster_diff``).
    """
    o = old.select(
        F.col(id_col).alias("_rid"), F.col(cluster_col).alias("old_cluster_id")
    )
    n = new.select(F.col(id_col).alias("_rid"), F.col(cluster_col).alias("_nid"))
    joined = o.join(n, "_rid", "left")

    base = joined.groupBy("old_cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(
            F.when(F.col("_nid").isNull(), F.lit(1)).otherwise(F.lit(0))
            .cast("long")
        ).alias("n_removed"),
    )
    cells = (
        joined.where(F.col("_nid").isNotNull())
        .groupBy("old_cluster_id", "_nid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    new_sizes = n.groupBy("_nid").agg(F.count(F.lit(1)).alias("n_new"))
    frag = (
        cells.join(new_sizes, "_nid")
        .groupBy("old_cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_fragments"),
            F.sum("n").alias("n_surviving"),
            F.sum(F.col("n_new") - F.col("n")).alias("n_external"),
            F.max("n").alias("largest_fragment"),
            F.min(
                F.struct(
                    (-F.col("n")).alias("neg"), F.col("_nid").alias("id")
                )
            ).alias("_top"),
        )
    )
    zero = F.lit(0).cast("long")
    out = base.join(frag, "old_cluster_id", "left").select(
        "old_cluster_id",
        "n_members",
        F.coalesce("n_surviving", zero).alias("n_surviving"),
        "n_removed",
        F.coalesce("n_fragments", zero).alias("n_fragments"),
        F.coalesce("largest_fragment", zero).alias("largest_fragment"),
        F.col("_top.id").alias("main_new_cluster"),
        F.coalesce("n_external", zero).alias("n_external"),
    )
    unchanged = (
        (F.col("n_fragments") == 1)
        & (F.col("n_removed") == 0)
        & (F.col("n_external") == 0)
    )
    return out.select(
        "*",
        F.when(F.col("n_fragments") == 0, F.lit("removed"))
        .when(unchanged, F.lit("unchanged"))
        .when(F.col("n_external") == 0, F.lit("split"))
        .when(
            (F.col("n_fragments") == 1) & (F.col("n_removed") == 0),
            F.lit("merged"),
        )
        .otherwise(F.lit("mixed"))
        .alias("status"),
    ).orderBy("old_cluster_id")


def merge_distance(
    assignments: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "truth_id",
) -> DataFrame:
    """Generalized merge distance with unit costs (Menestrina, Whang,
    Garcia-Molina, VLDB 2010): the minimum number of cluster split +
    merge operations transforming the predicted clustering into the
    truth.  The optimal unit-cost path goes through the contingency
    cells — split every predicted cluster into its cells
    (``n_cells - n_pred`` splits), then merge cells into truth entities
    (``n_cells - n_truth`` merges) — so the whole metric reduces to
    THREE counts over the same cells frame the other metrics use: one
    scan, one (pred, truth) aggregation, a driver-trivial one-row
    result.  All integers; the driver oracle replays it exactly.
    """
    p, t = F.col(pred_col), F.col(truth_col)
    clean = assignments.select(p.alias("p"), t.alias("t")).where(
        p.isNotNull() & t.isNotNull()
    )
    cells = clean.groupBy("p", "t").agg(F.count(F.lit(1)).alias("n"))
    return cells.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n_records"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("p").alias("n_pred_clusters"),
        F.countDistinct("t").alias("n_truth_entities"),
    ).select(
        "n_records",
        "n_cells",
        "n_pred_clusters",
        "n_truth_entities",
        (F.col("n_cells") - F.col("n_pred_clusters")).alias("n_splits"),
        (F.col("n_cells") - F.col("n_truth_entities")).alias("n_merges"),
        (
            2 * F.col("n_cells")
            - F.col("n_pred_clusters")
            - F.col("n_truth_entities")
        ).alias("gmd"),
    )


def cluster_cohesion(
    assigned: DataFrame,
    value_col: str = "line1",
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
    max_lev: int = 5,
    min_members: int = 2,
    max_members: int = 1000,
) -> DataFrame:
    """Intra-cluster cohesion audit: for each multi-member cluster, how
    many of its member PAIRS are within ``max_lev`` edit distance on
    ``value_col``.  Transitive closure merges A–B–C even when A and C are
    dissimilar; a cluster whose cohesive-pair count is far below its pair
    count is the classic over-merge signal a review queue keys on.

    Scale design: pairing is quadratic IN THE CLUSTER, so the audit is
    bounded by ``max_members`` — oversized clusters are excluded here
    (they are themselves the pathology and surface via the block/cluster
    histograms; production audits sample them instead).  The self-join is
    keyed on the cluster id (one shuffle), carries only
    (cluster, id, value), and aggregates map-side.

    Outputs are pure integers (counts), so the driver hash-grades this
    against a DuckDB oracle built on the same mirrored closure chain as
    ``er_link_closure`` (levenshtein is an integer kernel in both
    engines).
    """
    sizes = assigned.groupBy(cluster_col).agg(F.count("*").alias("n_members"))
    eligible = sizes.where(
        (F.col("n_members") >= min_members) & (F.col("n_members") <= max_members)
    )
    slim = (
        assigned.join(eligible.select(cluster_col), cluster_col)
        .select(
            cluster_col,
            F.col(id_col).alias("_rid"),
            F.lower(F.col(value_col)).alias("_val"),
        )
    )
    a, b = slim.alias("a"), slim.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}"))
        & (F.col("a._rid") < F.col("b._rid")),
    )
    coh = (
        pairs.groupBy(F.col(f"a.{cluster_col}").alias(cluster_col))
        .agg(
            F.count("*").alias("n_pairs"),
            # when/otherwise, not a bare cast: a NULL value must count 0
            # (matching SQL CASE semantics), not vanish from the sum
            F.sum(
                F.when(
                    F.levenshtein("a._val", "b._val") <= max_lev, F.lit(1)
                ).otherwise(F.lit(0)).cast("long")
            ).alias("n_cohesive"),
        )
    )
    return (
        eligible.join(coh, cluster_col, "left")
        .select(
            cluster_col,
            "n_members",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_cohesive", F.lit(0)).alias("n_cohesive"),
        )
        .orderBy(cluster_col)
    )
