"""Incremental record linkage: link a NEW batch of mentions against an
existing clustered state without re-scoring the world.

The batch pipeline (``plans/pipeline.py``) is a pure function of its whole
input; at 10^12-turn scale a daily ingest cannot afford to re-run it over
all history.  This module maintains a persistent **linkage state** and
folds each new batch in with work proportional to the batch and its
touched blocks, while producing mention-level labels **identical to
re-running the batch pipeline over the union of all batches** (the
equivalence argument is spelled out below and asserted in
``tests/test_incremental.py``).

State layout (``<state_dir>/``), every table partitioned by
``pb = pmod(xxhash64(block_key), n_pb)`` so per-batch I/O prunes to the
partitions a batch actually touches:

* ``values``    — one row per distinct normalized scoring tuple ever seen:
  ``(vkey, val_id, block_key, line1, city_name, postal_code, pb)``.
  Append-only: new tuples are appended, existing rows are never rewritten.
* ``clusters``  — value-level labels ``(val_id, cluster_id, block_key,
  pb)``.  Rewritten per batch ONLY for touched ``pb`` partitions, via
  Spark's dynamic partition overwrite (untouched partitions are never
  read or written).
* ``mention_map`` — ``(rec_id, val_id, pb)``.  Append-only log mapping
  every mention to its value node; joined with ``clusters`` on demand to
  materialize mention-level labels (``mention_clusters``).
* ``edges``     — ``(src, dst, block_key, pb)``: every scored-above-
  threshold pair and every alias edge any fold produced (never the star
  edges — those are spanning substitutes derivable from ``clusters``).
  Append-only under folds; retraction rewrites touched partitions.  This
  log is what makes :func:`retract_mentions` exact — connectivity under
  VERTEX DELETION cannot be recovered from stars alone.
* ``_manifest.json`` — state-shaping parameters (``n_pb``), written on
  the first fold and validated on every later one: a fold under a
  different ``n_pb`` would prune/overwrite the wrong buckets.

State metadata I/O (existence probes, the manifest) goes through the
Hadoop FileSystem (``sources/fs.py``), so the state dir may be a remote
URI (hdfs://, s3a://) under cluster spark-submit, not only a local path.

Per-batch algorithm:

1. normalize + block the new mentions, collapse them to value nodes
   (min-rec_id representative per distinct tuple — the same "score
   values, not mentions" collapse the batch pipeline uses).
2. match new value groups against state ``values`` on the exact tuple key
   ``vkey``: a matched group maps its mentions to the EXISTING val_id and
   contributes **no scoring work** (its tuple has already been scored
   against every value it can meet); when the new group's min rec_id
   undercuts the stored val_id, an **alias edge** (old id <-> new min)
   rides to the closure so cluster labels still equal the global min.
3. candidate pairs are generated **two-sided**: new nodes x (new + old
   nodes in touched blocks) on the same refined join key as the batch
   path (``pairs.py``: full-postal block key + recall-lossless house
   number refinement when the threshold allows it, hot keys salted).
   Old-x-old pairs are never generated — that work happened in earlier
   batches.
4. score the pairs with the production kernel cascade, union the scored
   edges with the alias edges and the touched blocks' **star edges**
   (``val_id -> cluster_id`` from the previous state — a spanning
   substitute for the old edge set: connected components of
   ``old_star ∪ new_edges`` equal those of ``old_edges ∪ new_edges``
   because every old component is already fully connected through its
   star), and run the per-block closure over the touched blocks only.
5. write back: append new value nodes + the batch's mention map;
   dynamically overwrite the touched ``pb`` partitions of ``clusters``
   (recomputed labels for touched blocks, carried-over labels for the
   other blocks sharing those partitions).

Exactness: the mention graph of the union input is the value graph with
each value node blown up into a clique (pipeline.py).  Steps 2-4 ensure
the incremental value graph has the same connected components as the
batch value graph restricted to touched blocks (old components enter via
their stars, cross-batch identity via ``vkey`` match + alias edges, every
new-old and new-new candidate pair is generated and scored with the same
kernels), and untouched blocks cannot change (no new vertex, no new
edge).  Labels are component minima over value ids; alias edges guarantee
the minimum reflects a later batch's smaller rec_id.  Therefore the
mention-level labeling equals the batch pipeline's on the union — the
property ``tests/test_incremental.py`` asserts on multi-batch splits,
including rec_id orderings where later batches carry SMALLER ids.
"""
from __future__ import annotations

import json
import posixpath
from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.fs import fs_delete, fs_exists, fs_read_text, fs_write_text
from ..operators.blocking import with_block_key
from ..operators.cluster import assign_clusters_blocked
from ..operators.extract import extract_mentions
from ..operators.normalize_op import normalize_mentions
from ..operators.pairs import PAIR_FIELDS, REFINE_SAFE_THRESHOLD
from ..operators.scoring import DEFAULT_THRESHOLD, score_pairs

# ASCII control chars that cannot appear in normalized address fields —
# safe separators/placeholders for the exact tuple key.
_SEP = "\x1f"
_NULL = "\x02"

_VALUES_SCHEMA = T.StructType([
    T.StructField("vkey", T.StringType()),
    T.StructField("val_id", T.StringType()),
    T.StructField("block_key", T.StringType()),
    T.StructField("line1", T.StringType()),
    T.StructField("city_name", T.StringType()),
    T.StructField("postal_code", T.StringType()),
    T.StructField("pb", T.IntegerType()),
])
_CLUSTERS_SCHEMA = T.StructType([
    T.StructField("val_id", T.StringType()),
    T.StructField("cluster_id", T.StringType()),
    T.StructField("block_key", T.StringType()),
    T.StructField("pb", T.IntegerType()),
])
_MENTION_MAP_SCHEMA = T.StructType([
    T.StructField("rec_id", T.StringType()),
    T.StructField("val_id", T.StringType()),
    T.StructField("pb", T.IntegerType()),
])
# Edge log: every scored-above-threshold pair + every alias edge each fold
# produced (star edges are NOT logged — they are derivable from
# ``clusters`` and would be redundant spanning trees).  Stored so that
# retraction can re-close affected blocks from the surviving REAL edges:
# the star alone cannot survive vertex deletion (removing a star center
# would falsely split members its real edges still connect).
_EDGES_SCHEMA = T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("dst", T.StringType()),
    T.StructField("block_key", T.StringType()),
    T.StructField("pb", T.IntegerType()),
])


@dataclass
class IncrementalConfig:
    strict: bool = False
    replace_city_name: bool = True
    postal_prefix_len: Optional[int] = None
    hot_threshold: int = 20000
    n_salt: int = 16
    threshold: float = DEFAULT_THRESHOLD
    n_pb: int = 64  # state partition buckets (pb = xxhash64(block) % n_pb)


def _vkey() -> F.Column:
    return F.concat_ws(
        _SEP,
        F.col("block_key"),
        F.coalesce(F.col("line1"), F.lit(_NULL)),
        F.coalesce(F.col("city_name"), F.lit(_NULL)),
        F.coalesce(F.col("postal_code"), F.lit(_NULL)),
    )


def _pb(n_pb: int) -> F.Column:
    return F.pmod(F.xxhash64("block_key"), F.lit(n_pb)).cast("int")


def _read_state(
    spark: SparkSession, state_dir: str, name: str, schema: T.StructType
) -> DataFrame:
    # Existence via the Hadoop FileSystem, NOT os.path: the state dir is a
    # cluster path (hdfs:// / s3a://) under spark-submit, and a local-FS
    # probe would read every remote state table as empty — writes land,
    # reads miss, labels silently diverge.
    path = posixpath.join(state_dir, name)
    if fs_exists(spark, path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def _check_manifest(spark: SparkSession, state_dir: str, n_pb: int) -> None:
    """Pin state-shaping parameters to the state dir's lifetime.

    ``pb = xxhash64(block_key) % n_pb`` decides which partitions every
    fold reads and overwrites; folding with a DIFFERENT ``n_pb`` than the
    state was built with prunes to the wrong buckets — cross-batch vkey
    matches are lost and stale cluster rows survive the dynamic overwrite.
    That is silent corruption, so the first fold writes a manifest and
    every later fold validates against it (same enforcement class as the
    stream checkpoint binding in ``streaming/link_stream.py``).
    """
    path = posixpath.join(state_dir, "_manifest.json")
    if fs_exists(spark, path):
        manifest = json.loads(fs_read_text(spark, path))
        if manifest.get("n_pb") != n_pb:
            raise ValueError(
                f"state dir {state_dir!r} was built with "
                f"n_pb={manifest.get('n_pb')}; refusing to fold with "
                f"n_pb={n_pb} — bucket ids would no longer line up with "
                "the stored pb partitions and the state would corrupt "
                "silently"
            )
    else:
        # edge_log marks that EVERY fold of this state has appended its
        # scored + alias edges to the ``edges`` table — the precondition
        # for exact retraction.  States created before the edge log lack
        # the flag and retract_mentions refuses them (their early folds'
        # edges are unrecoverable).
        fs_write_text(
            spark, path,
            json.dumps({"n_pb": n_pb, "version": 2, "edge_log": True}),
        )


def _sided(df: DataFrame, side: str, extra=()) -> DataFrame:
    cols = [F.col("join_key")] + [
        F.col(c).alias(f"{c}_{side}") for c in PAIR_FIELDS
    ] + [F.col(c) for c in extra]
    return df.select(*cols)


def _incremental_pairs(
    new_nodes: DataFrame,
    old_nodes: DataFrame,
    hot_threshold: int,
    n_salt: int,
    threshold: float,
) -> DataFrame:
    """new x (new ∪ old) candidate pairs — never old x old.

    Same refined join key and hot-key salting scheme as the batch path
    (``pairs.py:candidate_pairs``); the asymmetry is the point: the left
    side is only the batch's new value nodes, the right side is every
    node in the touched blocks, so pair volume is ~|new| x block density
    instead of the full within-block quadratic.  De-dup rule: a new-new
    pair appears from both orientations, kept only as ``rec_id_a <
    rec_id_b``; a new-old pair appears once (old nodes never ride the
    left side).
    """
    def keyed(df: DataFrame) -> DataFrame:
        if threshold > REFINE_SAFE_THRESHOLD:
            jk = F.concat_ws(
                "#", F.col("block_key"),
                F.coalesce(F.regexp_extract("line1", r"^(\d+)", 1), F.lit("")),
            )
        else:
            jk = F.col("block_key")
        return df.withColumn("join_key", jk)

    left = keyed(new_nodes).withColumn("block_key_keep", F.col("block_key"))
    right = keyed(
        old_nodes.withColumn("is_old", F.lit(True)).unionByName(
            new_nodes.withColumn("is_old", F.lit(False))
        )
    )

    histogram = right.groupBy("join_key").agg(F.count(F.lit(1)).alias("n"))
    hot_keys = (
        histogram.where(F.col("n") > hot_threshold)
        .select("join_key")
        .withColumn("__hot", F.lit(True))
    )
    lf = left.join(F.broadcast(hot_keys), "join_key", "left")
    rf = right.join(F.broadcast(hot_keys), "join_key", "left")

    def joined(l: DataFrame, r: DataFrame, salted: bool) -> DataFrame:
        a = _sided(l, "a", extra=["block_key_keep"])
        b = _sided(r, "b", extra=["is_old"])
        if salted:
            a = a.withColumn(
                "salt", F.pmod(F.xxhash64("rec_id_a"), F.lit(n_salt))
            )
            # explode_outer: constant non-empty sequence (CLAUDE.md rule 2).
            b = b.withColumn(
                "salt",
                F.explode_outer(F.sequence(F.lit(0), F.lit(n_salt - 1))),
            ).withColumn("salt", F.col("salt").cast("long"))
            on = ["join_key", "salt"]
        else:
            on = ["join_key"]
        return (
            a.join(b, on=on)
            .where(F.col("is_old") | (F.col("rec_id_a") < F.col("rec_id_b")))
            .where(F.col("rec_id_a") != F.col("rec_id_b"))
        )

    pairs = joined(
        lf.where(F.col("__hot").isNull()).drop("__hot"),
        rf.where(F.col("__hot").isNull()).drop("__hot"),
        salted=False,
    ).unionByName(
        joined(
            lf.where(F.col("__hot").isNotNull()).drop("__hot"),
            rf.where(F.col("__hot").isNotNull()).drop("__hot"),
            salted=True,
        ).drop("salt")
    )
    return (
        pairs.withColumnRenamed("block_key_keep", "block_key")
        .drop("join_key", "is_old")
    )


def incremental_link_mentions(
    spark: SparkSession,
    mentions: DataFrame,
    state_dir: str,
    config: Optional[IncrementalConfig] = None,
) -> Dict[str, DataFrame]:
    """Fold one batch of raw mention rows into the linkage state.

    Returns ``{"batch_labels": mention labels for THIS batch,
    "touched_blocks": ...}``; full labels over all history via
    :func:`mention_clusters`.  The write-back is the transaction: reads
    of the three state tables happen before any write, and every write
    lands before the function returns.
    """
    config = config or IncrementalConfig()
    n_pb = config.n_pb
    _check_manifest(spark, state_dir, n_pb)

    blocked = (
        with_block_key(
            normalize_mentions(
                mentions, strict=config.strict,
                replace_city_name=config.replace_city_name,
            ),
            config.postal_prefix_len,
        )
        .where(F.col("block_key").isNotNull())
        .withColumn("vkey", _vkey())
        # feeds the value collapse AND the mention map — persist so the
        # Arrow normalization chain runs once per batch.
        .persist()
    )

    # Value collapse for the batch: one node per distinct scoring tuple.
    batch_vals = (
        blocked
        .groupBy("vkey", "block_key", "line1", "city_name", "postal_code")
        .agg(F.min("rec_id").alias("nv_id"))
    ).persist()
    batch_mention_map = blocked.select("rec_id", "vkey")

    old_values = _read_state(spark, state_dir, "values", _VALUES_SCHEMA)
    old_clusters = _read_state(spark, state_dir, "clusters", _CLUSTERS_SCHEMA)

    # Partition-pruned slice of the state: only the pb buckets this batch
    # touches are ever read (predicate on the partition column).
    touched_pbs = [
        r["pb"]
        for r in batch_vals.select(_pb(n_pb).alias("pb")).distinct().collect()
    ]
    old_values_t = old_values.where(F.col("pb").isin(touched_pbs))
    old_clusters_t = old_clusters.where(F.col("pb").isin(touched_pbs))
    # ... then block-level: pb buckets hold many blocks.  Materialized
    # eagerly (it is small — one row per touched block, and its distinct
    # is cheap off the persisted batch_vals): it is reused by three joins
    # below AND returned to the caller, whose summary count would
    # otherwise re-run the whole Arrow normalization chain after the
    # persists are released.
    touched_blocks = (
        batch_vals.select("block_key").distinct().localCheckpoint(eager=True)
    )
    old_in_blocks = old_values_t.join(touched_blocks, "block_key", "semi")

    matched = batch_vals.join(
        old_values_t.select("vkey", F.col("val_id").alias("old_val_id")),
        "vkey", "left",
    ).persist()
    new_nodes = (
        matched.where(F.col("old_val_id").isNull())
        .select(
            F.col("nv_id").alias("rec_id"),
            "block_key", "line1", "city_name", "postal_code", "vkey",
        )
    )
    # Tuple seen before with a smaller new rec_id: alias the ids so the
    # component minimum (the cluster label) tracks the global minimum.
    alias_edges = (
        matched.where(
            F.col("old_val_id").isNotNull()
            & (F.col("nv_id") < F.col("old_val_id"))
        )
        .select(
            F.col("old_val_id").alias("src"),
            F.col("nv_id").alias("dst"),
            "block_key",
        )
    )

    scored = score_pairs(
        _incremental_pairs(
            new_nodes.select("block_key", *PAIR_FIELDS),
            old_in_blocks.select(
                "block_key", F.col("val_id").alias("rec_id"),
                "line1", "city_name", "postal_code",
            ),
            hot_threshold=config.hot_threshold,
            n_salt=config.n_salt,
            threshold=config.threshold,
        ),
        threshold=config.threshold,
    )
    star_edges = (
        old_clusters_t.join(touched_blocks, "block_key", "semi")
        .where(F.col("val_id") != F.col("cluster_id"))
        .select(F.col("val_id").alias("src"), F.col("cluster_id").alias("dst"),
                "block_key")
    )
    # Real edges (scored + alias) are what the edge log persists; star
    # edges only ride THIS fold's closure as the spanning substitute for
    # prior batches' logged edges.
    real_edges = scored.select(
        F.col("rec_id_a").alias("src"), F.col("rec_id_b").alias("dst"),
        "block_key",
    ).unionByName(alias_edges)
    edges = real_edges.unionByName(star_edges)
    # Vertices: every node of a touched block — prior values, the batch's
    # new nodes, and phantom alias minima (old cluster roots are already
    # val_ids in old_in_blocks; alias dst ids are new).
    vertices = (
        old_in_blocks.select(F.col("val_id").alias("rec_id"), "block_key")
        .unionByName(new_nodes.select("rec_id", "block_key"))
        .unionByName(
            alias_edges.select(F.col("dst").alias("rec_id"), "block_key")
        )
    ).distinct()

    new_labels = (
        assign_clusters_blocked(vertices, edges)
        .withColumnRenamed("rec_id", "val_id")
        .join(vertices.withColumnRenamed("rec_id", "val_id"), "val_id")
        .withColumn("pb", _pb(n_pb))
    )

    # ---- write-back ----------------------------------------------------
    values_out = posixpath.join(state_dir, "values")
    clusters_out = posixpath.join(state_dir, "clusters")
    map_out = posixpath.join(state_dir, "mention_map")
    edges_out = posixpath.join(state_dir, "edges")

    # EVERY payload is eagerly materialized BEFORE the first write: the
    # payloads' lineage reads the state tables this function is about to
    # modify, and a lazy plan re-lists the state directory at execution
    # time — the first append would make every new vkey "match itself"
    # and silently drop all new pairs (caught by
    # tests/test_incremental.py).  localCheckpoint pins the computed
    # rows executor-side; a production deployment would instead write
    # each batch to a fresh versioned state dir and swap a pointer.
    values_payload = (
        new_nodes.withColumn("val_id", F.col("rec_id"))
        .withColumn("pb", _pb(n_pb))
        .select([f.name for f in _VALUES_SCHEMA.fields])
        .localCheckpoint(eager=True)
    )
    batch_map = (
        batch_mention_map.join(
            matched.select(
                "vkey",
                F.coalesce("old_val_id", "nv_id").alias("val_id"),
                "block_key",
            ),
            "vkey",
        )
        .withColumn("pb", _pb(n_pb))
        .select([f.name for f in _MENTION_MAP_SCHEMA.fields])
        .localCheckpoint(eager=True)
    )
    # Touched pb partitions are atomically replaced (dynamic partition
    # overwrite): recomputed labels for touched blocks + carried-over
    # labels for the partitions' other blocks.  Untouched partitions are
    # neither read nor written.
    carried = old_clusters_t.join(touched_blocks, "block_key", "left_anti")
    clusters_payload = (
        new_labels.select([f.name for f in _CLUSTERS_SCHEMA.fields])
        .unionByName(carried)
        .localCheckpoint(eager=True)
    )
    edges_payload = (
        real_edges.withColumn("pb", _pb(n_pb))
        .select([f.name for f in _EDGES_SCHEMA.fields])
        .localCheckpoint(eager=True)
    )

    values_payload.write.mode("append").partitionBy("pb").parquet(values_out)
    batch_map.write.mode("append").partitionBy("pb").parquet(map_out)
    edges_payload.write.mode("append").partitionBy("pb").parquet(edges_out)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        clusters_payload.write.mode("overwrite").partitionBy("pb").parquet(
            clusters_out
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    batch_labels = (
        batch_map.select("rec_id", "val_id")
        .join(
            spark.read.schema(_CLUSTERS_SCHEMA).parquet(clusters_out)
            .select("val_id", "cluster_id"),
            "val_id",
        )
        .select("rec_id", "cluster_id")
    )
    blocked.unpersist()
    batch_vals.unpersist()
    matched.unpersist()
    return {
        "batch_labels": batch_labels,
        "touched_blocks": touched_blocks,
    }


def incremental_link(
    spark: SparkSession,
    transcripts: DataFrame,
    state_dir: str,
    config: Optional[IncrementalConfig] = None,
) -> Dict[str, DataFrame]:
    """Transcript-table entry point: extract mentions, then fold them in."""
    return incremental_link_mentions(
        spark, extract_mentions(transcripts), state_dir, config
    )


def retract_mentions(
    spark: SparkSession,
    rec_ids,
    state_dir: str,
) -> Dict[str, int]:
    """Remove a set of mentions from the linkage state (GDPR-style
    unlink), leaving labels **identical to re-running the batch pipeline
    over the surviving mentions** (asserted in ``tests/test_retract.py``).

    ``rec_ids``: an iterable of mention ids or a DataFrame with a
    ``rec_id`` column.  Unknown ids are ignored (idempotent re-runs).

    Why this needs the edge log: stored ``clusters`` rows are star edges
    — a spanning SUBSTITUTE for the scored edge set, valid only under
    edge/vertex ADDITION.  Deleting the star's center would split members
    whose real edges still connect them; exactness under deletion needs
    the real edges back.  Hence folds log ``(scored ∪ alias)`` edges and
    this function refuses states whose manifest lacks ``edge_log``.

    Algorithm (work ∝ touched state partitions + affected blocks — never
    the whole state; the one full-table pass is the ``mention_map`` scan
    locating the retracted rows, which a production deployment would
    replace with a rec_id-bucketed index):

    1. Locate the retracted mention rows; their values are *touched*.
       A touched value with no surviving mention is *dead*; one whose
       min surviving rec_id differs from its stored ``val_id`` is
       *renamed*.  Blocks holding dead or renamed values are *affected* —
       only there can labels or ids change (a retraction that removes
       neither a value nor its representative changes nothing but the
       mention_map row).
    2. For every value in an affected block, re-derive the effective id
       ``eff = min(surviving mention rec_ids)`` — exactly the val_id the
       batch pipeline would assign over the survivors.  This rename also
       SUBSUMES alias edges: an alias ``old_val_id <-> smaller rec_id``
       collapses to a self-loop once both endpoints canonicalize to the
       same value (step 3) and the value is renamed to its true min.
    3. Canonicalize every logged edge endpoint through the PRE-retraction
       ``mention_map`` (every endpoint — val_id or alias phantom — IS a
       mention rec_id mapping to its value), drop edges with a dead
       endpoint, rename survivors to ``eff``, drop self-loops, and re-run
       the per-block closure over the affected blocks' surviving values.
       Scores depend only on value TUPLES, so the surviving logged edges
       are exactly the pairs the batch pipeline would score >= threshold
       over the survivors (every cross-fold pair was generated by the
       later value's fold; same refined join key, same kernels).
    4. Write back, all four tables, touched ``pb`` partitions only
       (dynamic partition overwrite; partitions whose every row was
       retracted are deleted explicitly — dynamic overwrite cannot
       remove a partition absent from the payload).

    Returns summary counts (``retracted_mentions``, ``dead_values``,
    ``renamed_values``, ``affected_blocks``).
    """
    manifest_path = posixpath.join(state_dir, "_manifest.json")
    if not fs_exists(spark, manifest_path):
        raise ValueError(f"no linkage state at {state_dir!r}")
    manifest = json.loads(fs_read_text(spark, manifest_path))
    if not manifest.get("edge_log"):
        raise ValueError(
            f"state dir {state_dir!r} predates the edge log (manifest has "
            "no edge_log flag): its early folds' scored edges were never "
            "persisted, so exact retraction is impossible — re-fold the "
            "source batches into a fresh state dir"
        )
    n_pb = int(manifest["n_pb"])

    if not isinstance(rec_ids, DataFrame):
        rec_ids = spark.createDataFrame(
            [(str(r),) for r in rec_ids], "rec_id string"
        )
    retract = rec_ids.select("rec_id").distinct().localCheckpoint(eager=True)

    mmap = _read_state(spark, state_dir, "mention_map", _MENTION_MAP_SCHEMA)
    dead_mentions = mmap.join(retract, "rec_id", "semi").persist()
    touched_pbs = [
        r["pb"] for r in dead_mentions.select("pb").distinct().collect()
    ]
    if not touched_pbs:
        dead_mentions.unpersist()
        return {
            "retracted_mentions": 0, "dead_values": 0,
            "renamed_values": 0, "affected_blocks": 0,
        }

    values = _read_state(spark, state_dir, "values", _VALUES_SCHEMA)
    clusters = _read_state(spark, state_dir, "clusters", _CLUSTERS_SCHEMA)
    edges = _read_state(spark, state_dir, "edges", _EDGES_SCHEMA)
    vals_t = values.where(F.col("pb").isin(touched_pbs))
    mmap_t = mmap.where(F.col("pb").isin(touched_pbs)).persist()
    clusters_t = clusters.where(F.col("pb").isin(touched_pbs))
    edges_t = edges.where(F.col("pb").isin(touched_pbs))

    touched_vals = dead_mentions.select("val_id").distinct()
    surv_t = mmap_t.join(retract, "rec_id", "left_anti").persist()

    # Touched-value triage.  Labels are component minima over each
    # value's MIN MENTION id (stored val_id for most values, a smaller
    # alias phantom when a later batch brought one) — so a retraction
    # can only change labels where it kills a value or changes a value's
    # min mention.  The stored val_id alone cannot detect the latter
    # (retracting an alias phantom leaves val_id untouched but raises
    # the component minimum), hence the pre/post min comparison.
    touched_pre = (
        mmap_t.join(touched_vals, "val_id", "semi")
        .groupBy("val_id").agg(F.min("rec_id").alias("pre_min"))
    )
    touched_min = (
        surv_t.join(touched_vals, "val_id", "semi")
        .groupBy("val_id").agg(F.min("rec_id").alias("eff"))
    ).persist()
    dead_vals = touched_vals.join(
        touched_min, "val_id", "left_anti"
    ).localCheckpoint(eager=True)
    min_changed = (
        touched_pre.join(touched_min, "val_id")
        .where(F.col("pre_min") != F.col("eff"))
    )

    affected_blocks = (
        vals_t.join(
            dead_vals.unionByName(min_changed.select("val_id")),
            "val_id", "semi",
        )
        .select("block_key").distinct()
        .localCheckpoint(eager=True)
    )

    # Effective ids for EVERY value in an affected block (not only the
    # touched ones): an UNtouched value may still carry an alias phantom
    # minimum (a later-batch smaller rec_id) that only exists as a logged
    # alias edge — the closure rebuilt below must see that value under
    # its true min or its recomputed label would exceed the batch
    # pipeline's.
    b_vals = vals_t.join(affected_blocks, "block_key", "semi").persist()
    eff = (
        surv_t.join(b_vals.select("val_id"), "val_id", "semi")
        .groupBy("val_id").agg(F.min("rec_id").alias("eff"))
        .persist()
    )

    live_vals = (
        b_vals.join(dead_vals, "val_id", "left_anti")
        .join(eff, "val_id", "left")
        .withColumn("val_id", F.coalesce("eff", "val_id"))
        .drop("eff")
    )

    # Canonicalize logged endpoints via the PRE-retraction map (dead
    # mentions included — a dead value's endpoints must still resolve to
    # the dead value so its edges get dropped, not orphaned).
    canon = mmap_t.select(
        F.col("rec_id").alias("node"), F.col("val_id").alias("node_val")
    )
    b_edges = (
        edges_t.join(affected_blocks, "block_key", "semi")
        .join(canon.withColumnRenamed("node", "src")
              .withColumnRenamed("node_val", "src_val"), "src")
        .join(canon.withColumnRenamed("node", "dst")
              .withColumnRenamed("node_val", "dst_val"), "dst")
        .join(dead_vals.withColumnRenamed("val_id", "src_val"),
              "src_val", "left_anti")
        .join(dead_vals.withColumnRenamed("val_id", "dst_val"),
              "dst_val", "left_anti")
        .join(eff.select(F.col("val_id").alias("src_val"),
                         F.col("eff").alias("src_eff")), "src_val", "left")
        .join(eff.select(F.col("val_id").alias("dst_val"),
                         F.col("eff").alias("dst_eff")), "dst_val", "left")
        .select(
            F.coalesce("src_eff", "src_val").alias("src"),
            F.coalesce("dst_eff", "dst_val").alias("dst"),
            "block_key",
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    vertices = live_vals.select(
        F.col("val_id").alias("rec_id"), "block_key"
    ).distinct()
    new_labels = (
        assign_clusters_blocked(vertices, b_edges)
        .withColumnRenamed("rec_id", "val_id")
        .join(vertices.withColumnRenamed("rec_id", "val_id"), "val_id")
        .withColumn("pb", _pb(n_pb))
    )

    n_retracted = dead_mentions.count()
    n_dead = dead_vals.count()
    # renamed = the STORED id changes (its representative mention died
    # with a survivor left) — a subset of the min-changed trigger above.
    n_renamed = touched_min.where(F.col("eff") != F.col("val_id")).count()
    n_affected = affected_blocks.count()

    # ---- write-back (rule 10: EVERY payload materialized before the
    # FIRST write — all four lineages read the tables being overwritten).
    values_payload = (
        vals_t.join(affected_blocks, "block_key", "left_anti")
        .unionByName(live_vals)
        .localCheckpoint(eager=True)
    )
    map_payload = (
        surv_t.join(eff, "val_id", "left")
        .withColumn("val_id", F.coalesce("eff", "val_id"))
        .select([f.name for f in _MENTION_MAP_SCHEMA.fields])
        .localCheckpoint(eager=True)
    )
    edges_payload = (
        edges_t.join(affected_blocks, "block_key", "left_anti")
        .unionByName(b_edges.withColumn("pb", _pb(n_pb)))
        .select([f.name for f in _EDGES_SCHEMA.fields])
        .localCheckpoint(eager=True)
    )
    clusters_payload = (
        clusters_t.join(affected_blocks, "block_key", "left_anti")
        .unionByName(new_labels.select(
            [f.name for f in _CLUSTERS_SCHEMA.fields]
        ))
        .localCheckpoint(eager=True)
    )

    # Dynamic overwrite only replaces partitions PRESENT in a payload:
    # touched partitions a payload no longer covers (every row retracted)
    # must be deleted explicitly or their stale files survive.
    for name, payload in (
        ("values", values_payload), ("mention_map", map_payload),
        ("edges", edges_payload), ("clusters", clusters_payload),
    ):
        present = {r["pb"] for r in payload.select("pb").distinct().collect()}
        for pb in touched_pbs:
            if pb not in present:
                fs_delete(
                    spark, posixpath.join(state_dir, name, f"pb={pb}")
                )

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for name, payload in (
            ("values", values_payload), ("mention_map", map_payload),
            ("edges", edges_payload), ("clusters", clusters_payload),
        ):
            payload.write.mode("overwrite").partitionBy("pb").parquet(
                posixpath.join(state_dir, name)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    for df in (dead_mentions, mmap_t, surv_t, touched_min, b_vals, eff):
        df.unpersist()
    return {
        "retracted_mentions": n_retracted,
        "dead_values": n_dead,
        "renamed_values": n_renamed,
        "affected_blocks": n_affected,
    }


def mention_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Materialize mention-level labels over ALL batches folded so far —
    equals ``run_linkage`` over the concatenation of every batch."""
    mmap = _read_state(spark, state_dir, "mention_map", _MENTION_MAP_SCHEMA)
    clusters = _read_state(spark, state_dir, "clusters", _CLUSTERS_SCHEMA)
    return mmap.select("rec_id", "val_id").join(
        clusters.select("val_id", "cluster_id"), "val_id"
    ).select("rec_id", "cluster_id")


def publish_entities(
    spark: SparkSession, labels: DataFrame, entities_dir: str
) -> Dict[str, int]:
    """Maintain the durable PUBLISHED entity table next to a linkage
    state: carry entity ids from the last published assignment onto the
    given (rec_id, cluster_id) labels via
    :func:`..operators.cluster.stable_entity_ids`, and persist both
    views — ``<dir>/entities`` (per-cluster: entity_id, overlap, status)
    and ``<dir>/by_record`` (rec_id -> entity_id, the old side of the
    NEXT publish).

    Fresh-id uniqueness is per-PUBLISH, not global-prefix: a fixed
    prefix can collide across publishes (a later fold can mint
    ``e:<label>`` for a fresh fragment while an earlier publish's
    ``e:<label>`` still rides another cluster — min-id labels move).
    Each publish therefore mints under ``e<seq>.`` with ``seq`` read
    from and bumped in ``<dir>/_entities.json`` (same FS-metadata
    discipline as the state manifest).

    Rule-10 discipline: the carryover plan READS ``by_record`` and the
    write OVERWRITES it, so the resolved entity table is eagerly
    materialized (localCheckpoint) before the first write — a lazy plan
    would re-list the directory mid-overwrite.
    """
    from ..operators.cluster import stable_entity_ids

    root = entities_dir.rstrip("/")
    meta_path = posixpath.join(root, "_entities.json")
    by_record_path = posixpath.join(root, "by_record")
    seq = 0
    if fs_exists(spark, meta_path):
        seq = int(json.loads(fs_read_text(spark, meta_path))["seq"])
        old = spark.read.parquet(by_record_path).select(
            "rec_id", "entity_id"
        )
    else:
        old = spark.createDataFrame([], "rec_id string, entity_id string")
    ents = stable_entity_ids(
        old, labels, fresh_prefix=f"e{seq}."
    ).localCheckpoint(eager=True)
    by_record = labels.join(
        ents.select("cluster_id", "entity_id"), "cluster_id"
    ).select("rec_id", "entity_id")
    ents.write.mode("overwrite").parquet(posixpath.join(root, "entities"))
    by_record.write.mode("overwrite").parquet(by_record_path)
    fs_write_text(spark, meta_path, json.dumps({"seq": seq + 1}))
    counts = {
        r["status"]: int(r["n"])
        for r in ents.groupBy("status").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    return {
        "publish_seq": seq,
        "n_entities": int(ents.count()),
        "n_inherited": counts.get("inherited", 0),
        "n_contended": counts.get("contended", 0),
        "n_new": counts.get("new", 0),
    }
