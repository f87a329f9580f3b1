"""End-to-end record-linkage pipeline + checkpointed stage runner.

Stage graph (north rule):

    transcripts --extract--> mentions --normalize--> normalized
      --block_key--> blocked --self-join(salted)--> pairs
      --score--> edges --large/small-star CC--> clusters

Each stage can be checkpointed: its output is written to a deterministic
content-addressed directory (``<root>/<stage>_<fingerprint>``) derived
from the stage name, its parameters, and the upstream fingerprint chain.
A stage whose ``_SUCCESS`` marker exists is NOT recomputed — a killed run
re-invoked with the same inputs resumes after the last completed stage and
produces byte-identical results (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Per-stage lineage records (stage, fingerprint, rows, wall ms, output path)
are appended to ``<root>/lineage.jsonl``.
"""
from __future__ import annotations

import hashlib
import json
import posixpath
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fs import fs_exists, fs_read_text, fs_write_text
from ..operators.blocking import with_block_key
from ..operators.cluster import assign_clusters_blocked
from ..operators.extract import extract_mentions
from ..operators.normalize_op import normalize_mentions
from ..operators.pairs import candidate_pairs
from ..operators.scoring import DEFAULT_THRESHOLD, score_pairs
from ..sources.io import read_table, write_table


def _fingerprint(*parts: object) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


@dataclass
class LinkageConfig:
    strict: bool = False
    replace_city_name: bool = True
    # None = block on the FULL canonical postal (see blocking.py scale
    # rationale); an int keeps the coarser prefix variant available.
    postal_prefix_len: Optional[int] = None
    # NOTE: hot_threshold / max_block_size count DISTINCT VALUE nodes per
    # refined block (see the "score values, not mentions" collapse in
    # run_linkage), not raw mentions.
    hot_threshold: int = 20000
    n_salt: int = 16
    max_block_size: Optional[int] = None
    threshold: float = DEFAULT_THRESHOLD
    checkpoint_root: Optional[str] = None
    input_fingerprint: str = "input"

    def params_of(self, stage: str) -> Dict[str, object]:
        return {
            "mentions": {},
            "normalized": {
                "strict": self.strict,
                "replace_city_name": self.replace_city_name,
            },
            "blocked": {"postal_prefix_len": self.postal_prefix_len},
            "edges": {
                "hot_threshold": self.hot_threshold,
                "n_salt": self.n_salt,
                "threshold": self.threshold,
                "max_block_size": self.max_block_size,
            },
            "clusters": {},
        }[stage]


@dataclass
class StageRunner:
    spark: SparkSession
    config: LinkageConfig
    lineage: List[Dict] = field(default_factory=list)
    _chain: str = ""

    def __post_init__(self) -> None:
        self._chain = self.config.input_fingerprint

    def run(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage; checkpoint if a root is configured."""
        self._chain = _fingerprint(self._chain, stage, self.config.params_of(stage))
        root = self.config.checkpoint_root
        if root is None:
            return build()
        # Checkpoint probes go through the Hadoop FileSystem so the root
        # may be a remote URI (hdfs://, s3a://) under cluster spark-submit.
        path = posixpath.join(root, f"{stage}_{self._chain}")
        started = time.time()
        resumed = fs_exists(self.spark, posixpath.join(path, "_SUCCESS"))
        if not resumed:
            write_table(build(), path)
        out = read_table(self.spark, path)
        record = {
            "stage": stage,
            "fingerprint": self._chain,
            "path": path,
            "resumed": resumed,
            "rows": out.count(),
            "ms": int((time.time() - started) * 1000),
        }
        self.lineage.append(record)
        # Append = read-modify-write through the FileSystem API (the
        # driver is the only writer; FSDataOutputStream append() is not
        # supported on every Hadoop FS, e.g. the raw local one).
        log_path = posixpath.join(root, "lineage.jsonl")
        prior = fs_read_text(self.spark, log_path) if fs_exists(
            self.spark, log_path
        ) else ""
        if prior and not prior.endswith("\n"):
            prior += "\n"
        fs_write_text(self.spark, log_path, prior + json.dumps(record) + "\n")
        return out


def run_linkage(
    spark: SparkSession,
    transcripts: DataFrame,
    config: Optional[LinkageConfig] = None,
) -> Dict[str, DataFrame]:
    """Full pipeline; returns every stage output keyed by stage name."""
    config = config or LinkageConfig()
    runner = StageRunner(spark, config)

    from pyspark.sql import Observation

    observations: Dict[str, Observation] = {}

    def observed(name: str, df: DataFrame, *exprs) -> DataFrame:
        """Attach named metrics (north rule: per-partition lineage +
        METRICS): accumulated executor-side during the stage's own action,
        zero extra jobs.  Read after any action via
        ``result['observations'][name].get``."""
        obs = Observation(name)
        observations[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"), *exprs)

    mentions = runner.run("mentions", lambda: extract_mentions(transcripts))
    normalized = runner.run(
        "normalized",
        lambda: normalize_mentions(
            mentions, strict=config.strict,
            replace_city_name=config.replace_city_name,
        ),
    )
    from pyspark.sql import Window

    def _with_value_id(df: DataFrame) -> DataFrame:
        # val_id = min rec_id over mentions sharing the exact scoring
        # tuple (see the "score values, not mentions" note below); window
        # partitioning groups NULLs together, matching the scorer's
        # null-safe equality semantics.
        w = Window.partitionBy(
            "block_key", "line1", "city_name", "postal_code"
        )
        return df.withColumn("val_id", F.min("rec_id").over(w))

    blocked = runner.run(
        "blocked",
        lambda: observed(
            "blocked",
            _with_value_id(with_block_key(normalized, config.postal_prefix_len)),
            F.count(F.when(F.col("block_key").isNull(), 1)).alias("null_keys"),
            F.count(F.when(~F.col("is_valid"), 1)).alias("invalid_mentions"),
        ),
    )
    if config.checkpoint_root is None:
        # blocked feeds the histogram, both self-join sides, and the
        # cluster vertex set; without a parquet checkpoint it must be
        # cached or the whole UDF chain recomputes per consumer.
        blocked = blocked.persist()
    # Score VALUES, not mentions.  The pair score is a pure function of
    # the normalized (line1, city_name, postal_code) tuple, and two
    # mentions with the identical tuple in the same block always score
    # exactly 1.0 together (base 0.5 + both string features at 1.0) — an
    # automatic above-threshold clique.  So candidate generation and
    # scoring run over one representative mention per distinct tuple
    # (rec_id == val_id), and the mention-level clustering is recovered by
    # mapping each mention through its val_id afterward.  Exactly
    # label-preserving: the mention graph is the value graph with each
    # value node blown up into its clique, which has the same connected
    # components, and min-rec_id labels agree because each value's id IS
    # its group's min rec_id (equivalence asserted in
    # tests/test_pipeline_e2e.py).  At scale this is the difference
    # between ~k²/2 scored pairs for an entity mentioned k times and
    # ~(distinct noisy renders)²/2 — measured 12.8M -> ~0.3M pairs on the
    # hot-entity stress input (scripts/stress_bench.py) — and it shrinks
    # the normal path too (clean duplicate mentions collapse).
    values = blocked.where(F.col("rec_id") == F.col("val_id"))
    edges = runner.run(
        "edges",
        lambda: observed(
            "edges",
            score_pairs(
                candidate_pairs(
                    values,
                    hot_threshold=config.hot_threshold,
                    n_salt=config.n_salt,
                    max_block_size=config.max_block_size,
                    threshold=config.threshold,
                ),
                threshold=config.threshold,
            ),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        ),
    )
    if config.checkpoint_root is None:
        edges = edges.persist()
    # Pair edges are block-local by construction, so the per-block closure
    # (one shuffle, no iterative rounds) replaces global star CC here; the
    # general operator remains in operators/cluster.py for arbitrary graphs.
    clusters = runner.run(
        "clusters",
        lambda: assign_clusters_blocked(
            values.where(F.col("block_key").isNotNull()),
            edges.select(
                F.col("rec_id_a").alias("src"),
                F.col("rec_id_b").alias("dst"),
                "block_key",
            ),
        )
        .withColumnRenamed("rec_id", "val_id")
        .withColumnRenamed("cluster_id", "value_cluster_id")
        .join(
            blocked.where(F.col("block_key").isNotNull()).select(
                "rec_id", "val_id"
            ),
            "val_id",
        )
        .select("rec_id", F.col("value_cluster_id").alias("cluster_id")),
    )
    return {
        "mentions": mentions,
        "normalized": normalized,
        "blocked": blocked,
        "edges": edges,
        "clusters": clusters,
        "lineage": runner.lineage,  # type: ignore[dict-item]
        "observations": observations,  # type: ignore[dict-item]
    }
