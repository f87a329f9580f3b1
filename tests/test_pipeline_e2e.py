"""End-to-end linkage pipeline tests (north-rule acceptance).

* pairwise F1 >= 0.99 on labeled match pairs at shared (truth) blocking
  key, labels derived from the reference's equivalence families;
* per-turn text equality under stable (conv_id, turn_idx) ordering;
* extractor round-trip fidelity;
* salted and unsalted pair generation produce identical pair sets;
* checkpointed resume is a no-op re-run (byte-identical clusters).
"""
import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from postal_address_spark.core import AddressRecord
from postal_address_spark.operators.blocking import with_block_key
from postal_address_spark.operators.extract import extract_mentions
from postal_address_spark.operators.normalize_op import normalize_mentions
from postal_address_spark.operators.pairs import candidate_pairs
from postal_address_spark.operators.scoring import score_pairs
from postal_address_spark.plans.pipeline import LinkageConfig, run_linkage
from postal_address_spark.refdata.territory_tables import FOREIGN_TERRITORIES_MAPPING
from postal_address_spark.synth import (
    entity_profile,
    synth_transcripts_pandas,
    synth_transcripts_spark,
)

SEED = 42
N_CONVS = 400
N_ENTITIES = 120


@pytest.fixture(scope="module")
def fixture_data():
    return synth_transcripts_pandas(SEED, N_CONVS, N_ENTITIES)


@pytest.fixture(scope="module")
def transcripts(spark, fixture_data):
    transcripts_pd, _ = fixture_data
    return spark.createDataFrame(transcripts_pd).cache()


def truth_block_key(entity_idx):
    """Ground-truth blocking key parts from the canonical entity profile,
    via the scalar core (independent of the Spark path)."""
    profile = entity_profile(SEED, entity_idx)
    canonical_country, canonical_sub = profile["variants"][0]
    rec = AddressRecord(
        strict=False,
        line1=profile["line1"],
        postal_code=profile["postal_code"],
        city_name=profile["city_name"],
        country_code=canonical_country,
        subdivision_code=canonical_sub,
    )
    top = FOREIGN_TERRITORIES_MAPPING.get(rec.country_code, rec.country_code)
    return (top, rec.postal_code)


def labeled_pairs(truth_pd: pd.DataFrame) -> pd.DataFrame:
    """All mention pairs at a shared truth blocking key, labeled by
    entity equality (FIXTURES.md §2)."""
    truth = truth_pd.copy()
    eidx = truth["entity_id"].str.slice(1).astype(int)
    keys = {int(i): truth_block_key(int(i)) for i in eidx.unique()}
    truth["bk"] = [keys[int(i)] for i in eidx]
    rows = []
    for _, grp in truth.groupby("bk"):
        recs = list(zip(grp["rec_id"], grp["entity_id"]))
        for (ra, ea), (rb, eb) in itertools.combinations(sorted(recs), 2):
            rows.append((ra, rb, ea == eb))
    return pd.DataFrame(rows, columns=["rec_id_a", "rec_id_b", "is_match"])


def test_extract_round_trip(spark, transcripts, fixture_data):
    _, truth_pd = fixture_data
    got = extract_mentions(transcripts).toPandas().set_index("rec_id")
    assert len(got) == len(truth_pd)
    want = truth_pd.set_index("rec_id")
    for field in ["line1", "line2", "postal_code", "city_name",
                  "country_code", "subdivision_code"]:
        g = got[field].reindex(want.index)
        w = want[field]
        mismatch = ~((g.isna() & w.isna()) | (g == w))
        assert mismatch.sum() == 0, f"{field}: {g[mismatch].head()} vs {w[mismatch].head()}"


def test_reconciliation_blocks(spark, transcripts, fixture_data):
    """Every mention of one entity resolves to one blocking key — the
    reference's equivalence classes survive the vectorized graft."""
    _, truth_pd = fixture_data
    blocked = with_block_key(
        normalize_mentions(extract_mentions(transcripts))
    ).select("rec_id", "block_key").toPandas()
    merged = blocked.merge(truth_pd[["rec_id", "entity_id"]], on="rec_id")
    assert merged["block_key"].notna().all()
    per_entity = merged.groupby("entity_id")["block_key"].nunique()
    assert (per_entity == 1).all(), per_entity[per_entity > 1]


def test_pipeline_f1(spark, transcripts, fixture_data):
    _, truth_pd = fixture_data
    result = run_linkage(spark, transcripts, LinkageConfig())
    clusters = result["clusters"].toPandas()

    labels = labeled_pairs(truth_pd)
    cl = clusters.set_index("rec_id")["cluster_id"]
    pred_same = (
        cl.reindex(labels["rec_id_a"]).to_numpy()
        == cl.reindex(labels["rec_id_b"]).to_numpy()
    )
    truth_same = labels["is_match"].to_numpy()
    tp = int((pred_same & truth_same).sum())
    fp = int((pred_same & ~truth_same).sum())
    fn = int((~pred_same & truth_same).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    assert f1 >= 0.99, (f1, precision, recall, tp, fp, fn)


def test_salting_equivalence(spark, transcripts):
    """Hot-block salted route and plain route yield the same pair set."""
    blocked = with_block_key(
        normalize_mentions(extract_mentions(transcripts))
    ).cache()
    plain = candidate_pairs(blocked, hot_threshold=10**9)
    salted = candidate_pairs(blocked, hot_threshold=1, n_salt=4)
    key = ["rec_id_a", "rec_id_b"]
    assert plain.count() == salted.count()
    assert plain.select(key).exceptAll(salted.select(key)).count() == 0


def test_stable_order_text_equality(spark, transcripts, tmp_path):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after a round-trip through the sink."""
    from postal_address_spark.sources.io import write_transcripts_stable

    path = str(tmp_path / "transcripts_out")
    write_transcripts_stable(transcripts, path)
    back = spark.read.parquet(path)
    before = transcripts.select("conv_id", "turn_idx", "text").toPandas()
    after = back.select("conv_id", "turn_idx", "text").toPandas()
    before = before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    after = after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_checkpoint_resume(spark, transcripts, tmp_path):
    """Stage-level resume: second run re-reads every checkpoint (resumed
    flags all True) and yields byte-identical clusters."""
    root = str(tmp_path / "ckpt")
    cfg = LinkageConfig(checkpoint_root=root, input_fingerprint="t1")
    first = run_linkage(spark, transcripts, cfg)
    clusters_1 = sorted(map(tuple, first["clusters"].collect()))
    assert all(not rec["resumed"] for rec in first["lineage"])

    cfg2 = LinkageConfig(checkpoint_root=root, input_fingerprint="t1")
    second = run_linkage(spark, transcripts, cfg2)
    clusters_2 = sorted(map(tuple, second["clusters"].collect()))
    assert all(rec["resumed"] for rec in second["lineage"])
    assert clusters_1 == clusters_2


def test_distributed_synth_matches_driver(spark, fixture_data):
    transcripts_pd, _ = fixture_data
    dist = synth_transcripts_spark(
        spark, SEED, N_CONVS, N_ENTITIES, partitions=7
    ).toPandas()
    a = transcripts_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = dist.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a["turn_idx"] = a["turn_idx"].astype("int32")
    b["turn_idx"] = b["turn_idx"].astype("int32")
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_entity_skew_survives_refinement_and_salting_is_lossless(spark):
    """hot_entity_share concentrates mentions on ONE entity whose refined
    (postal, house#) key cannot be split further by key refinement — the
    exact shape the salted hot route exists for (stress_bench.py).  The
    salted and plain pair sets over that skewed input must be identical,
    and the skew must genuinely survive refinement (one dominant
    join_key), or the stress ablation would be measuring nothing."""
    skewed = synth_transcripts_spark(
        spark, SEED, N_CONVS, N_ENTITIES, hot_entity_share=0.3, partitions=4
    )
    blocked = with_block_key(
        normalize_mentions(extract_mentions(skewed))
    ).cache()
    plain = candidate_pairs(blocked, hot_threshold=10**9)
    salted = candidate_pairs(blocked, hot_threshold=20, n_salt=8)
    key = ["rec_id_a", "rec_id_b"]
    assert plain.count() == salted.count()
    assert plain.select(key).exceptAll(salted.select(key)).count() == 0

    # the dominant refined key: >= ~25% of mentions (0.3 share minus the
    # uniform draw that also lands on entity 0 occasionally, minus typo
    # noise on the house number / postal fields)
    refined = blocked.withColumn(
        "join_key",
        F.concat_ws(
            "#", F.col("block_key"),
            F.coalesce(F.regexp_extract("line1", r"^(\d+)", 1), F.lit("")),
        ),
    )
    top = (
        refined.groupBy("join_key").count()
        .orderBy(F.desc("count")).limit(1).collect()[0]
    )
    n_mentions = blocked.count()
    assert top["count"] >= 0.2 * n_mentions, (top, n_mentions)
    blocked.unpersist()


def test_value_collapse_is_label_preserving(spark, transcripts):
    """run_linkage scores one representative per distinct normalized
    (block, line1, city, postal) tuple; assert the resulting mention
    labels are IDENTICAL to the direct mention-level path (candidate
    pairs + scoring + closure over raw mentions), on both the standard
    fixture and an entity-skewed one."""
    from postal_address_spark.operators.cluster import assign_clusters_blocked

    skewed = synth_transcripts_spark(
        spark, SEED, N_CONVS, N_ENTITIES, hot_entity_share=0.3, partitions=4
    )
    for source in (transcripts, skewed):
        blocked = with_block_key(
            normalize_mentions(extract_mentions(source))
        ).cache()
        edges = score_pairs(candidate_pairs(blocked), threshold=0.82)
        mention_level = {
            r["rec_id"]: r["cluster_id"]
            for r in assign_clusters_blocked(
                blocked.where(F.col("block_key").isNotNull()),
                edges.select(
                    F.col("rec_id_a").alias("src"),
                    F.col("rec_id_b").alias("dst"),
                    "block_key",
                ),
            ).collect()
        }
        value_level = {
            r["rec_id"]: r["cluster_id"]
            for r in run_linkage(spark, source, LinkageConfig())[
                "clusters"
            ].collect()
        }
        assert mention_level == value_level
        blocked.unpersist()
