"""jobs/link.py — the spark-submit deploy surface: runs end-to-end on a
parquet transcript table, writes clusters, resumes idempotently."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_link_job_end_to_end(spark, tmp_path):
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "clusters")
    ckpt = str(tmp_path / "ckpt")
    synth_transcripts_spark(spark, seed=7, n_convs=60, n_entities=25).write.parquet(inp)

    summary = link.main(
        ["--input", inp, "--output", out, "--checkpoint", ckpt], spark=spark
    )
    assert summary["n_mentions"] > 0
    assert 0 < summary["n_clusters"] <= summary["n_mentions"]
    assert all(not s["resumed"] for s in summary["stages"])
    # executor-side observed metrics populated by the stage actions
    assert summary["metrics"]["blocked"]["rows"] == summary["n_mentions"]
    assert summary["metrics"]["edges"]["min_score"] is None or (
        summary["metrics"]["edges"]["min_score"] >= 0.82
    )

    first = {
        tuple(sorted(r.asDict().items()))
        for r in spark.read.parquet(out).collect()
    }

    # Re-submit: every stage must resume from checkpoint, output identical.
    summary2 = link.main(
        ["--input", inp, "--output", out + "2", "--checkpoint", ckpt],
        spark=spark,
    )
    assert all(s["resumed"] for s in summary2["stages"])
    second = {
        tuple(sorted(r.asDict().items()))
        for r in spark.read.parquet(out + "2").collect()
    }
    assert first == second

    # lineage file records every stage run (5 stages x 2 submissions)
    lineage_lines = [
        json.loads(line)
        for line in open(os.path.join(ckpt, "lineage.jsonl"), encoding="utf-8")
    ]
    assert len(lineage_lines) == len(summary["stages"]) + len(summary2["stages"])
    # resumed stages are marked in the metrics dict, not silently absent
    assert summary2["metrics"]["blocked"] == "resumed"
    assert summary2["metrics"]["edges"] == "resumed"


def test_link_job_stale_resume_invalidated(spark, tmp_path):
    """Content-addressed resume: mutating the data at the SAME input path
    must invalidate every checkpointed stage (the round-1 verdict's
    path-keyed fingerprint silently resumed stale stages)."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    ckpt = str(tmp_path / "ckpt")
    synth_transcripts_spark(spark, seed=7, n_convs=40, n_entities=20).write.parquet(inp)
    s1 = link.main(
        ["--input", inp, "--output", str(tmp_path / "c1"), "--checkpoint", ckpt],
        spark=spark,
    )
    assert all(not s["resumed"] for s in s1["stages"])

    # overwrite the same path with DIFFERENT data
    synth_transcripts_spark(spark, seed=8, n_convs=40, n_entities=20).write.mode(
        "overwrite"
    ).parquet(inp)
    s2 = link.main(
        ["--input", inp, "--output", str(tmp_path / "c2"), "--checkpoint", ckpt],
        spark=spark,
    )
    assert s2["input_fingerprint"] != s1["input_fingerprint"]
    assert all(not s["resumed"] for s in s2["stages"])

    # unchanged data at the same path still resumes
    s3 = link.main(
        ["--input", inp, "--output", str(tmp_path / "c3"), "--checkpoint", ckpt],
        spark=spark,
    )
    assert s3["input_fingerprint"] == s2["input_fingerprint"]
    assert all(s["resumed"] for s in s3["stages"])


def test_link_job_golden_output(spark, tmp_path):
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "clusters")
    gold = str(tmp_path / "goldens")
    synth_transcripts_spark(spark, seed=11, n_convs=60, n_entities=25).write.parquet(inp)

    summary = link.main(
        ["--input", inp, "--output", out, "--golden-output", gold], spark=spark
    )
    assert summary["n_golden"] == summary["n_clusters"]
    goldens = spark.read.parquet(gold)
    assert set(goldens.columns) == {
        "cluster_id", "n_records", "rep_rec_id",
        "line1", "line2", "postal_code", "city_name", "top_country",
    }
    rows = goldens.collect()
    # every golden row elects a line1 + country (always-present fields) and
    # its representative is a member of its own cluster label space
    assert all(r.line1 is not None and r.top_country is not None for r in rows)
    assert sum(r.n_records for r in rows) == summary["n_mentions"]


def test_link_job_entity_index(spark, tmp_path):
    """--entity-index-output: the entity↔conversation footprint matches a
    driver-side recompute over the written clusters joined to the mention
    provenance, and the two directions are mutually consistent."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "clusters")
    idx = str(tmp_path / "entity_index")
    synth_transcripts_spark(
        spark, seed=7, n_convs=60, n_entities=25
    ).write.parquet(inp)

    summary = link.main(
        ["--input", inp, "--output", out, "--entity-index-output", idx],
        spark=spark,
    )
    assert summary["entity_index"] == {
        "by_entity": f"{idx}/by_entity", "by_conv": f"{idx}/by_conv",
    }
    by_entity = spark.read.parquet(f"{idx}/by_entity").collect()
    by_conv = spark.read.parquet(f"{idx}/by_conv").collect()
    assert len(by_entity) == summary["n_clusters"]
    # total linked mentions agree across both directions and the clusters
    assert (
        sum(r["n_mentions"] for r in by_entity)
        == sum(r["n_linked_mentions"] for r in by_conv)
        == summary["n_mentions"]
    )
    # footprint sanity: every entity touches >= 1 conversation, and no
    # conversation claims more entities than it has linked mentions
    assert all(r["n_convs"] >= 1 for r in by_entity)
    assert all(1 <= r["n_entities"] <= r["n_linked_mentions"] for r in by_conv)

    # spot-verify one entity's n_convs against a direct recompute
    from pyspark.sql import functions as F

    from postal_address_spark.operators.extract import extract_mentions

    mentions = extract_mentions(spark.read.parquet(inp))
    joined = mentions.select("rec_id", "conv_id").join(
        spark.read.parquet(out), "rec_id"
    )
    want = {
        r["cluster_id"]: r["n"]
        for r in joined.groupBy("cluster_id")
        .agg(F.countDistinct("conv_id").alias("n"))
        .collect()
    }
    got = {r["cluster_id"]: r["n_convs"] for r in by_entity}
    assert got == want


def test_link_job_stable_entities_loop(spark, tmp_path):
    """--entities-output / --previous-entities: the bootstrap run mints
    fresh ids for every cluster; a relink of the SAME input fed the
    bootstrap's by_record table must inherit EVERY id unchanged — the
    loop invariant that makes the entity table publishable."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    synth_transcripts_spark(
        spark, seed=7, n_convs=60, n_entities=25
    ).write.parquet(inp)

    e1 = str(tmp_path / "ent1")
    s1 = link.main(
        ["--input", inp, "--output", str(tmp_path / "c1"),
         "--entities-output", e1],
        spark=spark,
    )
    ents1 = spark.read.parquet(f"{e1}/entities").collect()
    assert len(ents1) == s1["n_clusters"]
    # bootstrap: no previous table -> every cluster mints a fresh id
    assert all(r.status == "new" and r.n_overlap == 0 for r in ents1)
    prefix = f"e{s1['input_fingerprint'][:8]}:"
    assert all(r.entity_id == prefix + r.cluster_id for r in ents1)
    by_rec1 = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{e1}/by_record").collect()
    }
    assert len(by_rec1) == s1["n_mentions"]

    # relink the same input against the bootstrap's record table
    e2 = str(tmp_path / "ent2")
    link.main(
        ["--input", inp, "--output", str(tmp_path / "c2"),
         "--entities-output", e2, "--previous-entities", f"{e1}/by_record"],
        spark=spark,
    )
    ents2 = spark.read.parquet(f"{e2}/entities").collect()
    assert all(
        r.status == "inherited" and r.n_overlap == r.n_members for r in ents2
    )
    by_rec2 = {
        r.rec_id: r.entity_id
        for r in spark.read.parquet(f"{e2}/by_record").collect()
    }
    assert by_rec2 == by_rec1


def test_link_job_triplets_output(spark, tmp_path):
    """--triplets-output: every written triplet's positive shares the
    anchor's cluster and its hard negative does not (checked against the
    written cluster table), scores ride in similarity orientation."""
    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "clusters")
    trip = str(tmp_path / "triplets")
    # hot_share packs several entities into one postal block so
    # cross-cluster near-misses (the hard negatives) actually exist
    synth_transcripts_spark(
        spark, seed=7, n_convs=80, n_entities=25, hot_share=0.3
    ).write.parquet(inp)

    summary = link.main(
        ["--input", inp, "--output", out, "--triplets-output", trip],
        spark=spark,
    )
    rows = spark.read.parquet(trip).collect()
    assert summary["n_triplets"] == len(rows) > 0
    clusters = {
        r.rec_id: r.cluster_id for r in spark.read.parquet(out).collect()
    }
    seen = set()
    for r in rows:
        assert r.rec_id not in seen  # one triplet per anchor
        seen.add(r.rec_id)
        assert clusters[r.rec_id] == r.cluster_id
        assert clusters[r.pos_id] == r.cluster_id
        assert clusters[r.neg_id] != r.cluster_id
        assert 0.0 <= r.neg_score <= 1.0 and 0.0 <= r.pos_score <= 1.0


def test_link_job_cannot_links(spark, tmp_path):
    """--cannot-links: a clerical 'NOT the same entity' pair inside a
    multi-member cluster splits the published clustering (or, when both
    mentions normalize to the identical value tuple, stays honestly
    reported as unresolvable); untouched clusters keep their labels."""
    from collections import Counter

    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts")
    base_out = str(tmp_path / "clusters_base")
    synth_transcripts_spark(
        spark, seed=11, n_convs=80, n_entities=25
    ).write.parquet(inp)

    link.main(["--input", inp, "--output", base_out], spark=spark)
    base = {
        r.rec_id: r.cluster_id
        for r in spark.read.parquet(base_out).collect()
    }
    # pick the largest cluster and cannot-link its extreme members
    biggest = Counter(base.values()).most_common(1)[0][0]
    members = sorted(k for k, v in base.items() if v == biggest)
    assert len(members) >= 2
    pair = (members[0], members[-1])
    cl_path = str(tmp_path / "cannot")
    spark.createDataFrame([pair], "rec_id_a string, rec_id_b string") \
        .write.parquet(cl_path)

    out = str(tmp_path / "clusters_constrained")
    viol_out = str(tmp_path / "violations")
    summary = link.main(
        [
            "--input", inp, "--output", out,
            "--cannot-links", cl_path,
            "--violations-output", viol_out,
        ],
        spark=spark,
    )
    assert summary["n_cannot_link_violations"] == 1
    viol = spark.read.parquet(viol_out).collect()
    assert len(viol) == 1
    assert {viol[0].src, viol[0].dst} == set(pair)

    got = {r.rec_id: r.cluster_id for r in spark.read.parquet(out).collect()}
    assert set(got) == set(base)  # no mention lost or invented
    if summary.get("n_violations_unresolvable", 0) == 0:
        assert got[pair[0]] != got[pair[1]]  # the constraint now holds
    # every cluster the constraint didn't touch is label-identical
    for rec, c in base.items():
        if c != biggest:
            assert got[rec] == base[rec]


def test_link_job_expectation_gate(spark, tmp_path):
    """--expect on the linkage job: the report rides the summary, and
    --expect-fail-hard aborts with exit 3 BEFORE any linkage stage runs
    (no cluster output is written)."""
    import json as _json

    import pytest as _pytest

    from postal_address_spark.synth import synth_transcripts_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import link

    inp = str(tmp_path / "transcripts_ex")
    synth_transcripts_spark(
        spark, seed=7, n_convs=20, n_entities=10
    ).write.parquet(inp)

    spec_ok = [
        {"name": "conv_set", "column": "conv_id", "kind": "not_null"},
        {"name": "role_domain", "column": "role", "kind": "in_set",
         "values": ["user", "assistant", "system", "tool"]},
    ]
    ok_path = str(tmp_path / "ok.json")
    with open(ok_path, "w") as fh:
        _json.dump(spec_ok, fh)
    out = str(tmp_path / "clusters_ex")
    summary = link.main(
        ["--input", inp, "--output", out, "--expect", ok_path], spark=spark
    )
    assert all(v["passed"] for v in summary["expectations"].values())
    assert os.path.isdir(f"{out}_expectations")

    # an impossible check + fail-hard: abort before any linkage output
    spec_bad = [{"name": "conv_unique", "column": "conv_id",
                 "kind": "unique"}]
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as fh:
        _json.dump(spec_bad, fh)
    out2 = str(tmp_path / "clusters_ex2")
    with _pytest.raises(SystemExit) as ei:
        link.main(
            ["--input", inp, "--output", out2, "--expect", bad_path,
             "--expect-fail-hard"],
            spark=spark,
        )
    assert ei.value.code == 3
    assert not os.path.exists(out2)
