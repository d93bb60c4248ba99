"""Training-data pipeline operator tests over the driver testdata
(documents / embeddings at sf0.001), verified against exact
in-process computations."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    d.count()
    return d


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    e.count()
    return e


# --------------------------------------------------------------- text


def test_token_count_matches_python(docs):
    rows = docs.select("doc_id", "text", text.token_count(F.col("text"))
                       .alias("n")).collect()
    for r in rows:
        assert r.n == len(r.text.split()), r.doc_id


def test_quality_features(docs):
    out = docs.select("doc_id", "text", *text.quality_features(F.col("text")))
    for r in out.limit(100).collect():
        assert r.n_chars == len(r.text)
        assert r.n_tokens == len(r.text.split())
        assert r.n_punct == sum(c in ".,;:!?" for c in r.text)
        toks = r.text.split()
        assert r.n_stopwords == sum(
            toks.count(w) for w in text.LANG_MARKERS["en"]
        )


def test_bpe_token_count_matches_python(docs):
    import re as _re

    # Python re uses [A-Za-z]/[0-9]-style classes; \p{L} is Java/RE2.
    # Synthetic corpus is ASCII, so the ASCII transliteration is the
    # same tokenizer.
    pat = _re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    )
    rows = docs.select(
        "doc_id", "text",
        text.bpe_token_count(F.col("text")).alias("n"),
    ).limit(200).collect()
    for r in rows:
        assert r.n == len(pat.findall(r.text)), r.doc_id


def test_detect_lang_deterministic(docs):
    out = docs.select("doc_id", text.detect_lang(F.col("text")).alias("l"))
    langs = {r.l for r in out.collect()}
    assert langs <= {"en", "de", "fr", "es", "und"}
    # corpus is English-vocab word salad: 'the' dominates wherever present
    out2 = docs.select(
        text.detect_lang(F.col("text")).alias("l"),
        text.word_count(F.col("text"), "the").alias("nthe"),
    )
    for r in out2.collect():
        if r.nthe > 0:
            assert r.l == "en"


def test_md5_fingerprint_matches_python(docs):
    import hashlib
    rows = docs.select("text", text.md5_fingerprint64(F.col("text"))
                       .alias("fp")).limit(50).collect()
    for r in rows:
        norm = " ".join(r.text.lower().split())
        expect = int(hashlib.md5(norm.encode()).hexdigest()[:16], 16)
        signed = expect - (1 << 64) if expect >= 1 << 63 else expect
        assert r.fp == signed


def test_rolling_fingerprint_stable(docs):
    a = {r.doc_id: r.h for r in docs.select(
        "doc_id", text.rolling_fingerprint64(F.col("text")).alias("h")).collect()}
    b = {r.doc_id: r.h for r in docs.select(
        "doc_id", text.rolling_fingerprint64(F.col("text")).alias("h")).collect()}
    assert a == b and len(set(a.values())) == len(a)  # distinct texts → distinct


# --------------------------------------------------------------- dedup


def test_exact_dedup_all_distinct(docs):
    kept = dedup.exact_dedup(docs, "text", "doc_id")
    assert kept.count() == docs.count()  # corpus has no exact dups


def test_exact_dedup_with_dups(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb")],
        "doc_id long, text string",
    )
    kept = dedup.exact_dedup(df, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 4]


def test_minhash_estimates_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    variant = base.replace("lazy", "sleepy").replace("quick", "rapid")
    df = spark.createDataFrame(
        [(1, base), (2, variant), (3, "completely different content here")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: np.array(r.signature)
            for r in dedup.minhash_signatures(df, "text", "doc_id").collect()}
    est12 = (sigs[1] == sigs[2]).mean()
    est13 = (sigs[1] == sigs[3]).mean()
    sa = dedup._shingle_hashes(" ".join(base.lower().split()), 3)
    sb = dedup._shingle_hashes(" ".join(variant.lower().split()), 3)
    true12 = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    assert abs(est12 - true12) < 0.15
    assert est12 > 0.6 > est13


def test_near_dup_pairs_exact_verified(spark, docs):
    # plant two near-duplicates of real docs
    two = docs.limit(2).collect()
    extra = spark.createDataFrame(
        [(9001, two[0].text + " extra tail words"),
         (9002, two[1].text.replace("the", "a "))],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    pairs = dedup.near_dup_pairs(corpus, "text", "doc_id", threshold=0.6)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (two[0].doc_id, 9001) in got
    assert got[(two[0].doc_id, 9001)] >= 0.6
    # verification is EXACT jaccard
    na = " ".join(two[0].text.lower().split())
    nb = " ".join((two[0].text + " extra tail words").lower().split())
    sa, sb = dedup._shingle_hashes(na, 3), dedup._shingle_hashes(nb, 3)
    true = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    assert got[(two[0].doc_id, 9001)] == pytest.approx(true, abs=1e-12)


def test_simhash_near_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("delta", "delta2")
    far = "totally unrelated words in this one nothing shared at all"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sim = dedup.simhash64(df, "text", "doc_id")
    pairs = dedup.simhash_near_pairs(sim, "doc_id", max_hamming=7, blocks=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


# --------------------------------------------------------------- similarity


def test_brute_force_topk_exact(emb):
    pdf = emb.toPandas()
    queries = [(int(r.vec_id), list(r.embedding)) for r in emb.limit(3).collect()]
    out = similarity.brute_force_topk(emb, queries, k=5)
    got = out.toPandas().sort_values(["query_id", "rank"])
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        q /= np.linalg.norm(q)
        sims = M @ q
        order = np.lexsort((ids, -sims))[:5]
        expect = list(ids[order])
        mine = list(got[got.query_id == qid]["vec_id"])
        assert mine == expect, (qid, mine, expect)


def test_lsh_topk_recall(emb):
    queries = [(int(r.vec_id), list(r.embedding)) for r in emb.limit(5).collect()]
    exact = similarity.brute_force_topk(emb, queries, k=5).toPandas()
    approx = similarity.lsh_bucket_topk(emb, queries, k=5, dim=64,
                                        num_bits=8).toPandas()
    # every query's own vector is in its bucket → rank-1 self-hit
    for qid, _ in queries:
        a = approx[approx.query_id == qid]
        assert len(a) >= 1 and a.iloc[0]["vec_id"] == qid
    # recall@5 is approximate but should be nontrivial
    hits = tot = 0
    for qid, _ in queries:
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.4


def test_cosine_pairs_blocked(emb):
    out = similarity.cosine_pairs_ge(emb, 0.95, block_col="label")
    pdf = emb.toPandas()
    by_label = {}
    for lbl, g in pdf.groupby("label"):
        M = np.vstack(g["embedding"].to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = M @ M.T
        ids = g["vec_id"].to_numpy()
        ia, ib = np.where(np.triu(sims >= 0.95, k=1))
        for x, y in zip(ids[ia], ids[ib]):
            by_label[(min(x, y), max(x, y))] = True
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == set(by_label)


# --------------------------------------------------------------- multimodal


def test_multimodal_plumbing(docs):
    media = multimodal.attach_media(docs, "text", "doc_id")
    row = media.first()
    assert bytes(row.media).decode()  # payload is the encoded text
    assert row.media_meta.n_bytes == len(bytes(row.media))
    feats = multimodal.extract_features(media, "doc_id", batch_rows=64)
    got = feats.toPandas()
    assert len(got) == docs.count()
    assert all(len(f) == multimodal.FEATURE_DIM for f in got["features"])
    # deterministic across runs
    got2 = multimodal.extract_features(media, "doc_id").toPandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = got2.sort_values("doc_id").reset_index(drop=True)
    assert (a["n_bytes"] == b["n_bytes"]).all()
    assert all(np.allclose(x, y) for x, y in zip(a["features"], b["features"]))


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(pd.Series([b"x"]), "image/png")


def test_ivf_topk_recall(emb):
    queries = [(int(r.vec_id), list(r.embedding)) for r in emb.limit(5).collect()]
    exact = similarity.brute_force_topk(emb, queries, k=5).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=5, num_centroids=16, nprobe=4
    ).toPandas()
    hits = tot = 0
    for qid, _ in queries:
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.5  # nprobe=4/16 of the corpus scanned
    # self-vector lands in its own probed list -> rank-1 self hit
    for qid, _ in queries:
        a = approx[approx.query_id == qid].sort_values("rank")
        assert len(a) >= 1 and a.iloc[0]["vec_id"] == qid


def test_cosine_pairs_tiled_matches_single_group(emb):
    """The tiled exact all-pairs path (no block_col) must return
    exactly the pairs a single in-memory matmul finds — every
    unordered row pair lands in exactly one tile pair."""
    out = (
        similarity.cosine_pairs_ge(emb, 0.42, num_blocks=5)
        .select("id_a", "id_b").toPandas()
    )
    got = set(map(tuple, out.to_numpy()))
    pdf = emb.toPandas()
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    ids = pdf["vec_id"].to_numpy()
    ia, ib = np.where(np.triu(sims >= 0.42, k=1))
    expect = {
        (min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ia, ib)
    }
    assert got == expect and len(expect) > 0


def test_cosine_pairs_exact_gate(emb):
    """The unblocked exact path refuses corpora above
    max_exact_rows instead of silently scheduling a quadratic job."""
    with pytest.raises(ValueError, match="cosine_pairs_approx"):
        similarity.cosine_pairs_ge(emb, 0.42, max_exact_rows=10).collect()


def test_cosine_pairs_approx_vs_exact(emb):
    """cosine_pairs_approx: precision exactly 1 (subset of the exact
    pair set, with matching exact cosines), recall >= the planned
    target minus margin; deterministic given the fixed seed."""
    exact = similarity.cosine_pairs_ge(emb, 0.42).toPandas()
    ex = {(r.id_a, r.id_b): r.cosine for r in exact.itertuples()}
    approx = similarity.cosine_pairs_approx(
        emb, 0.42, target_recall=0.98
    ).toPandas()
    ap = {(r.id_a, r.id_b): r.cosine for r in approx.itertuples()}
    assert set(ap) <= set(ex)  # precision 1
    assert len(ap) >= 0.9 * len(ex) > 0  # recall with margin
    for k, v in ap.items():  # verified cosines are the exact ones
        assert abs(v - ex[k]) < 1e-9
    # band planning: more bands at lower threshold, fewer at higher
    assert similarity.plan_bands(0.42, 8, 0.98) > similarity.plan_bands(
        0.9, 8, 0.98
    )


def test_cosine_pairs_approx_high_threshold(spark):
    """At near-dup thresholds (the training-data case) the planned
    band count is small and recall is ~1: planted near-identical
    vectors are all recovered."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32))
    # 10 planted near-dup partners: tiny perturbation of rows 0..9
    dups = base[:10] + 0.02 * rng.standard_normal((10, 32))
    vecs = np.vstack([base, dups])
    pdf = pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [v.astype(np.float64).tolist() for v in vecs],
    })
    emb_df = spark.createDataFrame(pdf)
    out = similarity.cosine_pairs_approx(
        emb_df, 0.95, bits_per_band=8, target_recall=0.99
    ).toPandas()
    got = set(zip(out.id_a, out.id_b))
    assert {(i, i + 40) for i in range(10)} <= got
    assert similarity.plan_bands(0.95, 8, 0.99) <= 12


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_vs_union_find(spark):
    """Random sparse graph: DataFrame min-label propagation must
    match a reference union-find exactly (component id = min id)."""
    rng = np.random.default_rng(3)
    n = 400
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2))
             if a != b]
    pdf = pd.DataFrame({"id_a": [a for a, _ in edges],
                        "id_b": [b for _, b in edges]})
    pairs = spark.createDataFrame(pdf)
    got = {
        r.node: r.component
        for r in dedup.connected_components(pairs).collect()
    }
    nodes = {x for e in edges for x in e}
    want = _uf_components(edges, nodes)
    # union-find roots are not guaranteed minimal; normalize to min
    by_root = {}
    for v, r in want.items():
        by_root.setdefault(r, []).append(v)
    want_min = {v: min(vs) for r, vs in by_root.items() for v in vs}
    assert got == want_min


def test_connected_components_long_chain(spark):
    """A 200-node path graph converges within the default round cap —
    evidence the pointer-jumping step gives O(log diameter), not
    O(diameter), rounds."""
    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [a for a, _ in edges],
                      "id_b": [b for _, b in edges]})
    )
    got = dedup.connected_components(pairs, max_iterations=12).collect()
    assert {r.component for r in got} == {0}
    assert len(got) == 201


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [f"doc {i}" for i in range(8)],
    }))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [0, 1, 5], "id_b": [1, 2, 6]}
    ))
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_keep_canonical(docs, "doc_id", pairs).collect()
    )
    # clusters {0,1,2} -> keep 0; {5,6} -> keep 5; 3,4,7 untouched
    assert kept == [0, 3, 4, 5, 7]


def test_connected_components_nonconvergence_raises(spark):
    """ADVICE r3: exhausting max_iterations must raise, never return
    partially-converged (over-segmented) labels."""
    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [a for a, _ in edges],
                      "id_b": [b for _, b in edges]})
    )
    with pytest.raises(RuntimeError, match="fixed point"):
        dedup.connected_components(pairs, max_iterations=2)
