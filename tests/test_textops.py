"""Text-pipeline operators: dedup family, similarity search, profiles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rockefeller_spark import dedup as D
from rockefeller_spark import simsearch as V
from rockefeller_spark import textops as X

DOCS = [
    (0, "the cat sat on the mat and looked at the dog"),
    (1, "the cat sat on the mat and looked at the dog"),          # exact dup of 0
    (2, "the cat sat on the mat and looked at a dog"),            # near dup of 0
    (3, "der Hund ist nicht auf der Matte und das ist gut"),
    (4, "completely different content about spark query engines"),
    (5, "THE  CAT   sat on the mat and looked at the dog"),       # ws/case dup of 0
    (6, "le chat est sur le tapis et les chiens sont pour une"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    groups = D.exact_dedup_groups(docs).toPandas()
    g0 = groups[groups.keep_id == 0]
    assert g0.n_copies.iloc[0] == 3  # 0, 1, 5 canonicalize identically
    kept = D.exact_dedup(docs).toPandas()
    assert set(kept.doc_id) == {0, 2, 3, 4, 6}


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    keys = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in keys and (0, 5) in keys      # exact dups → jaccard 1.0
    assert (0, 2) in keys                          # near dup
    assert not any(4 in p for p in keys)           # unrelated doc clean


@pytest.mark.parametrize("portable", [False, True])
def test_minhash_pairs_superset_of_exact_dups(spark, docs, portable):
    pairs = D.minhash_dedup_pairs(docs, n_hashes=32, n_bands=8,
                                  threshold=0.9, portable=portable).toPandas()
    keys = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # identical docs collide in every band with est_jaccard 1.0
    assert {(0, 1), (0, 5), (1, 5)} <= keys


@pytest.mark.parametrize("portable", [False, True])
def test_simhash_near_pairs(spark, docs, portable):
    pairs = D.simhash_near_pairs(docs, max_hamming=3,
                                 portable=portable).toPandas()
    keys = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert {(0, 1), (0, 5), (1, 5)} <= keys        # identical → hamming 0
    assert not any(4 in p and 0 in p for p in keys)


def test_lang_id_and_profile(spark, docs):
    prof = X.profile(docs).toPandas().set_index("doc_id")
    assert prof.loc[0, "lang_pred"] == "en"
    assert prof.loc[3, "lang_pred"] == "de"
    assert prof.loc[6, "lang_pred"] == "fr"
    assert prof.loc[0, "n_tokens"] == 11
    assert prof.loc[0, "fp"] == prof.loc[5, "fp"]  # canonicalization
    assert 0.0 <= prof["quality"].min() and prof["quality"].max() <= 1.0


def test_cosine_topk_matches_numpy(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>")
    got = V.cosine_topk(df, query_id=0, k=5).toPandas()
    v = vecs.astype("float64")
    sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    want = np.argsort(-sims)[:5]
    assert got.neighbor_id.tolist() == [int(i) for i in want]


def test_ivf_and_lsh_recall(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    cents = (df.filter(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    exact = set(V.cosine_topk(df, 0, k=10).toPandas().neighbor_id)
    index = V.ivf_build(df, cents)   # build once, search many
    ivf = set(V.ivf_topk(index, cents, 0, k=10, n_probe=4)
              .toPandas().neighbor_id)
    lsh = set(V.lsh_topk(df, 0, dim=16, k=10, n_planes=16, max_hamming=6)
              .toPandas().neighbor_id)
    # approximate methods: reasonable recall on random data
    assert len(ivf & exact) >= 3
    assert len(lsh & exact) >= 3
    # every returned id is a real doc, never the query itself
    assert 0 not in ivf and 0 not in lsh


def test_embedding_near_dup_pairs_recovers_planted_dups(spark):
    import numpy as np
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(100, 16)).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(100)]
    # plant near-dup copies of the first 10 vectors (tiny perturbation)
    rows += [(1000 + i, [float(x * 1.001) if j % 2 else float(x)
                         for j, x in enumerate(vecs[i])])
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = V.embedding_near_dup_pairs(df, dim=16, threshold=0.98,
                                       n_planes=16, max_hamming=3).toPandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert {(i, 1000 + i) for i in range(10)} <= got   # all planted pairs found
    # no false positives among unrelated random vectors
    assert all(b - a == 1000 for a, b in got)


def _wait_log(caplog, needle, timeout=10.0):
    """The heavy-group audit logs from a daemon thread the moment the
    caller's action completes — poll briefly for the line."""
    import time
    deadline = time.time() + timeout
    while time.time() < deadline:
        if needle in caplog.text:
            return True
        time.sleep(0.05)
    return False


def test_degenerate_bucket_caps_bound_the_candidate_joins(spark, caplog):
    """Planted pathology: thousands of copies of one document (the web-
    corpus worst case). Uncapped, every candidate join is quadratic in the
    cluster size (m²/2 pairs per shared shingle / band bucket); with the
    degenerate-group caps the heavy groups are dropped — LOUDLY — and the
    operators stay linear while still finding pairs among normal docs."""
    m = 3000
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
            for i in range(m)]
    rows += [(10000, "a unique document about query planning strategies today"),
             (10001, "a unique document about query planning strategies tonight"),
             (10002, "totally unrelated content concerning garden furniture")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    with caplog.at_level("WARNING", logger="rockefeller_spark.dedup"):
        jac = D.ngram_jaccard_pairs(docs, threshold=0.5, max_df=64).toPandas()
        assert _wait_log(caplog, "dropped")   # never silent
    # every shingle of the m-cluster is heavy → no quadratic pair emission;
    # the discriminative planted pair still comes through
    assert set(map(tuple, jac[["id_a", "id_b"]].values)) == {(10000, 10001)}

    caplog.clear()
    with caplog.at_level("WARNING", logger="rockefeller_spark.dedup"):
        mh = D.minhash_dedup_pairs(docs, threshold=0.5,
                                   max_bucket=64).toPandas()
        assert _wait_log(caplog, "lsh_candidate_pairs band buckets")
    assert not ((mh.id_a < m) & (mh.id_b < m)).any()   # no m-cluster pairs

    caplog.clear()
    with caplog.at_level("WARNING", logger="rockefeller_spark.dedup"):
        sp = D.simhash_near_pairs(docs, max_bucket=64).toPandas()
        assert _wait_log(caplog, "simhash_near_pairs chunk buckets")
    assert not ((sp.id_a < m) & (sp.id_b < m)).any()


def test_embedding_near_dup_bucket_cap(spark, caplog):
    """Same pathology in vector space: a large exact-duplicate vector
    cluster collides in every sign-LSH band; the bucket cap drops it."""
    import numpy as np
    rng = np.random.default_rng(17)
    base = rng.normal(size=16)
    m = 2000
    rows = [(i, [float(x) for x in base]) for i in range(m)]
    extra = rng.normal(size=(20, 16))
    rows += [(10000 + i, [float(x) for x in extra[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with caplog.at_level("WARNING", logger="rockefeller_spark.dedup"):
        pairs = V.embedding_near_dup_pairs(df, dim=16, threshold=0.98,
                                           max_bucket=64).toPandas()
        assert _wait_log(caplog, "embedding_near_dup_pairs chunk buckets")
    assert not ((pairs.id_a < m) & (pairs.id_b < m)).any()


def test_dedup_clusters_nonconvergence_raises(spark):
    """A pair chain longer than max_iter must fail loudly, not return
    silently split components."""
    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(ids, chain, max_iter=2)
    # ...and succeeds with an adequate round budget
    got = D.dedup_clusters(ids, chain, max_iter=n).toPandas()
    assert set(got.cluster_id) == {0}


def test_dedup_clusters_connected_components(spark):
    ids = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    # components: {0,1,2} (triangle), {3,4,5} (chain), {6}, {7}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)], ["id_a", "id_b"])
    got = D.dedup_clusters(ids, pairs).toPandas().set_index("doc_id") \
        .cluster_id.to_dict()
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7}
    # keep/drop decision: representatives are exactly the cluster minima
    keep = {d for d, c in got.items() if d == c}
    assert keep == {0, 3, 6, 7}


def test_sketch_caches_released_between_calls(spark, docs):
    """ADVICE dedup.py: repeated sketch calls in a long-lived session must
    not accumulate persisted blocks — each top-level call releases the
    previous call's caches, and release_caches() frees the last."""
    D.minhash_dedup_pairs(docs).count()
    first_gen = list(D._tl_caches())
    assert first_gen                      # sigs + bands registered
    D.simhash_near_pairs(docs).count()
    # previous generation fully unpersisted, replaced by the new one
    assert all(df.storageLevel.useMemory is False for df in first_gen)
    assert D._tl_caches() and D._tl_caches() != first_gen
    D.release_caches()
    assert not D._tl_caches()


def test_sketch_cache_scope_is_thread_local(spark, docs):
    """ADVICE r4: a sketch call on thread B must not release thread A's
    cached intermediates mid-query — the scope registry is per-thread."""
    import threading

    D.release_caches()
    D.minhash_dedup_pairs(docs).count()
    a_gen = list(D._tl_caches())
    assert a_gen

    errs: list[Exception] = []

    def other_thread():
        try:
            # a full top-level sketch call on ANOTHER thread...
            D.simhash_near_pairs(docs).count()
            D.release_caches()            # ...and its cleanup
        except Exception as e:            # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=other_thread)
    t.start()
    t.join()
    assert not errs
    # thread A's registry and persisted blocks are untouched
    assert list(D._tl_caches()) == a_gen
    assert all(df.storageLevel.useMemory for df in a_gen)
    D.release_caches()


def test_release_all_caches_frees_dead_thread_scopes(spark, docs):
    """ADVICE r5: intermediates persisted by a worker thread that has
    since exited must still be releasable — release_all_caches() drains
    every thread's scope via the global registry."""
    import threading

    holder: dict = {}

    def worker():
        D.minhash_dedup_pairs(docs).count()
        holder["gen"] = list(D._tl_caches())

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert holder["gen"]
    assert any(df.storageLevel.useMemory for df in holder["gen"])
    D.release_all_caches()                 # called from the MAIN thread
    assert all(df.storageLevel.useMemory is False for df in holder["gen"])
