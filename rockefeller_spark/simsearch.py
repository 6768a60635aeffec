"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k for a query vector — the
  correctness baseline. All math is `F.zip_with`/`F.aggregate` in double
  precision, JVM-side.
- `assign_centroids` + `ivf_topk`: IVF-style scale path — partition the
  corpus by nearest centroid, then search only the query's `n_probe`
  nearest cells. At 100 TB the centroid assignment is a broadcast join
  (centroids are tiny) and each query touches a small fraction of rows.
- `lsh_signbits` + `lsh_topk`: sign-random-projection LSH bucket variant:
  candidates share the query's hyperplane sign pattern (Hamming-banded),
  re-ranked exactly.

No vector library, no UDFs: dot products are higher-order column
expressions, so Catalyst/Tungsten run them codegen'd over Arrow-backed
columnar batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_df: DataFrame | None = None) -> DataFrame:
    """Exact top-k cosine neighbors of ``query_id`` (excluded from its own
    result). The one-row query side is broadcast — no shuffle of the
    corpus; the ranking is a global top-k (orderBy+limit → Spark's
    TakeOrdered, no full sort). ``query_df`` optionally supplies the query
    row from a cheaper source than ``df`` (the ANN callers pass the base
    table so the one-row lookup doesn't re-run the candidate subtree)."""
    src = query_df if query_df is not None else df
    q = src.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"))
    scored = (df.filter(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(q))
              .select(F.col(id_col).alias("neighbor_id"),
                      F.round(cosine(F.col(vec_col), F.col("_qvec")), 6)
                      .alias("cosine_sim")))
    return scored.orderBy(F.col("cosine_sim").desc(),
                          F.col("neighbor_id")).limit(k)


def assign_centroids(df: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     cid_col: str = "centroid_id") -> DataFrame:
    """Nearest-centroid assignment (the IVF build step): broadcast the
    centroid table, score all pairs, keep the argmax-cosine centroid per
    vector (ties → smallest centroid id). One broadcast join + one
    map-side-combined max_by aggregation."""
    c = F.broadcast(centroids.select(F.col(cid_col).alias("_cid"),
                                     F.col(vec_col).alias("_cvec")))
    scored = (df.crossJoin(c)
              .select(F.col(id_col), F.col(vec_col),
                      F.col("_cid"),
                      cosine(F.col(vec_col), F.col("_cvec")).alias("_sim")))
    # max_by with deterministic tie-break: order by (sim, -cid)
    pick = F.max_by(F.col("_cid"), F.struct(F.col("_sim"), -F.col("_cid")))
    return (scored.groupBy(id_col)
            .agg(pick.alias(cid_col), F.max("_sim").alias("_best"))
            .drop("_best"))


def ivf_build(df: DataFrame, centroids: DataFrame,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """The IVF *build* step, run ONCE and stored/persisted: the corpus with
    its nearest-centroid cell id attached — (id, vec, centroid_id). Real
    IVF usage is build-once/search-many; callers persist or write this out
    (partitioned by centroid_id at fleet scale, so a probe reads only its
    cells' files) and pass it to :func:`ivf_topk` for every query."""
    assigned = assign_centroids(df, centroids, id_col, vec_col)
    return df.join(assigned, id_col)


def ivf_topk(index: DataFrame, centroids: DataFrame, query_id: int,
             k: int = 10, n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF search over a pre-built ``index`` (the :func:`ivf_build` output):
    restrict the brute-force scan to the query's ``n_probe`` nearest
    centroid cells. Approximate (recall < 1 when the true neighbor lives in
    an unprobed cell) but touches ~n_probe/n_centroids of the data, and —
    because the assignment is pre-built — query cost is independent of the
    build: one broadcast probe-list semi-join + a pruned top-k. The probe
    list itself is a global top-n over (1 query row × centroids) —
    TakeOrdered, no window/shuffle."""
    q = index.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"))
    c = F.broadcast(centroids.select(F.col("centroid_id"),
                                     F.col(vec_col).alias("_cvec")))
    qcells = (q.crossJoin(c)
              .select("centroid_id",
                      cosine(F.col("_qv"), F.col("_cvec")).alias("_sim"))
              .orderBy(F.col("_sim").desc(), "centroid_id")
              .limit(n_probe)
              .select("centroid_id"))
    cand = index.join(F.broadcast(qcells), "centroid_id", "left_semi")
    return cosine_topk(cand, query_id, k, id_col, vec_col, query_df=index)


def assign_centroids_topn(df: DataFrame, centroids: DataFrame, n: int,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Top-n nearest centroids per vector (the query-side probe list)."""
    c = F.broadcast(centroids.select(F.col("centroid_id").alias("_cid"),
                                     F.col(vec_col).alias("_cvec")))
    scored = (df.crossJoin(c)
              .select(F.col(id_col),
                      F.col("_cid").alias("centroid_id"),
                      cosine(F.col(vec_col), F.col("_cvec")).alias("sim")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), "centroid_id")
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def embedding_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.98,
                             n_planes: int = 16, seed: int = 7,
                             max_hamming: int = 3, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             max_bucket: int | None = 1000) -> DataFrame:
    """All-pairs embedding near-duplicate detection at corpus scale — the
    vector-space member of the dedup family (exact / Jaccard / MinHash /
    SimHash live in dedup.py).

    Never all-pairs: sign-LSH sketch (one long per row, literal
    hyperplanes) → pigeonhole band join (4 chunks of n_planes/4 bits; any
    pair within ``max_hamming`` ≤ 3 agrees exactly on ≥1 chunk) → exact
    cosine verify ≥ ``threshold`` on candidates only. The shuffle key is a
    small int chunk; vectors join in only for the surviving candidate ids.
    Output (id_a, id_b, cosine_sim).

    ``max_bucket`` caps degenerate (band, chunk) buckets: an m-sized
    exact-duplicate vector cluster collides in every band → 4·m²/2
    candidate rows, so over-cap buckets are dropped and the volume logged
    (``None`` disables). Tuning note: bucket capacity scales with the
    chunk space (2^(n_planes/4) values), so with few planes and a large
    corpus even legitimate buckets exceed the cap — the loud drop is the
    signal that the band join itself is degenerate at that size and
    ``n_planes`` must grow (≥64 at web scale → 16-bit chunks), which is
    also what recall wants."""
    assert n_planes % 4 == 0
    from rockefeller_spark.dedup import _cache, _cache_scope, _drop_heavy_groups
    with _cache_scope():
        sigs = _cache(lsh_signbits(df, dim, n_planes, seed, id_col, vec_col))
        width = n_planes // 4
        mask = (1 << width) - 1
        chunks = F.array(*[
            F.shiftrightunsigned(F.col("signbits"), width * i).bitwiseAND(F.lit(mask))
            for i in range(4)])
        banded = sigs.select(F.col(id_col).alias("id"), "signbits",
                             F.posexplode(chunks).alias("band", "chunk"))
        if max_bucket is not None:
            banded = _cache(banded)
            banded = _drop_heavy_groups(banded, ["band", "chunk"], max_bucket,
                                        "embedding_near_dup_pairs chunk buckets")
        a = banded.alias("a")
        b = banded.alias("b")
        ham = F.bit_count(F.col("a.signbits").bitwiseXOR(F.col("b.signbits")))
        cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.chunk") == F.col("b.chunk"))
                       & (F.col("a.id") < F.col("b.id")))
                .filter(ham <= max_hamming)
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                .distinct())
        ea = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        eb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
        return (cand.join(ea, "id_a").join(eb, "id_b")
                .withColumn("cosine_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
                .filter(F.col("cosine_sim") >= threshold)
                .select("id_a", "id_b", "cosine_sim"))


def hyperplane_signs(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic ±1 hyperplane components: component j of plane p is
    +1 iff the first md5 byte of ``"{j}:{p}:{seed}"`` is even. Computed
    driver-side ONCE (they are constants — n_planes × dim values), both
    for the Spark literals and for the SQL oracle, so any engine
    reproduces the identical sketch. No RNG state."""
    import hashlib
    return [[1.0 if hashlib.md5(f"{j}:{p}:{seed}".encode()).digest()[0] % 2 == 0
             else -1.0 for j in range(dim)]
            for p in range(n_planes)]


def lsh_signbits(df: DataFrame, dim: int, n_planes: int = 16, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection sketch: bit p = sign(v · h_p). ``dim`` is a
    plain int so the hyperplanes are baked as LITERAL sign arrays — the
    per-row work is exactly n_planes fused multiply-add folds over the
    vector (a previous formulation re-derived every sign via md5 inside a
    per-row transform: dim × n_planes md5 calls per row, ~100× the
    arithmetic for identical output)."""
    planes = hyperplane_signs(dim, n_planes, seed)
    def plane_dot(p: int) -> Column:
        signs = F.array(*[F.lit(s) for s in planes[p]])
        return F.aggregate(F.zip_with(F.col(vec_col), signs,
                                      lambda x, s: x.cast("double") * s),
                           F.lit(0.0), lambda acc, v: acc + v)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(plane_dot(p) > 0, F.lit(1 << p).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), sig.alias("signbits"))


def lsh_topk(df: DataFrame, query_id: int, dim: int, k: int = 10,
             n_planes: int = 16, max_hamming: int = 4, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed ANN: candidates within ``max_hamming`` of the query's
    sign pattern, re-ranked by exact cosine. The sketch join is on a long,
    the re-rank touches only candidates. The sketch table feeds two
    subtrees (query side + candidate filter) → persisted, one long per
    row; at fleet scale it is a stored sketch column, computed once."""
    from rockefeller_spark.dedup import _cache, _cache_scope
    with _cache_scope():
        sigs = _cache(lsh_signbits(df, dim, n_planes, seed, id_col, vec_col))
        qsig = sigs.filter(F.col(id_col) == query_id).select(
            F.col("signbits").alias("_qsig"))
        cand_ids = (sigs.crossJoin(F.broadcast(qsig))
                    .filter(F.bit_count(F.col("signbits").bitwiseXOR(F.col("_qsig")))
                            <= max_hamming)
                    .select(id_col))
        # Hamming-bounded candidate lists are small → broadcast the id set
        # so the corpus never shuffles for the semi-join
        cand = df.join(F.broadcast(cand_ids), id_col, "left_semi")
        return cosine_topk(cand, query_id, k, id_col, vec_col, query_df=df)
