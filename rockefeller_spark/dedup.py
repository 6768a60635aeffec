"""Deduplication family for training-data pipelines.

Four tiers, cheapest first, all shuffle-frugal and scale-designed:

- **Exact** (`exact_dedup_groups` / `exact_dedup`): md5 of canonicalized
  text → one groupBy. The 100-TB fast path: map-side partial agg, one
  shuffle on the 16-byte fingerprint, no text movement after the hash.
- **N-gram Jaccard** (`ngram_jaccard_pairs`): explode k-word shingles,
  self-join on shingle hash, count intersections / union sizes. Exact
  similarity, quadratic only within shingle-sharing groups.
- **MinHash + LSH** (`minhash_signatures` / `lsh_candidate_pairs` /
  `minhash_dedup_pairs`): linear-time near-dup at corpus scale — shingle →
  n-minhash signature → band buckets → join only within buckets. Each
  sketch has a `portable=True` mode that swaps the JVM-native xxhash64 for
  md5-derived hashes reproducible in any engine (the DuckDB oracle runs
  the identical sketch); the default stays on xxhash64 for speed.
- **SimHash** (`simhash60`): 60-bit sign-sum sketch; Hamming-close pairs
  via band join on 4×15-bit chunks.

All pure `pyspark.sql.functions` higher-order expressions — zero UDFs.
"""

from __future__ import annotations

import logging
import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rockefeller_spark.textops import fingerprint, word_shingles

log = logging.getLogger("rockefeller_spark.dedup")

# Default degenerate-group cap for every candidate-generating self-join in
# the dedup/sketch family (shingle posting lists, LSH band buckets, SimHash
# chunks, sign-LSH chunks). A group of m members yields ~m²/2 join rows, so
# one boilerplate shingle or an m-sized exact-duplicate cluster — common in
# web corpora — turns the band join quadratic. Groups above the cap are
# non-discriminative (they assert near-nothing about similarity) and are
# dropped WHOLESALE, with the dropped volume logged, never silently. The
# registry oracles bake the same constant, so capped and uncapped runs are
# value-checked either way.
DEFAULT_MAX_GROUP = 1000

# Persisted intermediates (signatures, band tables) registered per top-level
# sketch call. Each NEW top-level call releases the previous call's caches
# first, so a long-lived session (bench loop, notebook) holds at most one
# corpus-run's cached blocks PER THREAD instead of accumulating until
# eviction pressure; `release_caches()` frees the calling thread's last
# run's too. Nested calls (e.g. minhash_dedup_pairs → lsh_candidate_pairs)
# share one scope. The registry is THREAD-LOCAL: concurrent sketch calls
# from different threads own independent scopes and can never unpersist
# each other's intermediates mid-query (two threads in one module-global
# scope could interleave ownership). Corollary: materialize (or persist
# yourself) a sketch result BEFORE issuing the next top-level sketch call
# on the same thread — the next call releases the previous call's cached
# intermediates, and an unevaluated lazy result would silently recompute
# its shingling/signature subtrees.
_TL = threading.local()
# every thread's cache list, so blocks pinned by a thread that has since
# exited (e.g. a ThreadPool sketch run) are still releasable from any
# other thread via release_all_caches(); guarded by _SCOPES_LOCK
_ALL_SCOPES: list[list[DataFrame]] = []
_SCOPES_LOCK = threading.Lock()


def _tl_caches() -> list[DataFrame]:
    if not hasattr(_TL, "caches"):
        _TL.caches = []
        _TL.scope_open = False
        with _SCOPES_LOCK:
            _ALL_SCOPES.append(_TL.caches)
    return _TL.caches


def _drain(caches: list[DataFrame]) -> None:
    while caches:
        df = caches.pop()
        try:
            df.unpersist()
        except Exception:       # session already stopped: nothing to free
            pass


def release_caches() -> None:
    """Unpersist every intermediate cached by the calling thread's most
    recent sketch call."""
    _drain(_tl_caches())


def release_all_caches() -> None:
    """Unpersist every sketch intermediate cached by ANY thread — the
    session-teardown / pool-shutdown hook that frees blocks whose owning
    worker thread already exited (its thread-local scope is unreachable
    from other threads, but this global registry still holds it)."""
    with _SCOPES_LOCK:
        scopes = list(_ALL_SCOPES)
    for caches in scopes:
        _drain(caches)


def _cache(df: DataFrame) -> DataFrame:
    df = df.persist()
    _tl_caches().append(df)
    return df


@contextmanager
def _cache_scope():
    _tl_caches()                # ensure thread-local state exists
    if _TL.scope_open:          # nested sketch call: caller owns the scope
        yield
        return
    release_caches()
    _TL.scope_open = True
    try:
        yield
    finally:
        _TL.scope_open = False


def _drop_heavy_groups(df: DataFrame, keys: list[str], max_size: int,
                       what: str) -> DataFrame:
    """Degenerate-bucket defense: remove every (keys) group with more than
    ``max_size`` member rows from ``df`` before it feeds a self-join.

    The heavy-group list is computed up front — one hash aggregation over
    ``df``, which the caller has persisted, so the audit's marginal cost
    is a single pass over a cached id+hash table (it also warms the cache
    the main query reuses), never a re-scan of the corpus text/vectors.
    The dropped volume is logged, never silent. When NO group exceeds the
    cap — the overwhelmingly common case — ``df`` is returned unchanged,
    so the query plan carries no audit artifacts at all. When groups drop,
    the filter is a broadcast anti-join for small lists, plain anti-join
    otherwise.

    (A fully-lazy variant — in-plan anti-join + an ``Observation`` for
    the logging — was tried and reverted: the observed node lands on BOTH
    sides of the candidate self-join, and Spark's relation deduplication
    silently loses the duplicated CollectMetrics, so the log never fired
    for some operators.)
    """
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    heavy = sizes.filter(F.col("_n") > max_size)
    stats = heavy.agg(F.count(F.lit(1)).alias("g"),
                      F.sum("_n").alias("rows")).collect()[0]
    if not stats["g"]:
        return df
    log.warning(
        "%s: dropped %d degenerate group(s) holding %d rows (> %d members "
        "each) from the candidate join — pairs supported ONLY by these "
        "groups are not emitted (run exact dedup first to fold "
        "identical-document clusters)",
        what, stats["g"], stats["rows"], max_size)
    rhs = heavy.select(*keys)
    if stats["g"] <= 100_000:
        rhs = F.broadcast(rhs)
    return df.join(rhs, keys, "left_anti")


# ---------------------------------------------------------------- exact


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups: fingerprint → (keep_id = min id, n_copies)."""
    return (df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: keep the min-id representative per
    fingerprint. One shuffle (hash agg), then a semi-join back to rows."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------------------- portable hash

def _md5_long(c: Column, salt: int) -> Column:
    """Deterministic 60-bit positive int from md5 — portable to DuckDB
    (`('0x' || substr(md5(x || salt), 1, 15))::BIGINT` equivalent). Used
    where an SQL oracle must reproduce the hash; the sketch ops below use
    the much cheaper JVM-native xxhash64 instead."""
    return F.conv(F.substring(F.md5(F.concat(c, F.lit(f"#{salt}"))), 1, 15),
                  16, 10).cast("long")


MERSENNE31 = (1 << 31) - 1


def minhash_perm_constants(n_hashes: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash permutation
    family h_i(x) = (a_i·x + b_i) mod (2³¹−1). Derived from md5 driver-side
    and baked as literals into both the Spark plan and the SQL oracle, so
    portable MinHash costs ONE md5 per shingle (the base hash) plus cheap
    integer arithmetic — not one md5 per (shingle, permutation), which
    measured ~25× slower at sf0.1. Products stay < 2⁶² (a, x < 2³¹), so
    int64 arithmetic is exact in every engine."""
    import hashlib
    out = []
    for i in range(n_hashes):
        d = hashlib.md5(f"perm:{seed}:{i}".encode()).digest()
        a = int.from_bytes(d[:8], "big") % (MERSENNE31 - 1) + 1
        b = int.from_bytes(d[8:], "big") % MERSENNE31
        out.append((a, b))
    return out


# --------------------------------------------------------------- jaccard

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8,
                        max_df: int | None = DEFAULT_MAX_GROUP) -> DataFrame:
    """Exact shingle-Jaccard similarity for all pairs sharing ≥1 shingle.

    Plan shape: explode distinct shingles → self equi-join on the shingle
    (Catalyst sort-merge; the join key is the 15-hex-digit shingle hash,
    not the text) → count common shingles → join per-doc shingle counts →
    Jaccard = common / (|A| + |B| - common). Only id pairs and counts ever
    shuffle. Output: (id_a, id_b, jaccard) with id_a < id_b, ≥ threshold.

    ``max_df`` is the quadratic-blowup defense: a shingle held by m docs
    contributes m²/2 join rows, so shingles with document frequency above
    the cap are treated as non-discriminative (boilerplate) and excluded
    from the WHOLE computation — posting lists AND per-doc sizes — i.e.
    the Jaccard is over discriminative shingles only. Dropped volume is
    logged; ``max_df=None`` disables the cap.
    """
    with _cache_scope():
        # sh feeds three subtrees (sizes + both join sides) → persist so the
        # shingling runs once, not 3× (ids+hashes only; tiny vs the text)
        sh = _cache(
            df.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(word_shingles(text_col, k))).alias("s"))
            .select("id", F.md5(F.col("s")).alias("h")))
        if max_df is not None:
            sh = _drop_heavy_groups(sh, ["h"], max_df,
                                    "ngram_jaccard_pairs shingle posting lists")
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        a = sh.alias("a")
        b = sh.alias("b")
        common = (a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
                  .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                  .agg(F.count(F.lit(1)).alias("common")))
        na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
        nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
        return (common.join(na, "id_a").join(nb, "id_b")
                .withColumn("jaccard", F.round(
                    F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))


# --------------------------------------------------------------- minhash

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       n_hashes: int = 32, portable: bool = False) -> DataFrame:
    """n-permutation MinHash signature per doc as array<long>.

    Shape: explode distinct shingles once, hash each shingle once
    (xxhash64, JVM-native), then n_hashes MIN aggregates over
    xxhash64(shingle_hash, i) — a single vectorized hash aggregation with
    map-side partial combine, so each task emits ≤1 row per doc per
    aggregate regardless of document size. (A pure higher-order-function
    formulation re-evaluates the shingling per hash — ~30× slower.)

    ``portable=True`` swaps xxhash64 for one md5 base hash per shingle
    plus literal universal-hash permutations (`minhash_perm_constants`),
    so ANY engine (DuckDB oracle included) reproduces the exact signature
    values at near-xxhash64 cost.
    """
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(F.array_distinct(word_shingles(text_col, k))).alias("s")))
    if portable:
        sh = sh.select("id", (_md5_long(F.col("s"), 0)
                              % F.lit(MERSENNE31)).alias("h"))
        aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE31))
                .alias(f"_m{i}")
                for i, (a, b) in enumerate(minhash_perm_constants(n_hashes))]
    else:
        sh = sh.select("id", F.xxhash64("s").alias("h"))
        aggs = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"_m{i}")
                for i in range(n_hashes)]
    return (sh.groupBy("id").agg(*aggs)
            .select("id", F.array(*[F.col(f"_m{i}") for i in range(n_hashes)])
                    .alias("sig")))


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = 8,
                        portable: bool = False,
                        max_bucket: int | None = DEFAULT_MAX_GROUP) -> DataFrame:
    """Band the signature and emit candidate pairs that collide in ≥1 band.

    Standard LSH: rows_per_band = n_hashes / n_bands; docs equal on a whole
    band land in one bucket; a self-join per bucket yields candidates.
    Scale: the shuffle key is (band, hash(band slice)) — uniformly
    distributed; each bucket is tiny unless docs truly collide.
    ``portable=True`` uses md5-hex bucket ids (oracle-reproducible) instead
    of xxhash64.

    ``max_bucket`` caps band-bucket size: an m-sized exact-duplicate
    cluster collides in EVERY band and would emit n_bands·m²/2 candidate
    rows; buckets above the cap are dropped (logged) — such clusters are
    exact dups by construction and belong to exact_dedup, not LSH.
    ``max_bucket=None`` disables the cap.
    """
    def bucket(b):
        joined = F.concat_ws(
            ",", F.slice(F.col("sig"),
                         b * (F.size(F.col("sig")) / n_bands).cast("int") + 1,
                         (F.size(F.col("sig")) / n_bands).cast("int")))
        return F.md5(joined) if portable else F.xxhash64(joined).cast("string")
    with _cache_scope():
        bands = (sigs.select(
            "id",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)), bucket))
            .alias("band", "bucket")))
        if max_bucket is not None:
            bands = _cache(bands)  # size count + both join sides scan it
            bands = _drop_heavy_groups(bands, ["band", "bucket"], max_bucket,
                                       "lsh_candidate_pairs band buckets")
        a = bands.alias("a")
        b = bands.alias("b")
        return (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a.id") < F.col("b.id")))
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                .distinct())


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        n_hashes: int = 32, n_bands: int = 8,
                        threshold: float = 0.7,
                        portable: bool = False,
                        max_bucket: int | None = DEFAULT_MAX_GROUP) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified: LSH candidates are re-scored
    by estimated Jaccard (matching signature fraction) and thresholded.
    Output (id_a, id_b, est_jaccard).

    The signature table is consumed by three downstream subtrees (banding
    plus both sides of the verify join), so it is persisted — without that,
    Spark re-runs the shingle+hash aggregation of the whole corpus once per
    consumer (4 scans; measured 3.5× the wall of this query at sf0.1). At
    fleet scale the same move is writing the signatures to a table once and
    reusing them across dedup runs."""
    with _cache_scope():
        sigs = _cache(minhash_signatures(df, text_col, id_col, k, n_hashes,
                                         portable=portable))
        cands = lsh_candidate_pairs(sigs, n_bands, portable=portable,
                                    max_bucket=max_bucket)
        sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
        est = (F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"),
                                          lambda x, y: x == y), lambda v: v))
               / F.size(F.col("sig_a")))
        return (cands.join(sa, "id_a").join(sb, "id_b")
                .withColumn("est_jaccard", F.round(est, 6))
                .filter(F.col("est_jaccard") >= threshold)
                .select("id_a", "id_b", "est_jaccard"))


# ------------------------------------------------------------- clustering

def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate PAIRS → one cluster id per
    document (the min doc id of its component; singletons cluster to
    themselves). This is the step that turns pairwise dedup output into
    keep/drop decisions: keep ``id == cluster_id``, drop the rest.

    Iterative min-label propagation — the canonical Spark shape for an
    algorithm SQL can't express in one pass: per round, every node takes
    the min of its own label and its neighbors' labels (one equi-join +
    one hash aggregation, both AQE-sized); rounds repeat until a fixpoint
    (≤ graph diameter, typically 2-4 for dedup clusters — near-dup
    components are dense). Each round's labels are ``localCheckpoint``-ed:
    persist alone leaves the logical plan growing by one join per round,
    and re-analyzing that tree OOMs the driver after ~10 rounds (measured)
    — checkpointing truncates lineage so plan cost stays constant per
    round. (On a fleet with flaky executors, swap for a reliable
    ``checkpoint()`` to a cluster-visible dir.) The driver only ever
    collects a 1-row convergence flag, never data."""
    ids = df.select(F.col(id_col).alias("id")).distinct()
    half = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = (half.unionByName(half.select(F.col("b").alias("a"),
                                          F.col("a").alias("b")))
             .distinct().persist())
    labels = ids.select("id", F.col("id").alias("label")).localCheckpoint()
    changed = 0
    for _ in range(max_iter):
        nbr = (labels.join(edges, labels.id == edges.a)
               .groupBy("b").agg(F.min("label").alias("nl"))
               .withColumnRenamed("b", "id"))
        new_labels = (labels.join(nbr, "id", "left")
                      .select("id", F.least(F.col("label"),
                                            F.coalesce("nl", "label"))
                              .alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Returning partial labels would silently split one component
        # across cluster ids (and diverge from the transitive-closure
        # oracle) — fail loudly instead. Min-label propagation converges
        # in ≤ component-diameter rounds, so hitting this means a chain of
        # near-dup pairs longer than max_iter: rerun with a higher limit.
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            f"rounds (a component's diameter exceeds it); rerun with a "
            f"larger max_iter")
    return labels.select(F.col("id").alias(id_col),
                         F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------- simhash

def simhash60(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", portable: bool = False) -> DataFrame:
    """**60-bit** SimHash over word tokens (60, not 64: the portable md5
    hash yields 60 clean bits, and 60 splits evenly into 4 pigeonhole
    bands): bit b of the sketch is the sign of Σ_tokens (±1 depending on
    bit b of hash(token)). Near-dups have small Hamming distance.

    Shape: explode tokens (keeping multiplicity), one hash per token,
    then 60 SUM aggregates — a single map-side-combined hash aggregation,
    like minhash_signatures. ``portable=True`` uses the md5-derived token
    hash (oracle-reproducible) instead of xxhash64."""
    n_bits = 60
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                       r"\s+")).alias("t"))
    h = _md5_long(F.col("t"), 0) if portable else F.xxhash64("t")
    toks = toks.select("id", h.alias("h"))
    aggs = [F.sum(F.when(F.shiftrightunsigned(F.col("h"), b)
                         .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_b{b}")
            for b in range(n_bits)]
    per_bit = toks.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        sim = sim + F.when(F.col(f"_b{b}") > 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return per_bit.select("id", sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3,
                       portable: bool = False,
                       max_bucket: int | None = DEFAULT_MAX_GROUP) -> DataFrame:
    """Hamming-≤k pairs via banding: split the 60-bit sketch into 4 15-bit
    chunks; any pair within Hamming 3 agrees exactly on ≥1 chunk
    (pigeonhole), so join on chunks then verify with bit_count. The sketch
    table feeds both sides of the self-join → persisted (one id+long row
    per doc), so tokenization runs once.

    ``max_bucket`` drops degenerate (band, chunk) buckets — an m-sized
    identical-document cluster shares all 4 chunks and would emit 4·m²/2
    candidate rows (logged; ``None`` disables)."""
    with _cache_scope():
        sh = _cache(simhash60(df, text_col, id_col, portable=portable))
        chunks = F.array(*[
            F.shiftrightunsigned(F.col("simhash"), 15 * i).bitwiseAND(F.lit((1 << 15) - 1))
            for i in range(4)])
        banded = sh.select("id", "simhash",
                           F.posexplode(chunks).alias("band", "chunk"))
        if max_bucket is not None:
            banded = _cache(banded)
            banded = _drop_heavy_groups(banded, ["band", "chunk"], max_bucket,
                                        "simhash_near_pairs chunk buckets")
        a = banded.alias("a")
        b = banded.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.chunk") == F.col("b.chunk"))
                       & (F.col("a.id") < F.col("b.id")))
                .filter(ham <= max_hamming)
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                        ham.alias("hamming"))
                .distinct())
