"""Similarity search over embedding columns (brief §datapipe).

Baseline: brute-force cosine top-k with native higher-order functions
(zip_with + aggregate — JVM-side, no Python). Scale path: random-
hyperplane LSH bucketing so candidate generation joins on bucket
signatures instead of the full cross product; at 1000 executors the
cross join is O(N*Q) and dies first, the LSH join is O(N) + bucket-local
products.

Determinism: hyperplanes derive from a seeded hash, not RNG state, so
every run/partition sees identical planes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excluding self).
    queries: (query_id, embedding). Deterministic ordering: cosine
    rounded to 4dp desc, then neighbor id asc (stable across engines
    and summation orders)."""
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) kernels — round 3 (VERDICT r2 next #7): the
# signature/cell/cosine arithmetic dominated the ANN walls as per-element
# Catalyst expression chains (16 planes x 64 dims = a 1024-term tree per
# row). Each kernel below is ONE batched numpy matmul per Arrow batch;
# candidate generation stays an equi-join on the kernel's output, so the
# plan shape (no CartesianProduct) is unchanged. Numeric parity with the
# expression forms is empirical and test-asserted (test_datapipe):
# summation-order differences sit ~1e-15 relative, invisible at the
# 4-dp rounding every consumer applies — the DuckDB oracles already
# tolerate exactly this class of difference (list_dot_product sums in
# DuckDB's own order and the value hashes match).
#
# Residual divergence risk (ADVICE r3, documented by design): two
# decisions consume UNROUNDED floats — the LSH sign bit ((V@planes)>0)
# and the IVF cell argsort — so a dot product within ~1e-15 of zero
# (sign) or a near-exact cell-score tie (argsort) could in principle
# resolve differently between the numpy and expression forms, changing
# a CANDIDATE set (never a rerank value, which is rounded). With the
# seeded non-degenerate hyperplanes/centroids used here, exact ties
# have measure ~0 and parity is asserted bit-identical on the full
# fixture corpus (test_vectorized_ann_kernels_match_expression_forms);
# quantizing before the sign/argsort in BOTH forms would force tie
# agreement but also have to be mirrored in the DuckDB oracle SQL, so
# the trade is documented rather than taken.
# ---------------------------------------------------------------------------


def _stack(series) -> "np.ndarray":
    if len(series) == 0:
        return np.zeros((0, 1), dtype="float64")
    return np.vstack(series.to_numpy()).astype("float64")


def cosine_pd_udf():
    """pandas_udf twin of cosine_col: batched einsum dot/norms."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A, B = _stack(a), _stack(b)
        if A.shape[0] == 0:
            return pd.Series(np.zeros(0, dtype="float64"))
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
            np.einsum("ij,ij->i", B, B)
        )
        return pd.Series(num / den)

    return cos


def lsh_sig_pd_udf(dim: int, n_planes: int):
    """pandas_udf twin of lsh_bucket_col: one (batch x dim) @ (dim x P)
    matmul -> sign bits -> packed int64 signature."""
    planes = np.array(
        [hyperplane(dim, p) for p in range(n_planes)], dtype="float64"
    ).T  # dim x P
    weights = (np.int64(1) << np.arange(n_planes, dtype="int64"))

    @F.pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        V = _stack(v)
        if V.shape[0] == 0:
            return pd.Series(np.zeros(0, dtype="int64"))
        bits = (V @ planes) > 0
        return pd.Series((bits * weights).sum(axis=1).astype("int64"))

    return sig


def ivf_cells_pd_udf(dim: int, k_cells: int, nprobe: int,
                     codebook: list[list[float]] | None = None):
    """pandas_udf twin of ivf_cells_col: batched matmul + stable argsort
    (ties break toward the lower cell id, matching the struct-sort)."""
    from pyspark.sql.types import ArrayType, IntegerType

    if codebook is None:
        codebook = [ivf_centroid(dim, c) for c in range(k_cells)]
    book = np.array(codebook, dtype="float64").T  # dim x k

    @F.pandas_udf(ArrayType(IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        V = _stack(v)
        if V.shape[0] == 0:
            return pd.Series([], dtype="object")
        dots = V @ book
        order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return cells


def hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is a
    zig-zag of a 64-bit mix of (plane_idx, j). Pure function — identical
    on every executor without shipping arrays."""
    comps = []
    for j in range(dim):
        h = (plane_idx * 1_000_003 + j * 7_919 + 12_345) * 6364136223846793005 % (1 << 64)
        comps.append(((h >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return comps


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit p = sign(v . plane_p)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = hyperplane(dim, p)
        dot = sum(
            (F.element_at(vec, j + 1).cast("double") * F.lit(plane[j]) for j in range(dim)),
            F.lit(0.0),
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        )
    return sig


def ivf_centroid(dim: int, c: int) -> list[float]:
    """Deterministic codebook direction for IVF cell ``c`` (offset keeps
    the family disjoint from the LSH hyperplanes)."""
    return hyperplane(dim, 4096 + c)


def ivf_cells_col(vec: Column, dim: int, k_cells: int, nprobe: int,
                  codebook: list[list[float]] | None = None) -> Column:
    """Top-``nprobe`` IVF cells of a vector: the codebook directions with
    the largest dot products. Lexicographic sort on (-dot, cell) makes
    the ranking identical across engines. ``codebook`` overrides the
    seeded directions (e.g. with trained k-means centroids)."""
    if codebook is None:
        codebook = [ivf_centroid(dim, c) for c in range(k_cells)]
    scored = F.array(*[
        F.struct(
            (-sum(
                (F.element_at(vec, j + 1).cast("double") * F.lit(comp[j])
                 for j in range(dim)),
                F.lit(0.0),
            )).alias("negdot"),
            F.lit(c).alias("cell"),
        )
        for c, comp in enumerate(codebook)
    ])
    return F.transform(
        F.slice(F.sort_array(scored), 1, nprobe), lambda s: s["cell"]
    )


def train_ivf_codebook(
    vectors: DataFrame, dim: int, k_cells: int = 8, n_iter: int = 3,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means (Lloyd) codebook, trained distributedly:
    assignment is the same argmax-dot expression the query path uses
    (codegen, JVM-side); the update step is posexplode -> groupBy(cell,
    pos) avg — one shuffle of k_cells x dim partial sums per iteration —
    then the (tiny) k x dim result collects to the driver, is unit-
    normalized, and broadcasts into the next iteration's literals.
    Deterministic: init is the seeded ivf_centroid family, data order
    never matters (avg is the only reduction). At real scale this runs
    on a sample; the resulting codebook is plain literals, exactly like
    the untrained one, so the query plan shape is identical."""
    import math

    codebook = [ivf_centroid(dim, c) for c in range(k_cells)]
    for _ in range(n_iter):
        assigned = vectors.select(
            F.element_at(
                ivf_cells_col(F.col(vec_col), dim, k_cells, 1, codebook), 1
            ).alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        sums: dict[int, list[float]] = {}
        for r in rows:
            sums.setdefault(r.cell, [0.0] * dim)[r.pos] = r.m
        new_book = []
        for c in range(k_cells):
            if c not in sums:  # empty cell keeps its direction
                new_book.append(codebook[c])
                continue
            v = sums[c]
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            new_book.append([x / norm for x in v])
        codebook = new_book
    return codebook


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    k_cells: int = 8, nprobe: int = 2, id_col: str = "vec_id",
    vec_col: str = "embedding", codebook: list[list[float]] | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """IVF approximate top-k: vectors live in their single best cell
    (coarse quantization); queries probe their ``nprobe`` best cells, so
    candidate generation is an equi-join on cell id instead of the cross
    product, then exact cosine rerank. ``codebook=None`` uses the seeded
    deterministic directions (DuckDB-reproducible for the oracle gate);
    pass ``train_ivf_codebook(...)`` output for the trained-k-means
    variant — the plan shape is identical either way. ``vectorized``
    (default) computes cell assignment + rerank with batched numpy
    matmuls (see the pandas_udf kernels above) instead of per-element
    expression chains; the expression path remains for parity tests."""
    if vectorized:
        cells1 = ivf_cells_pd_udf(dim, k_cells, 1, codebook)
        cellsN = ivf_cells_pd_udf(dim, k_cells, nprobe, codebook)
        v_cell = F.element_at(cells1(F.col(vec_col)), 1)
        q_cells = F.explode(cellsN(F.col(vec_col)))
        cos = cosine_pd_udf()
    else:
        v_cell = F.element_at(
            ivf_cells_col(F.col(vec_col), dim, k_cells, 1, codebook), 1
        )
        q_cells = F.explode(
            ivf_cells_col(F.col(vec_col), dim, k_cells, nprobe, codebook)
        )
        cos = cosine_col
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"),
        v_cell.alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        q_cells.alias("cell"),
    )
    cand = (
        q.join(v, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos(F.col("qv"), F.col("v")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_near_pairs(
    vectors: DataFrame, dim: int, threshold: float = 0.4,
    n_planes: int = 12, bands: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-gated (the scale path for
    dp_embedding_neardup): candidates are pairs agreeing on >=1
    signature band — an equi-join on (band, band_bits) — then exact
    cosine verification. The crossJoin all-pairs form is O(N^2) and
    exists only as the small-scale oracle baseline. ``vectorized``
    (default) runs signature + cosine as batched numpy matmuls."""
    sig_fn = (lsh_sig_pd_udf(dim, n_planes) if vectorized
              else lambda c: lsh_bucket_col(c, dim, n_planes))
    cos = cosine_pd_udf() if vectorized else cosine_col
    sig = vectors.select(
        F.col(id_col).alias("vec_id"),
        sig_fn(F.col(vec_col)).alias("sig"),
    )
    r_bits = n_planes // bands
    mask = F.lit((1 << r_bits) - 1)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("sig"), b * r_bits).bitwiseAND(mask).alias("bh"),
        )
        for b in range(bands)
    ])
    # Guide §8 proxy shape (round 6): only (vec_id, band, bh) flows
    # through the explode + self-join + pair dedup — the candidate
    # stream is O(N^2/buckets) rows, and carrying the embedding arrays
    # through it shipped ~1 KB per candidate per side. The arrays are
    # broadcast-joined back onto the DEDUPED pairs just before the
    # exact-cosine verify (the vectors table is the small side by
    # construction here; at corpus scale the re-attach becomes the
    # §8 join-strategy decision). Same candidates, same cosines.
    banded = sig.select("vec_id", F.explode(band_structs).alias("x")).select(
        "vec_id", "x.band", "x.bh"
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), "band", "bh")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    eb = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    return (
        cand.join(F.broadcast(ea), "vec_a")
        .join(F.broadcast(eb), "vec_b")
        .withColumn("cosine", F.round(cos(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def lsh_topk(
    vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_planes: int = 12, bands: int = 4, id_col: str = "vec_id",
    vec_col: str = "embedding", vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates are pairs agreeing on at least one of
    ``bands`` (n_planes/bands)-bit signature bands — an equi-join on
    (band, band_bits) instead of the cross join. Recall/selectivity trade
    via bands: more bands of fewer bits = higher recall, more candidates.
    ``vectorized`` (default) computes signatures + rerank with batched
    numpy matmuls instead of per-element expression chains."""
    sig_fn = (lsh_sig_pd_udf(dim, n_planes) if vectorized
              else lambda c: lsh_bucket_col(c, dim, n_planes))
    cos = cosine_pd_udf() if vectorized else cosine_col
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"),
        sig_fn(F.col(vec_col)).alias("sig_v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        sig_fn(F.col(vec_col)).alias("sig_q"),
    )
    r_bits = n_planes // bands
    mask = F.lit((1 << r_bits) - 1)

    def keyed(df, sig, idc, vc):
        band_structs = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(sig), b * r_bits).bitwiseAND(mask).alias("bh"),
            )
            for b in range(bands)
        ])
        return df.select(idc, vc, F.explode(band_structs).alias("x")).select(
            idc, vc, "x.band", "x.bh"
        )

    cand = (
        keyed(q, "sig_q", "query_id", "qv")
        .join(keyed(v, "sig_v", "neighbor_id", "v"), ["band", "bh"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos(F.col("qv"), F.col("v")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_int8(vectors: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage
    /bandwidth step before shipping vectors to an ANN index (4x smaller
    than float32, 8x than float64). Per vector: ``scale = max|v| / 127``
    and ``q_i = floor(v_i / scale + 0.5)`` (explicit half-up rounding so
    Spark and the DuckDB oracle make bit-identical decisions — both
    evaluate the same IEEE-double expression element-by-element; no
    engine-specific round() tie rules in the hot path). The all-zero
    vector keeps scale 0 and an all-zero code.

    Output per vector: the int8 code array plus audit scalars — scale,
    q_min/q_max (range check: must stay in [-127, 127]), q_sum (code
    checksum) and max_abs_err (reconstruction bound: <= scale/2 + eps).
    All within-row higher-order functions: narrow, zero shuffle, and at
    100 TB the quantization is a free map over the scan; the audit
    scalars make the lossy step verifiable instead of trusted.
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = amax / F.lit(127.0)
    qexpr = F.transform(
        v,
        lambda x: F.when(F.col("__scale") == 0, F.lit(0))
        .otherwise(F.floor(x.cast("double") / F.col("__scale") + F.lit(0.5))
                   .cast("int")),
    )
    d = vectors.select(
        F.col(id_col), v.alias(vec_col), scale.alias("__scale")
    ).withColumn("qvec", qexpr)
    err = F.array_max(
        F.zip_with(
            v, F.col("qvec"),
            lambda x, q: F.abs(x.cast("double") - q * F.col("__scale")),
        )
    )
    return d.select(
        id_col,
        F.col("qvec").cast("array<tinyint>").alias("qvec"),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.array_min("qvec").cast("int").alias("q_min"),
        F.array_max("qvec").cast("int").alias("q_max"),
        F.aggregate("qvec", F.lit(0).cast("long"),
                    lambda acc, q: acc + q).alias("q_sum"),
        F.round(err, 6).alias("max_abs_err"),
    )
