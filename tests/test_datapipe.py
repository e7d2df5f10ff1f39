"""Training-data ops: hash-seeded operators (MinHash/SimHash/LSH) are
verified against independent Python implementations and recall targets;
the SQL-expressible ones are covered by scripts/verify_oracle.py and the
driver's DuckDB gate."""

import re

import pytest
from pyspark.sql import functions as F

from sqlite_otel_spark.datapipe import dedup as dd
from sqlite_otel_spark.datapipe import multimodal as mm
from sqlite_otel_spark.datapipe import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # add guaranteed near-duplicates: doc N' = doc N with one word changed
    dupes = (
        base.filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    return base.unionByName(dupes).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _python_tokens(text):
    return re.findall("[a-z0-9]+", text.lower())


def _python_shingles(text, n=3):
    t = _python_tokens(text)
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def test_shingles_match_python(spark, docs):
    got = {
        (r.doc_id, r.shingle)
        for r in dd.shingles(docs.filter(F.col("doc_id") < 5)).collect()
    }
    want = set()
    for r in docs.filter(F.col("doc_id") < 5).collect():
        for s in _python_shingles(r.text):
            want.add((r.doc_id, s))
    assert got == want


def test_jaccard_pairs_match_python(spark, docs):
    sub = docs.filter((F.col("doc_id") < 10) | (F.col("doc_id") >= 100000))
    got = {(r.doc_a, r.doc_b): r.jaccard for r in dd.jaccard_pairs(dd.shingles(sub), 0.5).collect()}
    rows = {r.doc_id: _python_shingles(r.text) for r in sub.collect()}
    want = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(rows[a] & rows[b])
            if inter:
                j = round(inter / len(rows[a] | rows[b]), 4)
                if j >= 0.5:
                    want[(a, b)] = j
    assert got == pytest.approx(want)
    # the planted near-dups must be found
    assert all((i, i + 100000) in got for i in range(10))


def test_minhash_lsh_recall(spark, docs):
    sh = dd.shingles(docs)
    exact = {
        (r.doc_a, r.doc_b) for r in dd.jaccard_pairs(sh, threshold=0.8).collect()
    }
    assert len(exact) >= 10  # planted dups are >0.8 jaccard
    cand = dd.minhash_lsh_candidates(dd.minhash_signatures(sh, 64), bands=16, rows=4)
    approx = {
        (r.doc_a, r.doc_b)
        for r in dd.jaccard_pairs(sh, threshold=0.8, candidates=cand).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9  # 16x4 banding: P(detect) ~ 1-(1-j^4)^16 >= .998 at j=.8
    assert approx <= exact


def test_gated_jaccard_default_recall(spark, docs):
    """The dp_ngram_jaccard default is the 16x2-banded MinHash gate over
    32 permutations: its output must be a subset of the exact all-pairs
    result with near-total recall at the 0.6 threshold."""
    sh = dd.shingles(docs)
    exact = {(r.doc_a, r.doc_b) for r in dd.jaccard_pairs(sh, 0.6).collect()}
    assert len(exact) >= 10  # planted near-dups
    cand = dd.minhash_lsh_candidates(dd.minhash_signatures(sh, 32), bands=16, rows=2)
    gated = {
        (r.doc_a, r.doc_b)
        for r in dd.jaccard_pairs(sh, 0.6, candidates=cand).collect()
    }
    assert gated <= exact
    assert len(gated & exact) / len(exact) >= 0.95  # 1-(1-j^2)^16 ≈ .999 at j=.6


def test_lsh_near_pairs_subset_of_exact(spark, emb):
    """dp_embedding_neardup_lsh (the scale path): every reported pair
    must also be an exact-cosine near-dup with the identical rounded
    cosine; the banded gate keeps a usable fraction of them."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in (
            a.crossJoin(b)
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cosine", F.round(sim.cosine_col(F.col("ea"), F.col("eb")), 4))
            .filter(F.col("cosine") >= 0.4)
        ).collect()
    }
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.lsh_near_pairs(emb, dim=64, threshold=0.4).collect()
    }
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == exact[k]
    if exact:
        # 12-plane/4-band gate: collision prob rises with cosine; random
        # vectors near the 0.4 floor collide ~1/3 of the time
        assert len(got) / len(exact) >= 0.2


def test_simhash_matches_python(spark, docs):
    import ctypes

    def xxhash64_py(spark_df_rows):  # use Spark itself to get token hashes
        pass

    sub = docs.filter(F.col("doc_id") < 20)
    got = {r.doc_id: r.simhash for r in dd.simhash(sub).collect()}

    # independent: compute via spark xxhash64 on distinct tokens, then fold
    # the bit-sums in Python
    toks = (
        sub.select("doc_id", F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))).alias("tok"))
        .withColumn("th", F.xxhash64("tok"))
        .collect()
    )
    from collections import defaultdict

    sums = defaultdict(lambda: [0] * 64)
    for r in toks:
        h = r.th & (2**64 - 1)
        for j in range(64):
            sums[r.doc_id][j] += 1 if (h >> j) & 1 else -1
    want = {}
    for d, bits in sums.items():
        fp = 0
        for j in range(64):
            if bits[j] > 0:
                fp |= 1 << j
        want[d] = ctypes.c_int64(fp).value
    assert got == want


def test_simhash_near_dups_find_planted(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in dd.simhash_near_dups(dd.simhash(docs), 3).collect()}
    hits = sum((i, i + 100000) in pairs for i in range(10))
    assert hits >= 8  # one-word change flips few bits; allow slack


def test_lsh_topk_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    brute = sim.brute_force_topk(emb, queries, k=10).collect()
    approx = sim.lsh_topk(emb, queries, dim=64, k=10).collect()
    bsets = {}
    for r in brute:
        bsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    asets = {}
    for r in approx:
        asets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bsets[q] & asets.get(q, set())) / len(bsets[q]) for q in bsets]
    assert sum(recalls) / len(recalls) >= 0.5  # 2x6-bit bands, random vectors


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    brute = sim.brute_force_topk(emb, queries, k=10).collect()
    approx = sim.ivf_topk(emb, queries, dim=64, k=10, k_cells=8, nprobe=2).collect()
    bsets, asets = {}, {}
    for r in brute:
        bsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        asets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bsets[q] & asets.get(q, set())) / len(bsets[q]) for q in bsets]
    # 2-of-8 probed cells scan ~1/4 of the corpus; near-neighbors
    # concentrate in the query's own cells, so recall beats that floor
    assert sum(recalls) / len(recalls) >= 0.35


def test_trained_ivf_codebook(spark, emb):
    """Lloyd-trained spherical k-means codebook: deterministic,
    unit-norm, moves off the seeded init, and the trained IVF retains
    recall at the same probe budget."""
    import math

    book1 = sim.train_ivf_codebook(emb, dim=64, k_cells=8, n_iter=2)
    book2 = sim.train_ivf_codebook(emb, dim=64, k_cells=8, n_iter=2)
    assert book1 == book2  # deterministic across runs
    init = [sim.ivf_centroid(64, c) for c in range(8)]
    assert book1 != init
    for v in book1:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9

    queries = emb.filter(F.col("vec_id") < 20)
    brute = sim.brute_force_topk(emb, queries, k=10).collect()
    approx = sim.ivf_topk(emb, queries, dim=64, k=10, k_cells=8, nprobe=2,
                          codebook=book1).collect()
    bsets, asets = {}, {}
    for r in brute:
        bsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        asets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bsets[q] & asets.get(q, set())) / len(bsets[q]) for q in bsets]
    assert sum(recalls) / len(recalls) >= 0.35


def test_multimodal_plumbing(spark, docs):
    media = mm.to_media(docs.filter(F.col("doc_id") < 30))
    feats = {r.doc_id: r for r in mm.extract_features(media).collect()}
    for r in docs.filter(F.col("doc_id") < 30).collect():
        f = feats[r.doc_id]
        n = len(r.text.encode())
        assert f.n_bytes == n
        assert (f.width, f.height) == (n % 640 + 1, n % 480 + 1)
        assert f.media_type == ["image", "audio", "video"][r.doc_id % 3]
    frames = mm.frame_sample(media.filter(F.col("doc_id") == 0))
    assert frames.count() >= 1
    # resize: fits the box, preserves aspect (within floor rounding),
    # byte count scales quadratically with the linear factor
    for r in mm.resize(media, 128, 96).collect():
        assert 1 <= r.resized_w <= 128 and 1 <= r.resized_h <= 96
        if r.width <= 128 and r.height <= 96:
            assert (r.resized_w, r.resized_h) == (r.width, r.height)
        else:
            assert (r.resized_w == 128) or (r.resized_h >= 95)


def test_exact_duplicates(spark, docs):
    twice = docs.unionByName(docs.filter(F.col("doc_id") < 3))
    groups = dd.exact_duplicates(twice).collect()
    assert len(groups) == 3
    assert all(g.n_docs == 2 for g in groups)


def test_text_stats_single_tokenization_pass(spark, docs):
    """Round-3 one-pass text kernel: lang-ID (9 markers) + quality
    (7 stopwords + 3 derived stats) over a shared materialized token
    array must keep exactly ONE regexp tokenization in the optimized
    plan (the old form scanned the full text once per needle), and the
    token-filter counts must match a pure-Python recount."""
    from sqlite_otel_spark.datapipe import text as dtext

    base = docs.withColumn("__tokens", dtext.tokens_col(F.col("text")))
    qcols = dtext.quality_cols(F.col("text"), F.col("__tokens"))
    df = base.select(
        "doc_id",
        dtext.lang_id_col(F.col("text"), F.col("__tokens")).alias("lang_pred"),
        *[c.alias(n) for n, c in qcols.items()],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") == 1

    got = {r.doc_id: r for r in df.filter(F.col("doc_id") < 20).collect()}
    for r in docs.filter(F.col("doc_id") < 20).collect():
        toks = _python_tokens(r.text)
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        stop = sum(1 for t in toks if t in {"the", "and", "of", "a", "to", "in", "is"})
        assert g.stopword_ratio == pytest.approx(
            round(stop / max(len(toks), 1), 4))
        assert g.mean_token_len == pytest.approx(
            round(sum(map(len, toks)) / max(len(toks), 1), 4))
