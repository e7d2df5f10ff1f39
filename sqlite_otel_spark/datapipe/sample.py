"""Deterministic sampling operators for a training-data pipeline
(brief §datapipe adjacency: corpus subsampling / mixture weighting).

Spark's ``DataFrame.sample``/``sampleBy`` draw from partition-seeded
RNGs — the kept set changes with partitioning, parallelism and even
plan rewrites, which is poison for reproducible training corpora. These
operators gate each row on a pure HASH of its id instead: the kept set
is a function of (id, salt, fraction) alone — identical on any cluster
size, any engine (the DuckDB oracle reproduces it with the same md5
arithmetic), and stable under resume. This is the standard
deterministic-sampling construction for web-scale corpus work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sqlite_otel_spark.datapipe.dedup import md5hash60

# Gate resolution: fractions are exact multiples of 1/SCALE.
SCALE = 1_000_000


def sample_gate(id_col: Column, fraction: float, salt: str = "") -> Column:
    """True iff the row survives a deterministic ``fraction`` sample:
    md5hash60(salt || id) mod SCALE < fraction * SCALE. The 60-bit md5
    prefix is uniform, so the kept share converges to ``fraction``
    (exact in expectation; a pure function of the id — no RNG)."""
    h = md5hash60(F.concat(F.lit(salt), id_col.cast("string")))
    return F.pmod(h, F.lit(SCALE)) < F.lit(int(round(fraction * SCALE)))


def deterministic_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                         salt: str = "") -> DataFrame:
    """Uniform deterministic sample: keep rows whose id-hash falls under
    ``fraction``. Narrow (no shuffle); the predicate is plain codegen."""
    return df.filter(sample_gate(F.col(id_col), fraction, salt))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixture weighting):
    each stratum keeps its own fraction of rows, gated by the same
    id-hash so the kept set is reproducible and strata stay consistent
    across runs (a doc kept at fraction f is also kept at any f' > f —
    nested samples for curriculum/ablation work come free). Strata not
    listed keep ``default_fraction``. Narrow — one codegen'd CASE over
    the hash, no shuffle, no RNG."""
    frac = F.lit(default_fraction)
    for value, f_keep in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(f_keep)).otherwise(frac)
    h = md5hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # round before the long cast: 0.1*10^6 is 100000.00000000001 in IEEE
    # double and a truncating cast of a value that lands BELOW the
    # integer (e.g. 0.29*10^6 = 289999.99...) would shift the gate
    return df.filter(
        F.pmod(h, F.lit(SCALE)) < F.round(frac * SCALE).cast("long")
    )


def split_assign(df: DataFrame, splits: dict[str, float],
                 id_col: str = "doc_id", salt: str = "",
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split assignment (reproducible
    corpus freezing): every row gets exactly one split label, decided
    by where ``md5hash60(salt || id) mod SCALE`` falls among the
    cumulative split thresholds. Pure function of (id, salt, splits):
    identical on any cluster size / engine (the DuckDB oracle uses the
    same md5 arithmetic), stable under resume, and CONSISTENT with
    ``deterministic_sample`` — the train split at fraction f is exactly
    the f-sample's kept set, and growing a split only reassigns rows
    from its right-hand neighbour (no churn inside the kept range).

    ``splits`` is an ordered name -> fraction map; fractions must sum
    to 1 (within rounding); the LAST split absorbs the sub-1e-6
    rounding remainder. Narrow: one codegen'd CASE over the hash, no
    shuffle, no RNG — at 100 TB this is a free projection on the scan.
    """
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = F.pmod(
        md5hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(SCALE),
    )
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    thresholds = []
    for name, frac in list(splits.items())[:-1]:
        cum += frac
        thresholds.append((name, int(round(cum * SCALE))))
    for name, cut in reversed(thresholds):
        expr = F.when(h < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mixture_weights(df: DataFrame, targets: dict[str, float],
                    strata_col: str = "lang",
                    token_count: Column | None = None,
                    weight_cap: float = 1.0) -> DataFrame:
    """Corpus mixture planning: given target token shares per stratum
    (domain/language), compute each stratum's current token share and
    the DOWNSAMPLING weight that moves the mixture toward the target —
    ``weight = min(cap, target_share / current_share)``, i.e. the
    per-stratum keep fraction to feed ``stratified_sample``. Strata
    absent from ``targets`` get target share 0 (dropped). This is the
    static-reweighting step every web-scale corpus recipe runs before
    training (aggregate statistics only — one partial-agg groupBy over
    the corpus, a scalar total, and a broadcast-size result; nothing
    here grows with corpus size except the single agg pass).

    Output: one row per stratum with n_docs, n_tokens, token_share,
    target_share, weight (all shares/weights rounded to 6 so the
    cross-engine hash is stable).
    """
    if token_count is None:
        from sqlite_otel_spark.datapipe.text import token_count_col

        token_count = token_count_col(F.col("text"))
    per = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(token_count).cast("long").alias("n_tokens"))
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    share = F.col("n_tokens") / total
    target = F.lit(0.0)
    for value, t_share in sorted(targets.items()):
        target = F.when(F.col(strata_col) == value,
                        F.lit(t_share)).otherwise(target)
    # Zero-token strata have no share to scale: target/share is 0/0
    # (NULL in Spark, NaN in DuckDB — divergent, and least() skipping
    # the NULL silently yielded weight=cap for a stratum whose target
    # is 0, ADVICE r4). Explicit: untargeted zero strata drop (0.0),
    # targeted ones keep-all (cap) — there is nothing to downsample.
    weight = F.when(
        F.col("n_tokens") > 0, F.least(F.lit(weight_cap), target / share)
    ).otherwise(
        F.when(target > 0, F.lit(float(weight_cap))).otherwise(F.lit(0.0))
    )
    return per.select(
        strata_col,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(target, 6).alias("target_share"),
        F.round(weight, 6).alias("weight"),
    )
