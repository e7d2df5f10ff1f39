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

from pyspark.sql import Column, DataFrame
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
