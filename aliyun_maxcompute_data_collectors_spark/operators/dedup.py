"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB (SURVEY.md build plan phase 5):
- exact dedup is one hash-groupBy (map-side combine, single shuffle);
- near-dup never goes quadratic: MinHash banding / LSH bucketing / label
  blocking bound candidate pairs, and only candidates get verified;
- all shingle/signature expressions are built-in functions (JVM-side);
  SimHash alone uses an Arrow-batched pandas UDF (bit-twiddling).

MinHash math: h(s) = first-8-hex-of-md5 as int; permutation_i(h) =
(a_i*h + b_i) mod p, p = 2^31-1.  md5 is engine-portable, which is what lets
the DuckDB oracle replicate signatures bit-for-bit (see minhash_sql_parts).
"""

from __future__ import annotations

import logging
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window
from aliyun_maxcompute_data_collectors_spark.operators.text import normalized

# deterministic permutation constants (generated once from a fixed LCG seed;
# odd multipliers, distinct offsets)
MINHASH_P = 2147483647  # 2^31 - 1
_A0, _B0, _M = 1103515245, 12345, 2**31


def _lcg_stream(seed: int):
    x = seed
    while True:
        x = (_A0 * x + _B0) % _M
        yield x


def minhash_perms(k: int, seed: int = 42) -> list[tuple[int, int]]:
    g = _lcg_stream(seed)
    out = []
    for _ in range(k):
        a = (next(g) % (MINHASH_P - 2)) + 1
        b = next(g) % (MINHASH_P - 1)
        out.append((a | 1, b))  # odd a
    return out


DEFAULT_K = 16
DEFAULT_BANDS = 4  # 4 rows per band with k=16
# default per-(band,bucket) membership cap for LSH pair emission: bounds
# candidate pairs at bands*cap/2 per doc (linear in corpus size) while a
# 100-member identical family still dedups fine via exact dedup first
DEFAULT_MAX_BUCKET = 100


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct word n-gram shingles of normalized text as array<string>.
    Documents shorter than n words get a single whole-text shingle."""
    c = normalized(col)
    words = F.split(c, r"\s+")
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(F.when(k >= n, grams).otherwise(F.array(c)))


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, shingle) exploded - the join-able form used by every near-dup op.

    Shingling amplifies rows ~(words-n)x, so the input is spread across the
    cluster first when its scan parallelism is low (single small file)."""
    from aliyun_maxcompute_data_collectors_spark.session import ensure_parallelism
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    return (
        src.select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle"))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_NULL_FP = "__NULL_TEXT__"


def _fp_or_sentinel(text_col: str) -> F.Column:
    """Fingerprint with NULL text mapped to a sentinel group: NULL never
    equals NULL in a join, which would silently drop every NULL-text row."""
    from aliyun_maxcompute_data_collectors_spark.operators.text import fingerprint
    return F.coalesce(fingerprint(text_col), F.lit(_NULL_FP))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fingerprint groups with >1 member: (fp, representative=min id, n_dups).
    One hash-groupBy; the canonical first pass of any dedup pipeline.
    NULL-text documents form one group (sentinel fingerprint)."""
    return (
        df.select(F.col(id_col).alias("id"), _fp_or_sentinel(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per identical normalized text."""
    groups = exact_dedup_groups(df, id_col, text_col)
    return (
        df.withColumn("__fp__", _fp_or_sentinel(text_col))
        .join(groups.select("fp", "keep_id"), F.col("__fp__") == F.col("fp"))
        .where(F.col(id_col) == F.col("keep_id"))
        .drop("__fp__", "fp", "keep_id")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (exact verification; candidates come from a join on
# shared shingles, never a cross product)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
    max_df: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """(id1, id2, jaccard) for pairs >= threshold.  Cost ~ sum over shingles
    of (docs sharing it)^2 - bounded for natural text.

    ``max_df`` caps the quadratic: shingles shared by more than ``max_df``
    DISTINCT CONTENTS (since round 4 - identical docs collapse first, so
    df counts unique texts, not raw documents; a boilerplate shingle in
    10^6 distinct docs alone makes 10^12 candidate pairs) are dropped from
    the shingle universe BEFORE the self-join, bounding per-shingle pair
    work at max_df^2.  Both the intersection AND the per-doc sizes use the
    filtered universe, so the output is the exact Jaccard over the kept
    shingle universe - a well-defined (and for boilerplate, usually
    better) similarity, not a biased estimate.  Note the unit change from
    pre-round-4: a shingle whose occurrences are concentrated in one big
    duplicate family now counts ONCE toward df, which keeps exact
    duplicates pairable (they report jaccard 1.0 regardless of the cap).
    Default None = exact classic Jaccard; ALWAYS set it on corpora you
    don't control.

    Identical-content collapse (round 4, exact-output-preserving): docs
    with the SAME normalized text collapse to one representative before
    the shingle self-join, and pairs re-expand afterwards - cross-group
    pairs inherit the representatives' jaccard (identical shingle sets =>
    identical similarity), within-group pairs are jaccard 1.0 by
    definition.  This bounds the per-shingle quadratic by the number of
    DISTINCT contents, not docs: a 100-member duplicate family used to
    push ~100^2 x shingles-per-doc intermediate rows through the join
    (the r4 sf10 smoke OOMed an 8g heap exactly there); now it
    contributes 1 representative and only the final (output-sized) pair
    expansion sees the members.

    ``metric`` selects the similarity (same candidate generation, same
    shuffles - only the denominator of the final scalar changes):
    ``"jaccard"`` = inter / union (symmetric; output column ``jaccard``);
    ``"containment"`` = inter / min(|A|, |B|) (detects SUBSET duplicates -
    a short doc fully contained in a longer one scores 1.0 under
    containment but arbitrarily low under Jaccard because the union is
    dominated by the longer doc; output column ``containment``).
    Containment is the standard complement to Jaccard in dedup pipelines
    for quote/excerpt/concatenation artifacts."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(
            f"metric must be 'jaccard' or 'containment', got {metric!r}")
    sim_col = metric
    grp = df.select(F.col(id_col).alias("__gid"),
                    _fp_or_sentinel(text_col).alias("__fp"))
    reps = grp.groupBy("__fp").agg(F.min("__gid").alias("__rep"),
                                   F.count(F.lit(1)).alias("__gn"))
    # cached like ``sh`` below and for the same reason (r13): this
    # relation is referenced FIVE times downstream (rep_df's semi-join,
    # m1/m2 pair expansion, both sides of the within-group self-join) -
    # uncached, each reference re-ran the doc scan + fingerprint
    # aggregate + join (20 parquet scans in one executed plan).  Four
    # narrow columns, O(docs) rows - strictly smaller than the cached
    # shingle table.
    members = grp.join(reps, "__fp").select(
        F.col("__fp"), F.col("__gid"), F.col("__rep"), F.col("__gn")).cache()
    rep_df = (df.join(members.where(F.col("__gid") == F.col("__rep"))
                      .select(F.col("__gid").alias(id_col)), id_col, "left_semi"))

    sh = shingle_table(rep_df, id_col, text_col, n)
    if max_df is not None:
        # df counts are over REPRESENTATIVES (distinct contents): the cap
        # semantics "shared by more than max_df distinct contents" - for
        # identical docs the shingle universe is per-content anyway
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sh = sh.cache()
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c1 = counts.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    denom = (F.least("n1", "n2") if metric == "containment"
             else F.col("n1") + F.col("n2") - F.col("inter"))
    rep_pairs = (
        inter.join(c1, "id1").join(c2, "id2")
        .withColumn(sim_col, F.round(F.col("inter") / denom, 4))
        .where(F.col(sim_col) >= threshold)
        .select("id1", "id2", sim_col)
    )
    # expand representative pairs to member pairs (cross-group) ...
    m1 = members.select(F.col("__rep").alias("id1"), F.col("__gid").alias("m1"))
    m2 = members.select(F.col("__rep").alias("id2"), F.col("__gid").alias("m2"))
    cross = (
        rep_pairs.join(m1, "id1").join(m2, "id2")
        .select(F.least("m1", "m2").alias("id1"),
                F.greatest("m1", "m2").alias("id2"), sim_col)
    )
    # ... and add within-group pairs (identical contents: similarity = 1.0
    # under either metric)
    out = cross
    if threshold <= 1.0:
        # NULL-text docs share the sentinel fp but have NO shingles (both
        # engines emit no rows for them) - never pair them
        real = members.where((F.col("__gn") > 1)
                             & (F.col("__fp") != _NULL_FP))
        g1 = real.alias("g1")
        g2 = real.alias("g2")
        within = (
            g1.join(g2, (F.col("g1.__rep") == F.col("g2.__rep"))
                    & (F.col("g1.__gid") < F.col("g2.__gid")))
            .select(F.col("g1.__gid").alias("id1"),
                    F.col("g2.__gid").alias("id2"),
                    F.lit(1.0).alias(sim_col))
        )
        out = cross.unionByName(within)
    return out


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """(id1, id2, containment) for pairs whose shared-shingle count covers
    >= ``threshold`` of the SMALLER doc's shingle set - the asymmetric
    complement to :func:`ngram_jaccard_pairs` that catches excerpt /
    quote / concatenation duplicates symmetric Jaccard misses (a 50-token
    doc embedded verbatim in a 5000-token doc has containment 1.0 and
    Jaccard ~0.01).  Same blocked candidate generation, identical-content
    collapse, and ``max_df`` hot-shingle cap as the Jaccard pass - one
    shingle self-join, never all-pairs."""
    return ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold,
                               max_df=max_df, metric="containment")


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    block_tail: int = 2,
) -> DataFrame:
    """(id1, id2, edit_dist) for near-identical short strings: blocked
    Levenshtein, the entity-resolution primitive (record linkage on names /
    SKUs / URLs).

    An all-pairs edit-distance scan is O(n^2) and unshardable; standard
    practice is BLOCKING: only compare candidates agreeing on a cheap key.
    Block key here = (length, prefix up to ``len - block_tail``), i.e. a
    pair is considered only if the strings share everything but the last
    ``block_tail`` characters and have equal length — which bounds recall
    (edits inside the prefix or length-changing edits are missed; widen
    with additional passes on other keys, e.g. suffix or sorted-odd/even
    chars, exactly like multi-probe LSH) but makes the join a plain
    equijoin: one shuffle on the block key, pair work bounded by the
    largest block, never n^2.
    """
    blk = F.struct(
        F.length(F.col(text_col)).alias("len"),
        F.substring(
            F.col(text_col), 1,
            F.greatest(F.length(F.col(text_col)) - block_tail, F.lit(0)),
        ).alias("pfx"),
    )
    side = df.select(F.col(id_col), F.col(text_col), blk.alias("__blk"))
    if max_dist == 1:
        # Exact OUTPUT-SENSITIVE path: blocked pairs have equal length, and
        # for EQUAL-LENGTH strings lev<=1 is equivalent to hamming<=1 (a
        # length-preserving single edit must be a substitution).  Instead of
        # materializing every within-block pair and filtering, use
        # wildcard-position keys (the deletion-neighborhood trick): pass i
        # joins on (block, tail with char i masked out), so the ONLY pairs
        # generated already agree everywhere except possibly position i —
        # pair work is proportional to true near-matches, not block^2.
        # Identical strings collide in every pass; the min-agg dedups them.
        outs = []
        for i in range(1, block_tail + 1):
            key = F.struct(
                F.col("__blk"),
                *[F.substring(F.col(text_col), -j, 1).alias(f"c{j}")
                  for j in range(1, block_tail + 1) if j != i],
            )
            ci = F.substring(F.col(text_col), -i, 1)
            a = side.select(key.alias("__key"), F.col(id_col).alias("id1"),
                            ci.alias("x1"))
            b = side.select(key.alias("__key"), F.col(id_col).alias("id2"),
                            ci.alias("x2"))
            outs.append(
                a.join(b, ["__key"])
                .where(F.col("id1") < F.col("id2"))
                .select("id1", "id2",
                        (F.col("x1") != F.col("x2")).cast("int").alias("d"))
            )
        allp = reduce(lambda x, y: x.unionByName(y), outs)
        return (
            allp.groupBy("id1", "id2").agg(F.min("d").alias("edit_dist"))
        )
    a = side.select(
        F.col("__blk"), F.col(id_col).alias("id1"), F.col(text_col).alias("t1"))
    b = side.select(
        F.col("__blk"), F.col(id_col).alias("id2"), F.col(text_col).alias("t2"))
    return (
        a.join(b, ["__blk"])
        .where(F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", F.levenshtein("t1", "t2"))
        .where(F.col("edit_dist") <= max_dist)
        .select("id1", "id2", "edit_dist")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """(id, n_contaminated_ngrams) for corpus docs sharing at least one word
    n-gram with any benchmark document - the standard eval-set leakage check
    run before training-data release.

    Scale shape: the benchmark side (eval sets: 10^3-10^5 docs) collapses to
    a DISTINCT n-gram set and is broadcast, so the corpus side - the 100 TB
    side - streams through a map-side semi join with no shuffle of corpus
    text.  The corpus's exploded shingles shuffle only for the final per-doc
    count (narrow (id, shingle) rows).  Anti-join the result against the
    corpus to drop flagged docs."""
    bench_grams = (
        benchmark.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    return (
        shingle_table(corpus, id_col, text_col, n)
        .join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _md5_int(col: Column) -> Column:
    """First 8 hex digits of md5 as a bigint - the engine-portable base hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    n: int = 5,
    seed: int = 42,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over shingles of each permuted hash.

    Computed entirely per-row with higher-order array functions: ZERO
    shuffles and no row explosion - the explode+groupBy formulation costs a
    full shuffle of ~words-per-doc x rows, this one is a narrow projection.
    The md5-derived hash array is materialized once per document, then ONE
    fold over it updates all k running minima together (an array<long>
    accumulator via zip_with/least) - measured ~15%% faster than k separate
    transform->array_min passes, which traverse the hash array k times."""
    from aliyun_maxcompute_data_collectors_spark.session import ensure_parallelism
    perms = minhash_perms(k, seed)
    src = ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    if hash_fn == "md5":
        shingle_hash = lambda s: F.conv(  # noqa: E731
            F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        # production fast path: one JVM hash vs md5's crypto rounds +
        # hex/conv string work.  NOT oracle-portable (DuckDB lacks xxhash64)
        # - signatures differ from the md5 path but the MinHash estimator
        # properties are identical; pick one hash per corpus and stick to it
        # (stores from incremental dedup embed it).
        shingle_hash = lambda s: F.pmod(  # noqa: E731
            F.xxhash64(s), F.lit(MINHASH_P)).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    hs = F.transform(word_shingles(text_col, n), shingle_hash)
    stage = src.select("id", hs.alias("__hs__"))

    a_arr = F.array(*[F.lit(a) for a, _ in perms])
    b_arr = F.array(*[F.lit(b) for _, b in perms])
    # shingle arrays are never empty (word_shingles emits the whole text as
    # one shingle for short docs), so the sentinel init never survives
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), k)
    folded = F.aggregate(
        F.col("__hs__"),
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % F.lit(MINHASH_P)),
            lambda m, v: F.least(m, v),
        ),
    )
    return stage.select(
        "id", folded.alias("__sig__")
    ).select(
        "id", *[F.col("__sig__").getItem(i).alias(f"sig_{i}") for i in range(k)]
    )


def minhash_sql_parts(text_expr: str, k: int = DEFAULT_K, n: int = 5, seed: int = 42
                      ) -> tuple[str, list[str]]:
    """DuckDB mirror of (shingle hash, per-permutation min exprs) generated
    from the same constants as minhash_signature - single source of truth."""
    perms = minhash_perms(k, seed)
    h = "CAST(('0x' || substr(md5(shingle),1,8)) AS BIGINT)"
    mins = [
        f"MIN(({a} * {h} + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(perms)
    ]
    shingles = f"""
      SELECT id, shingle FROM (
        SELECT id, unnest(CASE WHEN len(w) >= {n}
               THEN list_distinct(list_transform(range(1, len(w)-{n}+2), i -> array_to_string(w[i:i+{n-1}], ' ')))
               ELSE [array_to_string(w, ' ')] END) AS shingle
        FROM (SELECT id, string_split(trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g')), ' ') AS w FROM _src)
      )"""
    return shingles, mins


def minhash_band_buckets(sig: DataFrame, k: int = DEFAULT_K,
                         bands: int = DEFAULT_BANDS) -> DataFrame:
    """(id, band, bucket) rows from a signature frame - THE band-bucket
    derivation, shared by every LSH consumer (pair join, incremental dedup,
    query oracles, pipelines) so persisted bucket stores stay bit-compatible
    with freshly computed ones.  ``bucket = md5(concat_ws(',', sig_band))``."""
    rows = k // bands
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"sig_{bi * rows + r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(bi).alias("band"),
                                  F.md5(F.concat_ws(",", *cols)).alias("bucket")))
    return sig.select("id", F.explode(F.array(*band_cols)).alias("bb")) \
        .select("id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    n: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    warn_recall: bool = False,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs via banding: docs sharing any band bucket become
    candidates; candidates are verified with the exact signature similarity
    (fraction of matching minhashes >= threshold).

    ``hash_fn='xxhash64'`` swaps the shingle hash for one JVM xxhash64
    (no md5 crypto rounds, no hex/conv string work).  Signatures differ
    from the md5 path but the MinHash estimator is identical, so the
    verified PAIR SET is statistically equivalent (parity pinned by
    test); md5 stays the default because it is the cross-engine
    oracle-checkable rendering.  Pick one hash per corpus and stick with
    it - incremental stores embed it.

    ``max_bucket`` caps the per-bucket quadratic the same way
    ``ngram_jaccard_pairs(max_df=...)`` caps hot shingles: a (band, bucket)
    shared by more than ``max_bucket`` docs (a boilerplate near-dup family
    of size g emits ~g^2/2 pairs per band) is dropped BEFORE the self-join.
    Pairs inside an over-cap family are still found through any OTHER band
    that stays under the cap, so recall degrades only for families hot in
    EVERY band - which at that size are better handled by exact dedup or a
    representative-per-family pass first.  The cap is ON by default since
    round 4 (DEFAULT_MAX_BUCKET=100: pair output is bounded by
    ~bands*cap/2 per member row, i.e. LINEAR in corpus size; the r3 sf10
    smoke ran uncapped and went 11.1x at 10x data purely on quadratic
    family output - 26M pairs from 500k docs).  Pass ``max_bucket=None``
    to opt into unbounded output deliberately.  ``warn_recall=True`` adds
    an eager over-cap count so recall loss is LOGGED when buckets drop -
    one extra aggregate job per call, so it is opt-in.

    Scale shape: signatures (1 row/doc) -> explode to `bands` rows/doc ->
    groupBy band bucket (shuffle ~ corpus size, not pairs) -> pair join only
    within buckets."""
    # materialize signatures once: the band self-join references them on BOTH
    # sides, and without a lineage cut each side would recompute the full
    # shingle->md5->min pipeline (2x the dominant cost)
    sig = minhash_signature(df, id_col, text_col, k, n, seed,
                            hash_fn).localCheckpoint(eager=True)
    # narrow (id, band, bucket) rows only - the self-join and distinct never
    # carry the k signature columns; signatures re-attach to the (much
    # smaller) candidate pair set afterwards
    buckets = minhash_band_buckets(sig, k, bands)
    if max_bucket is not None:
        # count-agg is deliberately kept over two cheaper-at-small-SF
        # alternatives (both measured r4): a windowed count sorts every hot
        # bucket's rows into one partition, and a collect_list+explode
        # rewrite (1.35s vs 1.47s at sf0.1, identical output) materializes
        # an over-cap bucket as ONE array in an agg buffer - a 10M-member
        # degenerate bucket OOMs an executor there.  The count agg is
        # partially aggregated map-side, so hot buckets are identified
        # without ever concentrating their rows or bytes, and hot groups
        # are the RARE side by construction (each holds > max_bucket rows,
        # so there are at most rows/max_bucket of them - 1% of the relation
        # at the default cap).
        counts = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        hot = counts.where(F.col("__n") > max_bucket).select("band", "bucket")
        if warn_recall:
            # Opt-in diagnostic (VERDICT r5 ask #3 resolution): the
            # recall-loss warning needs the over-cap group count, which is
            # an EXTRA eager aggregate job per call - measured +~0.4s at
            # sf0.1, and a full extra pass over the band relation at 100 TB
            # - so the default path stays lazy and pipelines that want the
            # recall signal pay for it explicitly.
            n_over = hot.count()
            if n_over:
                logging.getLogger(__name__).warning(
                    "minhash_lsh_pairs: %d (band,bucket) groups exceed "
                    "max_bucket=%d and were dropped before the pair join; "
                    "pairs inside those families are found only via other "
                    "bands (run exact dedup first, or pass max_bucket=None "
                    "for unbounded output)", n_over, max_bucket)
                # hot is tiny in every non-degenerate corpus; past ~1M
                # groups (>100M over-cap rows) fall back to a shuffle
                # anti-join rather than build an oversized broadcast table
                anti = F.broadcast(hot) if n_over <= 1_000_000 else hot
                buckets = buckets.join(anti, ["band", "bucket"], "left_anti")
            # else: nothing over cap - skip the join entirely
        else:
            # Default: one LAZY broadcast anti-join, zero extra jobs.  The
            # hot set builds map-side-combined inside the broadcast
            # exchange of the SAME job as the pair join; an empty hot set
            # broadcasts a few bytes and the probe passes through map-side,
            # so the no-over-cap common case costs ~nothing and the rows of
            # a degenerate 10M-member bucket never travel at all.
            buckets = buckets.join(F.broadcast(hot), ["band", "bucket"],
                                   "left_anti")
    # persist the capped band relation (VERDICT r6 #8): the self-join
    # references it on BOTH sides, so without a cache the hashing +
    # anti-join pipeline runs twice (and its run-to-run scheduling split
    # was the measured 1.41-1.71s spread).  persist() is LAZY - the first
    # self-join stage computes and caches, the second reads the cache, no
    # extra job - and the frame is narrow (id, band, bucket).  The cached
    # RDD is released by the ContextCleaner when the DataFrame goes out
    # of scope (same lifecycle as the sig localCheckpoint above).
    buckets = buckets.persist()
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    s1 = sig.select(F.col("id").alias("id1"),
                    *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(k)])
    s2 = sig.select(F.col("id").alias("id2"),
                    *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(k)])
    paired = cand.join(s1, "id1").join(s2, "id2")
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        paired.withColumn("sig_sim", F.round(matches / F.lit(float(k)), 4))
        .where(F.col("sig_sim") >= threshold)
        .select("id1", "id2", "sig_sim")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) - pandas UDF (bit ops over token hashes)
# ---------------------------------------------------------------------------

def simhash64(tokens_hash: list[int]) -> int:
    """Pure-python reference: sign-aggregate each of 64 bits."""
    acc = [0] * 64
    for h in tokens_hash:
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out - (1 << 64) if out >= (1 << 63) else out


@pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    import hashlib

    def one(t):
        if t is None:
            return None
        toks = " ".join(str(t).lower().split()).split(" ")
        if not toks or toks == [""]:
            return 0
        hs = np.array(
            [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for bit in np.nonzero(acc > 0)[0]:
            out |= np.uint64(1) << np.uint64(bit)
        return int(out.astype(np.int64))

    return texts.map(one)


def simhash(col: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens (md5-based token hashes)."""
    c = F.col(col) if isinstance(col, str) else col
    return _simhash_udf(c)


SIMHASH32_BITS = 32


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash as pure built-in expressions — no Python in the loop,
    and (unlike the 64-bit variant, whose unsigned bit-twiddling neither
    engine's SQL can express) oracle-checkable: token hash = first-8-hex-of-
    md5 as long, per-bit sign votes accumulated with higher-order functions,
    bit b read arithmetically as floor(h / 2^b) % 2 (== (h >> b) & 1 for the
    non-negative 32-bit hashes).  NULL text -> NULL signature."""
    raw = F.col(col) if isinstance(col, str) else col
    toks = F.split(normalized(raw), " ")
    hs = F.transform(
        toks, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH32_BITS)])
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH32_BITS)
    votes = F.aggregate(
        hs, zero,
        lambda acc, h: F.zip_with(
            acc, powers, lambda a, p: a + (F.floor(h / p) % 2) * 2 - 1
        ),
    )
    sig = F.aggregate(
        F.zip_with(votes, powers,
                   lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    return F.when(raw.isNull(), F.lit(None).cast("long")).otherwise(sig)


def simhash32_py(text: str) -> int:
    """Pure-python reference for simhash32 (tests)."""
    import hashlib
    toks = " ".join(text.lower().split()).split(" ")
    acc = [0] * SIMHASH32_BITS
    for w in toks:
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        for b in range(SIMHASH32_BITS):
            acc[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(SIMHASH32_BITS) if acc[b] > 0)


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-limited by
    bit-chunk blocking: the signature splits into ``max_hamming + 1`` chunks,
    so any pair within the distance shares at least one chunk (pigeonhole) -
    detection is exact, never probabilistic.  Smaller chunks (higher
    max_hamming) admit more candidates; the verify stage stays cheap
    (one XOR+popcount per candidate)."""
    from aliyun_maxcompute_data_collectors_spark.session import ensure_parallelism
    if max_hamming > 63:
        raise ValueError("max_hamming must be <= 63 for a 64-bit signature")
    # pigeonhole needs max_hamming+1 chunks; capping below that would
    # silently break the exactness guarantee
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    sig = src.select(F.col(id_col).alias("id"), simhash(text_col).alias("sh"))
    chunks = sig.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     F.shiftrightunsigned("sh", chunk_bits * i)
                     .bitwiseAND(F.lit(mask)).alias("cv"))
            for i in range(n_chunks)
        ])).alias("c"),
    ).select("id", "sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.ci") == F.col("b.ci")) & (F.col("a.cv") == F.col("b.cv"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                F.col("a.sh").alias("sh1"), F.col("b.sh").alias("sh2"))
        .dropDuplicates(["id1", "id2"])
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


# ---------------------------------------------------------------------------
# one-call corpus dedup pipeline
# ---------------------------------------------------------------------------

def dedupe_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    method: str = "exact",          # exact | minhash | simhash | ngram
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Return the deduplicated corpus: one survivor (min id) per duplicate
    group under the chosen method.  Near-dup methods build pair graphs and
    drop every doc that pairs with a lower id - a transitive-lite policy
    (no connected components; each doc compares against its direct pairs),
    which is the standard one-pass choice at corpus scale."""
    if method == "exact":
        return exact_dedup(df, id_col, text_col)
    if method == "minhash":
        pairs = minhash_lsh_pairs(df, id_col, text_col, threshold=threshold, **kw)
    elif method == "simhash":
        pairs = simhash_dup_pairs(df, id_col, text_col,
                                  max_hamming=int(kw.pop("max_hamming", 3)))
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(df, id_col, text_col, threshold=threshold, **kw)
    else:
        raise ValueError(f"unknown dedup method {method!r}")
    losers = pairs.select(F.col("id2").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# C4-style duplicate-span removal (sub-document dedup)
# ---------------------------------------------------------------------------

def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_words: int = 20,
) -> DataFrame:
    """Remove duplicated sub-document spans across the whole corpus, keeping
    only the globally-first occurrence of each span (C4's "discard any
    three-sentence span seen before" rule, at aligned word-window
    granularity since the synthetic corpus has no sentence punctuation).

    Reference parity: the reference engines dedup whole rows only; this is
    a training-data-pipeline extension (SURVEY beyond-reference scope).

    Plan shape (scale notes):
      1. split -> explode aligned ``span_words``-word windows (narrow);
      2. hash-groupBy span fingerprint picking the lexicographic-min
         (id, span_idx) winner — partial-aggregable, so a boilerplate span
         repeated in 10^6 docs costs one combiner row per input partition,
         never a hot-key reduce;
      3. fp-equi join back (1 winner row per fp — no fanout) to drop
         non-first occurrences;
      4. per-doc reassembly (groupBy id, ordered array_sort concat).
    Three shuffles total, all key-partitioned; nothing quadratic.

    Returns one row per doc that retains >=1 span:
    (id, n_spans, n_kept, text_dedup).  Docs whose every span was seen
    earlier elsewhere are dropped entirely (the C4 behavior).
    """
    base = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"),
                F.split(F.trim(F.col(text_col)), r"\s+").alias("words"))
    )
    spans = (
        base
        .withColumn("n_spans",
                    F.ceil(F.size("words") / F.lit(span_words)).cast("int"))
        .select("id", "n_spans", "words",
                F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("span_idx"))
        .select(
            "id", "n_spans", "span_idx",
            F.array_join(
                F.slice("words", F.col("span_idx") * span_words + 1, span_words),
                " ").alias("span"))
        .withColumn("fp", F.md5(F.col("span")))
    )
    winners = spans.groupBy("fp").agg(
        F.min(F.struct(F.col("id").alias("d"), F.col("span_idx").alias("p"))).alias("w"))
    kept = (
        spans.join(winners, "fp")
        .where((F.col("id") == F.col("w.d")) & (F.col("span_idx") == F.col("w.p")))
    )
    return (
        kept.groupBy("id")
        .agg(
            F.max("n_spans").alias("n_spans"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                    lambda s: s["span"]),
                " ").alias("text_dedup"),
        )
    )


# ---------------------------------------------------------------------------
# stride-1 exact substring dedup (Lee et al. 2022)
# ---------------------------------------------------------------------------

def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
) -> DataFrame:
    """Exact substring deduplication at stride 1 (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): remove
    from each document every word position covered by a ``k``-word
    window whose text occurs at a lexicographically earlier
    (doc, position) anywhere in the corpus.  Unlike :func:`span_dedup`
    (aligned windows only - C4's cheaper rule), this catches duplicated
    passages at ANY offset, the common case for boilerplate shifted by a
    prefix.  The paper builds a corpus suffix array on one machine; the
    Spark-first equivalent materializes stride-1 k-gram fingerprints and
    resolves first-occurrence by hash aggregation - the standard
    distributed reformulation (each duplicated substring of length
    >= k is fully covered by its duplicated k-windows, so coverage
    removal is equivalent on word boundaries).

    Reference parity: the reference engines dedup whole rows only; this
    is a training-data-pipeline extension (SURVEY beyond-reference
    scope).

    Plan shape (scale notes):
      1. stride-1 explode: one row per word position (~total token
         count; narrow, no shuffle);
      2. hash-groupBy fingerprint -> (min (id,pos) winner, count) -
         partial-aggregable, so a boilerplate window repeated in 10^6
         docs costs one combiner row per input partition, never a
         hot-key sort (this is why it is NOT a row_number window);
      3. fp-equi join back (1 winner row per fp, no fanout) keeps only
         non-first occurrences ("dup windows");
      4. everything downstream is restricted to AFFECTED docs by a
         semi-join, so the word-level explode + coverage anti-join cost
         scales with the duplicated subset, not the corpus.
    Four key-partitioned shuffles; nothing quadratic, no hot-key sorts.

    Returns one row per AFFECTED doc (docs with zero duplicated windows
    pass through unchanged and are not emitted):
    ``(id, n_words, n_removed, text_dedup)`` - ``text_dedup`` is the
    document with covered words removed ('' if fully covered).
    """
    if k < 2:
        raise ValueError("substring_dedup needs k >= 2")
    base = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"),
                F.split(F.trim(F.col(text_col)), r"\s+").alias("words"))
        .withColumn("n_words", F.size("words"))
    )
    grams = (
        base.where(F.col("n_words") >= k)
        .select("id",
                F.explode(F.sequence(F.lit(0), F.col("n_words") - k)).alias("pos"),
                "words")
        .select("id", "pos",
                F.md5(F.array_join(
                    F.slice("words", F.col("pos") + 1, k), " ")).alias("fp"))
    )
    winners = grams.groupBy("fp").agg(
        F.min(F.struct(F.col("id").alias("d"), F.col("pos").alias("p"))).alias("w"),
        F.count(F.lit(1)).alias("c"))
    # persist() is LAZY and pays for itself immediately: ``dup`` feeds four
    # downstream consumers (affected x2, cover x2), and without the cache
    # the whole gram-explode + winner-agg + join subtree - the dominant
    # cost - re-executes once per consumer.  ``dup`` itself is only the
    # duplicated occurrences (small by construction on a mostly-unique
    # corpus), so the cached footprint is bounded by the dup rate, not the
    # corpus.  Falls out of scope with the returned DataFrame.
    dup = (
        grams.join(winners.where(F.col("c") >= 2), "fp")
        .where(~((F.col("id") == F.col("w.d")) & (F.col("pos") == F.col("w.p"))))
        .select("id", "pos")
        .persist()
    )
    affected = dup.select("id").distinct()
    cover = (
        dup.select("id", F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("wpos"))
        .distinct()
    )
    words_pos = (
        base.join(affected, "id")
        .select("id", "n_words", F.posexplode("words").alias("wpos", "word"))
    )
    kept = words_pos.join(cover, ["id", "wpos"], "left_anti")
    kept_text = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "word"))),
                lambda s: s["word"]),
            " ").alias("text_dedup"))
    removed = cover.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_removed"))
    return (
        base.join(affected, "id")
        .select("id", "n_words")
        .join(removed, "id")
        .join(kept_text, "id", "left")
        .select("id", "n_words", "n_removed",
                F.coalesce("text_dedup", F.lit("")).alias("text_dedup"))
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
    allow_quadratic: bool = False,
    max_block: int | None = None,
) -> DataFrame:
    """(id1, id2, cos) for pairs with cosine >= threshold.  ``block_col``
    (e.g. a cluster/label/LSH-bucket column) bounds the pair space - use
    lsh blocking from similarity.py (or SemDeDup's k-means cells) first.

    Without blocking this is an all-pairs O(n^2) join, which no cluster
    survives at corpus scale - so it RAISES unless the caller passes
    ``allow_quadratic=True`` explicitly (small, already-bounded inputs
    only).  A silent quadratic default is how 100-TB jobs die.

    ``max_block`` guards the SUBTLER failure (measured at sf10, round 6):
    blocking only bounds the pair space while blocks stay small, and a
    coarse block column whose groups grow WITH the corpus reintroduces
    the quadratic inside each block - a 50k-member label is 1.25e9
    comparisons.  With ``max_block`` set, over-cap blocks are dropped
    before the self-join by a lazy broadcast anti-join (the hot side is
    rare by construction - same design as minhash_lsh_pairs' bucket cap);
    pairs inside a dropped block should come from a FINER blocking (IVF
    cells, LSH buckets) instead."""
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import cosine_expr
    if block_col is None and not allow_quadratic:
        raise ValueError(
            "embedding_dup_pairs without block_col is an all-pairs O(n^2) "
            "join; pass block_col (cluster/LSH bucket) or opt in with "
            "allow_quadratic=True on provably small inputs"
        )
    sel = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        sel.append(F.col(block_col).alias("blk"))
    s = df.select(*sel)
    if block_col and max_block is not None:
        hot = (s.groupBy("blk").agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") > max_block).select("blk"))
        s = s.join(F.broadcast(hot), ["blk"], "left_anti")
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs an accumulated historical store
# ---------------------------------------------------------------------------
# The production shape at 100 TB is never "dedup the whole corpus at once":
# a daily increment (GBs) must dedup against the historical corpus (100 TB)
# without rescanning it.  Both operators below keep compact persistent
# stores (fingerprints / band buckets + signatures, one-or-few rows per doc)
# and join the small batch against them; re-deduping history never happens.
# At scale, persist the stores as catalog tables BUCKETED on the join key
# (fp / (band, bucket)) - then each batch join shuffles ONLY the batch side
# (see catalog.BucketSpec; the zero-exchange co-located join is asserted in
# tests/test_catalog.py).

def incremental_exact_dedup(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    store: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact-dedup a new batch within itself AND against the historical
    fingerprint store; returns ``(kept_rows, store_delta)``.

    ``store`` holds one ``(fp, keep_id)`` row per distinct historical text
    (None = first batch).  ``kept_rows`` are batch rows whose normalized
    text is new: not in history, and the min-id representative within the
    batch.  ``store_delta`` is the fingerprint rows to append to the store.

    Plan: one batch-side aggregate (min id per fp), one left-anti join
    against the store on fp, one semi join back to the batch rows.  The
    store is never aggregated or rewritten - append-only.
    """
    fp = _fp_or_sentinel(text_col)
    reps = (
        batch.select(F.col(id_col).alias("__id"), fp.alias("fp"))
        .groupBy("fp").agg(F.min("__id").alias("keep_id"))
    )
    if store is not None:
        reps = reps.join(store.select("fp"), "fp", "left_anti")
    kept = (
        batch.withColumn("__fp", fp)
        .join(reps, [F.col("__fp") == reps["fp"],
                     batch[id_col] == reps["keep_id"]], "left_semi")
        .drop("__fp")
    )
    return kept, reps


def incremental_minhash_dedup(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    sig_store: DataFrame | None = None,
    bucket_store: DataFrame | None = None,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    n: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    hash_fn: str = "md5",
    batch_sig: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Near-dup dedup of a new batch against the historical corpus via
    MinHash banding, without rescanning history.

    Persistent stores, one append per batch:
      - ``sig_store``:    (id, sig_0..sig_{k-1}) - one row per kept doc;
      - ``bucket_store``: (id, band, bucket)     - ``bands`` rows per kept doc.
    The stores must come WITH their signatures: passing ``bucket_store``
    without ``sig_store`` raises (history candidates could never be
    verified and would be silently kept).  ``hash_fn`` must be the SAME
    value the stores were built with ('md5' default, 'xxhash64' fast path)
    - signatures from different base hashes never collide, so a mismatch
    silently finds nothing; pick one per corpus and persist it alongside
    the stores.

    Returns ``(kept_rows, sig_delta, bucket_delta)``: batch rows that are
    near-dups of NOTHING kept before them (history, or an earlier-id batch
    survivor), plus the store rows for exactly those survivors.

    Plan: batch signatures (one narrow projection) -> batch band buckets ->
    candidates = batch x history on (band, bucket) UNION batch x batch
    within buckets - both equijoins on bucket keys, never all-pairs ->
    verify candidates on exact signature agreement >= threshold -> batch
    rows with a surviving-older neighbor are dropped (within-batch dup
    chains resolve to the min id, matching minhash_lsh_pairs + transitive
    keep-min semantics for pairwise chains).  History is touched ONLY
    through the bucket equijoin and the signature re-attach for verification
    - at 100 TB, bucket both stores on their join keys so these joins
    shuffle only the batch side.
    """
    if bucket_store is not None and sig_store is None:
        raise ValueError(
            "bucket_store without sig_store: history candidates could not "
            "be verified and would be silently kept - pass both stores")
    if sig_store is not None and bucket_store is None:
        raise ValueError(
            "sig_store without bucket_store: no batch-vs-history candidates "
            "would be generated, so every historical near-dup would be "
            "silently kept - pass both stores")
    # batch_sig (r13): the caller may hand in the batch's signatures when
    # it already computed them - e.g. ONE corpus-wide minhash_signature
    # pass sliced into history store + batch side, halving the dominant
    # shingle->hash->min scan count.  Contract: exactly the (id, sig_*)
    # rows of ``batch`` under the SAME (k, n, seed, hash_fn), already
    # materialized (the caller owns the checkpoint).
    sig = batch_sig if batch_sig is not None else \
        minhash_signature(batch, id_col, text_col, k, n, seed, hash_fn) \
        .localCheckpoint(eager=True)
    buckets = minhash_band_buckets(sig, k, bands)

    sig_cols = [f"sig_{i}" for i in range(k)]
    cand_parts = []
    # batch x history candidates
    if bucket_store is not None:
        cand_parts.append(
            buckets.alias("nw").join(
                bucket_store.alias("h"),
                (F.col("nw.band") == F.col("h.band"))
                & (F.col("nw.bucket") == F.col("h.bucket")))
            .select(F.col("nw.id").alias("new_id"),
                    F.col("h.id").alias("old_id")))
    # within-batch candidates (older id wins, same as minhash_lsh_pairs)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand_parts.append(
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") > F.col("b.id")))
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("old_id")))
    cand = cand_parts[0]
    for p in cand_parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.distinct()

    new_sig = sig.select(F.col("id").alias("new_id"),
                         *[F.col(c).alias(f"a_{c}") for c in sig_cols])
    old_sig_src = sig if sig_store is None else \
        sig.unionByName(sig_store.select("id", *sig_cols))
    old_sig = old_sig_src.select(F.col("id").alias("old_id"),
                                 *[F.col(c).alias(f"b_{c}") for c in sig_cols])
    matches = sum(
        F.when(F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}"), 1).otherwise(0)
        for i in range(k))
    dup_new = (
        cand.join(new_sig, "new_id").join(old_sig, "old_id")
        .where(matches / F.lit(float(k)) >= threshold)
        .select(F.col("new_id").alias("id")).distinct()
    )
    # NOTE: a batch doc whose only near-dup neighbor is a LARGER-id batch doc
    # that itself gets dropped still survives (neighbor drops are not
    # re-evaluated transitively) - same pairwise semantics as
    # minhash_lsh_pairs; chain-collapse callers follow with
    # graph.connected_components on the pair set.
    kept_sig = sig.join(dup_new, "id", "left_anti")
    kept = batch.join(kept_sig.select(F.col("id").alias(id_col)),
                      id_col, "left_semi")
    kept_buckets = buckets.join(dup_new, "id", "left_anti")
    return kept, kept_sig, kept_buckets


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (scale path for huge eval-gram sets)
# ---------------------------------------------------------------------------

BLOOM_M_DEFAULT = 1 << 20  # bits
BLOOM_K_DEFAULT = 5        # probes per n-gram


def _bloom_positions(shingle: Column, m: int, k: int) -> list[Column]:
    """k bit positions via double hashing: pos_i = (h1 + i*h2) mod m with
    h1/h2 the first/second 8 md5 hex digits (engine-portable, deterministic;
    h2 forced odd so the probe sequence cycles the full table)."""
    h1 = F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(shingle), 9, 8), 16, 10).cast("long") \
        .bitwiseOR(F.lit(1).cast("long"))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("long") for i in range(k)]


def bloom_build(
    benchmark: DataFrame,
    text_col: str,
    n: int = 8,
    m: int = BLOOM_M_DEFAULT,
    k: int = BLOOM_K_DEFAULT,
) -> DataFrame:
    """Build the benchmark n-gram Bloom filter as a (word, bits) table:
    word = bit-position div 63, bits = OR of the set bits in that word
    (63 bits per long: DuckDB's checked ``<<`` rejects shifting into the
    sign bit, so the portable word never uses bit 63).
    At m=2^20 the table is <= 16384 rows (128 KB of longs) regardless of
    eval-set size - THAT is the point: `decontaminate` broadcasts the
    exact distinct-gram set, which stops fitting in executor memory
    somewhere around 10^8-10^9 eval grams, while this stays constant-size
    with a tunable false-positive rate ((1-e^(-kn/m))^k; no false
    negatives ever)."""
    grams = (benchmark
             .select(F.explode(word_shingles(text_col, n)).alias("shingle"))
             .distinct())
    pos = grams.select(
        F.explode(F.array(*_bloom_positions(F.col("shingle"), m, k)))
        .alias("pos")).distinct()
    return (pos.select((F.col("pos") / 63).cast("long").alias("word"),
                       F.expr("shiftleft(CAST(1 AS BIGINT), "
                              "CAST(pmod(pos, 63) AS INT))").alias("b"))
            .groupBy("word").agg(F.bit_or("b").alias("bits")))


def bloom_decontaminate(
    corpus: DataFrame,
    bloom_words: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    m: int = BLOOM_M_DEFAULT,
    k: int = BLOOM_K_DEFAULT,
) -> DataFrame:
    """(id, n_contaminated_ngrams) like `decontaminate`, but probing the
    constant-size Bloom table instead of the exact gram set.  A gram is
    flagged iff ALL k probed bits are set (no false negatives; false
    positives at the configured rate flag extra grams, never miss real
    leakage - the safe direction for decontamination).

    Scale shape: grams explode to k (id, gram, word, mask) probe rows that
    map-side broadcast-join the <=m/64-row word table; per-gram AND and
    per-doc count are two narrow aggregations."""
    grams = shingle_table(corpus, id_col, text_col, n)
    probes = grams.select(
        F.col(id_col), F.col("shingle"),
        F.explode(F.array(*_bloom_positions(F.col("shingle"), m, k)))
        .alias("pos"))
    probed = (probes
              .select(id_col, "shingle",
                      (F.col("pos") / 63).cast("long").alias("word"),
                      F.expr("shiftleft(CAST(1 AS BIGINT), "
                             "CAST(pmod(pos, 63) AS INT))").alias("mask"))
              .join(F.broadcast(bloom_words), "word", "left")
              .select(id_col, "shingle",
                      (F.coalesce(F.col("bits"), F.lit(0).cast("long"))
                       .bitwiseAND(F.col("mask")) != 0).cast("int")
                      .alias("hit")))
    return (probed.groupBy(id_col, "shingle")
            .agg(F.min("hit").alias("all_hit"))
            .where(F.col("all_hit") == 1)
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams")))
