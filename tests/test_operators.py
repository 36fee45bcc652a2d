"""Operator unit tests: merge, CDC, dedup (simhash parity, LSH recall),
similarity, multimodal plumbing, types, templating."""

from __future__ import annotations

import hashlib
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_maxcompute_data_collectors_spark import types as ot
from aliyun_maxcompute_data_collectors_spark.operators import dedup as D
from aliyun_maxcompute_data_collectors_spark.operators.merge import merge_datasets
from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
    decode_media, extract_features, with_blob_meta)
from aliyun_maxcompute_data_collectors_spark.operators.similarity import cosine_topk, lsh_topk


def test_merge_new_beats_old_on_tie(spark):
    old = spark.createDataFrame([(1, "old", 10), (2, "old", 10)], "k int, src string, ts int")
    new = spark.createDataFrame([(1, "new", 10), (3, "new", 5)], "k int, src string, ts int")
    got = {(r["k"], r["src"]) for r in merge_datasets(old, new, ["k"], ["ts"]).collect()}
    assert got == {(1, "new"), (2, "old"), (3, "new")}


def test_cdc_merge_into(spark):
    from aliyun_maxcompute_data_collectors_spark.streaming.cdc import merge_cdc_into
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    ops = spark.createDataFrame(
        [(2, "U", 1, "B2"), (3, "D", 1, None), (4, "I", 1, "d"),
         (4, "U", 2, "D2")],  # later op wins
        "k int, op string, seq int, v string",
    )
    got = {(r["k"], r["v"]) for r in
           merge_cdc_into(target, ops, ["k"], ["seq"]).collect()}
    assert got == {(1, "a"), (2, "B2"), (4, "D2")}


def test_simhash_matches_pure_python(spark):
    texts = ["the quick brown fox", "the quick brown fox", "jumped over lazy dogs",
             "completely different words here"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    rows = {r["id"]: r["sh"] for r in
            df.select("id", D.simhash("text").alias("sh")).collect()}

    def py_simhash(t):
        toks = " ".join(t.lower().split()).split(" ")
        hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in toks]
        return D.simhash64(hs)

    for i, t in enumerate(texts):
        assert rows[i] == py_simhash(t), f"simhash mismatch for {t!r}"
    assert rows[0] == rows[1]  # identical text -> identical signature


def test_simhash_pairs_find_near_dups(spark):
    base = ("spark engine shuffles data across partitions while reading parquet "
            "files and writing them back to distributed storage with consistent ordering")
    near = base.replace("parquet", "orc")  # hamming 8 from base
    far = ("totally unrelated content about cooking pasta with tomatoes and basil "
           "in a large pot over medium heat for twenty minutes")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id int, text string")
    pairs = {(r["id1"], r["id2"]) for r in
             D.simhash_dup_pairs(df, "id", "text", max_hamming=12).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "Same  Text"), (2, "same text"), (9, "other")], "id int, text string")
    kept = sorted(r["id"] for r in D.exact_dedup(df, "id", "text").collect())
    assert kept == [2, 9]  # normalization folds case/whitespace; min id wins


def test_span_dedup_first_occurrence_wins(spark):
    # spans are aligned 3-word windows; doc 1 repeats doc 0's first span,
    # doc 2 is made ENTIRELY of spans seen earlier -> dropped outright
    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),          # spans: [a b c] [d e f]
            (1, "a b c x y z"),          # span 0 dupes doc0 span0 -> only [x y z] kept
            (2, "d e f a b c"),          # both spans seen earlier -> doc dropped
            (3, "g h"),                  # short doc: single ragged span, unique
        ],
        "doc_id int, text string")
    out = {r["id"]: r for r in
           D.span_dedup(df, "doc_id", "text", span_words=3).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == "a b c d e f"
    assert out[1]["n_kept"] == 1 and out[1]["text_dedup"] == "x y z"
    assert out[3]["n_kept"] == 1 and out[3]["text_dedup"] == "g h"


def test_substring_dedup_catches_shifted_passages(spark):
    # the case span_dedup cannot see: doc 1 repeats doc 0's 4-word passage
    # at a DIFFERENT offset (one word of prefix).  With k=3 every stride-1
    # 3-gram of the passage is duplicated, so all four words are covered.
    df = spark.createDataFrame(
        [
            (0, "w x y z a b"),      # first occurrence of "w x y z" -> kept
            (1, "p w x y z q r"),    # shifted repeat: "w x y z" removed
            (2, "u v"),              # shorter than k: no windows, unaffected
        ],
        "doc_id int, text string")
    out = {r["id"]: r for r in
           D.substring_dedup(df, "doc_id", "text", k=3).collect()}
    # only the affected doc is emitted; doc 0 (winner) and doc 2 pass through
    assert set(out) == {1}
    assert out[1]["n_words"] == 7 and out[1]["n_removed"] == 4
    assert out[1]["text_dedup"] == "p q r"


def test_substring_dedup_full_cover_and_within_doc(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d"),      # winner
            (1, "a b c d"),      # fully covered -> text_dedup == ''
            (2, "e f g e f g"),  # within-doc repeat: second "e f g" removed
        ],
        "doc_id int, text string")
    out = {r["id"]: r for r in
           D.substring_dedup(df, "doc_id", "text", k=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_removed"] == 4 and out[1]["text_dedup"] == ""
    assert out[2]["n_removed"] == 3 and out[2]["text_dedup"] == "e f g"
    with pytest.raises(ValueError):
        D.substring_dedup(df, "doc_id", "text", k=1)


def test_bm25_scores_match_reference_formula(spark):
    import math

    from aliyun_maxcompute_data_collectors_spark.operators.text import bm25_scores

    corpus = {1: "cat dog cat", 2: "dog bird", 3: "fish fish fish bird"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id int, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["cat", "bird"], k1=1.2, b=0.75).collect()}

    # straight from Robertson et al.: idf = ln(1 + (N - df + .5)/(df + .5))
    toks = {d: t.split() for d, t in corpus.items()}
    n, avgdl = len(toks), sum(map(len, toks.values())) / len(toks)
    exp = {}
    for d, ts in toks.items():
        s = 0.0
        for q in ("cat", "bird"):
            tf = ts.count(q)
            if not tf:
                continue
            dfq = sum(q in t for t in toks.values())
            idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            s += round(idf * (tf * 2.2)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl)), 6)
        if s:
            exp[d] = round(s, 6)
    assert set(got) == set(exp) == {1, 2, 3}
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-9, (d, got[d], exp[d])
    # doc 3 mentions only 'bird'; doc 1 only 'cat' (twice, but shorter)
    assert got[1] > got[2]


def test_bpe_train_reference_and_path_equivalence(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.operators import bpe
    from aliyun_maxcompute_data_collectors_spark.session import load_tables

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new"),
         (3, "wide wider low")], "doc_id int, text string")
    got = [tuple(r) for r in bpe.bpe_train(df, n_merges=4).collect()]
    # hand-checked Sennrich trace: 'lo' (6 = 4x low + lower + lowest),
    # then 'lo'+'w', then 'ew' / 'n'+'ew' (4 each, 'ew' wins the a-asc tie)
    assert got == [(1, "l", "o", "lo", 6), (2, "lo", "w", "low", 6),
                   (3, "e", "w", "ew", 4), (4, "n", "ew", "new", 4)]
    # the distributed vocab-table loop must produce identical merges -
    # on the real corpus, not just the toy (threshold 0 forces it)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"] \
        .where(F.col("doc_id") % 10 == 0)
    a = [tuple(r) for r in bpe.bpe_train(docs, n_merges=12).collect()]
    b = [tuple(r) for r in bpe.bpe_train(
        docs, n_merges=12, driver_vocab_threshold=0).collect()]
    assert a == b and len(a) == 12


def test_bpe_segment_lossless_and_greedy(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import bpe

    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    words = spark.createDataFrame(
        [("lowest",), ("lower",), ("slow",), ("a",)], "word string")
    out = {r["word"]: r["pieces"]
           for r in bpe.bpe_segment(words, merges).collect()}
    # pieces always reconcatenate to the word (BPE is lossless)
    assert all("".join(p) == w for w, p in out.items())
    assert out["lower"] == ["low", "er"]
    assert out["slow"] == ["s", "low"]
    assert out["a"] == ["a"]


def test_span_dedup_idempotent_on_corpus(spark, sf_dir):
    # corpus-level invariant: every surviving span fingerprint is globally
    # unique.  Dropping a span shifts later spans by whole window multiples
    # (only the final span may be ragged), so reassembled text re-splits
    # into exactly the kept spans -> a second pass must be a no-op.
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = D.span_dedup(docs, "doc_id", "text", span_words=20)
    n_docs, total = out.agg(
        F.count(F.lit(1)), F.sum("n_kept")).collect()[0]
    assert n_docs > 0 and total > 0
    again = D.span_dedup(out, "id", "text_dedup", span_words=20)
    n_docs2, total2 = again.agg(
        F.count(F.lit(1)), F.sum("n_kept")).collect()[0]
    assert (n_docs2, total2) == (n_docs, total)


def test_mixture_rebalance_plan_math(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import mixture_rebalance
    # 100 a-rows, 50 b-rows; target 50/50 -> feasible corpus = 100 (b binds):
    # a keeps 0.5, b keeps 1.0
    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    sampled, plan = mixture_rebalance(df, "doc_id", "source",
                                      {"a": 0.5, "b": 0.5})
    p = {r["source"]: r for r in plan.collect()}
    assert p["a"]["keep_frac"] == 0.5 and p["b"]["keep_frac"] == 1.0
    kept = {r["source"]: r["n"] for r in
            sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["b"] == 50                  # binding source keeps everything
    assert 35 <= kept["a"] <= 65            # hash-sampled ~50
    # unknown sources are dropped entirely
    df2 = df.union(spark.createDataFrame([(9999, "junk")], df.schema))
    sampled2, _ = mixture_rebalance(df2, "doc_id", "source", {"a": 0.5, "b": 0.5})
    assert sampled2.where(F.col("source") == "junk").count() == 0
    # a TARGET source with no rows makes the mixture infeasible -> raise
    import pytest as _pytest
    with _pytest.raises(ValueError, match="infeasible"):
        mixture_rebalance(df, "doc_id", "source",
                          {"a": 0.4, "b": 0.4, "ghost": 0.2})
    # token-weighted targets: same counts but a weighs 4 tokens/row vs b's 1
    # -> in token units a has 400 vs b 50, so b binds at 50/50 and a keeps
    # 100/400 of its mass
    dfw = df.withColumn("n_tok", F.when(F.col("source") == "a", 4).otherwise(1))
    _, planw = mixture_rebalance(dfw, "doc_id", "source",
                                 {"a": 0.5, "b": 0.5}, weight_col="n_tok")
    pw = {r["source"]: r for r in planw.collect()}
    assert pw["b"]["keep_frac"] == 1.0
    assert abs(pw["a"]["keep_frac"] - 0.125) < 1e-12
    # ADVICE r4 #1: a source PRESENT in the corpus whose weight mass is
    # NULL (all-NULL weights) is a zero/undefined-mass error, not the
    # 'have no rows in the corpus' one - SUM(NULL)=NULL must not be
    # conflated with absent-after-left-join
    dfn = df.withColumn(
        "n_tok", F.when(F.col("source") == "a", 4).otherwise(F.lit(None)))
    with _pytest.raises(ValueError, match="zero or undefined weight mass"):
        mixture_rebalance(dfn, "doc_id", "source",
                          {"a": 0.5, "b": 0.5}, weight_col="n_tok")
    # ...while a truly absent source still reports the missing-rows error
    with _pytest.raises(ValueError, match="no rows in the corpus"):
        mixture_rebalance(dfn, "doc_id", "source",
                          {"a": 0.5, "ghost": 0.5}, weight_col="n_tok")


def test_distribution_drift_bounds(spark):
    from math import log

    from aliyun_maxcompute_data_collectors_spark.operators.corpus import distribution_drift
    a = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
    # identical snapshots -> zero divergence, zero drift everywhere
    same = distribution_drift(a, a, "k").collect()
    assert all(r["jsd"] == 0.0 and r["drift"] == 0.0 for r in same)
    # disjoint supports -> JSD = ln 2 (the upper bound), every key fully moved
    b = spark.createDataFrame([("z",), ("w",)], "k string")
    rows = distribution_drift(a, b, "k").collect()
    assert abs(rows[0]["jsd"] - log(2)) < 1e-6
    # pre-aggregated (key, n) histograms are accepted (duplicate keys merge)
    ha = spark.createDataFrame([("x", 2), ("x", 1), ("y", 1)], "k string, n long")
    hb = spark.createDataFrame([("x", 1), ("y", 3)], "k string, n long")
    sym = {r["key"]: r for r in distribution_drift(ha, hb, "k").collect()}
    assert sym["x"]["drift"] == sym["y"]["drift"] == 0.5
    # an EMPTY snapshot reads as all-zero probabilities -> one-sided
    # divergence ln(2)/2 and non-NULL drift, never a NULL-poisoned report
    gone = distribution_drift(a, a.where("1=0"), "k").collect()
    assert abs(gone[0]["jsd"] - log(2) / 2) < 1e-6
    assert all(r["drift"] is not None for r in gone)


def test_guards_raise_not_silently_pass(spark):
    import pytest as _pytest
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import split_leakage
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        incremental_minhash_dedup, minhash_signature)
    from aliyun_maxcompute_data_collectors_spark.operators.text import filter_pipeline
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # leakage audit with a train name that matches nothing must raise,
    # not report zero leakage
    with _pytest.raises(ValueError, match="train_split"):
        split_leakage(df, "doc_id", "text",
                      splits={"tr": 0.9, "val": 0.1}, train_split="train")
    # sig_store without bucket_store would silently skip history dedup
    sig = minhash_signature(df, "doc_id", "text")
    with _pytest.raises(ValueError, match="bucket_store"):
        incremental_minhash_dedup(df, "doc_id", "text", sig_store=sig)
    # report-mode over an existing report would duplicate columns
    rules = [("len", F.length("text") > 1)]
    report = filter_pipeline(df, rules)
    with _pytest.raises(ValueError, match="report column"):
        filter_pipeline(report, rules)


def test_weighted_sample_biased_and_deterministic(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import weighted_sample
    # 50 heavy rows (w=1000) vs 50 light (w=1): a 10-draw should be all-heavy
    rows = [(i, 1000) for i in range(50)] + [(100 + i, 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = weighted_sample(df, "doc_id", "w", n=10).collect()
    assert len(got) == 10
    assert all(r["w"] == 1000 for r in got)
    # deterministic: same draw twice
    again = weighted_sample(df, "doc_id", "w", n=10).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)


def test_cosine_topk_salted_matches_single_window(spark, sf_dir):
    # the two-phase salted plan (100 TB reducer-parallelism path) must be
    # bit-identical to the single-window plan
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    plain = sorted(map(tuple, cosine_topk(q, e, k=5, salt=0).collect()))
    salted = sorted(map(tuple, cosine_topk(q, e, k=5, salt=4).collect()))
    assert plain == salted and len(plain) == 25


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = t["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    exact = cosine_topk(q, e, k=5)
    approx = lsh_topk(q, e, k=5, bits=4, dim=64, n_probe_planes=8)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 9)), (3, None)],
        "id int, blob binary",
    )
    meta = with_blob_meta(df, "blob").collect()
    by_id = {r["id"]: r for r in meta}
    assert by_id[1]["n_bytes"] == 100 and by_id[3]["n_bytes"] is None

    dec = {r["id"]: r for r in decode_media(df, "blob").collect()}
    assert dec[1]["meta"]["media_type"] == "image"
    assert dec[1]["meta"]["width"] == 64 + 100 % 512
    assert dec[3]["meta"] is None

    feats = {r["id"]: r["features"] for r in extract_features(df, "blob", dim=4).collect()}
    assert feats[1] == [0.0, 1.0, 0.0, 0.0]  # 'x'=120 -> bin 1 of [0,64,128,192,256]
    assert feats[3] is None


def test_odps_type_roundtrip():
    cases = [
        ("BIGINT", T.LongType()),
        ("decimal", T.DecimalType(38, 18)),
        ("DECIMAL(10,2)", T.DecimalType(10, 2)),
        ("VARCHAR(10)", T.StringType()),
        ("ARRAY<INT>", T.ArrayType(T.IntegerType())),
        ("MAP<STRING,ARRAY<BIGINT>>", T.MapType(T.StringType(), T.ArrayType(T.LongType()))),
        ("STRUCT<a:INT,b:STRING>", T.StructType([
            T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])),
    ]
    for s, dt in cases:
        assert ot.parse_odps_type(s) == dt
    assert ot.to_odps_type(T.DecimalType(38, 18)) == "DECIMAL(38,18)"
    assert ot.to_odps_type(T.ArrayType(T.LongType())) == "ARRAY<BIGINT>"
    with pytest.raises(ot.OdpsTypeError):
        ot.parse_odps_type("GEOMETRY")


def test_string_coercion():
    assert ot.coerce_string("42", T.IntegerType()) == 42
    assert ot.coerce_string("true", T.BooleanType()) is True
    assert ot.coerce_string("N", T.BooleanType()) is False
    assert ot.coerce_string("", T.StringType()) is None
    assert ot.coerce_string("1.5", T.DecimalType(10, 2)) == Decimal("1.5")
    with pytest.raises(ot.OdpsTypeError):
        ot.coerce_string("maybe", T.BooleanType())


def test_template_rendering(spark):
    from aliyun_maxcompute_data_collectors_spark.functions.templating import render_template
    df = spark.createDataFrame([("click", "2024-03-01 10:30:00")], "et string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = df.select(
        render_template("t/%{et}/dt=%{yyyy-MM-dd}/h=%{HH}", time_col="ts").alias("r")
    ).collect()
    assert out[0]["r"] == "t/click/dt=2024-03-01/h=10"


def test_frame_sample_plan(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import frame_sample_plan
    df = spark.createDataFrame(
        [(1, ("video", "fake", None, None, 10, None, 2500)),
         (2, ("image", "fake", 64, 64, 1, None, None))],
        "id int, meta struct<media_type:string,format:string,width:int,height:int,"
        "n_frames:int,sample_rate:int,duration_ms:bigint>",
    )
    out = frame_sample_plan(df, every_ms=1000).collect()
    # only the video row explodes; 2500ms / 1000ms -> 2 frames at 0ms and 1000ms
    assert {r["id"] for r in out} == {1}
    assert sorted((r["frame_idx"], r["frame_ts_ms"]) for r in out) == [(0, 0), (1, 1000)]


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL sketch path: approx within 5% of exact on the orders keys."""
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    t = load_tables(spark, sf_dir, ["orders"])
    exact = t["orders"].select("o_custkey").distinct().count()
    approx = t["orders"].agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_cached_dimension_ttl_refresh(spark):
    """J1 lookup-cache semantics: the dim reloads only after the TTL."""
    import time

    from aliyun_maxcompute_data_collectors_spark.operators.lookup import CachedDimension
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return spark.createDataFrame([(1, f"v{calls['n']}")], "k int, v string")

    dim = CachedDimension(loader, cache_expire_ms=400)
    assert dim.get().collect()[0]["v"] == "v1"
    assert dim.get().collect()[0]["v"] == "v1"  # within TTL: cached
    assert calls["n"] == 1
    time.sleep(0.5)
    assert dim.get().collect()[0]["v"] == "v2"  # TTL expired: reloaded
    assert calls["n"] == 2


def test_cached_dimension_retries_on_failure(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.lookup import CachedDimension
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return spark.createDataFrame([(1, "ok")], "k int, v string")

    dim = CachedDimension(flaky, max_retries=3)
    assert dim.get().collect()[0]["v"] == "ok"
    assert attempts["n"] == 3


def test_connected_components_transitive_groups(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.graph import (
        connected_components, keep_representatives)
    # chain 1-2-3, pair 5-6, isolated 9
    edges = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "id1 long, id2 long")
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame([(i, f"t{i}") for i in [1, 2, 3, 5, 6, 9]],
                                 "id long, text string")
    kept = sorted(r["id"] for r in keep_representatives(docs, edges, "id").collect())
    assert kept == [1, 5, 9]  # one per chain-group, singleton survives


def test_connected_components_driver_path_matches_distributed(spark):
    """r13: small edge sets are solved with driver-side union-find; the
    result must be ROW-IDENTICAL to the distributed label-propagation
    fixed point (same nodes, same min-reachable component), for both int
    and string ids, including duplicate and self edges."""
    import aliyun_maxcompute_data_collectors_spark.operators.graph as G

    int_edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 6), (6, 5), (7, 7), (10, 9), (8, 9)],
        "id1 long, id2 long")
    str_edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id1 string, id2 string")
    for edges in (int_edges, str_edges):
        fast = {(r["node"], r["component"])
                for r in G.connected_components(edges).collect()}
        prior = G.CC_DRIVER_MAX_EDGES
        G.CC_DRIVER_MAX_EDGES = -1  # force the distributed path
        try:
            slow = {(r["node"], r["component"])
                    for r in G.connected_components(edges).collect()}
        finally:
            G.CC_DRIVER_MAX_EDGES = prior
        assert fast == slow
    # float ids: Python/Spark orderings are not provably identical (NaN),
    # so the driver path must decline and the distributed path answer
    f_edges = spark.createDataFrame([(2.0, 1.0)], "id1 double, id2 double")
    out = {(r["node"], r["component"])
           for r in G.connected_components(f_edges).collect()}
    assert out == {(1.0, 1.0), (2.0, 1.0)}


def test_ivf_topk_recall(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        cosine_topk, ivf_topk)
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = t["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, e, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              ivf_topk(q, e, k=5, n_clusters=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_zorder_improves_two_dim_skipping(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.zorder import (
        skipping_effectiveness, zorder_by)
    import pyspark.sql.functions as SF
    # 2-d grid: x and y independent; single-column sort can't skip on y
    df = spark.range(10000).select(
        (SF.col("id") % 100).alias("x"), (SF.col("id") / 100).cast("long").alias("y"))

    z = zorder_by(df, ["x", "y"], n_files=16)
    assert z.count() == 10000  # clustering preserves rows

    eff_z = skipping_effectiveness(df, ["x", "y"], "y", 10, 20, n_files=16)
    # baseline: cluster by x only -> y min/max spans everything in each file
    base = (df.repartitionByRange(16, SF.col("x"))
            .withColumn("__pid__", SF.spark_partition_id())
            .groupBy("__pid__")
            .agg(SF.min("y").alias("lo"), SF.max("y").alias("hi"))
            .collect())
    base_touched = sum(1 for r in base if not (r["hi"] < 10 or r["lo"] > 20))
    assert eff_z["touched"] < base_touched, (eff_z, base_touched)
    assert eff_z["fraction"] <= 0.5  # z-order skips at least half the files


def test_zorder_three_columns(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.zorder import (
        skipping_effectiveness, with_zorder)
    import pyspark.sql.functions as SF
    df = spark.range(8000).select(
        (SF.col("id") % 20).alias("x"),
        ((SF.col("id") / 20) % 20).cast("long").alias("y"),
        (SF.col("id") / 400).cast("long").alias("w"))
    z = with_zorder(df, ["x", "y", "w"], bits=8)
    assert z.count() == 8000 and "__z__" in z.columns
    # every dimension still skips: each file covers a compact cube
    for col, lo, hi in [("x", 0, 3), ("y", 0, 3), ("w", 0, 3)]:
        eff = skipping_effectiveness(df, ["x", "y", "w"], col, lo, hi,
                                     n_files=16)
        assert eff["fraction"] < 1.0, (col, eff)
    with pytest.raises(ValueError, match="exceeds a long"):
        with_zorder(df, ["x", "y", "w"], bits=32)


def test_zorder_keeps_null_rows(spark):
    """A NULL in a z-order column must not drop the row (clustering a table
    must preserve it); NULL ranks as the smallest value (code 0)."""
    from aliyun_maxcompute_data_collectors_spark.operators.zorder import with_zorder
    rows = [(1, 10.0), (None, 10.0), (2, 20.0), (4, None), (5, 50.0)]
    df = spark.createDataFrame(rows, "x int, y double")
    z = with_zorder(df, ["x", "y"], bits=8)
    assert z.count() == 5
    assert z.where(F.col("__z__").isNull()).count() == 0
    # at equal y, NULL x ranks at-or-below the smallest real x (code 0)
    nx = z.where(F.col("x").isNull()).first()
    mn = z.where(F.col("x") == 1).first()
    assert nx["__z__"] <= mn["__z__"]


def test_running_agg_rejects_non_numeric_order(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.prefixscan import (
        running_agg,
    )
    df = spark.createDataFrame([("a", 1), ("b", 2)], "o string, v int")
    with pytest.raises(ValueError, match="numeric"):
        running_agg(df, "o", "v", agg="sum").collect()
    # NULL order values are rejected too (contract: non-NULL)
    df2 = spark.createDataFrame([(1.0, 1), (None, 2)], "o double, v int")
    with pytest.raises(ValueError, match="NULL"):
        running_agg(df2, "o", "v", agg="sum").collect()


def test_running_agg_empty_and_date_order(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.prefixscan import (
        running_agg,
    )
    empty = spark.createDataFrame([], "o double, v bigint")
    out = running_agg(empty, "o", "v", agg="sum")
    assert out.count() == 0 and {"__below", "__upto"} <= set(out.columns)
    # date order columns bin via the timestamp cast
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 4)],
        "o string, v bigint",
    ).select(F.col("o").cast("date").alias("o"), "v")
    got = {str(r["o"]): (r["__below"], r["__upto"])
           for r in running_agg(df, "o", "v", agg="sum").collect()}
    assert got == {"2024-01-01": (0, 1), "2024-01-02": (1, 3),
                   "2024-01-03": (3, 7)}


def test_calibrated_quality_flags_language_outlier(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    typical = "the cat and the dog sat in the house with the mouse and it is warm"
    docs = [(i, typical + f" extra{i}") for i in range(10)]
    # same language, wildly different word length + stopword density
    docs.append((99, "supercalifragilistic expialidocious the " * 8))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["n_ok"] for r in
           X.calibrated_quality(df, "text").collect()}
    assert all(out[i] == 3 for i in range(10)), out
    assert out[99] < 3, f"outlier not flagged: {out[99]}"


def test_calibrated_quality_degenerate_single_doc_language(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    # one doc in its language -> sd == 0 -> everything counts as typical
    df = spark.createDataFrame(
        [(1, "der hund und die katze ist nicht da")], "doc_id long, text string")
    rows = X.calibrated_quality(df, "text").collect()
    assert rows[0]["cal_lang"] == "de" and rows[0]["n_ok"] == 3


def test_simhash32_matches_pure_python(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import dedup as D
    texts = ["The quick brown fox", "the  QUICK brown fox", "entirely different words here",
             "a", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    got = {r["id"]: r["sh"] for r in
           df.select("id", D.simhash32("text").alias("sh")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == D.simhash32_py(t), f"mismatch for {t!r}"
    assert got[0] == got[1]  # case/whitespace-insensitive
    assert got[0] != got[2]


def test_rolling_fingerprint_order_sensitive(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "Alpha  Beta gamma")],
        "id int, text string")
    got = {r["id"]: r["rfp"] for r in
           df.select("id", X.rolling_fingerprint("text").alias("rfp")).collect()}
    assert got[1] != got[2]  # reordering changes the fingerprint
    assert got[1] == got[3]  # case/whitespace do not
    # pure-python mirror
    import hashlib
    h = 0
    for w in "alpha beta gamma".split():
        hw = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        h = (h * X.ROLL_B + hw) % X.ROLL_M
    assert got[1] == h


def test_rolling_window_fingerprints_shared_span(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    a = "one two three four five six seven eight nine ten"
    b = "zzz two three four five six seven eight nine yyy"
    df = spark.createDataFrame([(1, a), (2, b)], "id int, text string")
    rows = {r["id"]: set(r["w"]) for r in
            df.select("id", X.rolling_window_fingerprints("text", 8).alias("w")).collect()}
    # the 8-token run "two ... nine" is verbatim-shared
    assert rows[1] & rows[2]
    # a short doc still yields one (whole-text) span hash
    short = spark.createDataFrame([(9, "tiny doc")], "id int, text string")
    assert len(short.select(X.rolling_window_fingerprints("text", 8).alias("w"))
               .collect()[0]["w"]) == 1


def test_repetition_metrics_crafted(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"),              # all unique
         (2, "spam spam spam spam"),          # degenerate loop
         (3, "go go go stop stop north"),     # partial repeats
         (4, "x")],                           # single token
        "id int, text string")
    out = {r["id"]: r for r in df.select(
        "id",
        X.dup_token_ratio("text").alias("dt"),
        X.dup_bigram_ratio("text").alias("db"),
        X.top_token_ratio("text").alias("tt"),
        X.repetition_ok("text").alias("ok"),
    ).collect()}
    assert out[1]["dt"] == 0.0 and out[1]["db"] == 0.0 and out[1]["tt"] == 0.125
    assert out[1]["ok"] == 1
    assert out[2]["dt"] == 0.75          # 4 tokens, 1 distinct
    assert out[2]["db"] == round(2 / 3, 4)  # 3 bigrams, 1 distinct
    assert out[2]["tt"] == 1.0 and out[2]["ok"] == 0
    assert out[3]["dt"] == 0.5           # 6 tokens, 3 distinct
    assert out[3]["tt"] == 0.5           # 'go' 3/6
    assert out[4]["dt"] == 0.0 and out[4]["db"] == 0.0 and out[4]["tt"] == 1.0


def test_redact_pii_and_counts(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import text as X
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or call +44 20 7946 0958 ref 123456789012"),
         (2, "clean text, no identifiers here")],
        "id int, text string")
    out = {r["id"]: r for r in df.select(
        "id",
        X.pii_count("text", "EMAIL").alias("ne"),
        X.pii_count("text", "PHONE").alias("np"),
        X.pii_count("text", "NUMID").alias("nn"),
        X.redact_pii("text").alias("red"),
    ).collect()}
    assert (out[1]["ne"], out[1]["np"], out[1]["nn"]) == (1, 1, 1)
    assert out[1]["red"] == "mail [EMAIL] or call [PHONE] ref [NUMID]"
    assert (out[2]["ne"], out[2]["np"], out[2]["nn"]) == (0, 0, 0)
    assert out[2]["red"] == "clean text, no identifiers here"


def test_decontaminate_flags_overlapping_docs(spark):
    from aliyun_maxcompute_data_collectors_spark.operators import dedup as D
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "intro text then the quick brown fox jumps away"),   # shares 4-grams
         (2, "completely different words with zero overlap at all"),
         (3, "quick brown fox jumps over the lazy dog indeed")],  # shares many
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_contaminated_ngrams"] for r in
           D.decontaminate(corpus, bench, "doc_id", "text", n=4).collect()}
    assert 2 not in got
    # doc 1: spans 'the quick brown fox' + 'quick brown fox jumps' = 2
    assert got[1] == 2
    assert got[3] >= 5


def test_semantic_dedup_matches_bruteforce(spark):
    # blocked (k-means) pair recall vs brute force on a corpus with planted
    # duplicate pairs; end-to-end keeps min-id representative per group
    import numpy as np
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        semantic_dedup, semantic_dedup_pairs)
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant near-dups: 100..109 are tiny perturbations of 0..9
    for i in range(10):
        v = base[i] + rng.normal(scale=1e-3, size=16).astype("float32")
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # single cluster == exact brute force: all planted pairs found
    exact = semantic_dedup_pairs(df, threshold=0.99, n_clusters=1).collect()
    exact_pairs = {(r["id1"], r["id2"]) for r in exact}
    assert {(i, 100 + i) for i in range(10)} <= exact_pairs

    # blocked variant keeps high recall on the planted pairs
    blocked = semantic_dedup_pairs(df, threshold=0.99, n_clusters=4).collect()
    got = {(r["id1"], r["id2"]) for r in blocked}
    planted = {(i, 100 + i) for i in range(10)}
    assert len(got & planted) >= 8  # perturbed twins land in the same cell

    kept = semantic_dedup(df, threshold=0.99, n_clusters=1)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert all(100 + i not in ids for i in range(10))  # dup drops keep min id
    assert all(i in ids for i in range(10))


def test_timeseries_and_split_edge_cases(spark):
    import pytest as _pytest
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import split_assign
    from aliyun_maxcompute_data_collectors_spark.operators.timeseries import resample_fill

    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert resample_fill(empty, "user_id", "ts", "value").count() == 0

    one = spark.createDataFrame([(1, "2024-01-01 10:30:00", 5.0)],
                                "user_id long, ts string, value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    rows = resample_fill(one, "user_id", "ts", "value").collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 1 and not rows[0]["is_gap"]

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    with _pytest.raises(ValueError, match="sum to"):
        split_assign(df, "id", {"a": 0.5, "b": 0.4})
    # single split takes everything; assignment is stable under corpus growth
    assert split_assign(df, "id", {"all": 1.0}).where("split='all'").count() == 100
    small = {r["id"]: r["split"] for r in
             split_assign(df.where("id < 50"), "id",
                          {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    full = {r["id"]: r["split"] for r in
            split_assign(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(full[i] == small[i] for i in small)


def test_resize_images_contract(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
        decode_media, fake_decode_image, fake_decode_video, resize_images)
    rows = [(1, b"\x89PNGxxxx"), (2, b"\x00\x00\x01\xbavideo"), (3, None)]
    df = spark.createDataFrame(rows, "id long, blob binary")
    def route(payload):
        return fake_decode_video(payload) if payload.startswith(b"\x00\x00\x01\xba") \
            else fake_decode_image(payload)
    decoded = decode_media(df, decode_fn=route)
    out = {r["id"]: r for r in resize_images(decoded, 64, 32).collect()}
    # image: payload transformed, meta dims updated
    assert bytes(out[1]["blob"]).startswith(b"RESIZED:64x32:")
    assert out[1]["meta"]["width"] == 64 and out[1]["meta"]["height"] == 32
    # video: untouched
    assert bytes(out[2]["blob"]) == b"\x00\x00\x01\xbavideo"
    # null blob: passes through
    assert out[3]["blob"] is None


def test_audio_decode_and_resample_plan(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
        audio_resample_plan, decode_media, fake_decode_audio)
    df = spark.createDataFrame(
        [(1, b"\x00" * 10), (2, b"\x00" * 11), (3, None)], "id long, blob binary")
    decoded = decode_media(df, decode_fn=fake_decode_audio)
    metas = {r["id"]: r["meta"] for r in decoded.collect() if r["meta"]}
    assert metas[1]["media_type"] == "audio" and metas[1]["sample_rate"] == 16000
    assert metas[2]["sample_rate"] == 44100
    plan = audio_resample_plan(decoded, 16000).collect()
    got = {r["id"]: (r["needs_resample"], r["target_n_samples"]) for r in plan}
    # 10-byte payload: 500+10=510ms at 16k -> already at target
    assert got[1] == (False, 510 * 16)
    assert got[2][0] is True


def test_boilerplate_scores(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import boilerplate_scores

    # two sources; "the same header text" is shared by 3 docs of src_a only
    rows = [
        (1, "the same header text plus unique alpha words", "src_a"),
        (2, "the same header text plus unique beta words", "src_a"),
        (3, "the same header text plus unique gamma words", "src_a"),
        (4, "completely different content here one", "src_a"),
        (5, "the same header text plus unique delta words", "src_b"),  # alone in src_b
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in
           boilerplate_scores(df, "doc_id", "text", group_col="source",
                              n=3, min_docs=2).collect()}
    assert len(out) == 5
    # docs 1-3 share the 3-grams of "the same header text plus unique"
    assert out[1]["n_boiler"] > 0 and out[2]["n_boiler"] > 0
    assert out[4]["n_boiler"] == 0          # nothing shared within src_a
    assert out[5]["n_boiler"] == 0          # same text but different source
    assert abs(out[4]["boiler_frac"]) < 1e-9
    # corpus-wide grouping sees doc 5's overlap with 1-3
    corpus = {r["doc_id"]: r for r in
              boilerplate_scores(df, "doc_id", "text", n=3, min_docs=2).collect()}
    assert corpus[5]["n_boiler"] > 0
    # per-doc contract holds for degenerate docs: NULL / empty / shorter
    # than n words each yield one whole-text (or NULL) shingle, never a
    # dropped row
    edge = spark.createDataFrame([(10, None), (11, ""), (12, "one two")],
                                 "doc_id long, text string") \
        .withColumn("source", F.lit("s"))
    got = {r["doc_id"]: r["n_shingles"] for r in
           boilerplate_scores(edge, "doc_id", "text", group_col="source",
                              n=3, min_docs=2).collect()}
    assert got == {10: 1, 11: 1, 12: 1}


def test_shard_assign_and_write(spark, tmp_path):
    import pytest as _pytest
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
        shard_assign, write_shards)

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)],
                               "id long, payload string")
    with _pytest.raises(ValueError, match="n_shards"):
        shard_assign(df, "id", 0)
    a = shard_assign(df, "id", 8)
    rows = a.collect()
    assert len(rows) == 200
    assert {r["shard_id"] for r in rows} <= set(range(8))
    # within-shard positions are 1..n_shard, dense
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across recomputation and stable under corpus growth:
    # relative order of old rows within a shard never changes
    sub = {(r["id"], r["shard_id"]) for r in
           shard_assign(df.where("id < 100"), "id", 8).collect()}
    full = {(r["id"], r["shard_id"]) for r in rows if r["id"] < 100}
    assert sub == full

    out = str(tmp_path / "shards")
    write_shards(df, out, "id", 4)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("shard_id").distinct().count() == 4


def test_incremental_dedup_two_batches(spark):
    """Store evolution across sequential batches: batch-2 dups of batch-1
    survivors are dropped without rescanning batch 1's raw text."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        incremental_exact_dedup, incremental_minhash_dedup)

    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "ALPHA  beta gamma"),  # dup of 1 (normalized)
         (3, "totally different text")],
        "doc_id long, text string")
    kept1, store = incremental_exact_dedup(b1, "doc_id", "text", None)
    assert {r["doc_id"] for r in kept1.collect()} == {1, 3}

    b2 = spark.createDataFrame(
        [(10, "alpha beta gamma"),        # dup of history (doc 1)
         (11, "brand new content"),
         (12, "brand  NEW content")],     # dup of 11 within batch
        "doc_id long, text string")
    kept2, delta = incremental_exact_dedup(b2, "doc_id", "text", store)
    assert {r["doc_id"] for r in kept2.collect()} == {11}
    # delta holds only genuinely-new fingerprints
    assert delta.count() == 1
    # append and run a third batch against the union
    store2 = store.unionByName(delta)
    b3 = spark.createDataFrame([(20, "BRAND new   content")],
                               "doc_id long, text string")
    kept3, _ = incremental_exact_dedup(b3, "doc_id", "text", store2)
    assert kept3.count() == 0

    # near-dup variant: 40-word docs, batch doc differing by one word from a
    # historical doc is dropped; an unrelated doc survives
    # 200 words, one changed: ~2.5% of shingles differ, sig agreement 14/16
    # and two full bands collide - a deterministic LSH hit (verified once,
    # frozen by the fixed permutation constants)
    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(("w7x" if i == 7 else f"w{i}") for i in range(200))
    other = " ".join(f"z{i}" for i in range(200))
    h = spark.createDataFrame([(1, base)], "doc_id long, text string")
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        DEFAULT_K, minhash_band_buckets, minhash_signature)
    hsig = minhash_signature(h, "doc_id", "text", DEFAULT_K)
    hb = minhash_band_buckets(hsig)
    batch = spark.createDataFrame([(100, near), (101, other)],
                                  "doc_id long, text string")
    kept, ksig, kbuck = incremental_minhash_dedup(
        batch, "doc_id", "text", sig_store=hsig, bucket_store=hb,
        threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {101}
    assert {r["id"] for r in ksig.collect()} == {101}
    assert kbuck.where("id = 100").count() == 0
    # bucket store without its signatures is an unverifiable combination
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket_store"):
        incremental_minhash_dedup(batch, "doc_id", "text",
                                  sig_store=None, bucket_store=hb)
    # batch_sig fast path (r13): handing in the batch's precomputed
    # signatures (e.g. a slice of one corpus-wide pass) must be
    # result-identical to the internal computation
    bsig = minhash_signature(batch, "doc_id", "text", DEFAULT_K) \
        .localCheckpoint(eager=True)
    kept_p, ksig_p, kbuck_p = incremental_minhash_dedup(
        batch, "doc_id", "text", sig_store=hsig, bucket_store=hb,
        threshold=0.5, batch_sig=bsig)
    assert {r["doc_id"] for r in kept_p.collect()} == ids
    assert sorted(map(tuple, ksig_p.collect())) == \
        sorted(map(tuple, ksig.collect()))
    assert sorted(map(tuple, kbuck_p.collect())) == \
        sorted(map(tuple, kbuck.collect()))


def test_filter_pipeline_modes(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from aliyun_maxcompute_data_collectors_spark.operators.text import (
        filter_pipeline, token_count)

    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "short"), (3, None)],
        "id long, text string")
    rules = [("len", token_count("text") >= 3),
             ("notnull", F.col("text").isNotNull())]
    rep = {r["id"]: r for r in filter_pipeline(df, rules).collect()}
    assert rep[1]["kept"] and rep[1]["drop_reason"] is None
    assert not rep[2]["kept"] and rep[2]["drop_reason"] == "len"
    # NULL text -> token_count NULL -> rule counts as failed, first in order
    assert not rep[3]["kept"] and rep[3]["drop_reason"] == "len"
    kept = filter_pipeline(df, rules, mode="filter")
    assert [r["id"] for r in kept.collect()] == [1]
    assert kept.columns == df.columns
    with _pytest.raises(ValueError):
        filter_pipeline(df, rules, mode="bogus")
    with _pytest.raises(ValueError):
        filter_pipeline(df, [])


def test_minhash_lsh_max_bucket_cap(spark, caplog):
    """A planted 30-member identical family must not emit its ~435 pairs
    when every band bucket it occupies is over the cap; unrelated pairs
    under the cap are unaffected.  When buckets ARE dropped, the library
    logs a recall-loss warning with the over-cap bucket count (ADVICE r4
    #4) so pipelines can detect the degradation instead of inferring it."""
    import logging as _logging

    from aliyun_maxcompute_data_collectors_spark.operators.dedup import minhash_lsh_pairs

    fam = " ".join(f"f{i}" for i in range(60))
    solo_a = " ".join(f"a{i}" for i in range(60))
    rows = [(i, fam) for i in range(30)]            # hot family
    rows += [(100, solo_a), (101, solo_a)]          # small dup pair
    rows += [(200, " ".join(f"z{i}" for i in range(60)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with caplog.at_level(_logging.WARNING,
                         logger="aliyun_maxcompute_data_collectors_spark.operators.dedup"):
        raw = minhash_lsh_pairs(df, "doc_id", "text",
                                warn_recall=True).count()
        assert raw == 30 * 29 // 2 + 1              # family pairs + (100,101)
        assert not caplog.records                   # under cap: silent
        # default (lazy) path: same output, no diagnostic job, no warning
        capped_lazy = minhash_lsh_pairs(df, "doc_id", "text", max_bucket=10)
        got = {(r["id1"], r["id2"]) for r in capped_lazy.collect()}
        assert got == {(100, 101)}                  # family suppressed, pair kept
        assert not caplog.records                   # lazy path never warns
        # warn_recall=True: identical output plus the recall-loss warning
        capped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket=10,
                                   warn_recall=True)
        got = {(r["id1"], r["id2"]) for r in capped.collect()}
        assert got == {(100, 101)}
        dropped_warnings = [r for r in caplog.records
                            if "max_bucket" in r.getMessage()]
        assert dropped_warnings, "dropping buckets must emit a recall-loss warning"


def test_pretrain_pipeline_example(spark, tmp_path):
    """The end-to-end corpus pipeline example runs and every stage strictly
    narrows (or preserves) the corpus; the shard export is readable."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "pretrain_pipeline",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "pretrain_pipeline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "corpus")
    stats = mod.run(spark, "/root/testdata/sf0.001", out)
    assert stats["input"] >= stats["after_quality"] >= stats["after_exact"] \
        >= stats["after_minhash"] >= stats["after_span"] \
        >= stats["after_decontam"]
    assert stats["after_decontam"] == stats["train"] + stats["val"]
    back = spark.read.parquet(os.path.join(out, "train"))
    assert back.count() == stats["train"]
    assert back.select("shard_id").distinct().count() <= 4


def test_parse_bytes_conf_suffixes():
    from aliyun_maxcompute_data_collectors_spark.session import _parse_bytes_conf
    assert _parse_bytes_conf("268435456") == 268435456
    assert _parse_bytes_conf("256m") == 256 << 20
    assert _parse_bytes_conf("128MB") == 128 << 20
    assert _parse_bytes_conf("1g") == 1 << 30
    assert _parse_bytes_conf("64k") == 64 << 10
    assert _parse_bytes_conf("134217728b") == 134217728
    assert _parse_bytes_conf("nonsense") == 134217728  # safe fallback


def test_minhash_lsh_capped_growth_is_linear(spark):
    """VERDICT r3 'What's wrong' #3: with the (now default) max_bucket cap,
    candidate-pair output must grow ~linearly in corpus size even when
    duplicate-family size grows WITH the corpus (the uncapped quadratic
    regime that made the r3 sf10 smoke go 11.1x at 10x data).

    Corpus(N): one identical family of N/10 docs (over-cap at both scales:
    contributes ~0 pairs) + N/20 distinct 2-doc duplicate pairs (linear
    signal) + filler uniques.  At 4x the corpus an uncapped run grows
    family pairs 16x; the capped run must stay within ~linear bounds."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET, minhash_lsh_pairs)

    def corpus(n):
        fam = " ".join(f"fam{i} tok{i} x{i}" for i in range(20))
        rows = [(i, fam) for i in range(n // 10)]
        for p in range(n // 20):
            text = " ".join(f"p{p}w{i} q{p + i} r{i}" for i in range(20))
            rows.append((10_000_000 + 2 * p, text))
            rows.append((10_000_000 + 2 * p + 1, text))
        for u in range(n - len(rows)):
            rows.append((20_000_000 + u,
                         " ".join(f"u{u}w{i} s{u + 7 * i}" for i in range(20))))
        return spark.createDataFrame(rows, "doc_id long, text string")

    n1, n2 = 1200, 4800
    assert n1 // 10 > DEFAULT_MAX_BUCKET  # family over-cap at BOTH scales
    c1 = minhash_lsh_pairs(corpus(n1), "doc_id", "text").count()
    c2 = minhash_lsh_pairs(corpus(n2), "doc_id", "text").count()
    # linear signal: ~n/20 true pairs; allow 1.5x slack over proportional
    # growth plus a small constant - quadratic growth (16x) fails hard
    assert c1 >= n1 // 20  # the planted pairs are found
    assert c2 <= (n2 / n1) * c1 * 1.5 + 10, (c1, c2)


def test_ccnet_bucket_sample_semantics(spark):
    """Head tercile survives whole; tail keeps ~10%; buckets are per-lang
    logprob terciles with deterministic id tiebreak."""
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import ccnet_bucket_sample

    def letters(i):  # digit-free token suffix (the tokenizer drops digits)
        return "".join("abcdefghij"[int(c)] for c in str(i))

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en") for i in range(30)]                 # high logprob
    rows += [(100 + i,
              f"zzq{letters(i)}xw vqj{letters(i)}k qqzzt{letters(i)}", "en")
             for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_bucket_sample(df, keep=(1.0, 0.5, 0.0))
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # bucket 3 fully dropped with keep=0
    assert all(b in (1, 2) for b in got.values())
    # the 30 common-text docs rank highest -> all land in bucket 1 and are
    # kept whole (keep=1.0 has no hash filter effect)
    assert all(got.get(i) == 1 for i in range(30))
    # deterministic: same call -> same rows
    again = {r["doc_id"]: r["bucket"]
             for r in ccnet_bucket_sample(df, keep=(1.0, 0.5, 0.0)).collect()}
    assert again == got


def test_source_overlap_counts(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import source_overlap

    rows = [
        (1, "shared one", "cc"), (2, "Shared   ONE", "c4"),   # same fp cc/c4
        (3, "shared two", "cc"), (4, "shared two", "wiki"),
        (5, "shared two", "c4"),                              # fp in all 3
        (6, "only cc", "cc"), (7, "only c4", "c4"),
        (8, "shared one", "cc"),                              # dup within cc: 1 fp
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_shared_fps"]
           for r in source_overlap(df).collect()}
    assert got == {("c4", "cc"): 2, ("cc", "wiki"): 1, ("c4", "wiki"): 1}


def test_zipf_profile_slope(spark):
    """An exactly Zipfian token distribution (freq = C/rank) must fit slope
    ~ -1; output is a single deterministic row."""
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import zipf_profile

    # token tok_r appears floor(1200/r) times, r = 1..40 (letter-only names:
    # the tokenizer splits on [^a-z]+, so digits would merge every token)
    def letters(i):
        return "".join("abcdefghij"[int(c)] for c in str(i))

    words = []
    for r in range(1, 41):
        words += [f"tok{letters(r)}"] * (1200 // r)
    docs = [(i, " ".join(words[i::10])) for i in range(10)]  # spread over docs
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_profile(df, top_n=40).collect()[0]
    assert row["n_top"] == 40
    assert abs(row["slope"] + 1.0) < 0.05, row["slope"]


def test_ngram_novelty_bounds(spark):
    """First doc is fully novel; an exact copy is fully derivative; a
    half-overlapping doc sits in between."""
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import ngram_novelty

    a = "w1 w2 w3 w4 w5 w6"
    rows = [(1, a), (2, a), (3, "w4 w5 w6 x1 x2 x3")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["novelty"])
           for r in ngram_novelty(df, n=3).collect()}
    assert got[1] == (4, 1.0)
    assert got[2] == (4, 0.0)
    n3, nov3 = got[3]
    assert n3 == 4 and 0.0 < nov3 < 1.0  # 'w4 w5 w6' seen in doc 1
    assert nov3 == 0.75


def test_ngram_jaccard_identical_collapse(spark):
    """The round-4 identical-content collapse must be output-invisible:
    duplicate families pair at 1.0 (all member pairs), near-dups inherit
    the representative jaccard on every member, NULL/empty-text behavior
    matches the shingle semantics (null -> never pairs; empty -> "" shingle)."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import ngram_jaccard_pairs

    base = "a b c d e f g h i j"
    near = "a b c d e f g h i k"      # 4/6 wait - computed below, just >=0.5
    rows = [(1, base), (2, base), (3, base),       # identical family of 3
            (4, near), (5, near),                  # identical family of 2
            (6, None), (7, None),                  # null texts: never pair
            (8, "totally different words here now zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id1"], r["id2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, "doc_id", "text", n=5,
                                        threshold=0.3).collect()}
    # family pairs all at 1.0
    for p in [(1, 2), (1, 3), (2, 3), (4, 5)]:
        assert got[p] == 1.0, (p, got.get(p))
    # cross-family near-dup: same jaccard for EVERY member combination
    cross = {p: j for p, j in got.items()
             if p[0] in (1, 2, 3) and p[1] in (4, 5)}
    assert len(cross) == 6 and len(set(cross.values())) == 1
    assert 0.3 <= next(iter(cross.values())) < 1.0
    # null-text docs appear in no pair
    assert all(6 not in p and 7 not in p for p in got)


def test_embedding_quality_planted_defects(spark):
    """Null vector, wrong dimension, NaN element, inf element, and
    zero-norm vector are each counted exactly once; norm stats skip the
    non-finite/null rows."""
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        embedding_quality)

    rows = [
        (1, [3.0, 4.0]),            # norm 5
        (2, [0.0, 0.0]),            # zero norm
        (3, None),                  # null vector
        (4, [1.0, 2.0, 2.0]),       # wrong dim
        (5, [float("nan"), 1.0]),   # NaN element
        (6, [float("inf"), 1.0]),   # inf element
        (7, [0.0, 1.0]),            # norm 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_quality(df, "embedding", expected_dim=2).collect()[0]
    assert r["n_vecs"] == 7
    assert r["n_null"] == 1
    assert r["n_bad_dim"] == 1
    assert r["n_nonfinite"] == 2
    assert r["n_zero_norm"] == 1
    assert r["min_norm"] == 0.0 and r["max_norm"] == 5.0
    # mean over finite non-null norms: (5 + 0 + 3 + 1) / 4
    assert r["mean_norm"] == 2.25


def test_ivf_assign_matches_full_fit_cells(spark, sf_dir):
    """Frozen-index assignment of vectors the fit HAS seen must reproduce
    the fit's own cells (assignment expr == det_kmeans final pass)."""
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        det_kmeans, det_kmeans_assign_best)
    from aliyun_maxcompute_data_collectors_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cells, centers = det_kmeans(e, "vec_id", "embedding", dim=64,
                                n_clusters=8, n_iter=2)
    best = det_kmeans_assign_best(F.col("embedding"), centers)
    re_assigned = e.select(F.col("vec_id").alias("neighbor_id"),
                           best["c"].alias("cell2"))
    joined = cells.join(re_assigned, "neighbor_id")
    assert joined.where(F.col("cell") != F.col("cell2")).count() == 0


def test_vectorized_fold_kernels_bit_equal(spark):
    """cosine_fast / det_assign_fast must be BIT-identical to the HOF fold
    expressions (same float32->float64 widening, same sequential dim
    order), including distance ties resolving to the lower cell."""
    import random as _r

    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        cosine_expr, cosine_fast, det_assign_fast, det_kmeans_assign_best)

    rng = _r.Random(5)
    dim = 16
    rows = [(i,
             [rng.uniform(-1, 1) for _ in range(dim)],
             [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(300)]
    df = spark.createDataFrame(
        rows, f"id long, a array<float>, b array<float>")
    cmp = df.select(
        cosine_expr(F.col("a"), F.col("b")).alias("c1"),
        cosine_fast(F.col("a"), F.col("b")).alias("c2"))
    assert cmp.where(F.col("c1") != F.col("c2")).count() == 0  # exact ==

    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(6)]
    # plant a tie: two identical centers -> strict < must keep the lower
    centers.append(list(centers[0]))
    best_e = det_kmeans_assign_best(F.col("a"), centers)
    best_f = det_assign_fast(F.col("a"), centers)
    cmp2 = df.select(best_e["c"].alias("e"), best_e["d"].alias("de"),
                     best_f["c"].alias("f"), best_f["d"].alias("df_"))
    assert cmp2.where((F.col("e") != F.col("f"))
                      | (F.col("de") != F.col("df_"))).count() == 0
    assert cmp2.where(F.col("f") == 6).count() == 0  # tie never picks the copy


def test_arrow_list_parts_sliced_array():
    """ADVICE r6: pyarrow's ``ListArray.offsets`` is already
    slice-compensated (n+1 entries, absolute into the full child values
    buffer), so ``_arrow_list_parts`` must NOT re-apply ``arr.offset``.
    A sliced batch - which arrow_udf can hand the kernel when Spark
    splits record batches - must decompose identically to an equivalent
    freshly-built array."""
    import numpy as np
    import pyarrow as pa

    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        _arrow_list_parts)

    data = [[1.0, 2.0], [3.0], None, [4.0, 5.0, 6.0], [], [7.0, 8.0]]
    arr = pa.array(data, type=pa.list_(pa.float32()))
    for off, n in [(0, 6), (2, 4), (3, 3), (5, 1)]:
        s = arr.slice(off, n)
        null, starts, lens, flat = _arrow_list_parts(s)
        assert len(null) == len(starts) == len(lens) == n
        for i, row in enumerate(data[off:off + n]):
            if row is None:
                assert null[i]
                continue
            assert not null[i]
            assert lens[i] == len(row)
            got = flat[starts[i]: starts[i] + lens[i]]
            assert np.allclose(got, row), (off, i, got, row)


def test_cosine_fast_on_sliced_batches(spark):
    """cosine_fast must stay bit-equal to the fold even when the arrow
    batch reaching the kernel is a slice (offset > 0) - exercised by
    shrinking the arrow batch size so Spark chunks the input."""
    import random as _r

    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        cosine_expr, cosine_fast)

    rng = _r.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)],
             [rng.uniform(-1, 1) for _ in range(8)]) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        cmp = df.select(
            cosine_expr(F.col("a"), F.col("b")).alias("c1"),
            cosine_fast(F.col("a"), F.col("b")).alias("c2"))
        assert cmp.where(F.col("c1") != F.col("c2")).count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    """Bloom probing can only over-flag (false positives), never miss: every
    doc/count the exact decontaminate finds appears with >= count, and with
    the default 2^20-bit table on this corpus the two are identical."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        bloom_build, bloom_decontaminate, decontaminate)
    from aliyun_maxcompute_data_collectors_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bench = docs.where(F.col("doc_id") % 53 == 7)
    probe = docs.where(F.col("doc_id") % 53 != 7)
    exact = {r["doc_id"]: r["n_contaminated_ngrams"]
             for r in decontaminate(probe, bench, "doc_id", "text", n=4).collect()}
    words = bloom_build(bench, "text", n=4)
    bloom = {r["doc_id"]: r["n_contaminated_ngrams"]
             for r in bloom_decontaminate(probe, words, "doc_id", "text",
                                          n=4).collect()}
    for d, n in exact.items():
        assert bloom.get(d, 0) >= n, (d, n, bloom.get(d))
    assert bloom == exact  # at 2^20 bits the FP rate is ~0 here

    # a deliberately tiny filter must still be a superset (more FPs, no FNs)
    tiny = bloom_build(bench, "text", n=4, m=1 << 8, k=2)
    tiny_hits = {r["doc_id"]: r["n_contaminated_ngrams"]
                 for r in bloom_decontaminate(probe, tiny, "doc_id", "text",
                                              n=4, m=1 << 8, k=2).collect()}
    for d, n in exact.items():
        assert tiny_hits.get(d, 0) >= n
    assert sum(tiny_hits.values()) > sum(exact.values())  # FPs appeared


def test_vectorized_kernels_null_semantics_match_fold(spark):
    """r4 review findings 1-2: cosine_fast must yield NULL (like the HOF
    fold) for NULL vectors, length-mismatched pairs, and zero norms (Spark
    double 0/0 is NULL, not NaN); det_assign_fast must yield (d NULL, c 0)
    for NULL/ragged vectors exactly as the struct-sort expression does."""
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        cosine_expr, cosine_fast, det_assign_fast, det_kmeans_assign_best)

    rows = [(1, [1.0, 2.0], [2.0, 1.0]),
            (2, None, [1.0, 1.0]),
            (3, [1.0, 2.0], None),
            (4, [1.0], [1.0, 2.0]),          # ragged pair
            (5, [0.0, 0.0], [1.0, 2.0]),     # zero norm
            (6, [3.0, 4.0], [3.0, 4.0])]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    got = df.select("id", cosine_expr(F.col("a"), F.col("b")).alias("c1"),
                    cosine_fast(F.col("a"), F.col("b")).alias("c2")).collect()
    for r in got:
        assert (r["c1"] is None) == (r["c2"] is None), r
        if r["c1"] is not None:
            assert r["c1"] == r["c2"], r

    centers = [[1.0, 0.0], [0.0, 1.0]]
    be = det_kmeans_assign_best(F.col("a"), centers)
    bf = det_assign_fast(F.col("a"), centers)
    for r in df.select("id", be["d"].alias("de"), be["c"].alias("ce"),
                       bf["d"].alias("df_"), bf["c"].alias("cf")).collect():
        assert (r["de"] is None) == (r["df_"] is None), r
        assert r["ce"] == r["cf"], r
        if r["de"] is not None:
            assert r["de"] == r["df_"], r


def test_hash_decimal_exact_beyond_default_context(spark):
    """r4 review finding 3: quotients with >28 significant digits must not
    round before truncation - scalar, batched-UDF, and (within the
    precision gate) expression paths all agree and are exact."""
    from decimal import Decimal as D_

    from aliyun_maxcompute_data_collectors_spark.operators import hashing as H

    vals = [D_("12345678901999999999.9999999995"),
            D_("-12345678901999999999.9999999995"),
            D_("99999999999999999999999999.9999999999"),
            D_("-99999999999999999999999999.9999999999")]
    # independent exact reference via integer math (the unscaled value is
    # taken under a wide context: default-28-digit scaleb rounds!)
    def ref(v):
        from decimal import localcontext
        with localcontext() as c:
            c.prec = 200
            u = int(v.scaleb(10))  # scale 10 below
        P, S = 10 ** 19, 10 ** 10
        q = -((-u) // P) if u < 0 else u // P
        rem = u - q * P
        r = -((-rem) // S) if rem < 0 else rem // S
        m = ((q << 30) | (r & 0xFFFFFFFFFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
        import numpy as np
        return int(H._basic_long_hasher(
            np.array([m], dtype=np.uint64).astype(np.int64))[0])

    for v in vals:
        assert H.hash_decimal(v) == ref(v), v
    df = spark.createDataFrame([(v,) for v in vals], "d decimal(38,10)")
    for r in df.withColumn("h", H.odps_hash(df, ["d"])).collect():
        assert r["h"] == H.combine_hashes([H.hash_decimal(r["d"])]), r["d"]


def test_source_overlap_ignores_null_text(spark):
    """r4 review finding 4: NULL-text docs must not register as shared
    content between sources."""
    from aliyun_maxcompute_data_collectors_spark.operators.corpus import source_overlap

    rows = [(1, None, "cc"), (2, None, "c4"),      # sham overlap candidates
            (3, "real shared", "cc"), (4, "real shared", "c4")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_shared_fps"]
           for r in source_overlap(df).collect()}
    assert got == {("c4", "cc"): 1}


def test_ngram_containment_subset_dup(spark):
    """A short doc embedded verbatim in a much longer doc scores
    containment 1.0 even though its Jaccard is far below threshold -
    the defining case for the asymmetric metric.  Identical contents
    still pair at 1.0 and the output column is named 'containment'."""
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)

    short = "a b c d e f"                      # 2 5-gram shingles
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    rows = [(1, short), (2, long_), (3, short)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id1"], r["id2"]): r["containment"]
           for r in ngram_containment_pairs(df, "doc_id", "text", n=5,
                                            threshold=0.9).collect()}
    assert got[(1, 2)] == 1.0          # subset dup found
    assert got[(1, 3)] == 1.0          # identical contents
    assert got[(2, 3)] == 1.0          # symmetric expansion of the subset
    # and Jaccard at the same threshold misses the subset pair entirely
    jac = {(r["id1"], r["id2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, "doc_id", "text", n=5,
                                        threshold=0.9).collect()}
    assert (1, 2) not in jac and (1, 3) in jac


def test_ngram_containment_metric_validation(spark):
    from aliyun_maxcompute_data_collectors_spark.operators.dedup import ngram_jaccard_pairs
    import pytest as _pt

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pt.raises(ValueError, match="metric"):
        ngram_jaccard_pairs(df, "doc_id", "text", metric="dice").collect()


def test_pmi_collocations_known_corpus(spark):
    """Hand-checkable PMI: 'new york' always adjacent, 'the'/'dog' never
    adjacent to each other.  PMI(new, york) = ln(p(xy)/(p(x)p(y))) with
    exact counts; hapax bigrams are dropped by min_count."""
    import math

    from aliyun_maxcompute_data_collectors_spark.operators.corpus import pmi_collocations

    # 6 docs: "new york" x6 (always adjacent); "the dog" co-occur but
    # only adjacent once (below min_count=2? it's adjacent in every doc
    # of group B - use structure: 'the x dog' keeps them non-adjacent)
    rows = ([(i, "new york is big") for i in range(6)]
            + [(10 + i, "the red dog runs") for i in range(6)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=2, top_k=100).collect()
    got = {(r["x"], r["y"]): r for r in out}
    assert ("new", "york") in got
    r = got[("new", "york")]
    # corpus: 12 docs x 4 tokens = 48 tokens, 12 docs x 3 bigrams = 36
    assert r["n_xy"] == 6 and r["n_x"] == 6 and r["n_y"] == 6
    expect = math.log((6 / 36.0) / ((6 / 48.0) * (6 / 48.0)))
    assert abs(r["pmi"] - round(expect, 6)) < 1e-9
    # non-adjacent pair never appears
    assert ("the", "dog") not in got
    # hapax (min_count) filtering: nothing with n_xy < 2
    assert all(r["n_xy"] >= 2 for r in out)


def test_char_entropy_exact_values(spark):
    """Uniform two-char text has entropy ln 2; single-char text has 0;
    NULL text emits no row; the gate flag follows min_entropy."""
    import math

    from aliyun_maxcompute_data_collectors_spark.operators.text import char_entropy

    rows = [(1, "abab"), (2, "aaaa"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df, min_entropy=0.5).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_chars"] == 4 and got[1]["n_distinct_chars"] == 2
    assert abs(got[1]["entropy"] - round(math.log(2), 6)) < 1e-9
    assert got[1]["ok_entropy"] is True
    assert got[2]["entropy"] == 0.0 and got[2]["ok_entropy"] is False


def test_det_kmeans_rejects_dirty_vectors(spark):
    """ADVICE r5: det_kmeans's input contract is uniform - every vector
    non-NULL with exactly dim elements.  NULL/empty vectors raise (the old
    wide form silently counted them in the centroid denominator and the
    posexplode form silently dropped them), and uniformly-SHORT vectors -
    which pass the per-row checks because their per-pos counts agree -
    raise the ragged ValueError instead of escaping as a KeyError."""
    import pytest as _pytest

    from aliyun_maxcompute_data_collectors_spark.operators.similarity import det_kmeans

    clean = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, v array<double>")
    cells, centers = det_kmeans(clean, "id", "v", dim=2, n_clusters=2,
                                n_iter=1)
    assert cells.count() == 2 and len(centers) == 2

    with_null = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id long, v array<double>")
    with _pytest.raises(ValueError, match="NULL or empty"):
        det_kmeans(with_null, "id", "v", dim=2, n_clusters=2, n_iter=1)

    with_empty = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="NULL or empty"):
        det_kmeans(with_empty, "id", "v", dim=2, n_clusters=2, n_iter=1)

    # ragged mix: caught by the per-row count check
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="ragged"):
        det_kmeans(ragged, "id", "v", dim=2, n_clusters=2, n_iter=1)

    # uniformly short: equal per-pos counts, every pos < dim - the
    # completeness check must still flag it as ragged
    short = spark.createDataFrame(
        [(1, [1.0]), (2, [3.0])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="ragged"):
        det_kmeans(short, "id", "v", dim=2, n_clusters=2, n_iter=1)


def test_det_kmeans_centers_reuse_matches_fit(spark):
    """r7 train-once/assign-many: det_kmeans(centers=fit_centers) must
    produce exactly the fit's assignment (same fold arithmetic), with no
    fit jobs run."""
    import random as _r

    from aliyun_maxcompute_data_collectors_spark.operators.similarity import (
        det_kmeans)

    rng = _r.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells_fit, centers = det_kmeans(df, "vec_id", "embedding", dim=8,
                                    n_clusters=4, n_iter=2)
    cells_reuse, centers2 = det_kmeans(df, "vec_id", "embedding", dim=8,
                                       n_clusters=4, n_iter=2,
                                       centers=centers)
    assert centers2 == centers
    a = {r["neighbor_id"]: r["cell"] for r in cells_fit.collect()}
    b = {r["neighbor_id"]: r["cell"] for r in cells_reuse.collect()}
    assert a == b


def test_bpe_pair_counts_feed_the_first_merge(spark):
    """adjacent_pair_counts is the aggregation every BPE iteration runs:
    its rank-1 row must equal bpe_train's first merge (same tie-break),
    and counts must match the sequential reference on the toy corpus."""
    from aliyun_maxcompute_data_collectors_spark.operators import bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new"),
         (3, "wide wider low")], "doc_id int, text string")
    pc = [tuple(r) for r in bpe.adjacent_pair_counts(df).collect()]
    assert pc[0] == (1, "l", "o", 6)          # == first merge ('l','o',6)
    first_merge = bpe.bpe_train(df, n_merges=1).collect()[0]
    assert (pc[0][1], pc[0][2], pc[0][3]) == (
        first_merge["left"], first_merge["right"],
        first_merge["pair_count"])
    # rank order is the merge-loop tie-break: count DESC, lhs, rhs
    keys = [(-c, a, b) for _, a, b, c in pc]
    assert keys == sorted(keys)
    # weighted by word frequency: 'ne' appears once in 4 distinct words
    by_pair = {(a, b): c for _, a, b, c in pc}
    assert by_pair[("n", "e")] == 4
    # top_n truncates deterministically
    assert [t[0] for t in pc[:5]] == [r["pair_rank"] for r in
                                      bpe.adjacent_pair_counts(
                                          df, top_n=5).collect()]
