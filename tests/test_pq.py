"""Product quantization (operators/pq.py): kernel parity vs a numpy
reference, training determinism, dirty-input contracts, ADC ranking
against exact brute force on the compressed representation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.pq import (
    _subspace_codebooks_init,
    pq_assign_fast,
    pq_code_hist,
    pq_encode,
    pq_topk,
    pq_train,
)

DIM, M, KSUB = 8, 4, 4


def _vecs(n, dim=DIM, seed=7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(np.float32)


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>")


def _np_codes(X, books):
    """Reference per-subspace argmin with ties to the lower code."""
    C = np.asarray(books, dtype=np.float64)
    m, ksub, dsub = C.shape
    out = np.zeros((len(X), m), dtype=np.int32)
    for r, v in enumerate(np.asarray(X, dtype=np.float64)):
        for j in range(m):
            d = ((v[j * dsub:(j + 1) * dsub] - C[j]) ** 2).sum(axis=1)
            out[r, j] = int(np.argmin(d))  # argmin takes the first minimum
    return out


def test_assign_matches_numpy_reference(spark):
    X = _vecs(200)
    books = _subspace_codebooks_init(DIM, M, KSUB)
    got = (
        _df(spark, X)
        .select("vec_id", pq_assign_fast(F.col("embedding"), books).alias("c"))
        .orderBy("vec_id").collect())
    exp = _np_codes(X, books)
    assert all(list(r["c"]) == list(exp[i]) for i, r in enumerate(got))


def test_train_is_deterministic_and_moves_centroids(spark):
    X = _vecs(300)
    df = _df(spark, X)
    b1 = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=2)
    b2 = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=2)
    assert b1 == b2  # bit-identical across runs
    init = _subspace_codebooks_init(DIM, M, KSUB)
    assert b1 != init  # the update actually ran


def test_encode_and_hist_mass(spark):
    X = _vecs(150)
    df = _df(spark, X)
    books = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=1)
    codes = pq_encode(df, "vec_id", "embedding", books)
    hist = pq_code_hist(codes)
    assert hist.agg(F.sum("n")).first()[0] == 150 * M
    assert hist.where((F.col("code") < 0) | (F.col("code") >= KSUB)).count() == 0


def test_topk_matches_bruteforce_adc(spark):
    X = _vecs(120)
    df = _df(spark, X)
    books = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=2)
    codes = pq_encode(df, "vec_id", "embedding", books)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in pq_topk(df.where(F.col("vec_id") < 3), codes, books,
                            k=4).collect()}
    # numpy ADC: distance-table lookups summed left-to-right like the plan
    C = np.asarray(books, dtype=np.float64)
    m, ksub, dsub = C.shape
    np_codes = _np_codes(X, books)
    for qid in range(3):
        q = np.asarray(X[qid], dtype=np.float64)
        dt = np.stack([((q[j * dsub:(j + 1) * dsub] - C[j]) ** 2).sum(axis=1)
                       for j in range(m)])
        adc = np.array([
            round(sum(dt[j, np_codes[i, j]] for j in range(m)), 6)
            for i in range(len(X))])
        order = sorted((adc[i], i) for i in range(len(X)) if i != qid)
        for rank, (_, nid) in enumerate(order[:4], start=1):
            assert got[(qid, rank)] == nid


def test_candidates_prefilter(spark):
    X = _vecs(60)
    df = _df(spark, X)
    books = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=1)
    codes = pq_encode(df, "vec_id", "embedding", books)
    cand = spark.createDataFrame([(i,) for i in range(10, 20)], "id long")
    out = pq_topk(df.where(F.col("vec_id") == 0), codes, books, k=5,
                  candidates=cand)
    ids = {r["neighbor_id"] for r in out.collect()}
    assert ids and ids <= set(range(10, 20))


def test_train_rejects_dirty_vectors(spark):
    ok = [(0, [1.0] * DIM), (1, [0.5] * DIM)]
    for bad, msg in [
        ((2, None), "NULL"),
        ((2, []), "NULL"),
        ((2, [1.0] * (DIM - 1)), "non-dim-length"),
    ]:
        df = spark.createDataFrame(ok + [bad],
                                   "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match=msg):
            pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=1)


def test_encode_nulls_dirty_rows(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, None), (2, [1.0] * (DIM - 1))],
        "vec_id long, embedding array<float>")
    books = _subspace_codebooks_init(DIM, M, KSUB)
    rows = {r["id"]: r["codes"]
            for r in pq_encode(df, "vec_id", "embedding", books).collect()}
    assert rows[0] is not None and len(rows[0]) == M
    assert rows[1] is None and rows[2] is None


def test_ivfpq_equals_pq_restricted_to_probed_cells(spark):
    """ivfpq_topk == pq_topk with candidates pinned to the probed cells -
    the composition adds a prefilter, never changes a surviving score."""
    from aliyun_maxcompute_data_collectors_spark.operators.similarity import det_kmeans
    from aliyun_maxcompute_data_collectors_spark.operators.pq import ivfpq_topk

    X = _vecs(200)
    df = _df(spark, X)
    books = pq_train(df, "embedding", dim=DIM, m=M, ksub=KSUB, n_iter=2)
    codes = pq_encode(df, "vec_id", "embedding", books)
    cells, centers = det_kmeans(df, "vec_id", "embedding", dim=DIM,
                                n_clusters=4, n_iter=2)
    got = ivfpq_topk(df.where(F.col("vec_id") < 2),
                     cells.select("neighbor_id", "cell"), codes, books,
                     centers, k=5, n_probe=2).collect()
    assert got, "ivfpq returned no rows"
    cell_of = {r["neighbor_id"]: r["cell"] for r in cells.collect()}
    C = np.asarray(centers)
    for qid in range(2):
        q = np.asarray(X[qid], dtype=np.float64)
        # probe rule: top n_probe cells by centroid dot (ties to lower id)
        dots = C @ q
        probed = set(sorted(range(4), key=lambda c: (-dots[c], c))[:2])
        per_cell = [r for r in got if r["query_id"] == qid]
        assert per_cell, f"query {qid} empty"
        for r in per_cell:
            assert cell_of[r["neighbor_id"]] in probed
        # restricted pq_topk over the same candidate set agrees
        cand = spark.createDataFrame(
            [(i,) for i, c in cell_of.items() if c in probed], "id long")
        ref = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
               for r in pq_topk(df.where(F.col("vec_id") == qid), codes,
                                books, k=5, candidates=cand).collect()}
        for r in per_cell:
            assert ref[(qid, r["rank"])] == (r["neighbor_id"], r["adc_dist"])


def test_dim_not_divisible_raises(spark):
    df = _df(spark, _vecs(10))
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "embedding", dim=DIM, m=3, ksub=KSUB, n_iter=1)


def test_pq_topk_unbounded_query_guard(spark):
    """VERDICT r6 #2: pq_topk without candidates= must refuse a query side
    larger than max_query_rows (the silent |Q| x |codes| quadratic), accept
    it with an explicit max_query_rows=None opt-in, and leave small
    bounded batches untouched."""
    import pytest as _pytest

    from aliyun_maxcompute_data_collectors_spark.operators.pq import (
        pq_encode, pq_topk, pq_train)

    rng = __import__("random").Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, "embedding", dim=8, m=2, ksub=4, n_iter=1)
    codes = pq_encode(df, "vec_id", "embedding", books)

    with _pytest.raises(ValueError, match="candidates"):
        pq_topk(df, codes, books, k=3, max_query_rows=10)
    # explicit opt-in runs
    assert pq_topk(df.where("vec_id < 12"), codes, books, k=3,
                   max_query_rows=None).count() > 0
    # bounded batch under the threshold runs without opt-in
    assert pq_topk(df.where("vec_id < 3"), codes, books, k=3).count() > 0
