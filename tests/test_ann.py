"""Multi-band LSH ANN (operators.ann): recall on a planted-neighbor
corpus, candidate sublinearity as the corpus grows, and DuckDB oracle
equivalence of the bucket arithmetic.

Recall protocol: the sf testdata embeddings are near-random (true top-3
cosine ~0.3 — see VERDICT r2 / docs/SCALING.md note), where NO
sublinear method can hit high recall, so the recall bar is evaluated on
a planted corpus: queries are small perturbations of corpus vectors
(cosine ~0.95), the standard near-duplicate retrieval case LSH exists
for.  The sf-corpus behavior is covered by the driver's oracle row
(exactness of the candidate set + re-rank, not recall)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s


def _planted_corpus(n, dim=64, n_queries=10, seed=7, noise=0.04):
    """Each query has THREE planted near-duplicates in the corpus
    (cosine ~0.95, the near-dup retrieval case); everything else is
    random (cosine ~0.3), so brute top-3 == the planted set."""
    rng = np.random.RandomState(seed)
    base = rng.normal(size=(n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(n_queries):
        q = base[i] / np.linalg.norm(base[i])
        rows.append((i, [float(x) for x in q], 0))
    for i in range(n_queries, n):
        if i < n_queries * 4:  # 3 planted neighbors per query
            src = base[(i - n_queries) % n_queries]
            v = src + noise * rng.normal(size=dim)
            v /= np.linalg.norm(v)
        else:
            v = base[i]
        rows.append((i, [float(x) for x in v], 1))
    return rows


def _brute_topk(rows, k=3, n_queries=10):
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows])
    Vq = np.floor(V * 1e6)  # the engine's quantization
    out = {}
    qm = ids < n_queries
    cm = ~qm
    cids = ids[cm]
    sims = (Vq[qm] @ Vq[cm].T) / (
        np.linalg.norm(Vq[qm], axis=1)[:, None] * np.linalg.norm(Vq[cm], axis=1)[None, :])
    for qi, qid in enumerate(ids[qm]):
        order = np.lexsort((cids, -sims[qi]))[:k]
        out[int(qid)] = {int(cids[j]) for j in order}
    return out


def test_lsh_recall_planted(spark):
    from tippecanoe_spark.operators.ann import ann_lsh_topk

    rows = _planted_corpus(800)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = ann_lsh_topk(emb, k=3, bands=4).collect()
    brute = _brute_topk(rows)
    hit = sum(1 for r in got if r["cid"] in brute[r["qid"]])
    total = sum(len(v) for v in brute.values())
    recall = hit / total
    assert recall >= 0.9, f"planted-neighbor recall {recall:.2f} < 0.9"


def test_lsh_candidates_sublinear(spark):
    """candidates/query must grow much slower than the corpus: the
    plane count scales with N (planes_for), so expected bucket
    occupancy stays ~constant."""
    from tippecanoe_spark.operators.ann import ann_lsh_candidate_stats

    stats = {}
    for n in (800, 3200):
        rows = _planted_corpus(n)
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        stats[n] = ann_lsh_candidate_stats(emb)
    growth = stats[3200]["candidates_per_query"] / max(stats[800]["candidates_per_query"], 1)
    assert stats[3200]["planes_per_band"] > stats[800]["planes_per_band"]
    assert growth < 2.5, (stats, "4x corpus must not give ~4x candidates")


def test_lsh_oracle_equivalence(spark):
    """Spark and DuckDB produce identical buckets, candidates, and
    ranked output (the driver's correctness row, reproduced here)."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    sdf = (E.q_ann_lsh(spark, sf).toPandas()
           .sort_values(["qid", "rk"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    odf = (con.execute(E.oracle_sql()["ann_lsh"]).df()
           .sort_values(["qid", "rk"]).reset_index(drop=True))
    assert len(sdf) == len(odf) > 0
    assert sdf[["qid", "rk", "cid"]].astype("int64").equals(
        odf[["qid", "rk", "cid"]].astype("int64"))
    assert float((sdf["sim"] - odf["sim"]).abs().max()) == 0.0


def test_ivf_recall_planted(spark):
    """IVF with sampled centroids: a planted near-duplicate has nearly
    the query's own centroid distances, so it lands in a probed list —
    planted recall must be high even at nprobe=2 of 8 lists."""
    from tippecanoe_spark.operators.ann import ann_ivf_topk

    rows = _planted_corpus(800)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = ann_ivf_topk(emb, k=3, n_centroids=8, nprobe=2).collect()
    brute = _brute_topk(rows)
    hit = sum(1 for r in got if r["cid"] in brute[r["qid"]])
    total = sum(len(v) for v in brute.values())
    recall = hit / total
    assert recall >= 0.8, f"planted-neighbor IVF recall {recall:.2f} < 0.8"


def test_ivf_probed_fraction(spark):
    """The exact re-rank touches only the probed lists: scored pairs
    per query are bounded by the occupancy of nprobe lists, well under
    the corpus size."""
    from pyspark.sql import functions as F

    from tippecanoe_spark.operators.ann import ann_ivf_topk

    rows = _planted_corpus(800)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # k large enough to return every scored pair -> measures candidate volume
    all_pairs = ann_ivf_topk(emb, k=10**9, n_centroids=8, nprobe=2)
    per_q = (all_pairs.groupBy("qid").agg(F.count("*").alias("n")).collect())
    n_cand = 800 - 10
    for r in per_q:
        assert r["n"] < n_cand, (r, "probed more than the whole corpus")
    avg = sum(r["n"] for r in per_q) / len(per_q)
    # 2 of 8 lists -> expect ~25% of the corpus per query, not ~100%
    assert avg <= 0.6 * n_cand, f"avg scored pairs {avg} not sublinear"


def test_text_near_dup_recall_planted(spark, tmp_path):
    """The r=2 banded MinHash text pipeline (q_dedup_near_verified)
    must still FIND real near-duplicates after the r5 candidate-
    tightening: documents sharing ~90% of their bigrams (one word in
    ten swapped) are planted in a random-text corpus and every planted
    pair must survive candidates + exact-Jaccard verification."""
    import random
    import sys

    import pandas as pd

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import __spark_entry__ as entrymod

    rng = random.Random(5)
    vocab = [f"w{k}" for k in range(5000)]  # big vocab: low base overlap
    rows = []
    planted = set()
    doc_id = 0
    for pair in range(20):
        base = [rng.choice(vocab) for _ in range(60)]
        near = list(base)
        for _ in range(6):  # swap ~10% of tokens
            near[rng.randrange(len(near))] = rng.choice(vocab)
        rows.append((doc_id, " ".join(base)))
        rows.append((doc_id + 1, " ".join(near)))
        planted.add((doc_id, doc_id + 1))
        doc_id += 2
    for _ in range(400):  # unrelated noise docs
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(60))))
        doc_id += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "synthetic"
    out = tmp_path / "documents.parquet"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(out))
    # the query loads <sf_dir>/documents.parquet
    got = entrymod.q_dedup_near_verified(spark, str(tmp_path)).collect()
    found = {(r["d1"], r["d2"]) for r in got if r["jaccard"] >= 0.5}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, (recall, sorted(planted - found)[:5])
    # and the verifier keeps noise out: nothing unplanted at j >= 0.5
    assert not (found - planted)
