"""Approximate nearest neighbors over an embedding column.

Scale path for the training-data similarity ops: multi-band
sign-random-projection LSH.  Every vector gets B independent bucket ids
(one per band, P hyperplanes each); candidates are the UNION over bands
of equi-join matches (OR-construction — recall compounds across bands,
1-(1-r^P)^B, while each join stays a plain hash join on (band,
bucket)), deduped per (query, candidate), then exactly re-ranked with
integer-quantized cosine so the ranking is engine-neutral.

Plane count scales with corpus size: P = max(4, ceil(log2(n /
occupancy))) keeps expected bucket occupancy — and with it candidates
per query — roughly constant as N grows.  (A fixed plane count gives
N / 2^P candidates per query: O(N).)

Hyperplanes are deterministic integers, w[b][p][d] = (((b*P + p) * D +
d) * 2654435761) % 2^32 - 2^31, applied to the 1e6-quantized embedding:
no RNG and no floats in the bucketing, so DuckDB reproduces the buckets
bit-for-bit (the correctness oracle).
"""

from __future__ import annotations

import math

_XMUL = 2654435761
_W = 1 << 32


def planes_for(n: int, occupancy: int = 64) -> int:
    """Hyperplanes per band so that expected bucket occupancy stays
    ~`occupancy` as the corpus grows (2^P buckets per band)."""
    if n <= occupancy:
        return 4
    return max(4, math.ceil(math.log2(n / occupancy)))


def parquet_row_count(path: str) -> int:
    """Exact corpus size from parquet footers — a driver-side metadata
    read (no Spark job), so sizing the LSH planes never costs a scan.
    Accepts a single file or a directory of part files."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = [
            os.path.join(path, f) for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)




def _quant(col: str) -> str:
    return (f"CAST(floor(CAST({col} AS DOUBLE) * 1000000) AS BIGINT)")


def _dot_zip(a: str, b: str) -> str:
    """Dot product of two BIGINT array columns via zip_with+aggregate.

    Measured note (r6): an unrolled 64-term element_at sum — intended
    to dodge the interpreted higher-order-function path — was 4x
    SLOWER here (the giant expression knocks the projection out of
    whole-stage codegen, and interpreted element_at per term costs far
    more than one interpreted zip_with loop).  Scoring over
    PRE-QUANTIZED vectors with zip_with is ~0.1 s per 150k pairs; the
    expensive part was never the dot but re-quantizing per pair."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            "0L, (acc, v) -> acc + v)")


_FEAT_SCHEMA = "vec_id long, q array<long>, n2 long, bkt array<long>"


def lsh_vec_features(emb, bands: int, planes: int, dim: int = 64,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Per-vector LSH features in ONE vectorized numpy pass (guide §4.2):
    the 1e6-quantized integer vector ``q``, its squared norm ``n2`` and
    the per-band sign-random-projection bucket ids ``bkt`` (bkt[b] ==
    band_bucket_expr(b, planes, dim) exactly).

    Bit-identical to the SQL expressions: quantization is
    floor(float64(x) * 1e6) in IEEE double, the hyperplane weights are
    the same deterministic integers, and every multiply/add is wrapping
    int64 (numpy matmul == SQL BIGINT arithmetic; addition order is
    irrelevant mod 2^64).  Replaces bands*planes interpreted
    aggregate() lambdas per row — the dominant cost of the ANN queries
    in BENCH_r05 — with one int64 matmul per Arrow batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    n_planes = bands * planes
    seeds = (np.arange(n_planes * dim, dtype=np.int64) * _XMUL) % _W \
        - (1 << 31)
    wt = np.ascontiguousarray(seeds.reshape(n_planes, dim).T)
    pw = np.int64(1) << np.arange(planes, dtype=np.int64)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(vecs * 1e6).astype(np.int64)
            with np.errstate(over="ignore"):
                proj = q @ wt
                n2 = (q * q).sum(axis=1)
            bkt = ((proj >= 0).reshape(len(q), bands, planes)
                   * pw).sum(axis=2, dtype=np.int64)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "q": list(q),
                "n2": n2,
                "bkt": list(bkt),
            })

    return (emb.select(F.col(id_col).alias("vec_id"),
                       F.col(emb_col).alias("embedding"))
            .mapInPandas(fn, schema=_FEAT_SCHEMA))


def band_bucket_expr(band: int, planes: int, dim: int,
                     col: str = "embedding", duck: bool = False) -> str:
    """SQL for one band's bucket id (unrolled per plane; identical
    arithmetic in Spark SQL and DuckDB)."""
    bits = []
    for p in range(planes):
        seed = (band * planes + p) * dim
        if duck:
            proj = (
                f"CAST(list_sum(list_transform(generate_series(0, {dim - 1}), "
                f"d -> ((({seed} + d) * {_XMUL}) % {_W} - {1 << 31}) * "
                f"{_quant(f'{col}[d + 1]')})) AS BIGINT)"
            )
        else:
            proj = (
                f"aggregate(sequence(0, {dim - 1}), 0L, (acc, d) -> acc + "
                f"((({seed} + d) * {_XMUL}) % {_W} - {1 << 31}) * "
                f"{_quant(f'element_at({col}, CAST(d + 1 AS INT))')})"
            )
        bits.append(f"(CASE WHEN ({proj}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def ann_lsh_topk(emb, k: int = 3, bands: int = 4, planes: int | None = None,
                 dim: int = 64, n: int | None = None,
                 query_pred: str = "vec_id < 10"):
    """Top-k approximate cosine neighbors for the rows matching
    query_pred against the rest, via multi-band LSH + exact re-rank.

    Plan shape (the 100 TB argument): B hash joins on (band, bucket) —
    expressed as ONE join after exploding the band array — then a
    per-query window over the deduped candidate set.  No crossJoin
    anywhere; candidate volume per query ~ B * occupancy."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if planes is None:
        # sizing needs the corpus count; pass n (e.g. from
        # parquet_row_count — a footer read, no job) so the query stays
        # a single Spark job.  count() is the documented last resort.
        planes = planes_for(n if n is not None else emb.count())

    # quantized vector, squared norm and all band buckets in ONE
    # vectorized numpy pass per vector (lsh_vec_features) — the pair
    # scorer then only does the dot product.  query_pred is applied to
    # the INPUT of each featurizer: a filter above mapInPandas cannot
    # be pushed through the opaque function, so filtering first keeps
    # each side's Python pass to exactly its own rows (the featurizer
    # is row-wise, so the rows are identical either way)
    def side(pred):
        f = lsh_vec_features(emb.filter(pred), bands, planes, dim)
        return f.select("vec_id", "q", "n2",
                        F.posexplode(F.col("bkt")).alias("band", "bucket"))

    qv = side(query_pred).selectExpr(
        "vec_id AS qid", "q AS qa", "n2 AS na", "band", "bucket")
    cv = side(f"NOT ({query_pred})").selectExpr(
        "vec_id AS cid", "q AS qb", "n2 AS nb", "band", "bucket")
    cand = (qv.join(cv, ["band", "bucket"])
              .dropDuplicates(["qid", "cid"]))

    dot = _dot_zip("qa", "qb")
    scored = cand.selectExpr(
        "qid", "cid", f"round(({dot}) / (sqrt(na) * sqrt(nb)), 6) AS sim")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(f"rk <= {k}").select("qid", "rk", "cid", "sim"))


def ann_lsh_candidate_stats(emb, bands: int = 4, planes: int | None = None,
                            dim: int = 64, n: int | None = None,
                            query_pred: str = "vec_id < 10") -> dict:
    """Candidates-per-query accounting (the sublinearity evidence the
    bench records): distinct (qid, cid) candidate pairs / #queries."""
    from pyspark.sql import functions as F

    n = n if n is not None else emb.count()
    if planes is None:
        planes = planes_for(n)
    bexprs = [f"{band_bucket_expr(b, planes, dim)} AS b{b}" for b in range(bands)]
    withb = emb.selectExpr("vec_id", *bexprs)
    exploded = withb.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"b{b}") for b in range(bands)]))
        .alias("band", "bucket"))
    qv = exploded.filter(query_pred).selectExpr("vec_id AS qid", "band", "bucket")
    cv = exploded.filter(f"NOT ({query_pred})").selectExpr("vec_id AS cid", "band", "bucket")
    nq = qv.select("qid").distinct().count()
    cand = qv.join(cv, ["band", "bucket"]).select("qid", "cid").distinct().count()
    return {
        "corpus": n,
        "bands": bands,
        "planes_per_band": planes,
        "buckets_per_band": 1 << planes,
        "queries": nq,
        "candidates": cand,
        "candidates_per_query": round(cand / nq, 2) if nq else 0.0,
    }


def embedding_near_dup_pairs(emb, threshold: float = 0.99, bands: int = 2,
                             planes: int | None = None, dim: int = 64,
                             n: int | None = None):
    """Embedding-cosine near-duplicate detection (the dedup-mode
    counterpart of ann_lsh_topk): bucket every vector with multi-band
    sign-random-projection LSH, generate candidate pairs ONLY within
    (band, bucket) — a plain self equi-join, no crossJoin — and keep
    pairs whose exact integer-quantized cosine >= threshold.  The
    survivor rule is keep-the-smaller-id: every returned (keep_id,
    dup_id) has keep_id < dup_id, so the dup side is the drop set.

    Sign-random-projection is invariant to positive scaling, so
    scaled/renormalized copies of a vector land in IDENTICAL buckets in
    every band — recall 1.0 for the exact-duplicate and rescaled-
    duplicate classes, compounding 1-(1-r^P)^B for merely-similar
    pairs.  Scale shape: candidates per vector ~ B * occupancy
    (planes_for grows P with the corpus); the candidate self-join and
    the (keep_id, dup_id) dedup shuffle ONLY ids and bucket keys — the
    quantized vectors are attached to the surviving distinct pairs by
    two id equi-joins afterwards (guide §8: decide with small rows,
    move the heavy payload once)."""
    from pyspark.sql import functions as F

    if planes is None:
        planes = planes_for(n if n is not None else emb.count())
    feats = lsh_vec_features(emb, bands, planes, dim)
    slim = feats.select(
        "vec_id", F.posexplode(F.col("bkt")).alias("band", "bucket"))
    a = slim.selectExpr("vec_id AS keep_id", "band", "bucket")
    b = slim.selectExpr("vec_id AS dup_id", "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
             .filter("keep_id < dup_id")
             .dropDuplicates(["keep_id", "dup_id"])
             .select("keep_id", "dup_id"))
    # the attach sides use the JVM projection (same q/n2 integers as
    # the numpy featurizer — identical quantization and wrapping int64
    # arithmetic) so the Python pass runs once, for the buckets, not
    # three times
    vecs = emb.selectExpr(
        "vec_id",
        f"transform(embedding, x -> {_quant('x')}) AS q",
    ).selectExpr(
        "vec_id", "q",
        "aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v) AS n2")
    va = vecs.selectExpr("vec_id AS keep_id", "q AS qa", "n2 AS na")
    vb = vecs.selectExpr("vec_id AS dup_id", "q AS qb", "n2 AS nb")
    dot = _dot_zip("qa", "qb")
    return (cand.join(va, "keep_id").join(vb, "dup_id").selectExpr(
        "keep_id", "dup_id",
        f"round(({dot}) / (sqrt(na) * sqrt(nb)), 6) AS sim")
        .filter(f"sim >= {threshold}"))


def embedding_near_dup_oracle_sql(threshold: float = 0.99, bands: int = 2,
                                  planes: int = 4, dim: int = 64,
                                  source_cte: str = "embeddings") -> str:
    """DuckDB mirror of embedding_near_dup_pairs over ``source_cte``
    (a table/CTE with vec_id + DOUBLE[] embedding)."""
    per_band = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {b} AS band, "
        f"{band_bucket_expr(b, planes, dim, duck=True)} AS bucket FROM {source_cte}"
        for b in range(bands))
    qi = (f"list_transform(embedding, x -> {_quant('x')})")
    return (
        f"bkt AS ({per_band}), "
        "cand AS (SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id "
        "FROM bkt a JOIN bkt b USING (band, bucket) WHERE a.vec_id < b.vec_id), "
        f"vq AS (SELECT vec_id, {qi} AS q FROM (SELECT DISTINCT vec_id, embedding FROM {source_cte})), "
        "scored AS (SELECT keep_id, dup_id, "
        "round(CAST(list_sum(list_transform(generate_series(1, len(qa.q)), "
        "i -> qa.q[i] * qb.q[i])) AS DOUBLE) / "
        "(sqrt(CAST(list_sum(list_transform(qa.q, x -> x * x)) AS DOUBLE)) * "
        "sqrt(CAST(list_sum(list_transform(qb.q, x -> x * x)) AS DOUBLE))), 6) AS sim "
        "FROM cand JOIN vq qa ON qa.vec_id = keep_id JOIN vq qb ON qb.vec_id = dup_id) "
        f"SELECT keep_id, dup_id, sim FROM scored WHERE sim >= {threshold}"
    )


def ann_lsh_oracle_sql(k: int = 3, bands: int = 4, planes: int = 4,
                       dim: int = 64, table: str = "embeddings",
                       query_pred: str = "vec_id < 10") -> str:
    """DuckDB mirror of ann_lsh_topk (same deterministic hyperplanes,
    same dedup + tie-break)."""
    qi = (f"list_transform(embedding, x -> {_quant('x')})")
    per_band = " UNION ALL ".join(
        f"SELECT vec_id, {qi} AS qe, {b} AS band, "
        f"{band_bucket_expr(b, planes, dim, duck=True)} AS bucket FROM {table}"
        for b in range(bands))
    return (
        f"WITH b AS ({per_band}), "
        f"q AS (SELECT vec_id AS qid, qe, band, bucket FROM b WHERE {query_pred}), "
        f"c AS (SELECT vec_id AS cid, qe AS ce, band, bucket FROM b WHERE NOT ({query_pred})), "
        "cand AS (SELECT DISTINCT qid, cid FROM q JOIN c USING (band, bucket)), "
        "pairs AS (SELECT qid, cid, "
        "(SELECT qe FROM b WHERE b.vec_id = qid LIMIT 1) AS qe, "
        "(SELECT qe FROM b WHERE b.vec_id = cid LIMIT 1) AS ce FROM cand), "
        "scored AS (SELECT qid, cid, "
        "round(CAST(list_sum(list_transform(generate_series(1, len(qe)), "
        "i -> qe[i] * ce[i])) AS DOUBLE) / "
        "(sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) * "
        "sqrt(CAST(list_sum(list_transform(ce, x -> x * x)) AS DOUBLE))), 6) AS sim "
        "FROM pairs), "
        "ranked AS (SELECT qid, cid, sim, row_number() OVER ("
        "PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rk FROM scored) "
        f"SELECT qid, rk, cid, sim FROM ranked WHERE rk <= {k}"
    )


def ann_ivf_topk(emb, k: int = 3, n_centroids: int = 8, nprobe: int = 2,
                 query_pred: str = "vec_id < 10",
                 cent_pred: str | None = None):
    """IVF-flat ANN: coarse-quantize candidates into ``n_centroids``
    inverted lists (nearest centroid by exact quantized cosine), probe
    the ``nprobe`` nearest lists per query, exact re-rank inside the
    probed lists only.

    Deterministic stand-in for the k-means coarse quantizer: the
    centroids are the first ``n_centroids`` candidate vectors (a
    sampled quantizer), so both engines derive identical lists — in
    production the centroid table comes from a k-means job and K scales
    ~sqrt(N), making list occupancy sqrt(N) and per-query work
    nprobe*sqrt(N).

    100 TB plan shape: the centroid table BROADCASTS (K rows); the
    N x K assignment expansion collapses MAP-SIDE via max_by partial
    aggregation, so exactly one row per vector reaches the shuffle; the
    probe is an equi-join on list id.  No crossJoin between queries and
    candidates anywhere."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # q/n2 stay as JVM SQL here (not quant_features): this operator
    # evaluates `base` three times (centroid build, candidate side,
    # query side), and three Python/Arrow stage round-trips cost more
    # than the interpreted per-vector transforms at any corpus size
    # where K centroids still broadcast (measured r6: 0.61 s vs 0.98 s
    # at sf0.1)
    base = emb.selectExpr(
        "vec_id",
        f"transform(embedding, x -> {_quant('x')}) AS q",
    ).selectExpr(
        "vec_id", "q",
        "aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v) AS n2")
    if cent_pred is None:
        cent_pred = f"vec_id >= 10 AND vec_id < {10 + n_centroids}"
    cents = base.filter(cent_pred).selectExpr(
        "vec_id AS cent_id", "q AS cq", "n2 AS cn2")
    dot_c = _dot_zip("q", "cq")
    csim = f"({dot_c}) / (sqrt(n2) * sqrt(cn2))"

    cpairs = (base.filter(f"NOT ({query_pred})")
              .join(F.broadcast(cents))
              .selectExpr("vec_id", "q", "n2", "cent_id", f"{csim} AS csim"))
    assign = cpairs.groupBy("vec_id").agg(
        F.expr("max_by(cent_id, struct(csim, -cent_id))").alias("cent_id"),
        F.first("q").alias("qb"),
        F.first("n2").alias("nb"),
    ).selectExpr("vec_id AS cid", "cent_id", "qb", "nb")

    qpairs = (base.filter(query_pred)
              .join(F.broadcast(cents))
              .selectExpr("vec_id AS qid", "q AS qa", "n2 AS na",
                          "cent_id", f"{csim} AS csim"))
    wp = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cent_id"))
    probes = (qpairs.withColumn("rn", F.row_number().over(wp))
              .filter(f"rn <= {nprobe}").select("qid", "qa", "na", "cent_id"))

    dot = _dot_zip("qa", "qb")
    hits = probes.join(assign, "cent_id").selectExpr(
        "qid", "cid", f"round(({dot}) / (sqrt(na) * sqrt(nb)), 6) AS sim")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (hits.withColumn("rk", F.row_number().over(w))
            .filter(f"rk <= {k}").select("qid", "rk", "cid", "sim"))


def ann_ivf_oracle_sql(k: int = 3, n_centroids: int = 8,
                       nprobe: int = 2) -> str:
    """DuckDB mirror of ann_ivf_topk (queries = vec_id < 10, centroids =
    the first n_centroids candidates)."""
    quant = "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
    return f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> {quant}) AS q
  FROM embeddings),
b2 AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
  FROM base),
cents AS (
  SELECT vec_id AS cent_id, q AS cq, n2 AS cn2
  FROM b2 WHERE vec_id >= 10 AND vec_id < {10 + n_centroids}),
cp AS (
  SELECT b2.vec_id, b2.q, b2.n2, cents.cent_id,
         CAST(list_sum(list_transform(generate_series(1, len(q)),
              i -> q[i] * cq[i])) AS BIGINT)
           / (sqrt(n2) * sqrt(cn2)) AS csim
  FROM b2, cents WHERE NOT (b2.vec_id < 10)),
assign AS (
  SELECT vec_id AS cid, q AS qb, n2 AS nb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM cp) WHERE rn = 1),
qp AS (
  SELECT b2.vec_id AS qid, b2.q AS qa, b2.n2 AS na, cents.cent_id,
         CAST(list_sum(list_transform(generate_series(1, len(q)),
              i -> q[i] * cq[i])) AS BIGINT)
           / (sqrt(n2) * sqrt(cn2)) AS csim
  FROM b2, cents WHERE b2.vec_id < 10),
probes AS (
  SELECT qid, qa, na, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM qp) WHERE rn <= {nprobe}),
hits AS (
  SELECT qid, cid,
         round(CAST(list_sum(list_transform(generate_series(1, len(qa)),
               i -> qa[i] * qb[i])) AS BIGINT)
           / (sqrt(na) * sqrt(nb)), 6) AS sim
  FROM probes JOIN assign USING (cent_id))
SELECT qid, rk, cid, sim FROM (
  SELECT qid, cid, sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim DESC, cid ASC) AS rk
  FROM hits) WHERE rk <= {k}
"""
