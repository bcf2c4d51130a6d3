"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the query set, score every row
  with native zip_with/aggregate (JVM), window top-k. Exact; O(N·Q·d)
  but embarrassingly parallel and shuffle-free until the final top-k.
- LSH-bucketed ANN: random-hyperplane signatures (hyperplanes derived
  deterministically from hash bits — no RNG state to ship), candidates
  from matching buckets only; same scoring tail. The scale path when
  Q·N is too big to brute-force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _per_query_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, vec_id, cosine) → top-k per query WITHOUT a per-query
    window sort. A ``Window.partitionBy(query_id)`` sorts EVERY scored
    row for a query in ONE task — a single-reducer bottleneck at 10^12
    rows. Instead: per-(query, input-partition) partial top-k via
    ``slice(array_sort(collect_list(...)), 1, k)``, then a final
    per-query merge over ≤ k·P rows.

    Memory honesty: collect_list buffers ALL scored rows of one
    (query, input-partition) group in aggregation state before the
    sort/slice — state is O(rows per input partition per query), NOT
    O(k). What this removes is the single-reducer per-query sort (the
    scale killer); the partial state is bounded by however
    ``spark.sql.files.maxPartitionBytes`` sizes the input partitions,
    which the caller controls. A genuinely O(k) accumulator needs a
    custom typed aggregator (JVM) — noted as the upgrade path if
    partition-sized state ever becomes the limit. Ordering matches
    ``row_number() OVER (ORDER BY cosine DESC, vec_id)`` exactly:
    structs sort ascending by (-cosine, vec_id)."""
    item = F.struct(
        (-F.col("cosine")).alias("negc"),
        F.col("vec_id").alias("vec_id"),
        F.col("cosine").alias("cosine"),
    )
    partial = (
        scored.groupBy("query_id", F.spark_partition_id().alias("__p"))
        .agg(
            F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("top")
        )
    )
    merged = (
        partial.select("query_id", F.explode("top").alias("it"))
        .groupBy("query_id")
        .agg(
            F.slice(F.array_sort(F.collect_list("it")), 1, k).alias("top")
        )
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "it")
    ).select(
        "query_id",
        F.col("it.vec_id").alias("vec_id"),
        F.col("it.cosine").alias("cosine"),
        (F.col("pos") + 1).alias("rank"),
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    n = l2norm(a) * l2norm(b)
    return F.when(n > 0, dot(a, b) / n).otherwise(F.lit(0.0))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine, rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
        )
    )
    scored = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .crossJoin(q)
        .withColumn("cosine", cosine(F.col("v"), F.col("qv")))
    )
    return _per_query_topk(scored.select("query_id", "vec_id", "cosine"), k)


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """sign(<v, r_plane>) with r_plane[j] = ±1 from xxhash64(plane, j) —
    a deterministic Rademacher hyperplane, materialized as a literal
    array (constant-folded; nothing shipped to executors)."""
    import zlib

    signs = [
        1.0 if zlib.crc32(f"{plane}:{j}".encode()) & 1 else -1.0
        for j in range(dim)
    ]
    plane_arr = F.array(*[F.lit(s) for s in signs])
    return (dot(vec, plane_arr) >= 0).cast("int")


def lsh_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """n-bit random-hyperplane signature as one integer bucket id."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p, dim)
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket (2^n_planes buckets ⇒ ~N/2^n candidates per query). Recall
    is tunable via n_planes / multi-probe; exactness is traded for a
    2^n-fold candidate reduction."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
            lsh_signature(F.col(query_vec_col), n_planes, dim).alias("bucket"),
        )
    )
    scored = e.join(q, "bucket").withColumn(
        "cosine", cosine(F.col("v"), F.col("qv"))
    )
    return _per_query_topk(scored.select("query_id", "vec_id", "cosine"), k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates: bucket by hyperplane signature
    (near-identical vectors share all sign bits with high probability),
    verify cosine ≥ threshold within buckets."""
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    return (
        e.alias("a")
        .join(e.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "cosine",
        )
    )


# ------------------------------------------------------------------ IVF ---

def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """index of the closest centroid (squared L2), centroids inlined as
    literal arrays (small: K × dim floats, constant-folded)."""
    best = None
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        pair = F.struct(d.alias("d"), F.lit(i).alias("i"))
        best = pair if best is None else F.when(pair["d"] < best["d"], pair).otherwise(best)
    return best["i"]


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic mini-kmeans for the IVF coarse quantizer.

    Init: mean of each hash-partition of the ids (seed-free,
    reproducible). Update: per-cluster elementwise means via dim
    separate SUM aggregates — one narrow groupBy per iteration, no
    per-row Python. Index building is a one-off amortized cost; only
    the assignment expression runs at query time."""
    def cluster_means(df: DataFrame, cluster: Column) -> list[list[float]]:
        aggs = [F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
                for i in range(dim)]
        rows = (
            df.groupBy(cluster.alias("c"))
            .agg(F.count(F.lit(1)).alias("n"), *aggs)
            .collect()
        )
        out: dict[int, list[float]] = {}
        for r in rows:
            out[r["c"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        # empty clusters keep their previous position implicitly (absent)
        return [out.get(i) for i in range(n_centroids)]

    init = cluster_means(
        emb, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)).cast("int")
    )
    centroids = [c if c is not None else [0.0] * dim for c in init]
    for _ in range(iterations):
        updated = cluster_means(
            emb, _nearest_centroid(F.col(vec_col), centroids)
        )
        centroids = [
            u if u is not None else centroids[i] for i, u in enumerate(updated)
        ]
    return centroids


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search: vectors pre-bucketed by nearest centroid; each query
    probes its ``n_probe`` closest centroid buckets only — the classic
    inverted-file ANN trade (recall vs 1/n_centroids of the scan).
    At cluster scale the emb side is written partitioned by
    ``ivf_cluster`` so probing prunes partitions at the scan."""
    n_centroids = len(centroids)
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _nearest_centroid(F.col(vec_col), centroids).alias("bucket"),
    )
    # per-query: n_probe nearest centroids via the same distance exprs
    dists = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col("qv"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dists.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    probes = F.transform(
        F.slice(F.array_sort(F.array(*dists)), 1, n_probe), lambda s: s["i"]
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
        ).withColumn("bucket", F.explode(probes))
    )
    scored = e.join(q, "bucket").withColumn(
        "cosine", cosine(F.col("v"), F.col("qv"))
    )
    return _per_query_topk(scored.select("query_id", "vec_id", "cosine"), k)


def write_ivf_index(
    emb: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: the embeddings table written
    partitioned by ``ivf_cluster`` (one directory per inverted list).
    Probing then becomes a PARTITION FILTER — at 10^12 rows a query
    touching n_probe of K clusters scans n_probe/K of the files and the
    rest is pruned at planning time, never opened. (On a real warehouse
    this is the Iceberg partition spec; parquet dir-partitioning is the
    same contract.)"""
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            _nearest_centroid(F.col(vec_col), centroids).alias("ivf_cluster"),
        )
        .write.mode("overwrite")
        .partitionBy("ivf_cluster")
        .parquet(path)
    )


def ivf_ann_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search against a written index with PHYSICAL partition
    pruning: the union of all queries' probe clusters is computed
    driver-side (queries are a small broadcast-scale set; centroid
    distances are pure python on literals) and pushed as an ``isin``
    partition predicate, so non-probed inverted lists never leave the
    manifest. Per-query probe routing then joins as usual. Results are
    identical to :func:`ivf_ann_topk` with the same parameters."""
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    ).collect()

    def nearest(vec, n):
        # sequential left-fold sum, same order as the Spark aggregate in
        # _nearest_centroid/ivf_ann_topk → bit-identical probe choice
        dists = []
        for i, cent in enumerate(centroids):
            d = 0.0
            for x, c in zip(vec, cent):
                d += (float(x) - c) * (float(x) - c)
            dists.append((d, i))
        return [i for _, i in sorted(dists)[:n]]

    probe_map = {r["query_id"]: nearest(list(r["qv"]), n_probe) for r in q_rows}
    probe_union = sorted({b for bs in probe_map.values() for b in bs})

    e = spark.read.parquet(index_path).filter(
        F.col("ivf_cluster").isin(probe_union)  # pruned at the scan
    )
    q = F.broadcast(
        spark.createDataFrame(
            [
                (r["query_id"], [float(x) for x in r["qv"]], b)
                for r in q_rows
                for b in probe_map[r["query_id"]]
            ],
            "query_id long, qv array<double>, ivf_cluster int",
        )
    )
    scored = (
        e.join(q, "ivf_cluster")
        .withColumn(
            "cosine",
            cosine(F.col("embedding").cast("array<double>"), F.col("qv")),
        )
    )
    return _per_query_topk(scored.select("query_id", "vec_id", "cosine"), k)
