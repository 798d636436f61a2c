"""Similarity search over embedding columns (`array<float>`).

* cosine_topk            — brute-force exact top-k: broadcast the (small)
                           query set against the corpus, dot products via
                           zip_with/aggregate (JVM-side fold, no UDF), rank
                           with a window. At 100 TB the corpus side stays
                           partitioned; only queries broadcast.
* hyperplane_lsh_buckets — sign-random-projection LSH: b deterministic
                           pseudo-random hyperplanes hash each vector to a
                           b-bit bucket; near neighbors collide with high
                           probability. The scale path: bucket-join then
                           re-rank within buckets (candidate ~ corpus/2^b).
* cosine_topk_lsh        — the two combined: exact re-ranking over LSH
                           candidates (approximate global recall).

Dot products fold left-to-right in DOUBLE, so an oracle that folds the same
order (DuckDB list reduction) reproduces results bit-for-bit; ranking rounds
to 6 decimals with vec_id tiebreak to stay deterministic anyway.
"""

from __future__ import annotations

from math import sqrt as math_sqrt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column, dims: int | None = None) -> Column:
    """Dot product of two array columns, folded left-to-right in double.

    Two physical forms with bit-identical results (same fold order):

    * dims=None (default) — zip_with+aggregate higher-order fold. Measured
      FASTER at every scale tried (sf0.1, 600k pairs x 64 dims): the fold
      runs on primitive double arrays inside the JVM, while the unrolled
      alternative blows up generated-code size (192 element_at terms per
      cosine) past what JIT handles well.
    * dims=N — unrolled element_at sum, kept for plans where codegen
      profiling shows the fold dominating; measure before switching.
    """
    if dims is not None:
        acc: Column = F.lit(0.0)
        for i in range(1, dims + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dims: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dims))


def cosine(a: Column, b: Column, dims: int | None = None) -> Column:
    return _dot(a, b, dims) / (_norm(a, dims) * _norm(b, dims))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    (query_id, neighbor_id, sim, rank); self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-3, 3].

    md5-seeded so every (plane, dim) cell is decorrelated. The previous
    linear-congruential family ((plane*97 + dim*31) % 7 - 3) was periodic in
    `plane` mod 7: only SEVEN distinct hyperplanes existed no matter how many
    planes/tables were configured, so multi-table recall (1-(1-p)^L assumes
    independent tables) was silently correlated and `auto_num_planes` beyond
    7 bits added no bucket diversity (<=128 distinct buckets at any scale).
    The weights are computed driver-side only and enter BOTH engines as
    literals (packed arrays in Spark, inlined constants in the SQL oracle),
    so any pure-Python definition keeps the two bit-identical.
    """
    import hashlib

    digest = hashlib.md5(f"plane:{plane}:{dim}".encode()).digest()
    return (int.from_bytes(digest[:4], "big") % 7) - 3


def hyperplane_lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """(vec_id, table, bucket): b-bit sign hash per hash table.

    Multiple independent tables (plane sets) are the standard recall lever:
    a ~0.4-cosine neighbor colliding with p per table is found with
    1-(1-p)^L overall. Table t uses planes [t*b, (t+1)*b).

    MAP-ONLY, Arrow-vectorized: this is the one hot path where the built-in
    Column algebra genuinely can't express the computation efficiently — a
    (batch x dims) @ (dims x planes) sign projection. A Column formulation
    is either an interpreted higher-order fold per plane (~40 nested lambda
    folds per row) or a ~2,200-term unrolled scalar tree (16 s of py4j plan
    build + janino recompilation per plan); both measured 5-10x slower at
    sf0.1 than this vectorized mapInPandas (0.6 s vs 3.6-9.7 s steady
    state), and the gap widens with planes x dims.

    Bit-exactness vs the SQL oracle is preserved by construction: the
    accumulation loops over DIMENSIONS sequentially (acc += v[d] * w[p,d]
    for d = 0..dims-1, vectorized across rows and planes), which performs
    the identical left-to-right IEEE-double fold as the oracle's unrolled
    `0.0 + v[1]*w + v[2]*w + ...` per plane — never numpy's blocked/
    pairwise `@` matmul, whose different rounding could flip a
    near-boundary sign.

    Buckets assemble from the sign bits with int64 ops (bucket_t =
    sum 2^i * bit[t*b+i]), so plane counts up to 31 cannot overflow. Planes
    are deduplicated by weight vector first, so a hash family that repeats
    planes costs one projection per DISTINCT plane. Earlier formulations
    (broadcast-crossJoin + groupBy, then nested HOF folds) shuffled or
    interpreted their way through the same math; this one is a pure
    Arrow-batched projection — at 100 TB it runs embarrassingly parallel
    with zero shuffle.
    """
    import numpy as np
    import pandas as pd

    total = num_tables * num_planes
    weights = [
        tuple(float(_plane_weight(p, d)) for d in range(dims)) for p in range(total)
    ]
    distinct: dict[tuple[float, ...], int] = {}
    slot_of: list[int] = []  # plane index -> 0-based row in the distinct matrix
    for w in weights:
        if w not in distinct:
            distinct[w] = len(distinct)
        slot_of.append(distinct[w])
    w_mat = np.array(list(distinct), dtype=np.float64)  # (n_distinct, dims)
    slots = np.array(slot_of, dtype=np.int64).reshape(num_tables, num_planes)
    powers = (2 ** np.arange(num_planes, dtype=np.int64))

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"vec_id {id_type}, table int, bucket long"

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)  # (n, dims)
            n = x.shape[0]
            acc = np.zeros((n, w_mat.shape[0]), dtype=np.float64)
            for d in range(dims):  # sequential over dims == the oracle's fold
                acc = acc + x[:, d : d + 1] * w_mat[:, d]
            bits = (acc > 0).astype(np.int64)  # (n, n_distinct)
            buckets = (bits[:, slots] * powers).sum(axis=2)  # (n, tables)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), num_tables),
                    "table": np.tile(
                        np.arange(num_tables, dtype=np.int32), n
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    ).mapInPandas(bucketize, out_schema)


def auto_num_planes(
    n_vectors: int, target_bucket: int = 64, min_planes: int = 4
) -> int:
    """The planes ~ log2(n) operating rule as a function: enough hyperplane
    bits that the EXPECTED bucket occupancy is ~`target_bucket`, never fewer
    than `min_planes`. Candidate-pair work per table is sum(bucket^2)/2, so
    holding occupancy constant keeps the bucket join LINEAR in corpus size;
    fixed bits make it quadratic (measured 50x at a 10x tiling — SCALE.md).
    Callers pass a cheap corpus-count estimate; recall lost to narrower
    buckets is recovered with more tables (`num_tables`), which scales
    linearly, not quadratically.

    Capped at 31 planes (corpus ~1.4e11 at the default occupancy): buckets
    accumulate as bigint, but 31 bits already gives 2^31 buckets and the
    cap keeps every engine's int paths (and the packed-bits assembly) far
    from overflow."""
    import math

    if n_vectors <= target_bucket:
        return min_planes
    return min(31, max(min_planes, math.ceil(math.log2(n_vectors / target_bucket))))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 10,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = docs sharing any (table, bucket) with
    the query, exact cosine re-rank over the candidate union.

    At 100 TB: corpus buckets are precomputed once (map-only, L small ints
    per vector) and bucket-partitioned on disk; per-query work is L buckets'
    worth of exact scoring instead of the full corpus.
    """
    cb = hyperplane_lsh_buckets(corpus, num_planes, dims, id_col, vec_col, num_tables)
    qb = hyperplane_lsh_buckets(queries, num_planes, dims, id_col, vec_col, num_tables)
    cand = (
        cb.select(F.col("vec_id").alias("neighbor_id"), "table", "bucket")
        .join(
            F.broadcast(qb.select(F.col("vec_id").alias("query_id"), "table", "bucket")),
            ["table", "bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    sims = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """(vec_id, cell, cell_rank): the `nprobe` nearest coarse cells per
    vector, ranked by cosine to the centroid set.

    The IVF coarse quantizer: corpus vectors index with nprobe=1 (their one
    home cell); queries probe several. Determinism: cosine rounded to 6
    decimals, centroid id breaks ties.

    MAP-ONLY by construction: a codebook is driver-small by definition
    (k vectors — the same object every ANN system broadcasts), so it is
    collected once and enters the plan as literal arrays. Ranking is
    array_sort over the k (affinity, cell) structs + slice(nprobe) +
    posexplode inside the projection — no crossJoin row blowup, no
    corpus-wide shuffle, no Window sort. The previous formulation
    (broadcast crossJoin + row_number window) shuffled corpus x k rows on
    vec_id just to rank k values per vector; at 100 TB that shuffle IS the
    job. Cells are then bucket-partitioned on disk so probes read only the
    matching buckets.
    """
    cent_rows = sorted(
        centroids.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
        ).collect(),
        key=lambda r: r.cell,
    )
    cell_type = centroids.schema[id_col].dataType.simpleString()
    src = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        _norm(F.col(vec_col)).alias("__vn"),  # vector norm computed ONCE
    )
    ranked = _codebook_ranked_cells(
        F.col("__v"),
        F.col("__vn"),
        [[float(x) for x in row.centroid] for row in cent_rows],
        [row.cell for row in cent_rows],
        cell_type,
    )
    top = F.slice(ranked, 1, nprobe)
    return src.select("vec_id", F.posexplode(top)).select(
        "vec_id",
        F.col("col.cell").alias("cell"),
        (F.col("pos") + 1).alias("cell_rank"),
    )


def _codebook_ranked_cells(
    vec: Column, vnorm: Column, cents: list[list[float]], cells: list,
    cell_type: str,
) -> Column:
    """array<struct(na, cell)> sorted by (cosine affinity DESC, cell ASC) —
    the shared ranking core of `ivf_cells` and the k-means assignment.

    The whole codebook enters the plan as THREE literal nodes (a nested
    array, the norms, the cell ids) — not k*dims scalar literals, which
    bloat analysis/optimization time linearly in the codebook size. The
    ascending struct sort realizes the descending-affinity order via the
    negated affinity `na` in the first field."""
    cent_lit = F.lit(cents).cast("array<array<double>>")
    norm_lit = F.lit([math_sqrt(_seq_sq_sum(c)) for c in cents]).cast(
        "array<double>"
    )
    cell_lit = F.lit(cells).cast(f"array<{cell_type}>")
    entries = F.transform(
        F.sequence(F.lit(1), F.lit(len(cents))),
        lambda i: F.struct(
            (
                -F.round(
                    _dot(vec, F.element_at(cent_lit, i))
                    / (vnorm * F.element_at(norm_lit, i)),
                    6,
                )
            ).alias("na"),
            F.element_at(cell_lit, i).alias("cell"),
        ),
    )
    return F.array_sort(entries)


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Deterministic k-means codebook for the IVF coarse quantizer.

    Lloyd iterations with every source of nondeterminism removed, so the
    same data yields bit-identical centroids on any run, partitioning, or
    engine (a DuckDB oracle reproduces it exactly):

    * init — the k vectors with smallest (md5(id), id): the engine's
      deterministic id-hash sampler (operators/curation.py uses the same
      trick), standing in for random seeding; cell = rank in that order.
    * assign — cosine affinity to each centroid rounded to 6 decimals,
      ties to the lowest cell. Map-only: the codebook enters the plan as
      three packed literal nodes (`_codebook_ranked_cells`), so expression
      size is O(1) in k and no shuffle/window touches the corpus.
    * update — per-dimension sums of floor(value * 1e6) as LONGS: integer
      addition is associative, so partial aggregation order cannot change
      the result. New centroid micro = floor(sum * 1.0 / count) evaluated
      in IEEE double (sums stay far below 2^53, so the division is exact
      cross-engine). Empty cells keep their previous centroid.
    * stop — early exit when the integer micro-vectors stop changing
      (assignment is a pure function of centroids, so once they repeat the
      remaining iterations are no-ops and early exit preserves equality
      with a fixed-iteration oracle).

    Per iteration: one map-only assignment pass + ONE groupBy on `cell`
    (k rows out, map-side combined) + a k-row collect. At 100 TB that is
    the minimum possible data movement for Lloyd's algorithm; k-means|| style
    oversampling would only change the init, which is already O(k) here.

    Returns (id_col int cell, vec_col array<double>) — feed directly to
    `cosine_topk_ivf`. Reference analogue: none (the reference has no ANN);
    this backs the training-data-pipeline ANN path (SURVEY §2 additions).
    """
    import math

    spark = df.sparkSession
    if dims is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("cannot train centroids on an empty frame")
        dims = len(first[0])

    seeds = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k)
        .collect()
    )
    # centroids as exact integer micros (the canonical representation)
    cents: list[list[int]] = [
        [int(math.floor(float(x) * 1e6)) for x in row.v] for row in seeds
    ]

    # Lloyd re-reads the corpus every iteration: persist the projected
    # training frame (id, vector, norm) once instead of re-scanning and
    # re-normalizing per iteration — the standard Spark iterative-ML
    # pattern (MLlib's KMeans does the same). MEMORY_AND_DISK spills
    # gracefully when the corpus outgrows executor memory.
    from pyspark import StorageLevel

    src = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("__vn"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    micro_sums = [
        F.sum(
            F.floor(F.element_at(F.col("v"), i).cast("double") * F.lit(1e6))
        ).alias(f"s{i}")
        for i in range(1, dims + 1)
    ]
    for _ in range(iters):
        ranked = _codebook_ranked_cells(
            F.col("v"),
            F.col("__vn"),
            [[m / 1e6 for m in cm] for cm in cents],
            list(range(len(cents))),
            "int",
        )
        assigned = src.withColumn("cell", F.element_at(ranked, 1)["cell"])
        stats = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("cnt"), *micro_sums)
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cells keep previous
        for row in stats:
            new_cents[row.cell] = [
                int(math.floor(row[f"s{i}"] * 1.0 / row.cnt))
                for i in range(1, dims + 1)
            ]
        if new_cents == cents:
            break
        cents = new_cents
    src.unpersist()

    return spark.createDataFrame(
        [(j, [m / 1e6 for m in cm]) for j, cm in enumerate(cents)],
        schema=f"{id_col} int, {vec_col} array<double>",
    )


def _seq_sq_sum(xs: list[float]) -> float:
    """Left-to-right sum of squares — the same IEEE fold order as the SQL
    list_sum the oracle uses, so the literal centroid norm matches it."""
    acc = 0.0
    for x in xs:
        acc += x * x
    return acc


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus (one cell per
    vector), probe the query's `nprobe` nearest cells, exact cosine re-rank
    inside the probed cells. The complement of the LSH path: recall comes
    from probing more cells instead of more hash tables."""
    corpus_cells = ivf_cells(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    query_cells = ivf_cells(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cand = (
        corpus_cells.join(F.broadcast(query_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    sims = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
