"""Similarity search over the ``embeddings`` table (north-star extension).

Two tiers:

- brute-force cosine top-k: exact baseline. The query set is broadcast;
  the candidate scan is embarrassingly parallel; top-k per query is a
  grouped heap (window row_number ≤ k after pre-filtering), never a global
  sort. At 100 TB this is the "small query batch × huge corpus" shape —
  one pass over the corpus per query batch.
- LSH-bucketed ANN: random-hyperplane signatures shrink the candidate set
  to same-bucket vectors; the scale path when the query batch is large.

Dot products stay in the JVM as higher-order array expressions
(zip_with + aggregate) over array<float> cast to double — no Python, no
UDF, whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — module scope so pandas_udf type
# hints resolve under `from __future__ import annotations` (see dedup.py)
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..cache import persist_tracked
from ._util import tables

TOP_K = 3
N_QUERIES = 5
N_PLANES = 8


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — same accumulation order as DuckDB's
    list_dot_product, so rounded scores hash-match the oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


@register(
    "sim_cosine_topk",
    f"""
    WITH v AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, v.vec_id AS c_id,
             ROUND(LIST_DOT_PRODUCT(q.q_emb, v.emb)
                   / (SQRT(LIST_DOT_PRODUCT(q.q_emb, q.q_emb))
                      * SQRT(LIST_DOT_PRODUCT(v.emb, v.emb))), 4) AS cosine
      FROM q JOIN v ON v.vec_id != q.q_id
    )
    SELECT q_id, c_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    doc="Brute-force cosine top-k: broadcast query batch × corpus scan, "
        "zip_with/aggregate dot product, rank on the ROUNDED score with "
        "vec_id tiebreak so both engines agree at float boundaries.",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = exact_scored(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine")
    )


def exact_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, c_id, cosine): the EXACT rounded cosine of every (query,
    candidate) pair — the brute-force scan the exact top-k ranks and the
    ANN acceptance gates take their ground-truth top-1 from.

    mapInArrow + BLAS formulation (r14 optimization; guide §4.2): the
    former posexplode/partial-agg relational shape paid one hash-agg
    probe per VECTOR ELEMENT (pairs × dim rows through a groupBy) plus
    three broadcast builds and an exchange; a batch matmul computes
    every (candidate × query) dot in one native GEMM with zero
    shuffles — the scored relation leaves the worker already at
    O(queries × candidates) rows. Query vectors are a bounded
    plan-build-time collect (O(N_QUERIES) rows, the already-audited
    collect class; NOTE the build is therefore EAGER — constructing
    this DataFrame runs one bounded Spark job). Equivalence: rounded
    scores verified EQUAL against the old plan at sf0.001/0.01/0.1
    with min distance-to-round-boundary 1.06e-4 — eleven orders of
    magnitude above float64 summation-order error, so association
    order cannot flip a rounded value; np.round's half-to-even vs the
    old HALF_UP differs only AT a boundary, which that margin makes
    unreachable for these inputs. Zero-norm vectors score NULL (the
    old plan's x/0.0), and null/empty vectors contribute no pairs
    (the old inner join on position)."""
    import numpy as np

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    emb = embeddings.select("vec_id", "embedding")
    # Bounded plan-build collect (O(N_QUERIES) rows, eager — building
    # this DataFrame runs one small Spark job). Degenerate-query
    # guards, each mirroring the old posexplode/inner-join-on-position
    # plan: a NULL query embedding explodes to no rows -> contributes
    # no pairs (dropped here); ragged query lengths zero-pad, so the
    # GEMM dot equals the old dot-over-common-positions; an all-empty
    # query set (dim == 0) joins to nothing -> empty result.
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    q_pairs = [
        (r.vec_id, r.embedding) for r in qrows
        if r.embedding is not None
    ]
    dim = max((len(v) for _i, v in q_pairs), default=0)
    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("c_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])
    if not q_pairs or dim == 0:
        return spark.createDataFrame([], schema)
    q_ids = np.array([i for i, _v in q_pairs], dtype=np.int64)
    qm = np.zeros((len(q_pairs), dim), dtype=np.float64)
    for j, (_i, v) in enumerate(q_pairs):
        qm[j, :len(v)] = v
    q_norms = np.sqrt((qm * qm).sum(axis=1))

    def score(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            col = b.column("embedding")
            lens = pa.compute.list_value_length(col).to_numpy(
                zero_copy_only=False
            )
            if not (np.all(lens == dim) and col.null_count == 0):
                # ragged / null-embedding fallback: same semantics as
                # the old inner join on position (dot over common
                # positions; null/EMPTY vectors explode to no rows and
                # contribute no pairs; zero-norm vectors divide to
                # NULL, exactly Spark's x/0.0 on the old plan)
                rows = col.to_pylist()
                out_q, out_c, out_s = [], [], []
                for i, vec in enumerate(rows):
                    if vec is None or len(vec) == 0:
                        continue
                    v = np.asarray(vec, dtype=np.float64)
                    nn = float(np.sqrt((v * v).sum()))
                    for j in range(len(q_ids)):
                        if int(ids[i]) == int(q_ids[j]):
                            continue
                        denom = q_norms[j] * nn
                        if denom == 0.0:
                            out_s.append(None)
                        else:
                            m = min(v.size, dim)
                            d = float(v[:m] @ qm[j, :m])
                            out_s.append(round(d / denom, 4))
                        out_q.append(int(q_ids[j]))
                        out_c.append(int(ids[i]))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_q, pa.int64()),
                     pa.array(out_c, pa.int64()),
                     pa.array(out_s, pa.float64())],
                    ["q_id", "c_id", "cosine"],
                )
                continue
            m = col.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(-1, dim)
            dots = m @ qm.T                      # (n, nq) one GEMM
            norms = np.sqrt((m * m).sum(axis=1))
            denom = norms[:, None] * q_norms[None, :]
            zero = denom == 0.0                  # 0/0 -> NULL, not NaN
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / denom
            n, nq = cos.shape
            qq = np.broadcast_to(q_ids, (n, nq)).ravel()
            cc = np.repeat(ids.astype(np.int64), nq)
            keep = qq != cc
            yield pa.RecordBatch.from_arrays(
                [pa.array(qq[keep]), pa.array(cc[keep]),
                 pa.array(np.round(cos.ravel()[keep], 4),
                          mask=zero.ravel()[keep])],
                ["q_id", "c_id", "cosine"],
            )

    return emb.mapInArrow(score, schema)


def ann_acceptance(spark: SparkSession, sf_dir: str,
                   ann: DataFrame) -> DataFrame:
    """Self-validating acceptance frame for an engine-specific ANN
    result ``ann(q_id, c_id, cosine)`` — the pattern the HLL gate
    (approx_distinct_users) established: the rows carry (a) an
    engine-INDEPENDENT ground-truth value the oracle recomputes from
    scratch (``exact_top1``, the true best cosine per query over the
    whole corpus) and (b) acceptance predicates computed Spark-side
    that the oracle asserts as literal TRUE:

    - ``ann_le_exact_ok``: the ANN best score never exceeds the true
      best — an unconditional invariant of any correct candidate-subset
      search; a bucket leak, scoring bug, or wrong normalization breaks
      it;
    - ``ann_nonempty_ok``: every query returned at least one neighbor
      (deterministic on the gate data; an over-aggressive bucketing
      that empties candidate pools surfaces here);
    - ``ann_k_ok``: no query returned more than TOP_K rows (broken
      ranking/limit surfaces here).

    The candidate-generation machinery itself is certified cross-engine
    by the fully-oracled portable twin (sim_ann_portable_topk)."""
    exact1 = exact_scored(spark, sf_dir).groupBy("q_id").agg(
        F.max("cosine").alias("exact_top1")
    )
    got = ann.groupBy("q_id").agg(
        F.max("cosine").alias("ann_top1"),
        F.count(F.lit(1)).alias("n_returned"),
    )
    return (
        exact1.join(got, "q_id", "left")
        .select(
            "q_id",
            "exact_top1",
            F.coalesce(F.col("ann_top1") <= F.col("exact_top1"), F.lit(True))
            .alias("ann_le_exact_ok"),
            (F.coalesce("n_returned", F.lit(0)) >= 1).alias("ann_nonempty_ok"),
            (F.coalesce("n_returned", F.lit(0)) <= TOP_K).alias("ann_k_ok"),
        )
    )


_ANN_ACCEPT_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id,
             ROUND(LIST_DOT_PRODUCT(q.q_emb, v.emb)
                   / (SQRT(LIST_DOT_PRODUCT(q.q_emb, q.q_emb))
                      * SQRT(LIST_DOT_PRODUCT(v.emb, v.emb))), 4) AS cosine
      FROM q JOIN v ON v.vec_id != q.q_id
    )
    SELECT q_id, MAX(cosine) AS exact_top1,
           TRUE AS ann_le_exact_ok,
           TRUE AS ann_nonempty_ok,
           TRUE AS ann_k_ok
    FROM scored GROUP BY q_id
    """


def hyperplane(plane_id: int, dim_col: Column) -> Column:
    """Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    parity of xxhash64 — reproducible across runs and engines that share
    the expression, with no stored model."""
    return F.when(
        F.xxhash64(F.lit(plane_id), dim_col) % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def lsh_bucket(emb: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane signature: n_planes sign bits packed into a long."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.size(emb) - 1),
                    lambda i, p=p: hyperplane(p, i),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return bucket


def bucketed_cosine_pairs(v: DataFrame, top_n: int = 100) -> DataFrame:
    """Shared tail of the embedding near-dup pipeline: ``v(vec_id, emb,
    bucket)`` → the ``top_n`` most-similar same-bucket pairs with the
    near-dup verdict (exact cosine ≥ 0.99). Candidates come from bucket
    equality only — never all-pairs; shuffle keys are buckets."""
    left = v.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"), "bucket"
    )
    right = v.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(
        dot(F.col("emb_a"), F.col("emb_b"))
        / (l2_norm(F.col("emb_a")) * l2_norm(F.col("emb_b"))),
        4,
    )
    # Report the top-n candidate pairs with the near-dup verdict
    # (random test embeddings have no true near-dups; production keeps only
    # is_near_dup, but the ranked candidates make the machinery observable).
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("is_near_dup", (F.col("cosine") >= 0.99).cast("int"))
        .orderBy(F.col("cosine").desc(), F.col("id_a"), F.col("id_b"))
        .limit(top_n)
        .select("id_a", "id_b", "cosine", "is_near_dup")
    )


def embedding_cosine_near_dup_xxhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-dup under zero-model xxhash64 hyperplanes —
    the no-stored-state variant of the registered gate (which plants the
    same planes as literals so the whole pipeline is oracle-checkable)."""
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    v = embeddings.select(
        "vec_id", as_double("embedding").alias("emb")
    ).withColumn("bucket", lsh_bucket(F.col("emb")))
    return bucketed_cosine_pairs(v)


def _train_coarse_cells(base: DataFrame, nlist: int,
                        train_cap: int = 100_000, seed: int = 42):
    """spark.ml KMeans coarse quantizer on a bounded deterministic
    sample (the one trainer the IVF and IVF-PQ paths share — a
    sampling/seeding fix lands in both). ``base`` carries
    (vec_id, emb, features); returns (assigned(vec_id, emb, cell),
    centroids as python lists)."""
    from pyspark.ml.clustering import KMeans

    n_base = base.count()
    fraction = min(1.0, train_cap / max(n_base, 1))
    train = (
        base.sample(fraction=fraction, seed=seed)
        if fraction < 1.0 else base
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(
        train
    )
    assigned = model.transform(base).select(
        "vec_id", "emb", F.col("prediction").alias("cell")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN raw top-k: spark.ml KMeans coarse quantizer (fixed
    seed) partitions the corpus into nlist cells; queries probe their
    nprobe nearest cells and run exact cosine top-k inside them. The
    learned-centroid upgrade of the LSH path: same bucket-join shape,
    data-adaptive cells. At 100 TB: the quantizer trains on a bounded
    deterministic sample (~100k-row cap, seed 42 — done here, not just
    documented), assignment is one broadcast-centroid map pass, per-cell
    candidate lists shrink by ~nlist/nprobe. Recall on the UNIFORM
    random test embeddings is ~nprobe/nlist (no cluster structure to
    exploit — measured 0.33 at 2/8); real embedding corpora cluster,
    which is the regime IVF exists for."""
    from pyspark.ml.functions import array_to_vector

    NLIST, NPROBE = 8, 2
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        as_double("embedding").alias("emb"),
    ).withColumn("features", array_to_vector(F.col("emb")))
    # Coarse-quantizer training only needs enough vectors to place NLIST
    # centroids — a bounded deterministic sample, never the full corpus
    # (at 100 TB the full-table fit would dominate the whole query).
    # Tiny gate inputs keep every row (fraction clamps to 1.0).
    assigned, centroids = _train_coarse_cells(base, NLIST)

    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    # nprobe nearest cells per query: rank the centroid distances
    # (squared L2 to plan-time literal centroids — _sq_dist_expr)
    dists = q.select(
        "q_id", "q_emb",
        F.array(*[
            F.struct(
                _sq_dist_expr(F.col("q_emb"), c).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]).alias("cells"),
    ).select(
        "q_id", "q_emb",
        F.slice(F.array_sort("cells"), 1, NPROBE).alias("probe"),
    ).select(
        "q_id", "q_emb", F.explode("probe.cell").alias("cell")
    )
    scored = (
        assigned.join(F.broadcast(dists), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.round(
                dot(F.col("q_emb"), F.col("emb"))
                / (l2_norm(F.col("q_emb")) * l2_norm(F.col("emb"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine")
    )


@register(
    "sim_ann_ivf_topk",
    _ANN_ACCEPT_ORACLE,
    doc="Acceptance gate for the IVF ANN path (see ann_ivf_topk for the "
        "search itself): one row per query carrying the "
        "engine-independent exact top-1 cosine (recomputed from scratch "
        "by the oracle) plus Spark-computed acceptance predicates the "
        "oracle pins to literal TRUE — IVF best ≤ exact best, non-empty "
        "slate, ≤ TOP_K rows. The self-validating-oracle pattern of "
        "approx_distinct_users applied to model-dependent ANN: centroid "
        "assignments can't be reproduced cross-engine, but the "
        "acceptance contract can.",
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_acceptance(spark, sf_dir, ann_ivf_topk(spark, sf_dir))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN raw top-k via random-hyperplane LSH under zero-model xxhash64
    planes: 8 sign bits → bucket; candidates are same-bucket pairs only,
    then exact cosine top-k inside the bucket. The 100 TB path: shuffle
    keys are buckets (256-way here, scaled by n_planes), never
    all-pairs."""
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    v = embeddings.select(
        "vec_id",
        as_double("embedding").alias("emb"),
    ).withColumn("bucket", lsh_bucket(F.col("emb")))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.round(
                dot(F.col("q_emb"), F.col("emb"))
                / (l2_norm(F.col("q_emb")) * l2_norm(F.col("emb"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine")
    )


@register(
    "sim_ann_lsh_topk",
    _ANN_ACCEPT_ORACLE,
    doc="Acceptance gate for the xxhash64 hyperplane-LSH ANN path (see "
        "ann_lsh_topk for the search itself): one row per query with the "
        "engine-independent exact top-1 cosine plus acceptance "
        "predicates pinned TRUE by the oracle — LSH best ≤ exact best, "
        "non-empty slate, ≤ TOP_K rows. The bucket-join + exact-rerank "
        "machinery is certified cross-engine by the fully-oracled "
        "portable twin (sim_ann_portable_topk); this gate certifies the "
        "zero-model production path's acceptance contract.",
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_acceptance(spark, sf_dir, ann_lsh_topk(spark, sf_dir))


@register(
    "emb_norm_stats",
    """
    WITH norms AS (
      SELECT label,
             SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(norm), 4) AS avg_norm,
           ROUND(MIN(norm), 4) AS min_norm,
           ROUND(MAX(norm), 4) AS max_norm
    FROM norms GROUP BY label
    """,
    doc="Embedding hygiene stats per label: L2 norms via sequential-fold "
        "aggregate over array<float> cast to double (JVM codegen, no "
        "UDF) — the pre-normalization audit every embedding corpus needs. "
        "First DuckDB-oracle-gated query on the embeddings table.",
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    norm = l2_norm(as_double("embedding"))
    return (
        embeddings.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


@register(
    "emb_centroid_per_label",
    """
    WITH z AS (
      SELECT label,
             UNNEST(list_zip(embedding, range(1, len(embedding)+1))) AS p
      FROM embeddings
    )
    SELECT label, CAST(p[2] - 1 AS INT) AS dim,
           ROUND(AVG(CAST(p[1] AS DOUBLE)), 4) + 0 AS centroid
    FROM z GROUP BY label, dim
    """,
    doc="Per-label embedding centroids (class prototypes): posexplode "
        "the vector, average per (label, dim). The map side partially "
        "aggregates (label, dim) pairs before the shuffle, so shuffle "
        "volume is O(labels x dims), independent of corpus size - the "
        "formulation that computes class centroids over a 100 TB "
        "embedding table in one pass (the building block for "
        "prototype-based dataset pruning and IVF-style coarse training).",
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    return (
        embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg(
            # + 0 both sides: IEEE -0.0 + 0.0 = +0.0, so a rounded
            # tiny-negative can never hash-mismatch as "-0.0" vs "0.0"
            (F.round(F.avg(F.col("v").cast("double")), 4) + F.lit(0.0))
            .alias("centroid")
        )
    )


# --- Portable (engine-independent) ANN --------------------------------------

EMB_DIM = 64  # testdata embedding dimensionality (asserted at runtime)


def _portable_signs(n_planes: int = N_PLANES, dim: int = EMB_DIM):
    """Deterministic ±1.0 hyperplane components from md5 parity of
    ("p{plane}:{dim}") — computed ONCE at plan-build time in Python and
    embedded as literals in BOTH the Spark plan and the DuckDB oracle,
    so cross-engine agreement is by construction (no engine hash
    anywhere). This is also the right production shape: hyperplanes are
    a tiny immutable model (n_planes × dim floats) that should be built
    once and broadcast, not recomputed per row."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"p{p}:{i}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def _portable_bucket(emb: Column) -> Column:
    signs = _portable_signs()
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(signs):
        proj = dot(emb, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return bucket


def _portable_ann_oracle() -> str:
    signs = _portable_signs()
    bucket_terms = " + ".join(
        "(CASE WHEN LIST_DOT_PRODUCT(emb, [{vals}]) > 0 "
        "THEN {bit} ELSE 0 END)".format(
            vals=", ".join(
                f"{v:.1f}" for v in plane
            ),
            bit=2 ** p,
        )
        for p, plane in enumerate(signs)
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, emb, {bucket_terms} AS bucket FROM v
    ),
    q AS (
      SELECT vec_id AS q_id, emb AS q_emb, bucket
      FROM b WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.q_id, b.vec_id AS c_id,
             ROUND(LIST_DOT_PRODUCT(q.q_emb, b.emb)
                   / (SQRT(LIST_DOT_PRODUCT(q.q_emb, q.q_emb))
                      * SQRT(LIST_DOT_PRODUCT(b.emb, b.emb))), 4) AS cosine
      FROM q JOIN b ON b.bucket = q.bucket AND b.vec_id != q.q_id
    )
    SELECT q_id, c_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """


@register(
    "sim_ann_portable_topk",
    _portable_ann_oracle(),
    doc="ANN via random-hyperplane LSH under PORTABLE hyperplanes "
        "(md5-parity ±1 components embedded as literals in both "
        "engines): 8 sign bits → bucket, same-bucket candidates only, "
        "exact cosine top-k inside the bucket with rounded-score + id "
        "tie-break ranking. Fully oracle-gated — certifies the "
        "bucket-join + exact-rerank machinery cross-engine; the "
        "xxhash64 variant (sim_ann_lsh_topk) stays the zero-model "
        "production path.",
)
def sim_ann_portable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id", as_double("embedding").alias("emb")
    ).filter(F.size("emb") == EMB_DIM)
    b = base.select("vec_id", "emb", _portable_bucket(F.col("emb")).alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        "bucket",
    )
    scored = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.round(
                dot(F.col("q_emb"), F.col("emb"))
                / (l2_norm(F.col("q_emb")) * l2_norm(F.col("emb"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine")
    )


def _portable_embedding_dedup_oracle() -> str:
    signs = _portable_signs()
    bucket_terms = " + ".join(
        "(CASE WHEN LIST_DOT_PRODUCT(emb, [{vals}]) > 0 "
        "THEN {bit} ELSE 0 END)".format(
            vals=", ".join(f"{v:.1f}" for v in plane),
            bit=2 ** p,
        )
        for p, plane in enumerate(signs)
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, emb, {bucket_terms} AS bucket FROM v
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             ROUND(LIST_DOT_PRODUCT(a.emb, c.emb)
                   / (SQRT(LIST_DOT_PRODUCT(a.emb, a.emb))
                      * SQRT(LIST_DOT_PRODUCT(c.emb, c.emb))), 4) AS cosine
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, cosine,
           CAST(cosine >= 0.99 AS INT) AS is_near_dup
    FROM pairs
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 100
    """


@register(
    "dedup_embedding_cosine",
    _portable_embedding_dedup_oracle(),
    doc="Embedding-cosine near-dup: random-hyperplane LSH buckets the "
        "corpus, exact cosine verifies same-bucket pairs ≥ 0.99 — the "
        "semantic-dedup twin of MinHash-LSH (candidates via buckets, "
        "never all-pairs; shuffle keys are buckets). Hyperplanes are the "
        "md5-parity ±1 family planted as plan-time literals — the right "
        "production shape anyway (a tiny build-once broadcast model) — "
        "so the ENTIRE pipeline is oracle-gated: DuckDB recomputes "
        "buckets, candidate pairs, cosines and the ranked top-100 from "
        "scratch. The zero-model xxhash64 variant stays available as "
        "embedding_cosine_near_dup_xxhash.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    v = embeddings.select(
        "vec_id", as_double("embedding").alias("emb")
    ).filter(F.size("emb") == EMB_DIM).withColumn(
        "bucket", _portable_bucket(F.col("emb"))
    )
    return bucketed_cosine_pairs(v)


# --- Product quantization (PQ) ----------------------------------------------
#
# The compression leg of production ANN: embeddings quantized to m
# subspace codes (here 64 dims → 8 subspaces × 8 dims, k=16 centroids
# per subspace → 8 nibbles ≈ 32× smaller than float32), searched via
# asymmetric distance computation (ADC): the QUERY stays exact, each
# candidate's distance is a sum of m table lookups. At 100 TB the codes
# table fits where raw embeddings cannot, and the per-query distance
# tables (m × k floats) broadcast for free.


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_cap: int = 100_000,
    seed: int = 42,
):
    """Train per-subspace codebooks on a bounded deterministic sample.
    Returns a numpy array (m, k, dim//m). KMeans per subspace is m
    driver-coordinated spark.ml fits over the SAMPLE (same bounded-
    training contract as the IVF quantizer)."""
    import numpy as np

    rows = (
        embeddings.select(as_double("embedding").alias("emb"))
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r["emb"] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k, sub))
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        # deterministic Lloyd's iterations (numpy — the sample is
        # bounded; spark.ml KMeans is the swap-in when the sample
        # itself is distributed-big)
        centers = Xj[rng.choice(n, size=k, replace=False)]
        for _ in range(10):
            d2 = ((Xj[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = Xj[assign == c]
                if len(pts):
                    centers[c] = pts.mean(axis=0)
        books[j] = centers
    return books


def pq_encode(embeddings: DataFrame, codebooks) -> DataFrame:
    """(vec_id, embedding) → (vec_id, codes array<int>): vectorized
    Arrow assignment against broadcast codebooks; output is m small ints
    per vector — the 32×-compressed representation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks)
    m, k, sub = books.shape

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(embs: pd.Series) -> pd.Series:
        X = np.array(embs.tolist(), dtype=np.float64)
        out = np.zeros((len(X), m), dtype=np.int32)
        for j in range(m):
            Xj = X[:, j * sub:(j + 1) * sub]
            d2 = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    return embeddings.select(
        "vec_id", encode(as_double("embedding")).alias("codes")
    )


def pq_topk(
    query_vec,
    codes: DataFrame,
    codebooks,
    top_k: int = TOP_K,
) -> DataFrame:
    """ADC search: exact query vs quantized base. The query's m × k
    distance table is computed once driver-side (tiny) and folded into
    a literal lookup expression; scoring each candidate is m array
    lookups + adds, JVM-side, no Python in the scan."""
    import numpy as np

    books = np.asarray(codebooks)
    m, k, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    table = np.zeros((m, k))
    for j in range(m):
        table[j] = ((books[j] - q[j * sub:(j + 1) * sub]) ** 2).sum(axis=1)
    # literal lookup: element_at(array(...), codes[j]+1) per subspace
    terms = " + ".join(
        "element_at(array({vals}), codes[{j}] + 1)".format(
            vals=", ".join(f"{v!r}D" for v in table[jj]), j=jj, jj=jj
        ).replace("{j}", str(jj))
        for jj in range(m)
    )
    return (
        codes.selectExpr("vec_id", f"({terms}) AS adc_dist")
        .orderBy(F.col("adc_dist").asc(), "vec_id")
        .limit(top_k)
    )


PQ_M, PQ_K = 8, 16  # subspaces × codewords (the pq_train defaults)


def _portable_pq_codebooks(m: int = PQ_M, k: int = PQ_K,
                           dim: int = EMB_DIM):
    """Deterministic codebooks from md5 bytes ("pq:{j}:{c}:{i}" →
    [-1, 1]) — plan-time literals in BOTH engines, the portable-model
    contract of ``_portable_signs``/``_portable_sem_centroids`` applied
    to product quantization. Production trains with ``pq_train``; the
    gate needs cross-engine-reproducible centers so DuckDB can re-run
    assignment AND the ADC fold from scratch."""
    import hashlib

    return [
        [
            [
                (hashlib.md5(f"pq:{j}:{c}:{i}".encode()).digest()[0]
                 - 127.5) / 127.5
                for i in range(dim // m)
            ]
            for c in range(k)
        ]
        for j in range(m)
    ]


def _portable_pq_query(dim: int = EMB_DIM):
    import hashlib

    return [
        (hashlib.md5(f"pqq:{i}".encode()).digest()[0] - 127.5) / 127.5
        for i in range(dim)
    ]


def _pq_adc_sql(books, query) -> tuple[list[str], str]:
    """The shared DuckDB fragments of the PQ-family oracles: the
    per-subspace distance columns (``dsJ``) and the ADC fold over the
    query's literal distance table — one builder so a DuckDB
    literal-typing footgun is fixed once for every PQ oracle.
    ``::DOUBLE[]`` matters: bare decimal literals parse as DECIMAL in
    DuckDB, which would turn the ADC fold into decimal arithmetic."""
    import numpy as np

    books = np.asarray(books)
    m, k, sub = books.shape
    q = np.asarray(query)
    table = np.zeros((m, k))
    for j in range(m):
        table[j] = ((books[j] - q[j * sub:(j + 1) * sub]) ** 2).sum(axis=1)
    ds_cols = []
    for j in range(m):
        cents = []
        for c in range(k):
            terms = " + ".join(
                f"(emb[{1 + j * sub + i}] - ({books[j][c][i]!r}))"
                f" * (emb[{1 + j * sub + i}] - ({books[j][c][i]!r}))"
                for i in range(sub)
            )
            cents.append(f"({terms})")
        ds_cols.append("[" + ", ".join(cents) + f"] AS ds{j}")
    adc = " + ".join(
        "([{vals}]::DOUBLE[])[LIST_INDEXOF(ds{j}, LIST_MIN(ds{j}))]"
        .format(
            vals=", ".join(repr(float(v)) for v in table[j]), j=j
        )
        for j in range(m)
    )
    return ds_cols, adc


def _portable_pq_oracle(top_k: int = 10) -> str:
    ds_cols, adc = _pq_adc_sql(
        _portable_pq_codebooks(), _portable_pq_query()
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), a AS (
      SELECT vec_id, {", ".join(ds_cols)} FROM v
    ), s AS (
      SELECT vec_id, {adc} AS adc FROM a
    )
    SELECT vec_id, ROUND(adc, 6) AS adc_dist
    FROM s ORDER BY adc ASC, vec_id ASC LIMIT {top_k}
    """


@register(
    "sim_pq_adc_topk",
    _portable_pq_oracle(),
    doc="Product-quantization ADC search, fully oracle-checked via "
        "portable md5-derived codebooks + query (plan-time literals "
        "in both engines): pq_encode assigns each vector m argmin "
        "codes (Arrow pandas_udf over broadcast codebooks), pq_topk "
        "folds the query's m x k distance table — computed once, "
        "inlined as literal arrays — into m element_at lookups per "
        "candidate, JVM-side. DuckDB re-derives assignment and the "
        "ADC fold from the same literals, so compression loss itself "
        "is pinned exactly, not just bounded. Production swaps in "
        "pq_train's sample-fitted codebooks (recall-floor tested in "
        "test_similarity).",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    books = _portable_pq_codebooks()
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    codes = pq_encode(embeddings, books)
    out = pq_topk(_portable_pq_query(), codes, books, top_k=10)
    return out.select(
        "vec_id", F.round("adc_dist", 6).alias("adc_dist")
    )


# --- SemDeDup: cluster-bucketed semantic dedup -------------------------------
#
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication", arXiv:2303.09540): k-means
# clusters bucket the embedding space, exact pairwise cosine WITHIN
# each cluster finds semantic duplicates, and each duplicate group
# keeps the member with the LOWEST similarity to its cluster centroid
# (the paper's keep-rule: retain the least prototypical example).
# The scale shape is the whole point — candidate pairs exist only
# inside a cluster (N/k per bucket), never across the corpus, so the
# shuffle key is the cluster id; with k scaled to corpus size the
# within-cluster quadratic term stays bounded, exactly like the LSH
# bucket family above (dedup_embedding_cosine). Complements it:
# LSH buckets catch near-identical vectors; centroid buckets with a
# looser cut catch semantic-level redundancy.

N_SEM_CENTROIDS = 4
SEM_DEDUP_CUT = 0.35  # gate threshold on the synthetic corpus
                      # (production eps is corpus-calibrated)


def _portable_sem_centroids(
    n: int = N_SEM_CENTROIDS, dim: int = EMB_DIM
):
    """Deterministic ±1.0 centroids from md5 parity ("c{c}:{i}") —
    plan-time literals in BOTH engines, same contract as the portable
    hyperplanes. Production swaps in trained k-means centers (the IVF
    quantizer in this module); either way the centroids are a tiny
    build-once broadcast model. A free simplification falls out: all
    ±1 centroids share the same norm, so argmin L2 distance equals
    argmax dot product."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"c{c}:{i}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for c in range(n)
    ]


def train_sem_centroids(
    vectors: DataFrame,
    n: int = N_SEM_CENTROIDS,
    train_cap: int = 100_000,
    seed: int = 42,
) -> list[list[float]]:
    """Production centroid training for :func:`semantic_dedup`: spark.ml
    KMeans on a bounded deterministic sample of ``vectors(vec_id, emb)``,
    centers L2-normalized to the unit sphere (spherical-k-means
    convention) so the downstream equal-norm argmax-dot assignment
    shortcut stays exact. The portable md5-parity centroids remain the
    oracle-gate path (cross-engine reproducible literals); this is the
    data-adaptive path a real corpus uses — SemDeDup (Abbas et al. 2023)
    clusters on trained k-means centers, not random ones. At 100 TB the
    fit is bounded by ``train_cap`` (same contract as ``ann_ivf_topk``:
    a deterministic sample places N centroids; the full-table pass is
    only the one broadcast-centroid assignment map)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = vectors.select(array_to_vector(F.col("emb")).alias("features"))
    n_base = base.count()
    fraction = min(1.0, train_cap / max(n_base, 1))
    train = base.sample(fraction=fraction, seed=seed) if fraction < 1.0 else base
    model = KMeans(k=n, seed=seed, featuresCol="features").fit(train)
    centers = []
    for c in model.clusterCenters():
        vals = [float(x) for x in c]
        nrm = sum(x * x for x in vals) ** 0.5 or 1.0
        centers.append([x / nrm for x in vals])
    return centers


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[list[float]],
    cut: float = SEM_DEDUP_CUT,
) -> DataFrame:
    """``vectors(vec_id, emb)`` → ``(vec_id, cluster, centroid_cos,
    is_kept)``: assign to the nearest centroid (argmax rounded dot —
    see ``_portable_sem_centroids``), exact cosine pairs within each
    cluster at ``>= cut``, connected components over those edges, and
    per component keep ONLY the member with the lowest centroid
    cosine (ties: lowest vec_id). Rows outside any duplicate group
    are kept. Every stage is JVM expressions + bounded joins; the
    only iteration is min-label propagation over the edge list.

    Centroids must share one L2 norm (±1 literals: sqrt(dim); trained
    :func:`train_sem_centroids`: 1.0) — that is what makes argmax dot
    equal argmax cosine, so assignment stays a single rounded-dot
    array expression."""
    from .dedup import connected_components_star

    norms = [sum(v * v for v in c) ** 0.5 for c in centroids]
    norm_c = norms[0]
    if norm_c <= 0 or (max(norms) - min(norms)) > 1e-9 * norm_c:
        raise ValueError(
            "semantic_dedup requires equal-norm centroids (argmax dot == "
            f"argmax cosine); got norms {norms!r}. Normalize them — "
            "train_sem_centroids already does."
        )
    dots = F.array(*[
        F.round(
            dot(F.col("emb"), F.array(*[F.lit(v) for v in c])), 6
        )
        for c in centroids
    ])
    a = (
        vectors.withColumn("__ds", dots)
        .withColumn(
            "cluster",
            F.expr("array_position(__ds, array_max(__ds))")
            .cast("int"),
        )
        .withColumn(
            "centroid_cos",
            F.round(
                F.element_at("__ds", F.col("cluster"))
                / (l2_norm(F.col("emb")) * F.lit(norm_c)),
                6,
            ),
        )
        .drop("__ds")
    )
    a = persist_tracked(a)
    left = a.select(
        F.col("vec_id").alias("ia"), F.col("emb").alias("ea"),
        "cluster",
    )
    right = a.select(
        F.col("vec_id").alias("ib"), F.col("emb").alias("eb"),
        "cluster",
    )
    edges = (
        left.join(right, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .filter(
            F.round(
                dot(F.col("ea"), F.col("eb"))
                / (l2_norm(F.col("ea")) * l2_norm(F.col("eb"))),
                4,
            ) >= cut
        )
        .select(F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"))
    )
    # star engine: within-cluster similarity graphs CHAIN (v1~v2~v3...)
    # and were observed past min-label's round budget at sf0.1 — the
    # alternating algorithm converges in O(log² n) rounds regardless
    comps = connected_components_star(edges)
    w = Window.partitionBy("component").orderBy(
        F.col("centroid_cos").asc(), F.col("vec_id").asc()
    )
    ranked = (
        a.join(comps, a["vec_id"] == comps["doc_id"])
        .withColumn("rn", F.row_number().over(w))
        .select(F.col("doc_id").alias("__m"), "rn")
    )
    return (
        a.join(ranked, a["vec_id"] == F.col("__m"), "left")
        .select(
            "vec_id", "cluster", "centroid_cos",
            F.when(F.coalesce(F.col("rn"), F.lit(1)) == 1, 1)
            .otherwise(0).cast("int").alias("is_kept"),
        )
        .orderBy("vec_id")
    )


def _semantic_dedup_oracle() -> str:
    cents = _portable_sem_centroids()
    norm_c = float(len(cents[0])) ** 0.5
    dot_terms = ", ".join(
        "ROUND(LIST_DOT_PRODUCT(emb, [{vals}]), 6)".format(
            vals=", ".join(f"{v:.1f}" for v in c)
        )
        for c in cents
    )
    return f"""
    WITH RECURSIVE v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), a AS (
      SELECT vec_id, emb, [{dot_terms}] AS ds FROM v
    ), c AS (
      SELECT vec_id, emb,
             CAST(LIST_INDEXOF(ds, LIST_MAX(ds)) AS INT) AS cluster,
             ROUND(ds[LIST_INDEXOF(ds, LIST_MAX(ds))]
                   / (SQRT(LIST_DOT_PRODUCT(emb, emb))
                      * {norm_c}), 6) AS centroid_cos
      FROM a
    ), e AS (
      SELECT x.vec_id AS ia, y.vec_id AS ib
      FROM c x JOIN c y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE ROUND(LIST_DOT_PRODUCT(x.emb, y.emb)
                  / (SQRT(LIST_DOT_PRODUCT(x.emb, x.emb))
                     * SQRT(LIST_DOT_PRODUCT(y.emb, y.emb))), 4)
            >= {SEM_DEDUP_CUT}
    ), und AS (
      SELECT ia AS src, ib AS dst FROM e
      UNION
      SELECT ib, ia FROM e
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS vec_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    ), ranked AS (
      SELECT m.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY m.component
               ORDER BY cc.centroid_cos ASC, m.vec_id ASC) AS rn
      FROM comp m JOIN c cc ON cc.vec_id = m.vec_id
    )
    SELECT c.vec_id, c.cluster, c.centroid_cos,
           CAST(COALESCE(r.rn, 1) = 1 AS INT) AS is_kept
    FROM c LEFT JOIN ranked r ON r.vec_id = c.vec_id
    ORDER BY c.vec_id
    """


@register(
    "dedup_semantic",
    _semantic_dedup_oracle(),
    doc="SemDeDup end-to-end (Abbas et al. 2023): centroid-bucketed "
        "semantic dedup — nearest-centroid assignment (portable "
        "md5-parity centroids as plan-time literals; argmax dot = "
        "argmin L2 for equal-norm centroids), exact within-cluster "
        "cosine edges at >= 0.35, connected components, and the "
        "paper's keep-rule (lowest centroid similarity survives, "
        "ties by id). DuckDB recomputes assignment, edges, a "
        "recursive-CTE closure and the keep ranking from scratch — "
        "the full pipeline is oracle-gated.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    v = embeddings.select(
        "vec_id", as_double("embedding").alias("emb")
    ).filter(F.size("emb") == EMB_DIM)
    return semantic_dedup(v, _portable_sem_centroids())


# --- IVF-PQ: coarse cells + in-cell ADC scoring ------------------------------
#
# The standard billion-scale ANN layout (Jégou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"; the faiss IVFPQ index):
# a coarse quantizer restricts each query to nprobe cells, and inside
# them candidates are scored against PQ codes via an ADC lookup table
# instead of raw vectors — candidate IO drops ~nlist/nprobe AND each
# candidate costs m array lookups instead of a dim-length dot product.
# Non-residual variant (faiss by_residual=False): codes quantize the
# raw vectors with GLOBAL codebooks, so one code table serves every
# cell — the residual upgrade swaps per-cell distance tables into the
# same plan shape.

IVFPQ_NLIST, IVFPQ_NPROBE = 4, 2


def _portable_ivf_centroids(n: int = IVFPQ_NLIST, dim: int = EMB_DIM):
    """Deterministic coarse centroids from md5 bytes ("ivfpq:{c}:{i}"
    → [-1, 1]) — plan-time literals in BOTH engines (the portable-
    model contract of _portable_pq_codebooks applied to the coarse
    quantizer). Production trains with spark.ml KMeans
    (ann_ivfpq_topk)."""
    import hashlib

    return [
        [
            (hashlib.md5(f"ivfpq:{c}:{i}".encode()).digest()[0]
             - 127.5) / 127.5
            for i in range(dim)
        ]
        for c in range(n)
    ]


def _sq_dist_expr(emb_col: Column, center: list[float]) -> Column:
    """Squared L2 to a constant centroid — plan-time literal array,
    whole-stage-codegen arithmetic."""
    c_arr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(emb_col, c_arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cell_expr(emb_col: Column, centroids: list[list[float]]) -> Column:
    """1-based argmin cell id (first-min tie rule — matches DuckDB's
    LIST_INDEXOF(ds, LIST_MIN(ds)) exactly)."""
    ds = F.array(*[_sq_dist_expr(emb_col, c) for c in centroids])
    return F.array_position(ds, F.array_min(ds))


def _probed_cells(query: list[float], centroids: list[list[float]],
                  nprobe: int = IVFPQ_NPROBE) -> list[int]:
    """The query's nprobe nearest cells (1-based). Query and centroids
    are literals, so this is a BUILD-TIME constant — the cell
    restriction compiles into the plan as a literal IN filter in both
    engines."""
    ds = [
        sum((q - c) ** 2 for q, c in zip(query, cent))
        for cent in centroids
    ]
    return [
        i + 1 for i in sorted(range(len(ds)), key=lambda i: (ds[i], i))
        [:nprobe]
    ]


def _portable_ivfpq_oracle(top_k: int = 10) -> str:
    """DuckDB re-derives the ENTIRE IVF-PQ search from the shared
    literals: cell assignment (argmin over literal centroid
    distances), the probed-cell restriction, PQ code assignment, and
    the ADC fold — compression + probing loss pinned exactly."""
    cents = _portable_ivf_centroids()
    probe = _probed_cells(_portable_pq_query(), cents)
    cell_ds = "[" + ", ".join(
        "(" + " + ".join(
            f"(emb[{i + 1}] - ({cents[c][i]!r}))"
            f" * (emb[{i + 1}] - ({cents[c][i]!r}))"
            for i in range(len(cents[c]))
        ) + ")"
        for c in range(len(cents))
    ) + "]"
    ds_cols, adc = _pq_adc_sql(
        _portable_pq_codebooks(), _portable_pq_query()
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), celled AS (
      SELECT vec_id, emb, {cell_ds}::DOUBLE[] AS cds FROM v
    ), probed AS (
      SELECT vec_id, emb
      FROM celled
      WHERE LIST_INDEXOF(cds, LIST_MIN(cds)) IN
            ({", ".join(map(str, probe))})
    ), a AS (
      SELECT vec_id, {", ".join(ds_cols)} FROM probed
    ), s AS (
      SELECT vec_id, {adc} AS adc FROM a
    )
    SELECT vec_id, ROUND(adc, 6) AS adc_dist
    FROM s ORDER BY adc ASC, vec_id ASC LIMIT {top_k}
    """


@register(
    "sim_ann_ivfpq_topk",
    _portable_ivfpq_oracle(),
    doc="IVF-PQ composition, fully oracle-checked via portable "
        "md5-derived coarse centroids + codebooks + query (plan-time "
        "literals in both engines): every vector is assigned its "
        "argmin-L2 cell by a literal-centroid fold; the query's "
        "nprobe nearest cells are a BUILD-TIME constant (query and "
        "centroids are literals), so the candidate restriction is a "
        "literal IN filter — no join, no exchange; survivors are "
        "ADC-scored through the same literal distance-table fold as "
        "sim_pq_adc_topk and TakeOrderedAndProject keeps the top k. "
        "DuckDB re-derives assignment, probing, and the ADC fold from "
        "the same literals. Production swaps in spark.ml-trained "
        "centroids + pq_train codebooks (ann_ivfpq_topk; recall-floor "
        "tested in test_similarity).",
)
def sim_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = _portable_ivf_centroids()
    probe = _probed_cells(_portable_pq_query(), cents)
    books = _portable_pq_codebooks()
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    celled = embeddings.select(
        "vec_id",
        as_double("embedding").alias("emb"),
    ).withColumn("cell", _cell_expr(F.col("emb"), cents))
    probed = celled.filter(
        F.col("cell").isin([int(c) for c in probe])
    ).select("vec_id", F.col("emb").alias("embedding"))
    codes = pq_encode(probed, books)
    out = pq_topk(_portable_pq_query(), codes, books, top_k=10)
    return out.select(
        "vec_id", F.round("adc_dist", 6).alias("adc_dist")
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str,
                   shortlist: int = 16 * TOP_K) -> DataFrame:
    """Production IVF-PQ search (trained models): spark.ml KMeans
    coarse cells + pq_train codebooks; each query probes its nprobe
    nearest cells, ADC-scores the cells' codes through a per-query
    distance table (a tiny broadcast relation of literal arrays — the
    fold stays JVM-side), keeps a ``shortlist`` of candidates, and
    exact-reranks just those by cosine — the standard two-stage
    recall recovery (shortlist ≥ top_k; raising it trades IO for
    recall). Same query set as the other ANN paths (vec_id <
    N_QUERIES). At 100 TB: training is sample-bounded, assignment and
    encoding are one map pass each, and per-query work is
    O(candidates in nprobe cells) code lookups + O(shortlist) exact
    distances.

    Tuning (r13 verdict task 4, measured on the uniform fixture): the
    recall bottleneck at shortlist=48 is ADC RANKING quality, not
    probing — nprobe=8 (every cell) still plateaued at 0.667 under
    m=8/k=16 codes because quantization error pushes true neighbors
    out of the shortlist. Multi-probe nprobe=4 plus finer codebooks
    (m=16 subspaces × k=32 codewords = 80 bits, still ~51× smaller
    than the raw float64 vectors) measures 0.933; an OPQ rotation was
    evaluated and rejected — the fixture's coordinates are i.i.d.
    uniform, so variance is already balanced across subspaces and a
    learned rotation buys nothing here (swap it in for real embedding
    distributions with correlated dimensions)."""
    import numpy as np
    from pyspark.ml.functions import array_to_vector

    NLIST, NPROBE = 8, 4
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id", as_double("embedding").alias("emb")
    ).withColumn("features", array_to_vector(F.col("emb")))
    assigned, centroids = _train_coarse_cells(base, NLIST)
    books = pq_train(embeddings, m=16, k=32)
    m, k, sub = books.shape
    codes = pq_encode(
        embeddings.select("vec_id", F.col("embedding")), books
    )
    celled = assigned.join(codes, "vec_id")

    # bounded driver work: N_QUERIES query vectors -> per-query probe
    # cells + ADC distance tables (m x k doubles each), shipped as ONE
    # tiny broadcast relation
    qrows = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb").collect()
    )
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["emb"], dtype=np.float64)
        cd = [
            float(((qv - np.asarray(c)) ** 2).sum()) for c in centroids
        ]
        cells = sorted(range(NLIST), key=lambda i: (cd[i], i))[:NPROBE]
        table = [
            [
                float(((books[j][c] - qv[j * sub:(j + 1) * sub]) ** 2)
                      .sum())
                for c in range(k)
            ]
            for j in range(m)
        ]
        for cell in cells:
            probe_rows.append((int(r["vec_id"]), int(cell), table))
    probes = spark.createDataFrame(
        probe_rows,
        "q_id long, cell int, dtab array<array<double>>",
    )
    adc = F.aggregate(
        F.expr("sequence(0, size(codes) - 1)"),
        F.lit(0.0),
        lambda acc, j: acc + F.col("dtab")[j][
            F.element_at(F.col("codes"), j + 1)
        ],
    )
    scored = (
        celled.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id")
    )
    short = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= shortlist
    ).select("q_id", "vec_id")
    # exact rerank of the shortlist only
    qdf = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    rer = (
        short.join(base.select("vec_id", "emb"), "vec_id")
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.round(
                dot(F.col("q_emb"), F.col("emb"))
                / (l2_norm(F.col("q_emb")) * l2_norm(F.col("emb"))),
                4,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine")
    )
