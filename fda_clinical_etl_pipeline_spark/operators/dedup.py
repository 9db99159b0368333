"""Deduplication operators over ``documents`` (north-star extension).

Four tiers, each with the partitioning story that matters at 100 TB:

- exact        hash-groupBy on a normalized fingerprint: one shuffle on
               md5(text) — uniform key distribution by construction.
- n-gram Jaccard  exact pairwise similarity on a *bounded candidate set*
               (never all-pairs: at 100 TB all-pairs is 10^21 comparisons).
- MinHash+LSH  the scale path: shingle → K minhashes → band → bucket-join.
               Only documents sharing a band bucket are ever compared, so
               the shuffle volume is O(docs × bands), not O(docs²).
- SimHash      64-bit sketch via a vectorized Arrow-batched Pandas UDF
               (numpy bit-packing), Hamming-distance buckets for near-dup.

Every tier is DuckDB-oracle-gated. The xxhash64 production MinHash path
is certified through an exact-shingle-truth oracle (the candidate
filter is recall-only, so the verified pair set is hash-independent);
the portable md5 MinHash twin (``dedup_portable_minhash``) additionally
proves the shingle→signature→band→verify machinery bit-for-bit against
an independent SQL implementation. SimHash is md5-based and carries a
full oracle that recomputes the 64-bit majority vote in SQL.

Cluster resolution ships two interchangeable engines: min-label
propagation (O(cluster-diameter) rounds — the default; near-dup
clusters are shallow) and alternating large-star/small-star
(O(log² n) rounds regardless of diameter — the scale path for
chain-shaped or adversarially deep candidate graphs).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed at module scope so pandas_udf
# type hints resolve under `from __future__ import annotations`
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..cache import persist_tracked
from ._util import tables
from .text import tokens

NUM_MINHASHES = 32
# 16 bands × 2 rows: P(candidate | j) = 1-(1-j^2)^16 → ~0.99 recall at
# j=0.5, ~0.48 false-candidate rate at j=0.2 (cheap to verify exactly).
LSH_BANDS = 16
LSH_ROWS = NUM_MINHASHES // LSH_BANDS
SHINGLE_SIZE = 3


@register(
    "dedup_exact",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id)              AS keeper_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) >= 1
    """,
    doc="Exact dedup: normalize → md5 → hash-groupBy, keep min(doc_id). "
        "One shuffle on the digest; at 100 TB, group keys are uniform so "
        "no skew handling needed.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " ")))
    return (
        documents.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def _token_set(col: str | Column) -> Column:
    return F.array_distinct(F.transform(tokens(col), lambda t: F.lower(t)))


def lowered_tokens(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text) → (doc_id, toks) with toks the lowercased
    token MULTISET (order preserved, duplicates kept). The shared
    tokenization pass of the near-dup pipeline: signatures shingle it,
    exact verification distincts it — computed (and, by the caller,
    persisted) ONCE instead of re-tokenizing the corpus per consumer."""
    return documents.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t)).alias("toks"),
    )


def verify_jaccard(
    candidates: DataFrame,
    docs: DataFrame | None = None,
    threshold: float = 0.5,
    toks: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set Jaccard verification of a bounded candidate set:
    ``candidates(doc_a, doc_b)`` × ``docs(doc_id, text)`` →
    ``(doc_a, doc_b, jaccard)`` for pairs scoring ≥ threshold.

    THE exact-verify primitive every near-dup path shares (LSH candidates,
    bounded windows, corpus prep). Cost is O(|candidates|) — the caller
    owns keeping the candidate set bounded; this function never builds
    pairs itself. The intersect size materializes once per pair
    (re-referencing the array_intersect expression in filter+select would
    recompute it).

    Pass ``toks`` (a ``lowered_tokens`` frame, ideally persisted) to
    reuse a tokenization the caller already paid for; otherwise ``docs``
    is tokenized here."""
    if toks is not None:
        toks = toks.select("doc_id", F.array_distinct("toks").alias("tok"))
    else:
        toks = docs.select("doc_id", _token_set("text").alias("tok"))
    pairs = (
        candidates
        .join(
            toks.select(F.col("doc_id").alias("doc_a"),
                        F.col("tok").alias("tok_a")),
            "doc_a",
        )
        .join(
            toks.select(F.col("doc_id").alias("doc_b"),
                        F.col("tok").alias("tok_b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("tok_a", "tok_b")).cast("double")
            .alias("inter"),
            (F.size("tok_a") + F.size("tok_b")).cast("double").alias("sizes"),
        )
    )
    jac = F.col("inter") / (F.col("sizes") - F.col("inter"))
    return (
        pairs.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def verify_shingle_jaccard(
    candidates: DataFrame, toks: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact k-SHINGLE-set Jaccard verification of a bounded candidate
    set — the metric the MinHash signatures actually estimate, applied
    exactly. Verifying candidates with the same metric the candidate
    generator targets is the principled composition (Broder's resemblance
    end-to-end): a pair then scores ≥ t iff its resemblance is ≥ t, with
    no metric mismatch between the sketch and the verdict. The token-SET
    variant (``verify_jaccard``) stays for vocabulary-overlap use cases;
    on template-generated corpora token-set similarity saturates (most
    pairs share most vocabulary) while shingle similarity stays sharp.

    ``candidates(doc_a, doc_b)`` × ``toks`` (a ``lowered_tokens`` frame,
    ideally persisted) → ``(doc_a, doc_b, jaccard)`` for pairs ≥
    threshold. Cost is O(|candidates|); pairs where either side has an
    empty shingle set drop (0/0 similarity is null, never ≥ t)."""
    sh = toks.select("doc_id", shingles_from(F.col("toks")).alias("sh"))
    pairs = (
        candidates
        .join(
            sh.select(F.col("doc_id").alias("doc_a"),
                      F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            .alias("inter"),
            (F.size("sh_a") + F.size("sh_b")).cast("double").alias("sizes"),
        )
    )
    jac = F.col("inter") / (F.col("sizes") - F.col("inter"))
    return (
        pairs.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _shingle_truth_ctes(src: str = "documents", threshold: float = 0.5,
                        p: str = "") -> str:
    """DuckDB CTEs computing the EXACT all-pairs shingle-Jaccard truth
    ``{p}spairs(doc_a, doc_b, jaccard)`` over relation ``src`` (doc_id,
    text) at ``threshold`` — the ground-truth oracle for the xxhash64
    LSH gates. Formulated as an exploded shingle equi-join (pairs only
    materialize for docs sharing ≥1 shingle), not a quadratic
    cross-join, so the oracle itself scales past the gate SF.

    Shingling mirrors ``shingles_from`` element-for-element: lowercase
    whitespace tokens, distinct 3-shingles, whole-text fallback under 3
    tokens, empty for empty text (empty sides never pair — the Spark
    side's null-similarity filter)."""
    return f"""
    {p}stoks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS arr
      FROM {src}
    ), {p}sshl AS (
      SELECT doc_id,
             LIST_DISTINCT(CASE WHEN LEN(arr) >= 3
                  THEN LIST_TRANSFORM(RANGE(1, LEN(arr) - 1),
                       i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2])
                  WHEN LEN(arr) > 0 THEN [ARRAY_TO_STRING(arr, ' ')]
                  ELSE [] END) AS s
      FROM {p}stoks
    ), {p}ssizes AS (
      SELECT doc_id, LEN(s) AS n FROM {p}sshl
    ), {p}sexp AS (
      SELECT doc_id, UNNEST(s) AS sh FROM {p}sshl
    ), {p}sinter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM {p}sexp a JOIN {p}sexp b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), {p}spairs AS (
      SELECT doc_a, doc_b,
             ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
      FROM {p}sinter
      JOIN {p}ssizes sa ON sa.doc_id = doc_a
      JOIN {p}ssizes sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
    )"""


@register(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t != ''),
               t -> LOWER(t))) AS tok
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(LENGTH(LIST_INTERSECT(a.tok, b.tok)) AS DOUBLE)
                 / (LENGTH(a.tok) + LENGTH(b.tok)
                    - LENGTH(LIST_INTERSECT(a.tok, b.tok))), 4) AS jaccard
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(LENGTH(LIST_INTERSECT(a.tok, b.tok)) AS DOUBLE)
          / (LENGTH(a.tok) + LENGTH(b.tok) - LENGTH(LIST_INTERSECT(a.tok, b.tok)))
          >= 0.5
    """,
    doc="Token-set Jaccard on a bounded candidate window (doc_id < 40 — "
        "stand-in for an LSH candidate set; all-pairs is intentionally "
        "never run unbounded). array_intersect/union sizes, broadcast "
        "self-join.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    # bounded candidate window (the gate's stand-in for an LSH candidate
    # set) — verification itself is the shared verify_jaccard primitive
    ids = documents.filter(F.col("doc_id") < 40).select("doc_id")
    cands = ids.select(F.col("doc_id").alias("doc_a")).join(
        F.broadcast(ids.select(F.col("doc_id").alias("doc_b"))),
        F.col("doc_a") < F.col("doc_b"),
    )
    return verify_jaccard(cands, documents.select("doc_id", "text"), 0.5)


def shingles_from(toks: Column, k: int = SHINGLE_SIZE, dedup: bool = True) -> Column:
    """k-word shingles (distinct) from an already-materialized token array
    COLUMN. The input must be a plain column reference, not a derived
    expression: HOF lambdas re-evaluate captured expressions per element
    (no CSE on the interpreted path), so passing split(...)+filter(...)
    here would recompute tokenization per shingle — measured ~3× the cost
    of the whole MinHash pipeline. element_at keeps each shingle O(k).
    Documents shorter than k words yield one whole-text shingle."""
    # NULL/empty text yields an EMPTY shingle set (not [NULL] / [""]):
    # otherwise every null-text document shares one degenerate shingle and
    # they all become near-dup candidates of each other.
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    n = F.size(toks)
    windowed = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    out = (
        F.when(n >= k, windowed)
        .when(n > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )
    return F.array_distinct(out) if dedup else out


def shingles(col: str | Column, k: int = SHINGLE_SIZE) -> Column:
    """Convenience wrapper for ad-hoc use on a text column. Prefer
    materializing the token array first (see minhash_signatures) in
    anything performance-sensitive."""
    return shingles_from(F.transform(tokens(col), lambda t: F.lower(t)), k)


def minhash_signatures(
    documents: DataFrame | None = None,
    num_hashes: int = NUM_MINHASHES,
    toks: DataFrame | None = None,
) -> DataFrame:
    """documents(doc_id, text) → (doc_id, h0..h{K-1}) MinHash signature.

    Relational shape, not per-row array passes: explode shingles once,
    compute the K seeded xxhash64 columns vectorized (codegen), then
    groupBy(doc_id).min — partial map-side aggregation collapses each
    document to one row per partition *before* the shuffle, so shuffle
    volume is O(docs × K longs) regardless of document length.

    Pass ``toks`` (a ``lowered_tokens`` frame, ideally persisted) to
    skip re-tokenizing a corpus another consumer already tokenized."""
    toksdf = toks if toks is not None else lowered_tokens(documents)
    # dedup=False: min over a multiset equals min over the set, so the
    # per-row array_distinct is pure overhead on this path
    exploded = toksdf.select(
        "doc_id",
        F.explode(shingles_from(F.col("toks"), dedup=False)).alias("sh"),
    )
    # SQL-string construction, not 32 nested Column builders: every
    # F.xxhash64/F.lit/alias is a py4j round-trip, and this K-wide
    # pipeline was measured costing ~0.5 s of pure DRIVER plan-build
    # time per query invocation. One selectExpr string parses JVM-side
    # into the identical plan.
    hashed = exploded.selectExpr(
        "doc_id",
        *[f"xxhash64(sh, {j}) AS h{j}" for j in range(num_hashes)],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.expr(f"min(h{j}) AS h{j}") for j in range(num_hashes)]
    )


def minhash_bands(
    sigs: DataFrame, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """(doc_id, h0..h{K-1}) signature table → (doc_id, band, bucket)
    LSH band rows: each band's bucket is a hash over its LSH_ROWS
    signature slots. Narrow (explode only) — the banding step every LSH
    path (batch, incremental) shares.

    ``num_hashes`` must match the signature table's K (h0..h{K-1}) and
    divide into LSH_ROWS-sized bands; every hash participates in exactly
    one band, so banding and the similarity estimate honor the same K."""
    if num_hashes % LSH_ROWS:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by LSH_ROWS={LSH_ROWS}"
        )
    n_bands = num_hashes // LSH_ROWS
    # one SQL string instead of ~100 Column-builder py4j round-trips
    # (same plan; see minhash_signatures for the measurement)
    band_structs = ", ".join(
        "struct({b} AS band, xxhash64({cols}) AS bucket)".format(
            b=b,
            cols=", ".join(
                f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS)
            ),
        )
        for b in range(n_bands)
    )
    return sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bb"
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    documents: DataFrame | None = None, toks: DataFrame | None = None
) -> DataFrame:
    """documents(doc_id, text) → candidate near-dup pairs (doc_a < doc_b)
    via banded MinHash-LSH. Shuffle cost: docs × bands rows into the
    bucket join — all-pairs never materializes.

    The signature table stays persisted for the life of the returned
    plan; sessions running many dedup passes should
    ``spark.catalog.clearCache()`` between passes (caller contract,
    shared with ``incremental_minhash_dedup``).

    Pass ``toks`` (a persisted ``lowered_tokens`` frame, already
    repartitioned for parallel hashing) to share the tokenization with a
    downstream exact-verify step."""
    if toks is None:
        spark = documents.sparkSession
        parallelism = spark.sparkContext.defaultParallelism
        toks = lowered_tokens(documents.repartition(parallelism, "doc_id"))
    # Persist the signature table: it's O(docs × K longs) — tiny relative
    # to the text — and it feeds both sides of the bucket self-join, which
    # would otherwise recompute the whole shingle→hash pipeline twice.
    sigs = persist_tracked(minhash_signatures(toks=toks))
    bands = minhash_bands(sigs)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    "WITH " + _shingle_truth_ctes() + """
    SELECT doc_a, doc_b, jaccard FROM spairs
    """,
    doc="MinHash(32)+LSH(16 bands×2): shingle → signature → band buckets "
        "→ in-bucket candidate pairs → EXACT shingle-Jaccard verification "
        "≥ 0.5 (the metric the sketch estimates, applied exactly — "
        "precision is unconditional by construction). The 100 TB dedup "
        "path: no all-pairs comparison ever materializes. Oracle = the "
        "exact all-pairs shingle-Jaccard TRUTH (DuckDB, exploded-join "
        "formulation), so the gate certifies recall too: a pair the "
        "banding misses is a red row, not a silent gap. Recall is "
        "verified complete at sf0.001/0.01/0.1 (truth==found at every "
        "threshold probed down to 0.35; banding P(miss|j=0.5)=(1-j²)^16 "
        "≈ 1%, and the gate corpora's true pairs sit at j ≥ 0.65).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    # One persisted tokenization feeds BOTH the signature pipeline and
    # the exact-verify shingle sets — the corpus is tokenized once, not
    # three times (sigs + each side of the verify join). ~25% of query
    # time at sf0.1; at 100 TB it's a full corpus scan saved.
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    return verify_shingle_jaccard(
        minhash_lsh_candidates(toks=toks), toks=toks, threshold=0.5
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 15,
    checkpoint_dir: str | None = None,
    on_nonconvergence: str = "warn",
) -> DataFrame:
    """``pairs(doc_a, doc_b)`` (an undirected edge list) →
    ``(doc_id, component)`` where component = the minimum doc_id reachable
    — the standard pretraining-dedup refinement: cluster-level canonical
    selection instead of pairwise drops (a chain A~B~C keeps only A even
    when A!~C directly).

    Min-label propagation: each round every node takes the min of its own
    and its neighbors' labels; converges in O(cluster diameter) rounds —
    near-dup clusters are shallow, so the early-exit fires after a handful
    of bounded-shuffle iterations (each is one join + one groupBy on the
    edge list; nothing here is ever all-pairs). Nodes with no edges are
    not emitted (their component is trivially themselves).

    Every iteration checkpoints its label frame: each round's plan
    references the previous round's TWICE (neighbor join + change
    check), so without lineage truncation the logical plan doubles per
    iteration and Catalyst re-analysis OOMs the driver near ~10 rounds
    (caught by the union-find property test). ``checkpoint_dir=None``
    uses ``localCheckpoint`` (fast, executor-local — fine in local
    mode); pass an HDFS/object-store path on a real cluster to use
    RELIABLE ``checkpoint``, so a mid-algorithm executor loss replays
    from durable storage instead of failing the whole run.

    ``checkpoint_dir`` is a GLOBAL SparkContext setting: it is applied
    only when the session has no checkpoint dir yet; if one is already
    set to a different path this function warns and uses the existing
    dir rather than silently redirecting other checkpoint() users.
    Per-iteration checkpoint files are superseded, not deleted — enable
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (or sweep
    the dir after convergence) on long-lived sessions.

    If labels are still moving at ``max_iter`` the result is NOT a
    fixpoint (some components may remain split) — reported, never
    silent: ``on_nonconvergence="warn"`` (default) warns with the
    still-moving label count; ``"raise"`` raises RuntimeError."""
    if checkpoint_dir is not None:
        sc = pairs.sparkSession.sparkContext
        current = sc.getCheckpointDir()
        if current is None:
            sc.setCheckpointDir(checkpoint_dir)
        # getCheckpointDir returns <dir>/<random-uuid>; same base dir =>
        # already effectively set, nothing to do
        elif checkpoint_dir.strip("/") not in current:
            import warnings

            warnings.warn(
                f"SparkContext checkpoint dir already set to {current}; "
                f"using it instead of {checkpoint_dir} (the setting is "
                "session-global)",
                stacklevel=2,
            )

    def ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint() if checkpoint_dir is not None
            else df.localCheckpoint()
        )

    edges = pairs.select("doc_a", "doc_b")
    sym = ckpt(edges.union(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    ))
    labels = ckpt(
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    converged = False
    last_changed: DataFrame | None = None
    for _ in range(max_iter):
        neigh = (
            sym.join(
                labels.select(F.col("doc_id").alias("doc_b"),
                              F.col("component").alias("nbr")),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nbr").alias("nbr_min"))
        )
        new_labels = ckpt(
            labels.join(
                neigh.select(F.col("doc_a").alias("doc_id"), "nbr_min"),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_min", F.col("component")),
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        done = changed.isEmpty()
        last_changed = changed
        labels = new_labels
        if done:
            converged = True
            break
    if not converged and last_changed is not None:
        n_moving = last_changed.count()
        if n_moving:
            msg = (
                f"connected_components: no fixpoint after {max_iter} "
                f"iterations — {n_moving} labels still changing; some "
                "components may be split. Raise max_iter (rounds needed "
                "scale with cluster diameter)."
            )
            if on_nonconvergence == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    return labels


def _star_canonical_edges(pairs: DataFrame) -> DataFrame:
    """Undirected (doc_a, doc_b) pairs → canonical edge list (u, v) with
    u > v; self-loops carry no connectivity and are dropped (their nodes
    are still emitted by the caller's vertex list)."""
    return (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node links its strictly-larger
    neighbors to the minimum of its closed neighborhood. m <= u < v, so
    the output is canonical (child > parent) and self-loop-free by
    construction."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over a canonical (u > v) edge list: every
    node links its smaller neighbors, and itself, to the minimum of its
    closed neighborhood."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = e.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfe = mins.select("u", F.col("m").alias("v"))
    return (
        nbrs.union(selfe)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
    on_nonconvergence: str = "warn",
) -> DataFrame:
    """``pairs(doc_a, doc_b)`` (undirected edge list) → ``(doc_id,
    component)`` with component = minimum reachable doc_id — the same
    contract as :func:`connected_components`, computed with the
    alternating large-star/small-star algorithm (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii, *Connected Components in MapReduce
    and Beyond*, SoCC 2014).

    Why a second engine: min-label propagation needs O(cluster diameter)
    rounds, which is fine for shallow near-dup clusters but degenerates
    on chain-shaped graphs (a 10^6-node path needs 10^6 rounds). The
    star algorithm contracts the graph toward a star forest in
    O(log² n) rounds worst-case (~log n in practice) REGARDLESS of
    diameter — each round is two bounded shuffles on the edge list
    (one groupBy per star operation), never all-pairs:

    - large-star: every node links its strictly-larger neighbors to the
      minimum of its closed neighborhood;
    - small-star: every node links its smaller-or-equal neighbors (and
      itself) to that minimum.

    Both operations preserve connectivity and strictly shrink a
    monotone potential, so the fixpoint is exactly the star forest
    rooted at each component's global minimum. Edges stay canonical
    (child > parent) between rounds, so the fixpoint test is set
    equality of the canonical edge list.

    Same operational contract as the min-label engine: per-round
    lineage truncation via ``localCheckpoint`` (or RELIABLE
    ``checkpoint`` when ``checkpoint_dir`` is given — same global-dir
    semantics), non-convergence reported via ``on_nonconvergence``.
    Unlike min-label, every node appearing in ``pairs`` (including
    self-loop-only nodes) is emitted; pure isolates never enter the
    edge list and are trivially their own component."""
    if checkpoint_dir is not None:
        sc = pairs.sparkSession.sparkContext
        current = sc.getCheckpointDir()
        if current is None:
            sc.setCheckpointDir(checkpoint_dir)
        elif checkpoint_dir.strip("/") not in current:
            import warnings

            warnings.warn(
                f"SparkContext checkpoint dir already set to {current}; "
                f"using it instead of {checkpoint_dir} (the setting is "
                "session-global)",
                stacklevel=2,
            )

    def ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint() if checkpoint_dir is not None
            else df.localCheckpoint()
        )

    vertices = ckpt(
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    edges = ckpt(_star_canonical_edges(pairs))

    converged = edges.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        new_edges = ckpt(_small_star(_large_star(edges)))
        # Both sides are distinct sets: equal iff same count and
        # new ⊆ old.
        if new_edges.subtract(edges).isEmpty() and (
            new_edges.count() == edges.count()
        ):
            converged = True
        edges = new_edges
    if not converged:
        msg = (
            f"connected_components_star: no fixpoint after {max_iter} "
            "rounds — the edge set is still contracting; some "
            "components may be split. Raise max_iter (rounds needed "
            "are O(log² nodes))."
        )
        if on_nonconvergence == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
        # A non-fixpoint edge set can still hold multiple parents per
        # child; without this collapse the labeling join below would
        # emit duplicate rows per doc_id (a contract violation beyond
        # the warned "components may be split"). Converged sets are
        # already one-root-per-child, so the extra shuffle only runs
        # on the warn path.
        edges = edges.groupBy("u").agg(F.min("v").alias("v"))
    # Fixpoint is a star forest (child > root): label children by their
    # root edge; roots and self-loop-only nodes label themselves.
    return vertices.join(
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("root")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("root", F.col("doc_id")).alias("component"),
    )


@register(
    "dedup_near_dup_clusters",
    "WITH RECURSIVE " + _shingle_truth_ctes() + """
    , und AS (
      SELECT doc_a AS src, doc_b AS dst FROM spairs
      UNION
      SELECT doc_b, doc_a FROM spairs
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    )
    SELECT component AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(doc_id) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="Connected-components clustering over exact-shingle-verified "
        "near-dup pairs (min-label propagation, bounded iterations): "
        "cluster-level canonical selection — a chain A~B~C collapses to "
        "one cluster keyed by min doc_id even when A!~C directly. Oracle "
        "= recursive-CTE transitive closure over the exact all-pairs "
        "shingle truth, so the iterative fixpoint is certified against "
        "an independent closure AND the pair recall against ground "
        "truth (see dedup_minhash_lsh).",
)
def dedup_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    pairs = verify_shingle_jaccard(
        minhash_lsh_candidates(toks=toks), toks=toks, threshold=0.5
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .withColumnRenamed("component", "keeper_doc_id")
    )


def simhash_udf():
    """64-bit SimHash as an Arrow-batched Pandas UDF (numpy bit-packing —
    the vectorized Python path; ~100× over row-at-a-time UDFs)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        # Batch-wide vectorization (r14): the former per-document loop
        # paid ~10 small-array numpy calls per row. Flatten the batch's
        # tokens once, md5 each DISTINCT token once (factorize), build
        # one (tokens, 64) ±1 sign matrix, and segment-sum it per
        # document with add.reduceat (token runs are contiguous).
        # Bit-identical to the per-doc majority vote.
        n = len(texts)
        out = np.zeros(n, dtype=np.int64)
        tok_lists = [
            [t.lower() for t in (text or "").split()] for text in texts
        ]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=n
        )
        flat = [t for toks in tok_lists for t in toks]
        if not flat:
            return pd.Series(out)
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, t in enumerate(uniques):
            # md5 (not Python hash()) so the sketch is deterministic
            # across executors and runs.
            uh[i] = np.uint64(
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            )
        hashes = uh[codes]
        bit_idx = np.arange(64, dtype=np.uint64)
        signs = np.where(
            ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1))
            .astype(bool),
            np.int64(1), np.int64(-1),
        )
        nz = counts > 0
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        acc = np.zeros((n, 64), dtype=np.int64)
        # reduceat needs strictly increasing offsets: skip empty docs
        # (their accumulator row stays 0 -> signature 0, as before)
        acc[nz] = np.add.reduceat(signs, starts[nz], axis=0)
        sig = ((acc > 0).astype(np.uint64) << bit_idx[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(sig.view(np.int64))

    return simhash


def _simhash_oracle_sql() -> str:
    """ANSI-SQL replica of ``simhash_udf`` for the DuckDB oracle.

    The UDF is md5-based precisely so an independent engine can reproduce
    it: token hash = first 8 bytes of md5(token) big-endian, which DuckDB
    expresses as ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``. Per-bit
    majority is 64 generated conditional sums (disjoint powers of two, so
    plain addition assembles the signature); the final two's-complement
    fold matches numpy's uint64→int64 reinterpretation. Tokenization
    parity (Python ``str.split()`` vs ``\\s+`` split-and-drop-empties)
    holds on ASCII-whitespace corpora — validated token-for-token on the
    test tables."""
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b}::UBIGINT ELSE 0::UBIGINT END)"
        for b in range(64)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, LOWER(tok) AS tok
      FROM (SELECT doc_id,
                   UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), th AS (
      SELECT doc_id, ('0x' || SUBSTR(MD5(tok), 1, 16))::UBIGINT AS h
      FROM toks
    ), sig AS (
      SELECT doc_id, {bit_terms} AS usig FROM th GROUP BY doc_id
    ), buckets AS (
      SELECT d.doc_id, COALESCE(s.usig, 0::UBIGINT) >> 48 AS bucket
      FROM documents d LEFT JOIN sig s USING (doc_id)
    )
    SELECT bucket::BIGINT AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM buckets
    GROUP BY 1
    """


@register(
    "dedup_simhash",
    _simhash_oracle_sql(),
    doc="SimHash near-dup sketch via vectorized Pandas UDF; groups docs by "
        "16-bit prefix bucket (the Hamming-ball blocking key) and reports "
        "bucket sizes — the shuffle key a 100 TB near-dup pass would use. "
        "Oracle-gated: the md5-based sketch is engine-independent, so the "
        "DuckDB oracle recomputes the full 64-bit majority vote in SQL.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    sh = simhash_udf()
    # spread the CPU-bound sketch UDF across workers ONLY when the
    # scan under-parallelizes (single-row-group files): at 100 TB the
    # scan already yields >= core-count tasks and an unconditional
    # repartition would shuffle the full text column for nothing
    # (VERDICT r14 finding 3) — gate on the scan's actual partition
    # count, the same guard the triangle intersect stage uses
    parallelism = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < parallelism:
        documents = documents.repartition(parallelism, "doc_id")
    sigs = documents.select("doc_id", sh(F.col("text")).alias("simhash"))
    bucket = F.shiftrightunsigned(F.col("simhash"), 48).alias("bucket")
    return (
        sigs.select("doc_id", "simhash", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# --- Portable (engine-independent) MinHash ---------------------------------
#
# The production LSH path hashes with Spark's xxhash64 — fast, but no other
# engine can reproduce the signatures, so those queries carry rows-only
# driver checks. This variant swaps in an md5-derived hash family that ANY
# engine can compute (h_j(shingle) = first 60 bits of md5(shingle + '#j')),
# giving the whole shingle→signature→band→bucket→verify pipeline a full
# DuckDB oracle: the one structural difference from the fast path is the
# hash family, so a green hash-match here certifies the shared machinery
# (shingling, banding, candidate join, exact verification) cross-engine.

PORTABLE_NUM_HASHES = 16
PORTABLE_LSH_ROWS = 2
PORTABLE_LSH_BANDS = PORTABLE_NUM_HASHES // PORTABLE_LSH_ROWS


def portable_minhash_signatures(
    toks: DataFrame, num_hashes: int = PORTABLE_NUM_HASHES
) -> DataFrame:
    """(doc_id, toks) → (doc_id, h0..h{K-1}) MinHash signatures under the
    portable md5 hash family. Same relational shape as
    ``minhash_signatures`` (explode → K hash columns → groupBy.min with
    map-side partial agg); only the hash expression differs. ~5× the hash
    cost of xxhash64 — use the fast path in production, this one when an
    external system must verify or reproduce signatures."""
    exploded = toks.select(
        "doc_id",
        F.explode(shingles_from(F.col("toks"), dedup=False)).alias("sh"),
    )
    hashed = exploded.selectExpr(
        "doc_id",
        *[
            f"CAST(CONV(SUBSTR(MD5(CONCAT(sh, '#{j}')), 1, 15), 16, 10)"
            f" AS BIGINT) AS h{j}"
            for j in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.expr(f"min(h{j}) AS h{j}") for j in range(num_hashes)]
    )


def portable_band_rows(sigs: DataFrame) -> DataFrame:
    """Signature table → (doc_id, band, r0, r1) band rows. Unlike the fast
    path there is no band-bucket hash: the bucket key IS the tuple of raw
    signature slots, so equality joins need no engine-specific hashing.
    Shuffle volume is still O(docs × bands)."""
    structs = ", ".join(
        f"struct({b} AS band, h{2 * b} AS r0, h{2 * b + 1} AS r1)"
        for b in range(PORTABLE_LSH_BANDS)
    )
    return sigs.selectExpr(
        "doc_id", f"explode(array({structs})) AS bb"
    ).select("doc_id", "bb.band", "bb.r0", "bb.r1")


def portable_minhash_candidates(toks: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs (doc_a < doc_b) under the portable hash
    family: 8 bands × 2 rows → P(candidate | j) = 1-(1-j²)^8 ≈ 0.90 at
    j=0.5. Signatures persist for the life of the plan (they feed both
    sides of the bucket self-join)."""
    sigs = persist_tracked(portable_minhash_signatures(toks))
    bands = portable_band_rows(sigs)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.r0") == F.col("r.r0"))
            & (F.col("l.r1") == F.col("r.r1"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _portable_oracle_ctes(src: str = "documents") -> str:
    """Shared DuckDB CTE prefix reproducing the portable pipeline:
    tokenize → shingle (k=3, whole-text fallback, multiset) → md5-family
    hash → per-doc min → per-band tuple self-join → verified pairs.
    Token/shingle construction mirrors the Spark HOF expressions
    element-for-element (validated token-for-token on the test corpus).
    ``src`` names the (doc_id, text) relation to read — a prior CTE for
    composed pipelines (training_corpus_prep_portable), or the
    documents table itself."""
    hash_cols = ", ".join(
        f"('0x' || SUBSTR(MD5(s || '#{j}'), 1, 15))::BIGINT AS h{j}"
        for j in range(PORTABLE_NUM_HASHES)
    )
    min_cols = ", ".join(
        f"MIN(h{j}) AS h{j}" for j in range(PORTABLE_NUM_HASHES)
    )
    band_joins = "\n      UNION\n".join(
        f"      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a "
        f"JOIN sig b ON a.h{2 * b} = b.h{2 * b} "
        f"AND a.h{2 * b + 1} = b.h{2 * b + 1} AND a.doc_id < b.doc_id"
        for b in range(PORTABLE_LSH_BANDS)
    )
    return f"""
    toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS arr
      FROM {src}
    ), shl AS (
      SELECT doc_id,
             CASE WHEN LEN(arr) >= 3
                  THEN LIST_TRANSFORM(RANGE(1, LEN(arr) - 1),
                       i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2])
                  WHEN LEN(arr) > 0 THEN [ARRAY_TO_STRING(arr, ' ')]
                  ELSE [] END AS shs
      FROM toks
    ), sh AS (
      SELECT doc_id, UNNEST(shs) AS s FROM shl
    ), hashed AS (
      SELECT doc_id, {hash_cols} FROM sh
    ), sig AS (
      SELECT doc_id, {min_cols} FROM hashed GROUP BY doc_id
    ), cand AS (
{band_joins}
    ), tokset AS (
      SELECT doc_id, LIST_DISTINCT(arr) AS tok FROM toks
    ), pairs AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(CAST(LENGTH(LIST_INTERSECT(ta.tok, tb.tok)) AS DOUBLE)
                   / (LENGTH(ta.tok) + LENGTH(tb.tok)
                      - LENGTH(LIST_INTERSECT(ta.tok, tb.tok))), 4) AS jaccard
      FROM cand c
      JOIN tokset ta ON ta.doc_id = c.doc_a
      JOIN tokset tb ON tb.doc_id = c.doc_b
      WHERE CAST(LENGTH(LIST_INTERSECT(ta.tok, tb.tok)) AS DOUBLE)
            / (LENGTH(ta.tok) + LENGTH(tb.tok)
               - LENGTH(LIST_INTERSECT(ta.tok, tb.tok))) >= 0.5
    )"""


@register(
    "dedup_portable_minhash",
    "WITH " + _portable_oracle_ctes() + """
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    doc="MinHash(16)+LSH(8 bands×2) under the portable md5 hash family, "
        "exact-verified at jaccard ≥ 0.5. Same machinery as the xxhash64 "
        "production path but fully oracle-gated: DuckDB recomputes the "
        "entire shingle→signature→band→verify pipeline in SQL and the "
        "hashes must match bit-for-bit.",
)
def dedup_portable_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    return verify_jaccard(
        portable_minhash_candidates(toks), threshold=0.5, toks=toks
    )


@register(
    "dedup_portable_clusters",
    "WITH RECURSIVE " + _portable_oracle_ctes() + """
    , und AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    )
    SELECT component AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(doc_id) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="Connected-components clustering over portable-MinHash verified "
        "pairs — the cluster-level canonical selection of "
        "dedup_near_dup_clusters, but fully oracle-gated: DuckDB resolves "
        "the same components via a recursive transitive-closure CTE, so "
        "the iterative min-label propagation is certified against an "
        "independent fixpoint computation.",
)
def dedup_portable_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    pairs = verify_jaccard(
        portable_minhash_candidates(toks), threshold=0.5, toks=toks
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .withColumnRenamed("component", "keeper_doc_id")
    )


@register(
    "dedup_clusters_largestar",
    "WITH RECURSIVE " + _portable_oracle_ctes() + """
    , und AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    )
    SELECT component AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(doc_id) AS max_doc_id
    FROM comp GROUP BY component
    """,
    doc="Cluster resolution over the SAME portable-MinHash verified pairs "
        "as dedup_portable_clusters, but through the alternating "
        "large-star/small-star engine (Kiveris et al., SoCC 2014) — "
        "O(log² n) rounds regardless of cluster diameter, the scale path "
        "for chain-shaped candidate graphs where min-label propagation "
        "needs O(diameter) rounds. Certified against the same independent "
        "recursive-CTE transitive closure, so BOTH component engines are "
        "oracle-gated on identical inputs.",
)
def dedup_clusters_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    pairs = verify_jaccard(
        portable_minhash_candidates(toks), threshold=0.5, toks=toks
    )
    comps = connected_components_star(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .withColumnRenamed("component", "keeper_doc_id")
    )


def incremental_dedup(
    delta: DataFrame, existing_fingerprints: DataFrame
) -> DataFrame:
    """Incremental exact dedup for a GROWING corpus: only the delta's
    fingerprints are computed and checked — (1) against the persisted
    fingerprint set of every prior version (anti-join; the 100 TB corpus
    itself is never re-read) and (2) within the delta (keep min doc_id).
    Returns the surviving delta rows.

    This is the corpus-versioning shape: each release persists its
    fingerprint table (doc_id, fingerprint — tiny next to the text);
    release N+1 dedups against the union of prior fingerprint tables in
    O(delta + fingerprints) instead of re-deduping the whole corpus."""
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " ")))
    delta_fp = delta.select("doc_id", "text", fp.alias("fingerprint"))
    fresh = delta_fp.join(
        existing_fingerprints.select("fingerprint").distinct(),
        "fingerprint",
        "left_anti",
    )
    keepers = (
        fresh.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return fresh.join(keepers, "doc_id", "left_semi").drop("fingerprint")


def write_signature_table(documents: DataFrame, path: str) -> None:
    """Release-time step of incremental near-dup: persist the corpus
    version's MinHash signature table (doc_id, h0..h{K-1}) — O(docs × K
    longs), thousands of times smaller than the text. Later deltas dedup
    against THIS table; the released text is never read again."""
    minhash_signatures(documents).write.mode("overwrite").parquet(path)


def incremental_minhash_dedup(
    delta: DataFrame,
    prior_sigs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = NUM_MINHASHES,
) -> DataFrame:
    """Incremental NEAR-dup dedup for a growing corpus — the MinHash
    extension of ``incremental_dedup``'s anti-join shape (and the
    corpus-versioning semantics of the reference's Hudi upsert,
    hudi/register_hudi.py:56-69, applied to the LLM tier):

    - signatures are computed for the DELTA ONLY; every prior version
      participates solely through its persisted signature table
      (``write_signature_table``) — prior-corpus TEXT is never re-read;
    - candidates: band-join delta bands against prior bands
      (cross-version) and against themselves (in-batch) — shuffle is
      O((delta + priors) × bands) band rows, never all-pairs, and at
      100 TB the prior side is signature-table-sized, not corpus-sized;
    - similarity: cross-version pairs score the standard MinHash
      estimate (matching-slot fraction — unbiased estimator of shingle
      Jaccard) because the prior text is unavailable by design; in-delta
      pairs verify EXACT shingle Jaccard against the delta text we
      already hold — the same resemblance metric the signatures
      estimate, applied exactly where the text is available.

    Returns surviving delta rows (doc_id, text). Drop semantics:
    - a delta doc whose MinHash estimate vs ANY prior doc clears the
      threshold is dropped (cross-version);
    - in-batch, verified near-dup pairs are resolved as CLUSTERS via
      ``connected_components`` and only each cluster's min doc_id
      survives — identical to the batch ``dedup_near_dup_clusters``
      path, so a chain A~B, B~C (A!~C) keeps exactly A. The two drops
      compose by anti-join: if a cluster's canonical min is itself a
      prior-dup, the rest of its cluster still drops (its members are
      transitively near a released doc's near-dup — the conservative
      choice for training-corpus hygiene).

    ``prior_sigs`` must have been built with the same ``num_hashes``
    (columns h0..h{K-1}); banding and the similarity estimate both
    derive from it, so K is honored end-to-end.

    ``delta_sigs`` stays persisted for the life of the returned plan —
    on repeated incremental runs in one session the caller should
    ``spark.catalog.clearCache()`` between runs (same contract as
    ``minhash_lsh_candidates``).
    """
    delta_toks = lowered_tokens(delta.select("doc_id", "text"))
    delta_sigs = persist_tracked(minhash_signatures(
        num_hashes=num_hashes, toks=delta_toks
    ))
    d_bands = minhash_bands(delta_sigs, num_hashes)
    # -- cross-version: delta vs persisted prior signatures ------------
    p_bands = minhash_bands(prior_sigs, num_hashes)
    cross = (
        d_bands.alias("d")
        .join(
            p_bands.alias("p"),
            (F.col("d.band") == F.col("p.band"))
            & (F.col("d.bucket") == F.col("p.bucket")),
        )
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("p.doc_id").alias("prior_id"),
        )
        .distinct()
    )
    # SQL-string construction (see minhash_signatures): the K-wide
    # renames and the K-term match-fraction estimator are one JVM-side
    # parse each instead of ~160 py4j Column-builder round-trips
    d_ren = delta_sigs.selectExpr(
        "doc_id AS delta_id",
        *[f"h{j} AS dh{j}" for j in range(num_hashes)],
    )
    p_ren = prior_sigs.selectExpr(
        "doc_id AS prior_id",
        *[f"h{j} AS ph{j}" for j in range(num_hashes)],
    )
    est = F.expr(
        "("
        + " + ".join(
            f"CASE WHEN dh{j} = ph{j} THEN 1 ELSE 0 END"
            for j in range(num_hashes)
        )
        + f") / {float(num_hashes)}"
    )
    dup_of_prior = (
        cross.join(d_ren, "delta_id")
        .join(p_ren, "prior_id")
        .filter(est >= threshold)
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
    )
    # -- in-batch: delta vs delta (exact verify — we hold the text) ----
    within_cands = (
        d_bands.alias("l")
        .join(
            d_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Cluster-resolve verified in-batch pairs: min doc_id per connected
    # component survives, matching the batch dedup_near_dup_clusters
    # path (a pairwise drop-doc_b rule would remove BOTH B and C in a
    # chain A~B, B~C even though C only matched the non-survivor B).
    verified = verify_shingle_jaccard(
        within_cands, toks=delta_toks, threshold=threshold
    )
    comp = connected_components(verified.select("doc_a", "doc_b"))
    dup_within = (
        comp.filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    return (
        delta.join(dup_of_prior, "doc_id", "left_anti")
        .join(dup_within, "doc_id", "left_anti")
    )


@register(
    "dedup_incremental_minhash",
    "WITH RECURSIVE " + _shingle_truth_ctes() + """
    , cross_drop AS (
      SELECT DISTINCT doc_b AS doc_id FROM spairs
      WHERE doc_a < 250 AND doc_b >= 250
    ), wpairs AS (
      SELECT doc_a, doc_b FROM spairs WHERE doc_a >= 250
    ), und AS (
      SELECT doc_a AS src, doc_b AS dst FROM wpairs
      UNION
      SELECT doc_b, doc_a FROM wpairs
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    ), within_drop AS (
      SELECT doc_id FROM comp WHERE doc_id != component
    ), delta AS (
      SELECT doc_id FROM documents WHERE doc_id >= 250
    ), dropped AS (
      -- DISTINCT explicitly: DuckDB 1.0 treats UNION in non-recursive
      -- CTEs under a WITH RECURSIVE umbrella as UNION ALL
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id FROM cross_drop
        UNION ALL
        SELECT doc_id FROM within_drop
      )
    )
    SELECT CAST((SELECT COUNT(*) FROM delta) AS BIGINT) AS n_delta,
           CAST((SELECT COUNT(*) FROM dropped) AS BIGINT) AS n_dropped,
           CAST((SELECT COUNT(*) FROM delta)
                - (SELECT COUNT(*) FROM dropped) AS BIGINT) AS n_survivors
    """,
    doc="Incremental MinHash near-dup across corpus versions: docs 0..249 "
        "play the released corpus (only their SIGNATURE table is used — "
        "text never re-read), docs 250+ are the delta. Band-join delta "
        "vs prior signatures + in-delta LSH, MinHash-estimate similarity "
        "cross-version, exact shingle Jaccard in-batch. Reports survivor "
        "counts. Oracle = the EXACT ground truth (DuckDB computes true "
        "shingle-Jaccard drops from the full text — which the engine "
        "deliberately never re-reads): a green row certifies the "
        "signature-only estimate reached the same verdicts as exact "
        "similarity. Sound because the gate corpora's cross-version "
        "dups sit at j ≥ 0.89 where the K=32 estimator (σ≈0.05) cannot "
        "flip across the 0.5 cut; verified at sf0.001/0.01/0.1.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    # release-time: version N's signature table (built once per release)
    prior_sigs = minhash_signatures(
        documents.filter(F.col("doc_id") < 250).select("doc_id", "text")
    )
    delta = documents.filter(F.col("doc_id") >= 250).select("doc_id", "text")
    survivors = incremental_minhash_dedup(delta, prior_sigs)
    return (
        delta.withColumn("_d", F.lit(1))
        .join(survivors.select("doc_id").withColumn("_s", F.lit(1)),
              "doc_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_delta"),
            F.sum(F.when(F.col("_s").isNull(), 1).otherwise(0))
            .cast("long").alias("n_dropped"),
            F.sum(F.when(F.col("_s").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_survivors"),
        )
    )


@register(
    "dedup_incremental",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    existing AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250),
    delta AS (SELECT * FROM fp WHERE doc_id >= 250),
    fresh AS (
      SELECT d.doc_id, d.fingerprint FROM delta d
      LEFT JOIN existing e USING (fingerprint) WHERE e.fingerprint IS NULL
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY fingerprint
    )
    SELECT CAST((SELECT COUNT(*) FROM delta) AS BIGINT) AS n_delta,
           CAST((SELECT COUNT(*) FROM delta) -
                (SELECT COUNT(*) FROM fresh) AS BIGINT) AS n_dup_of_existing,
           CAST((SELECT COUNT(*) FROM fresh) -
                (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_dup_within_delta,
           CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_new_unique
    """,
    doc="Incremental exact dedup across corpus versions: docs 0..249 play "
        "the released corpus (only its FINGERPRINT table is read), docs "
        "250+ are the delta — anti-join + in-delta keep-min, O(delta + "
        "fingerprints), the whole corpus never re-read.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " ")))
    existing = (
        documents.filter(F.col("doc_id") < 250)
        .select(fp.alias("fingerprint"))
    )
    delta = documents.filter(F.col("doc_id") >= 250).select("doc_id", "text")
    # ONE declarative plan, no driver-side actions: tag each delta row
    # with whether its fingerprint exists in the released corpus (left
    # join against the distinct fingerprint set), then a single aggregate
    # derives all four counters.
    delta_fp = delta.select("doc_id", fp.alias("fingerprint"))
    hit = (
        existing.distinct()
        .withColumnRenamed("fingerprint", "fingerprint")
        .withColumn("_hit", F.lit(1))
    )
    tagged = delta_fp.join(hit, "fingerprint", "left")
    fresh_cnt = F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
    kept_cnt = F.count_distinct(
        F.when(F.col("_hit").isNull(), F.col("fingerprint"))
    )
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_delta"),
        (F.count(F.lit(1)) - fresh_cnt).cast("long")
        .alias("n_dup_of_existing"),
        (fresh_cnt - kept_cnt).cast("long").alias("n_dup_within_delta"),
        kept_cnt.cast("long").alias("n_new_unique"),
    )


def _portable_sig_ctes(src: str, p: str) -> str:
    """Prefixed DuckDB CTEs computing the portable signature table
    ``{p}sig(doc_id, h0..h{K-1})`` for relation ``src`` (doc_id, text).
    Lets one oracle hold signatures for several relations (the
    incremental twin signs prior and delta separately)."""
    hash_cols = ", ".join(
        f"('0x' || SUBSTR(MD5(s || '#{j}'), 1, 15))::BIGINT AS h{j}"
        for j in range(PORTABLE_NUM_HASHES)
    )
    min_cols = ", ".join(
        f"MIN(h{j}) AS h{j}" for j in range(PORTABLE_NUM_HASHES)
    )
    return f"""
    {p}toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS arr
      FROM {src}
    ), {p}shl AS (
      SELECT doc_id,
             CASE WHEN LEN(arr) >= 3
                  THEN LIST_TRANSFORM(RANGE(1, LEN(arr) - 1),
                       i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2])
                  WHEN LEN(arr) > 0 THEN [ARRAY_TO_STRING(arr, ' ')]
                  ELSE [] END AS shs
      FROM {p}toks
    ), {p}sh AS (
      SELECT doc_id, UNNEST(shs) AS s FROM {p}shl
    ), {p}hashed AS (
      SELECT doc_id, {hash_cols} FROM {p}sh
    ), {p}sig AS (
      SELECT doc_id, {min_cols} FROM {p}hashed GROUP BY doc_id
    )"""


def incremental_portable_minhash_dedup(
    delta: DataFrame,
    prior_sigs: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """``incremental_minhash_dedup`` under the portable hash family —
    identical drop semantics (cross-version MinHash estimate vs ANY
    prior; in-batch exact-verify + connected-components canonicals),
    tuple-keyed bands, md5-derived signatures. Exists so the
    corpus-versioning shape itself is certifiable cross-engine; the
    xxhash64 path stays the production default."""
    K = PORTABLE_NUM_HASHES
    parallelism = delta.sparkSession.sparkContext.defaultParallelism
    delta_toks = persist_tracked(lowered_tokens(
        delta.select("doc_id", "text").repartition(parallelism, "doc_id")
    ))
    delta_sigs = persist_tracked(
        portable_minhash_signatures(delta_toks)
    )
    d_bands = portable_band_rows(delta_sigs)
    p_bands = portable_band_rows(prior_sigs)
    cross = (
        d_bands.alias("d")
        .join(
            p_bands.alias("p"),
            (F.col("d.band") == F.col("p.band"))
            & (F.col("d.r0") == F.col("p.r0"))
            & (F.col("d.r1") == F.col("p.r1")),
        )
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("p.doc_id").alias("prior_id"),
        )
        .distinct()
    )
    d_ren = delta_sigs.selectExpr(
        "doc_id AS delta_id", *[f"h{j} AS dh{j}" for j in range(K)]
    )
    p_ren = prior_sigs.selectExpr(
        "doc_id AS prior_id", *[f"h{j} AS ph{j}" for j in range(K)]
    )
    est = F.expr(
        "("
        + " + ".join(
            f"CASE WHEN dh{j} = ph{j} THEN 1 ELSE 0 END" for j in range(K)
        )
        + f") / {float(K)}"
    )
    dup_of_prior = (
        cross.join(d_ren, "delta_id")
        .join(p_ren, "prior_id")
        .filter(est >= threshold)
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
    )
    within = verify_jaccard(
        portable_minhash_candidates(delta_toks),
        threshold=threshold,
        toks=delta_toks,
    )
    comp = connected_components(within.select("doc_a", "doc_b"))
    dup_within = (
        comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    )
    return (
        delta.join(dup_of_prior, "doc_id", "left_anti")
        .join(dup_within, "doc_id", "left_anti")
    )


def _incremental_portable_oracle() -> str:
    K = PORTABLE_NUM_HASHES
    cross_band_joins = "\n      UNION\n".join(
        f"      SELECT d.doc_id AS delta_id, p.doc_id AS prior_id "
        f"FROM dsig d JOIN psig p ON d.h{2 * b} = p.h{2 * b} "
        f"AND d.h{2 * b + 1} = p.h{2 * b + 1}"
        for b in range(PORTABLE_LSH_BANDS)
    )
    within_band_joins = "\n      UNION\n".join(
        f"      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM dsig a JOIN dsig b ON a.h{2 * b} = b.h{2 * b} "
        f"AND a.h{2 * b + 1} = b.h{2 * b + 1} AND a.doc_id < b.doc_id"
        for b in range(PORTABLE_LSH_BANDS)
    )
    est_terms = " + ".join(
        f"(CASE WHEN d.h{j} = p.h{j} THEN 1 ELSE 0 END)" for j in range(K)
    )
    return f"""
    WITH RECURSIVE prior AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 250
    ), delta AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
    ), {_portable_sig_ctes("prior", "p").lstrip()},
    {_portable_sig_ctes("delta", "d").lstrip()},
    cross_cand AS (
{cross_band_joins}
    ), dup_of_prior AS (
      SELECT DISTINCT c.delta_id AS doc_id
      FROM cross_cand c
      JOIN dsig d ON d.doc_id = c.delta_id
      JOIN psig p ON p.doc_id = c.prior_id
      WHERE ({est_terms}) / {float(K)} >= 0.5
    ), within_cand AS (
{within_band_joins}
    ), dtokset AS (
      SELECT doc_id, LIST_DISTINCT(arr) AS tok FROM dtoks
    ), pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM within_cand c
      JOIN dtokset ta ON ta.doc_id = c.doc_a
      JOIN dtokset tb ON tb.doc_id = c.doc_b
      WHERE CAST(LENGTH(LIST_INTERSECT(ta.tok, tb.tok)) AS DOUBLE)
            / (LENGTH(ta.tok) + LENGTH(tb.tok)
               - LENGTH(LIST_INTERSECT(ta.tok, tb.tok))) >= 0.5
    ), und AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(src, dst) AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ), comp AS (
      SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
      FROM reach GROUP BY src
    ), dup_within AS (
      SELECT doc_id FROM comp WHERE doc_id != component
    ), dropped AS (
      -- DISTINCT wrapper, not bare UNION: measured DuckDB (1.0) quirk —
      -- inside a WITH RECURSIVE statement a LATER CTE's UNION behaves
      -- as UNION ALL, and a doc dropped by BOTH rules would double-count
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id FROM dup_of_prior
        UNION ALL
        SELECT doc_id FROM dup_within
      )
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_delta,
           CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors
    FROM delta LEFT JOIN dropped dr USING (doc_id)
    """


@register(
    "dedup_incremental_portable",
    _incremental_portable_oracle(),
    doc="Incremental MinHash near-dup across corpus versions under the "
        "PORTABLE hash family — prior corpus participates only through "
        "its signature table, cross-version MinHash-estimate drops, "
        "in-delta exact-verify + connected-components canonicals — "
        "fully oracle-gated: DuckDB recomputes both signature tables, "
        "both band joins, the estimate, and the cluster fixpoint "
        "(recursive CTE). Certifies the corpus-versioning shape "
        "end-to-end; dedup_incremental_minhash (xxhash64) stays the "
        "production path.",
)
def dedup_incremental_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    prior_sigs = portable_minhash_signatures(
        lowered_tokens(
            documents.filter(F.col("doc_id") < 250).select("doc_id", "text")
        )
    )
    delta = documents.filter(F.col("doc_id") >= 250).select("doc_id", "text")
    survivors = incremental_portable_minhash_dedup(delta, prior_sigs)
    return (
        delta.join(
            survivors.select("doc_id").withColumn("_s", F.lit(1)),
            "doc_id",
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_delta"),
            F.sum(F.when(F.col("_s").isNull(), 1).otherwise(0))
            .cast("long").alias("n_dropped"),
            F.sum(F.when(F.col("_s").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_survivors"),
        )
    )
