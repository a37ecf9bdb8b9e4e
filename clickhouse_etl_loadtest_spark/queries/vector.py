"""Vector similarity search over the ``embeddings`` table (64-dim float
arrays) — the ANN part of the LLM-pipeline extension (SURVEY.md §7.6).

Three tiers, mirroring how a 100 TB corpus would be served:
- brute-force cosine top-k: the exact baseline. The query set is broadcast;
  the corpus side streams through one narrow projection (no shuffle until the
  per-query top-k, which TakeOrderedAndProject/window-limit bounds).
- threshold near-dup pairs: set semantics (no ranking) — the robust
  dedup-by-embedding operator.
- random-hyperplane LSH buckets + IVF (nearest-centroid) assignment: the
  scale paths that bound candidate generation.

All math is double-precision builtin array expressions (``zip_with`` +
``aggregate``) — JVM codegen, no UDFs; DuckDB oracles use the same fold order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register

DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings", parallel=True)


def _dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold double dot product: sum_i a[i]*b[i].

    Pass column NAMES where possible: the string form is one JVM-parsed
    expression (the Column/lambda form costs ~25 py4j round-trips per use —
    driver plan-construction latency, guide §5). Both parse/analyze to the
    identical fold, so results are bit-for-bit the same.
    """
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column | str) -> Column:
    """sqrt(sum a[i]^2); same string-form contract as :func:`_dot`."""
    if isinstance(a, str):
        return F.expr(
            f"sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (acc, x) -> acc + x))"
        )
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, x: acc + x))


# DuckDB equivalents with the same sequential fold
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), (acc, x) -> acc + x))"
    )


# --- brute-force cosine top-k -----------------------------------------------------

_TOPK = 5
_N_QUERIES = 8  # vec_id < 8 are the query vectors

_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS n_id, embedding AS n_emb, label AS n_label FROM embeddings),
scored AS (
    SELECT q_id, n_id, n_label,
           {_dot_sql('q_emb', 'n_emb')} / ({_norm_sql('q_emb')} * {_norm_sql('n_emb')}) AS cosine
    FROM q JOIN c ON q_id <> n_id
),
ranked AS (
    SELECT q_id, n_id, n_label, cosine,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
    FROM scored
)
SELECT q_id, n_id, n_label, cosine, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_TOPK}
ORDER BY q_id, rnk
"""


@register("ann_cosine_topk", _TOPK_ORACLE, headline=True, extra=True)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: the brute-force ANN baseline.

    Scale: queries broadcast (small side), corpus never shuffles for the
    join; the per-query rank compiles to ``WindowGroupLimit`` with a
    map-side ``Partial`` pass (plan-gated in ``tests/test_plan_quality.py``),
    so each task keeps at most k rows per query BEFORE the exchange — the
    shuffle moves O(k · partitions) rows per query, never a corpus-scale
    window partition. At 100 TB the LSH/IVF variants below pre-filter
    candidates; this operator remains the reranker on the candidate set.

    Norms are computed ONCE per side before the join (higher-order array
    functions are interpreted, not codegen'd — recomputing both norms per
    pair measured ~4x slower); only the dot product remains per-pair.
    """
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_nrm"),
    )
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("label").alias("n_label"),
        _norm("embedding").alias("n_nrm"),
    )
    cosine = _dot("q_emb", "n_emb") / (F.col("q_nrm") * F.col("n_nrm"))
    scored = F.broadcast(q).join(c, F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", "n_label", cosine.alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _TOPK)
        .orderBy("q_id", "rnk")
    )


# --- threshold near-duplicate pairs -------------------------------------------------

_NEAR_DUP_THRESHOLD = 0.40  # fixture embeddings are near-orthogonal (max pair ~0.51)

_NEARDUP_ORACLE = f"""
WITH n AS (
    SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


_NEARDUP_BLOCKS = 8


@register("embedding_near_dup_pairs", _NEARDUP_ORACLE, extra=True)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold set semantics — no
    rank boundary, so float fold-order differences cannot change the result
    set at any realistic threshold margin).

    Executed as the blocked exact matmul join (operators/blockjoin.py): hash
    vectors into blocks, equi-join each block to its partner blocks via a
    broadcast block-pair table, one vectorized BLAS cosine matrix per
    cogrouped block pair — even task sizes, no corpus broadcast, no
    nested-loop join (plan-pinned in tests/test_plan_quality.py).

    Why not LSH candidates -> verify here: at this threshold (0.40) the
    fixture corpus has NO similarity gap (true pairs start at 0.40001,
    background reaches 0.39999), and measured sign-LSH geometries reaching
    recall 1.0 keep >= 97.9% of all pairs as candidates — pruning is
    impossible without recall loss. LSH/IVF (below) remain the approximate
    scale paths for separated thresholds; this is the exact tool.
    tests/test_query_oracles.py asserts equality with the quadratic
    expression form (embedding_near_dup_exact) on the fixtures.
    """
    from ..operators.blockjoin import blocked_cosine_pairs

    e = _emb(spark, sf_dir)
    return blocked_cosine_pairs(
        e, threshold=_NEAR_DUP_THRESHOLD, n_blocks=_NEARDUP_BLOCKS
    ).orderBy("vec_a", "vec_b")


@register("embedding_near_dup_exact", _NEARDUP_ORACLE, extra=True)
def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quadratic expression-form near-dup join: the recall/equality
    baseline for the blocked operator above (and the shape the DuckDB oracle
    mirrors). Small-data only — the inequality join is a nested-loop plan.
    """
    e = _emb(spark, sf_dir)
    n = e.select("vec_id", "embedding", _norm("embedding").alias("nrm"))
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b"))
    cosine = _dot("emb_a", "emb_b") / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= _NEAR_DUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


# --- semantic dedup keep-list (embedding analogue of doc_fuzzy_dedup_keep) ----------

_SEMANTIC_KEEP_ORACLE = f"""
WITH n AS (
    SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
)
SELECT e.vec_id, e.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM embeddings e
ORDER BY e.vec_id
"""


@register("semantic_dedup_keep", _SEMANTIC_KEEP_ORACLE, extra=True)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-based semantic dedup end-to-end: of every near-duplicate
    pair (cosine >= threshold), the lower vec_id survives — the vector twin
    of doc_fuzzy_dedup_keep's keep/drop decision.

    Scale: pairs come from embedding_near_dup_pairs — now the blocked exact
    matmul join (operators/blockjoin.py), so this inherits its even-task,
    no-corpus-broadcast plan; the keep decision is then one join of corpus
    ids against the dropped set — ids only, vectors never shuffle twice.
    """
    e = _emb(spark, sf_dir)
    dropped = (
        embedding_near_dup_pairs(spark, sf_dir)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        e.select("vec_id")
        .join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select("vec_id", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
        .orderBy("vec_id")
    )


# --- int8 symmetric quantization (the storage path for embedding corpora) ------------

_QUANT_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
           embedding
    FROM embeddings
),
err AS (
    SELECT vec_id, label, scale,
           list_transform(generate_series(1, {DIM}),
               i -> abs(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5) * scale
                        - CAST(embedding[i] AS DOUBLE))) AS errs
    FROM q
)
SELECT vec_id, label, scale,
       list_max(errs) AS max_abs_err,
       list_reduce(list_prepend(0.0, errs), (acc, x) -> acc + x * x) / {DIM} AS mse
FROM err
ORDER BY vec_id
"""


@register("embedding_quantize_int8", _QUANT_ORACLE, extra=True)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale = max|x|/127,
    code = floor(x/scale + 0.5) (explicit half-up — identical in both
    engines, unlike round()'s mode differences), reporting reconstruction
    error. The storage pass that shrinks an embedding corpus 4x before
    ANN serving.

    Scale: pure per-row array math, map-only, no shuffle at all; the int8
    codes themselves stay internal here (arrays would defeat the driver's
    canonicalizer) — this query emits the quality audit a deployment reviews.
    """
    e = _emb(spark, sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb_d, lambda x: F.abs(x))) / 127.0
    q = e.select("vec_id", "label", scale.alias("scale"), emb_d.alias("emb"))
    errs = F.transform(
        F.col("emb"),
        lambda x: F.abs(F.floor(x / F.col("scale") + 0.5) * F.col("scale") - x),
    )
    w = q.select("vec_id", "label", "scale", errs.alias("errs"))
    mse = (
        F.aggregate(F.col("errs"), F.lit(0.0), lambda acc, x: acc + x * x) / DIM
    )
    return w.select(
        "vec_id", "label", "scale",
        F.array_max("errs").alias("max_abs_err"),
        mse.alias("mse"),
    ).orderBy("vec_id")


# --- corpus standardization audit (per-dimension stats -> per-vector z-scores) -------

_STDZ_ORACLE = f"""
WITH ve AS (
    SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
stats AS (
    SELECT i, AVG(v) AS mu, sqrt(AVG(v * v) - AVG(v) * AVG(v)) AS sigma
    FROM ve GROUP BY i
),
z AS (
    SELECT vec_id, (v - mu) / sigma AS z
    FROM ve JOIN stats USING (i)
)
SELECT vec_id,
       MAX(abs(z)) AS max_abs_z,
       SUM(z * z) / {DIM} AS mean_z2
FROM z GROUP BY vec_id
ORDER BY vec_id
"""


@register("embedding_standardize_audit", _STDZ_ORACLE, extra=True)
def embedding_standardize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus feature standardization audit: per-dimension mean/std over the
    whole corpus, then each vector's z-score extremum and energy — the
    normalization pass an embedding pipeline runs before quantization or
    whitened ANN, with the outlier signal (max |z|) a curation filter reads.

    Both engines use the SAME moment formula (sigma = sqrt(E[v²] − E[v]²),
    population, no Bessel) so no stddev-implementation differences leak in.

    Scale: the per-dim stats are a posexplode + groupBy(i) — shuffle volume
    O(dim × mappers) after partial aggregation, independent of corpus rows;
    the dim-stats table (dim rows) collapses to ONE broadcast row and the
    z-audit is then pure map-side array math per vector. Corpus never
    shuffles.
    """
    e = _emb(spark, sf_dir)
    ve = e.select("vec_id", F.posexplode("embedding").alias("i0", "v")).select(
        "vec_id", (F.col("i0") + 1).alias("i"), F.col("v").cast("double").alias("v")
    )
    stats = ve.groupBy("i").agg(
        F.avg("v").alias("mu"),
        F.sqrt(F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")).alias("sigma"),
    )
    stats_row = stats.agg(
        F.array_sort(F.collect_list(F.struct("i", "mu", "sigma"))).alias("dims")
    )
    zs = F.zip_with(
        F.col("embedding"),
        F.col("dims"),
        lambda x, d: (x.cast("double") - d["mu"]) / d["sigma"],
    )
    audited = e.crossJoin(F.broadcast(stats_row)).select("vec_id", zs.alias("zs"))
    return audited.select(
        "vec_id",
        F.array_max(F.transform(F.col("zs"), F.abs)).alias("max_abs_z"),
        (F.aggregate(F.col("zs"), F.lit(0.0), lambda acc, z: acc + z * z) / DIM).alias("mean_z2"),
    ).orderBy("vec_id")


# --- random-hyperplane LSH buckets ----------------------------------------------------

_N_PLANES = 12

# deterministic rational hyperplane coefficients shared by both engines:
# coeff(p, i) = (h60('hp<p>_<i>') % 2001 - 1000) / 1000  in [-1, 1].
# Spark-side they are folded to LITERAL arrays at plan-build time — the
# md5 derivation is a pure function of (p, i), so deriving it per ROW (the
# original form: an md5 chain inside a transform() lambda = 768 interpreted
# md5 calls per vector) spent more time minting constants than projecting;
# hashlib reproduces the exact same doubles once on the driver.
def _coeff_py(p: int, i: int) -> float:
    import hashlib

    h = int(hashlib.md5(f"hp{p}_{i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def _coeff_sql(p: int, i_expr: str) -> str:
    h = f"CAST(('0x' || substr(md5('hp{p}_' || CAST({i_expr} AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT"
    return f"CAST({h} % 2001 - 1000 AS DOUBLE) / 1000.0"


_LSH_ORACLE = f"""
WITH proj AS (
    SELECT vec_id, label,
           {", ".join(
               f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
               f"i -> CAST(embedding[i] AS DOUBLE) * ({_coeff_sql(p, 'i')}))), (acc, x) -> acc + x) AS d{p}"
               for p in range(_N_PLANES)
           )}
    FROM embeddings
)
SELECT vec_id, label,
       CAST({" + ".join(f"CASE WHEN d{p} > 0 THEN {1 << p} ELSE 0 END" for p in range(_N_PLANES))} AS INT) AS bucket
FROM proj
ORDER BY vec_id
"""


@register("ann_lsh_buckets", _LSH_ORACLE, extra=True)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH (Charikar 2002 SimHash for vectors): sign of the
    projection onto _N_PLANES fixed hyperplanes packs into a bucket id.
    Near-dup / ANN candidates = same-bucket vectors.

    The hyperplane coefficients derive from md5 (rational arithmetic), so the
    oracle reproduces them bit-exactly — no RNG state to share. Per-row map
    only: embarrassingly parallel, no shuffle; downstream groupBy(bucket)
    bounds candidate pairs at any corpus size.
    """
    e = _emb(spark, sf_dir)
    return _lsh_sig(e, extra_cols=["label"]).orderBy("vec_id")


def _lsh_sig(
    e: DataFrame, extra_cols: list[str] | None = None, dim: int = DIM
) -> DataFrame:
    """(vec_id, bucket) signature frame: the shared map-only projection used
    by ``ann_lsh_buckets`` and the banded bitext candidate generation.

    ``dim`` MUST equal the length of the input ``embedding`` vectors: the
    hyperplane coefficients are plan-time literal arrays of that length, and
    ``zip_with`` silently null-pads a mismatch (every projection would go
    null and all rows would collapse into one bucket). Callers feeding
    anything other than the embeddings table (e.g. the hashed text
    embeddings) must pass their own dim explicitly."""

    def _proj(p: int):
        coeffs = F.array(*[F.lit(_coeff_py(p, i)) for i in range(1, dim + 1)])
        prod = F.zip_with(F.col("embedding"), coeffs, lambda x, cfc: x.cast("double") * cfc)
        return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)

    projs = [_proj(p).alias(f"d{p}") for p in range(_N_PLANES)]
    proj = e.select("vec_id", *(extra_cols or []), *projs)
    bucket = None
    for p in range(_N_PLANES):
        term = F.when(F.col(f"d{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return proj.select(
        "vec_id", *(extra_cols or []), bucket.cast("int").alias("bucket")
    )


# --- IVF nearest-centroid assignment ----------------------------------------------------

_IVF_ORACLE = f"""
WITH expanded AS (
    SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
centroids AS (
    SELECT label AS c_label, i, AVG(v) AS cv
    FROM expanded GROUP BY label, i
),
vec_expanded AS (
    SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
dists AS (
    SELECT vec_id, ve.label, c_label,
           SUM((v - cv) * (v - cv)) AS dist2
    FROM vec_expanded ve JOIN centroids c ON ve.i = c.i
    GROUP BY vec_id, ve.label, c_label
),
ranked AS (
    SELECT vec_id, label, c_label, dist2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rnk
    FROM dists
)
SELECT vec_id, label, CAST(c_label AS INT) AS assigned_label
FROM ranked WHERE rnk = 1
ORDER BY vec_id
"""


def _codebook(e: DataFrame) -> DataFrame:
    """1-row frame holding the whole trained codebook as
    ``cells: array<struct<c_label, c_emb>>`` (labels x dim doubles — KBs).

    Centroid build is a posexplode + groupBy(label, dim) with partial
    aggregation (shuffle is O(labels x dim), independent of corpus size);
    the collect into one row is over the already-tiny centroid table."""
    expanded = e.select("label", F.posexplode("embedding").alias("i", "v")).select(
        "label", (F.col("i") + 1).alias("i"), F.col("v").cast("double").alias("v")
    )
    centroids = expanded.groupBy(F.col("label").alias("c_label"), "i").agg(F.avg("v").alias("cv"))
    cent_arr = (
        centroids.groupBy("c_label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("pairs"))
        .select("c_label", F.transform(F.col("pairs"), lambda s: s["cv"]).alias("c_emb"))
    )
    return cent_arr.agg(
        F.array_sort(F.collect_list(F.struct("c_label", "c_emb"))).alias("cells")
    )


def _cell_dists(cells: Column, emb: Column) -> Column:
    """Per-row distances to every cell, sorted ascending: array of
    struct(dist2, cell) — array_sort on structs compares field-by-field, so
    ties break to the lowest cell id, matching the oracles' ORDER BY."""
    return F.array_sort(
        F.transform(
            cells,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        emb, c["c_emb"], lambda x, cv: (x.cast("double") - cv) * (x.cast("double") - cv)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist2"),
                c["c_label"].alias("cell"),
            ),
        )
    )


@register("ivf_nearest_centroid", _IVF_ORACLE, extra=True)
def ivf_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: per-label centroids (the "trained"
    codebook), each vector assigned to its nearest centroid by squared L2.

    Scale: the codebook collapses to ONE broadcast row; the argmin is a
    per-row array_sort over the cell-distance structs — pure map-side, so
    corpus rows NEVER shuffle for assignment (the earlier shape ranked a
    corpus x labels frame through a vec_id window, which shuffles the whole
    corpus once per assignment pass; tests/test_plan_quality.py now pins the
    window-free form). This is exactly how an IVF index build distributes.
    """
    e = _emb(spark, sf_dir)
    best = _cell_dists(F.col("cells"), F.col("embedding"))[0]["cell"]
    return (
        e.crossJoin(F.broadcast(_codebook(e)))
        .select("vec_id", "label", best.cast("int").alias("assigned_label"))
        .orderBy("vec_id")
    )


# --- IVF probe search: coarse quantize -> probe cells -> exact rerank ----------------

_NPROBE = 3

_IVF_DISTS_SQL = f"""
    SELECT ve.vec_id, c.c_label, SUM((ve.v - c.cv) * (ve.v - c.cv)) AS dist2
    FROM vec_expanded ve JOIN centroids c ON ve.i = c.i
    GROUP BY ve.vec_id, c.c_label
"""

_IVF_SEARCH_ORACLE = f"""
WITH expanded AS (
    SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
centroids AS (
    SELECT label AS c_label, i, AVG(v) AS cv FROM expanded GROUP BY label, i
),
vec_expanded AS (
    SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
dists AS ({_IVF_DISTS_SQL}),
assign AS (
    SELECT vec_id, c_label AS cell FROM (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rnk
        FROM dists
    ) WHERE rnk = 1
),
probes AS (
    SELECT vec_id AS q_id, c_label AS cell FROM (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rnk
        FROM dists WHERE vec_id < {_N_QUERIES}
    ) WHERE rnk <= {_NPROBE}
),
cand AS (
    SELECT p.q_id, a.vec_id AS n_id
    FROM probes p JOIN assign a ON p.cell = a.cell
    WHERE a.vec_id <> p.q_id
),
scored AS (
    SELECT c.q_id, c.n_id, ce.label AS n_label,
           {_dot_sql('qe.embedding', 'ce.embedding')}
             / ({_norm_sql('qe.embedding')} * {_norm_sql('ce.embedding')}) AS cosine
    FROM cand c
    JOIN embeddings qe ON qe.vec_id = c.q_id
    JOIN embeddings ce ON ce.vec_id = c.n_id
)
SELECT q_id, n_id, n_label, cosine, CAST(rnk AS INT) AS rnk
FROM (
    SELECT q_id, n_id, n_label, cosine,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
    FROM scored
) WHERE rnk <= {_TOPK}
ORDER BY q_id, rnk
"""


@register("ivf_search_topk", _IVF_SEARCH_ORACLE, extra=True)
def ivf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF search: coarse-quantize the corpus into centroid cells,
    probe each query's _NPROBE nearest cells, exact-cosine-rerank ONLY the
    candidates in those cells — the composition that replaces brute force at
    100 TB (ann_cosine_topk stays the exact recall baseline).

    Scale: the centroid codebook broadcasts (labels x dim floats), so corpus
    cell assignment is map-only; the probe table (queries x nprobe rows)
    broadcasts onto the assigned corpus, so candidate generation never
    shuffles corpus vectors; per-query candidate counts are bounded by cell
    sizes, and the final rank window partitions by q_id. Compared to the
    brute-force scorer, the scored pair count drops from |corpus| x |queries|
    to the probed cells' population only.
    """
    e = _emb(spark, sf_dir)
    with_cells = e.crossJoin(F.broadcast(_codebook(e))).withColumn(
        "cell_dists", _cell_dists(F.col("cells"), F.col("embedding"))
    )
    assign = with_cells.select(
        F.col("vec_id").alias("n_id"),
        F.col("cell_dists")[0]["cell"].alias("cell"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
        _norm("embedding").alias("n_nrm"),
    )
    probes = (
        with_cells.where(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.transform(F.slice("cell_dists", 1, _NPROBE), lambda s: s["cell"])
            ).alias("cell"),
            F.col("embedding").alias("q_emb"),
            _norm("embedding").alias("q_nrm"),
        )
    )
    cosine = _dot("q_emb", "n_emb") / (F.col("q_nrm") * F.col("n_nrm"))
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", "n_label", cosine.alias("cosine"))
    )
    topk = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        cand.withColumn("rnk", F.row_number().over(topk).cast("int"))
        .where(F.col("rnk") <= _TOPK)
        .orderBy("q_id", "rnk")
    )


# --- ANN quality: recall@k of the probe search vs the exact baseline -----------------

_RECALL_ORACLE = f"""
WITH bf AS ({_TOPK_ORACLE.replace("ORDER BY q_id, rnk", "")}),
ivf AS ({_IVF_SEARCH_ORACLE.replace("ORDER BY q_id, rnk", "")})
SELECT bf.q_id,
       CAST(COUNT(ivf.n_id) AS BIGINT) AS n_hit,
       COUNT(ivf.n_id) * 1.0 / {_TOPK} AS recall_at_{_TOPK}
FROM bf LEFT JOIN ivf ON bf.q_id = ivf.q_id AND bf.n_id = ivf.n_id
GROUP BY bf.q_id
ORDER BY bf.q_id
"""


@register("ann_recall_eval", _RECALL_ORACLE, extra=True)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@_TOPK of the IVF probe search against the exact brute-force
    top-k — the quality dial every ANN deployment tunes (nprobe up = recall
    up = cost up). Composes the two registered operators, so the number
    measures exactly what users of those operators get.

    Scale: both inputs end at |queries| x k rows regardless of corpus size;
    the recall join and per-query aggregate are driver-negligible.
    """
    exact = ann_cosine_topk(spark, sf_dir).select("q_id", "n_id")
    approx = ivf_search_topk(spark, sf_dir).select(
        F.col("q_id").alias("a_q_id"), F.col("n_id").alias("a_n_id")
    )
    hit = (F.col("a_n_id").isNotNull()).cast("int")
    return (
        exact.join(
            approx,
            (F.col("q_id") == F.col("a_q_id")) & (F.col("n_id") == F.col("a_n_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.sum(hit).cast("bigint").alias("n_hit"),
            (F.sum(hit) * 1.0 / _TOPK).alias(f"recall_at_{_TOPK}"),
        )
        .orderBy("q_id")
    )


# --- k-means clustering (iterative; oracle = Lloyd unrolled in SQL) ------------------

_KMEANS_K = 8
_KMEANS_ITERS = 3


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unroll the deterministic Lloyd loop as chained CTEs: init = k lowest
    vec_id vectors, per iteration assign (argmin dist2, ties to lowest
    cluster) then per-cluster per-dim AVG (empty clusters keep their previous
    centroid via COALESCE) — the operators/clustering.py semantics. dist2
    noise from differing float summation order (~1e-15 relative) is absorbed
    by the driver's 9-significant-digit rounding; a near-exact distance TIE
    between two centroids could still flip the discrete argmin across
    engines — accepted residual risk, vanishingly unlikely on real-valued
    embeddings (same class as the accepted centroid-average tolerance)."""
    ctes = [
        f"ve AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v "
        f"FROM embeddings, generate_series(1, {DIM}) AS t(i))",
        f"init AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster "
        f"FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "c0 AS (SELECT cluster, i, v AS cv FROM init JOIN ve USING (vec_id))",
    ]
    for n in range(1, iters + 1):
        ctes.append(
            f"d{n} AS (SELECT ve.vec_id, c.cluster, SUM((ve.v - c.cv) * (ve.v - c.cv)) AS dist2 "
            f"FROM ve JOIN c{n - 1} c ON ve.i = c.i GROUP BY ve.vec_id, c.cluster)"
        )
        ctes.append(
            f"a{n} AS (SELECT vec_id, cluster FROM (SELECT vec_id, cluster, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cluster) AS rnk FROM d{n}) WHERE rnk = 1)"
        )
        ctes.append(
            f"c{n} AS (SELECT p.cluster, p.i, COALESCE(m.cv, p.cv) AS cv FROM c{n - 1} p "
            f"LEFT JOIN (SELECT a.cluster, ve.i, AVG(ve.v) AS cv FROM a{n} a "
            f"JOIN ve ON a.vec_id = ve.vec_id GROUP BY a.cluster, ve.i) m "
            f"ON p.cluster = m.cluster AND p.i = m.i)"
        )
    final = iters + 1
    ctes.append(
        f"d{final} AS (SELECT ve.vec_id, c.cluster, SUM((ve.v - c.cv) * (ve.v - c.cv)) AS dist2 "
        f"FROM ve JOIN c{iters} c ON ve.i = c.i GROUP BY ve.vec_id, c.cluster)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT vec_id, CAST(cluster AS INT) AS cluster, dist2 FROM "
        f"(SELECT vec_id, cluster, dist2, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cluster) AS rnk "
        f"FROM d{final}) WHERE rnk = 1 ORDER BY vec_id"
    )


@register("kmeans_clusters", _kmeans_oracle(_KMEANS_K, _KMEANS_ITERS), extra=True)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus (operators/clustering.py).
    The init and every step are deterministic (k lowest vec_id seeds, argmin
    ties to the lowest cluster id, empty clusters keep their centroid), so
    the iteration unrolls to a single SQL statement for the DuckDB oracle;
    invariants (determinism, coverage, non-increasing cost) are additionally
    pinned in tests/test_clustering.py."""
    from ..operators.clustering import kmeans_fit_assign

    return kmeans_fit_assign(_emb(spark, sf_dir), k=_KMEANS_K, iterations=_KMEANS_ITERS).orderBy("vec_id")


# --- cluster-balanced diversity sampling ---------------------------------------------

# Keep the N most central members of EVERY k-means cluster: the
# "cluster-then-sample-evenly" diversity pass (the selection half of
# SemDeDup-style semantic curation, Abbas et al. 2023 — public): instead of
# sampling the corpus uniformly (which over-represents dense regions), cap
# every semantic cluster at the same budget.
_BALANCE_N = 20


def _cluster_balanced_oracle(k: int, iters: int, n: int) -> str:
    """Wrap the unrolled Lloyd oracle with a per-cluster centrality rank."""
    return f"""
SELECT vec_id, cluster, dist2, rank_in_cluster FROM (
    SELECT vec_id, cluster, dist2,
           ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY dist2, vec_id) AS rank_in_cluster
    FROM ({_kmeans_oracle(k, iters)}) base
) ranked
WHERE rank_in_cluster <= {n}
ORDER BY vec_id
"""


@register(
    "embedding_cluster_balanced_sample",
    _cluster_balanced_oracle(_KMEANS_K, _KMEANS_ITERS, _BALANCE_N),
    extra=True,
)
def embedding_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sample: fit the deterministic k-means (same constants
    as ``kmeans_clusters``), then keep each cluster's _BALANCE_N most
    central vectors (rank by dist2, ties to the lowest vec_id) — equal
    representation per semantic region regardless of cluster population.

    Scale (100 TB): assignment is map-only (codebook in the UDF closure);
    the rank window partitions by cluster, so the sort parallelism is k —
    fine for k in the thousands, but for small k over a huge corpus swap the
    exact rank for a per-cluster dist2 THRESHOLD (approx_percentile at
    n/|cluster|, one k-row broadcast back, map-only filter) — same contract,
    no per-cluster sort. The exact-rank form is the oracle-verifiable twin,
    same pairing discipline as `events_value_quantiles` vs the sketch form.
    Residual cross-engine risk: a near-exact dist2 tie at the rank-_BALANCE_N
    boundary could flip membership — same accepted class as the k-means
    argmin tie (vanishingly unlikely on real-valued embeddings).
    """
    from pyspark.sql import Window

    from ..operators.clustering import kmeans_fit_assign

    assigned = kmeans_fit_assign(_emb(spark, sf_dir), k=_KMEANS_K, iterations=_KMEANS_ITERS)
    w = Window.partitionBy("cluster").orderBy("dist2", "vec_id")
    return (
        assigned.withColumn("rank_in_cluster", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank_in_cluster") <= _BALANCE_N)
        .orderBy("vec_id")
    )


# --- SemDeDup: cluster-bounded semantic dedup (Abbas et al. 2023, public) ------------

_SEMDEDUP_ORACLE = f"""
WITH assigned AS (
    SELECT vec_id, cluster FROM ({_kmeans_oracle(_KMEANS_K, _KMEANS_ITERS)}) base
),
n AS (
    SELECT a.vec_id, a.cluster, e.embedding, {_norm_sql('e.embedding')} AS nrm
    FROM assigned a JOIN embeddings e USING (vec_id)
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
)
SELECT n.vec_id, n.cluster,
       n.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM n
ORDER BY n.vec_id
"""


@register("embedding_semdedup", _SEMDEDUP_ORACLE)
def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup made corpus-tractable by
    BOUNDING the pairwise cosine pass to k-means clusters — near-duplicate
    pairs are only searched WITHIN a cluster, so the quadratic term is
    Σ n_c² instead of n² (the paper's point: at web scale the all-pairs
    pass is impossible; clustering first makes each block small enough to
    compare exhaustively). Within every cluster, of each pair at
    cosine ≥ threshold the lower vec_id survives — the same keep-first
    discipline as ``semantic_dedup_keep`` (the exact global twin, whose
    keep-set this approximates: a near-dup pair split across clusters is
    the method's documented miss).

    Scale: k-means assignment is map-only (k x dim codebook in the
    closure); the pair search shuffles vectors ONCE keyed by cluster and
    the per-cluster join is the bounded block; the keep decision joins ids
    only. The clustered frame localCheckpoints — three consumers (both
    pair sides + the output) must not re-run Lloyd iterations. The
    pairwise rule is ``operators/semstream.py::semdedup_dropped`` — the
    same code the INCREMENTAL twin (``semstream.semdedup_batch``, waves
    against a pinned codebook) applies per wave.
    """
    from ..operators.clustering import kmeans_fit_assign
    from ..operators.semstream import semdedup_dropped

    e = _emb(spark, sf_dir)
    assigned = kmeans_fit_assign(e, k=_KMEANS_K, iterations=_KMEANS_ITERS).select(
        "vec_id", "cluster"
    )
    n = (
        e.join(assigned, "vec_id")
        .select("vec_id", "cluster", "embedding", _norm("embedding").alias("nrm"))
        .localCheckpoint()
    )
    dropped = semdedup_dropped(n, _NEAR_DUP_THRESHOLD)
    return (
        n.select("vec_id", "cluster")
        .join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
        .orderBy("vec_id")
    )


# --- SemDeDup cross-cluster miss, measured --------------------------------------------
# The dedup twin of doc_lsh_recall_curve: embedding_semdedup's documented
# trade (a near-dup pair split across clusters is never compared) deserves a
# NUMBER the pipeline owner can dial. For each cluster count k, what
# fraction of the exact near-dup pairs stay within a cluster (pair_recall),
# and what fraction of the exact drop-set the cluster-bounded rule still
# drops (drop_recall)? The cosine pass runs ONCE (the exact pair set);
# per-k work is two id-keyed joins against that fixed pair list — recall
# always falls as k grows, which is exactly the dial: k buys Σ n_c² speed
# at measured recall cost.

_SEMDEDUP_RECALL_KS = (2, 4, 8, 16)


def _semdedup_recall_oracle(ks: tuple, iters: int) -> str:
    asg = [
        f"asg{k} AS (SELECT vec_id, cluster FROM ({_kmeans_oracle(k, iters)}) base)"
        for k in ks
    ]
    rows = [
        f"SELECT CAST({k} AS BIGINT) AS k, "
        f"(SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) FROM "
        f"(SELECT COUNT(*) AS n FROM asg{k} GROUP BY cluster)) AS pairs_checked, "
        f"CAST(COUNT(*) AS BIGINT) AS n_pairs_within, "
        f"CAST(COUNT(DISTINCT p.vb) AS BIGINT) AS n_dropped "
        f"FROM exact_pairs p JOIN asg{k} x ON p.va = x.vec_id "
        f"JOIN asg{k} y ON p.vb = y.vec_id AND x.cluster = y.cluster"
        for k in ks
    ]
    asg_sql = ",\n".join(asg)
    per_k_sql = " UNION ALL ".join(rows)
    return f"""
WITH n AS (
    SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings
),
exact_pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
),
ex AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_exact,
           CAST(COUNT(DISTINCT vb) AS BIGINT) AS n_dropped_exact
    FROM exact_pairs
),
{asg_sql},
per_k AS ({per_k_sql})
SELECT p.k, p.pairs_checked, e.n_pairs_exact, p.n_pairs_within,
       e.n_dropped_exact, p.n_dropped,
       ROUND(p.n_pairs_within * 1.0 / NULLIF(e.n_pairs_exact, 0), 6) AS pair_recall,
       ROUND(p.n_dropped * 1.0 / NULLIF(e.n_dropped_exact, 0), 6) AS drop_recall
FROM per_k p, ex e
ORDER BY p.k
"""


@register(
    "embedding_semdedup_recall",
    _semdedup_recall_oracle(_SEMDEDUP_RECALL_KS, _KMEANS_ITERS),
)
def embedding_semdedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the cluster-bounded SemDeDup drop-set vs the exact global
    twin, as a function of the cluster count k — one row per k in
    ``_SEMDEDUP_RECALL_KS``: how many exact near-dup pairs survive within a
    cluster (``pair_recall``) and how much of ``semantic_dedup_keep``'s
    drop-set the bounded rule reproduces (``drop_recall``) — beside the
    COST side of the same dial, ``pairs_checked`` = Σ n_c·(n_c−1)/2, the
    within-cluster pairs the bounded pass actually scores at that k. The
    cluster-bounded drop-set is a SUBSET of the exact one by construction,
    so recall is the whole story (precision is always 1).

    Scale: the exact cosine pass runs once (the blocked pair join —
    localCheckpointed, reused by every k); each k adds a Lloyd fit plus two
    id-keyed joins of the fixed pair list against the assignment — ids
    only, vectors never re-shuffle per k.
    """
    from ..operators.clustering import kmeans_fit_assign

    e = _emb(spark, sf_dir)
    pairs = (
        embedding_near_dup_pairs(spark, sf_dir)
        .select("vec_a", "vec_b")
        .localCheckpoint()  # reused by ex + every per-k join below
    )
    ex = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs_exact"),
        F.count_distinct("vec_b").alias("n_dropped_exact"),
    )
    def _row_for_k(k: int) -> DataFrame:
        assigned = kmeans_fit_assign(e, k=k, iterations=_KMEANS_ITERS).select(
            "vec_id", "cluster"
        ).localCheckpoint()  # three consumers below; never re-run Lloyd
        # the COST side of the dial: how many within-cluster pairs the
        # bounded pass must actually score at this k (Σ n_c·(n_c−1)/2)
        cost = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(F.col("n") * (F.col("n") - 1) / 2)
                .cast("bigint")
                .alias("pairs_checked")
            )
        )
        x = assigned.select(F.col("vec_id").alias("vec_a"), F.col("cluster").alias("_ca"))
        y = assigned.select(F.col("vec_id").alias("vec_b"), F.col("cluster").alias("_cb"))
        return (
            pairs.join(x, "vec_a")
            .join(y, "vec_b")
            .where(F.col("_ca") == F.col("_cb"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs_within"),
                F.count_distinct("vec_b").alias("n_dropped"),
            )
            .crossJoin(F.broadcast(cost))
            .select(
                F.lit(k).cast("bigint").alias("k"),
                "pairs_checked",
                "n_pairs_within",
                "n_dropped",
            )
        )

    # The per-k Lloyd fits are INDEPENDENT driver-side loops of small jobs
    # (5 centroid collects + 2 checkpoints each); run them from a thread
    # pool so their jobs overlap on the cluster (guide §2.6) instead of
    # paying ~28 sequential job latencies. Results are deterministic per k;
    # the final orderBy("k") pins the output order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_SEMDEDUP_RECALL_KS)) as pool:
        rows = list(pool.map(_row_for_k, _SEMDEDUP_RECALL_KS))
    per_k = rows[0]
    for r in rows[1:]:
        per_k = per_k.unionByName(r)
    return (
        per_k.crossJoin(F.broadcast(ex))
        .select(
            "k",
            "pairs_checked",
            "n_pairs_exact",
            "n_pairs_within",
            "n_dropped_exact",
            "n_dropped",
            F.round(
                F.col("n_pairs_within") * 1.0 / F.nullif(F.col("n_pairs_exact"), F.lit(0)),
                6,
            ).alias("pair_recall"),
            F.round(
                F.col("n_dropped") * 1.0 / F.nullif(F.col("n_dropped_exact"), F.lit(0)),
                6,
            ).alias("drop_recall"),
        )
        .orderBy("k")
    )


# --- bounded (kept-representatives) incremental SemDeDup, recall measured ------------
# The incremental twin (operators/semstream.py) pays O(all seen history) per
# wave for exact batch parity — measured linear growth at the sf1.0 wave.
# The production relaxation compares each wave only against SURVIVORS; this
# query puts the resulting recall delta beside the exact form, per wave, on
# the corpus: the kept-mode drop set is a SUBSET of the exact one (with
# vec_id-contiguous waves a kept earlier survivor is an earlier seen
# vector), so drop_recall per wave is the whole story — the dial the
# pipeline owner reads before flipping compare="kept" on a long stream.

_SEMDEDUP_N_WAVES = 3


def _semdedup_bounded_oracle(n_waves: int, k: int, iters: int, thr: float) -> str:
    cos = f"{_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)"
    ctes = [
        f"asg AS (SELECT vec_id, cluster FROM ({_kmeans_oracle(k, iters)}) base)",
        "mx AS (SELECT MAX(vec_id) AS mx FROM embeddings)",
        f"n AS (SELECT e.vec_id, a.cluster, e.embedding, {_norm_sql('e.embedding')} AS nrm, "
        f"CAST((e.vec_id * {n_waves}) // (m.mx + 1) AS INT) AS wave "
        f"FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id, mx m)",
        f"exact_drop AS (SELECT DISTINCT b.vec_id FROM n a JOIN n b "
        f"ON a.cluster = b.cluster AND a.vec_id < b.vec_id WHERE {cos} >= {thr})",
    ]
    kept_union = []
    for w in range(n_waves):
        within = (
            f"SELECT b.vec_id FROM n a JOIN n b ON a.cluster = b.cluster "
            f"AND a.vec_id < b.vec_id AND a.wave = {w} AND b.wave = {w} "
            f"WHERE {cos} >= {thr}"
        )
        if kept_union:
            kept = " UNION ALL ".join(f"SELECT * FROM k{i}" for i in range(w))
            vs_kept = (
                f"SELECT b.vec_id FROM ({kept}) a JOIN n b "
                f"ON a.cluster = b.cluster AND b.wave = {w} WHERE {cos} >= {thr}"
            )
            ctes.append(
                f"d{w} AS (SELECT DISTINCT vec_id FROM ({within} UNION ALL {vs_kept}))"
            )
        else:
            ctes.append(f"d{w} AS (SELECT DISTINCT vec_id FROM ({within}))")
        ctes.append(
            f"k{w} AS (SELECT * FROM n WHERE wave = {w} "
            f"AND vec_id NOT IN (SELECT vec_id FROM d{w}))"
        )
        kept_union.append(f"k{w}")
    bounded = " UNION ".join(f"SELECT vec_id FROM d{w}" for w in range(n_waves))
    ctes.append(f"bounded AS ({bounded})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT wave, n_vecs, dropped_exact, dropped_bounded,
       ROUND(dropped_bounded * 1.0 / NULLIF(dropped_exact, 0), 6) AS drop_recall
FROM (
    SELECT CAST(n.wave AS BIGINT) AS wave,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) FILTER (WHERE n.vec_id IN (SELECT vec_id FROM exact_drop))
               AS BIGINT) AS dropped_exact,
           CAST(COUNT(*) FILTER (WHERE n.vec_id IN (SELECT vec_id FROM bounded))
               AS BIGINT) AS dropped_bounded
    FROM n GROUP BY n.wave
)
ORDER BY wave
"""
    )


@register(
    "embedding_semdedup_bounded",
    _semdedup_bounded_oracle(
        _SEMDEDUP_N_WAVES, _KMEANS_K, _KMEANS_ITERS, _NEAR_DUP_THRESHOLD
    ),
)
def embedding_semdedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-wave recall of the BOUNDED incremental SemDeDup (compare each
    wave only against earlier SURVIVORS — ``semstream.semdedup_batch``'s
    ``compare="kept"`` mode, the O(kept) production relaxation of the
    O(all seen) exact-parity form) vs the exact cluster-bounded drop set,
    over ``_SEMDEDUP_N_WAVES`` contiguous vec_id waves: wave 0 is always
    exact (nothing precedes it); later waves lose only transitive-chain
    drops (a newcomer whose every near neighbor was itself dropped). The
    bounded drop set is a subset of the exact one by construction, so
    ``drop_recall`` per wave is the whole dial.

    Scale: assignment is one Lloyd fit; the wave split is a 1-row max
    broadcast (NO global window); the bounded fold is
    ``operators/semstream.py::semdedup_bounded_verdicts`` — per wave one
    cluster-keyed join against the (smaller) survivor set instead of all
    seen history, exactly what a months-long stream pays.
    """
    from ..operators.clustering import kmeans_fit_assign
    from ..operators.semstream import semdedup_bounded_verdicts, semdedup_dropped

    e = _emb(spark, sf_dir)
    assigned = kmeans_fit_assign(e, k=_KMEANS_K, iterations=_KMEANS_ITERS).select(
        "vec_id", "cluster"
    )
    mx = e.agg(F.max("vec_id").alias("mx"))
    n = (
        e.join(assigned, "vec_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "vec_id",
            "cluster",
            "embedding",
            _norm("embedding").alias("nrm"),
            F.expr(f"CAST((vec_id * {_SEMDEDUP_N_WAVES}) DIV (mx + 1) AS INT)").alias(
                "wave"
            ),
        )
        .localCheckpoint()  # exact arm + every bounded wave reuse the assign
    )
    exact_drop = semdedup_dropped(n, _NEAR_DUP_THRESHOLD)
    bounded = semdedup_bounded_verdicts(n, _NEAR_DUP_THRESHOLD, _SEMDEDUP_N_WAVES)
    return (
        n.select("vec_id", "wave")
        .join(exact_drop.withColumn("_de", F.lit(True)), "vec_id", "left")
        .join(
            bounded.select("vec_id", (~F.col("keep")).alias("_db")),
            "vec_id",
        )
        .groupBy(F.col("wave").cast("bigint").alias("wave"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count(F.when(F.col("_de"), 1)).alias("dropped_exact"),
            F.count(F.when(F.col("_db"), 1)).alias("dropped_bounded"),
        )
        .select(
            "wave",
            "n_vecs",
            "dropped_exact",
            "dropped_bounded",
            F.round(
                F.col("dropped_bounded")
                * 1.0
                / F.nullif(F.col("dropped_exact"), F.lit(0)),
                6,
            ).alias("drop_recall"),
        )
        .orderBy("wave")
    )


# --- PCA residual audit (decorrelation screening before quantization/IVF) ------------

_PCA_K = 8

# moments are deterministic per fixture (DECIMAL sums) — one covariance pass
# per session however many times the query runs (same memo pattern as the
# BPE merge table / logreg weights)
_PCA_CACHE: dict[str, tuple] = {}


@register("embedding_pca_residuals", None, extra=True)
def embedding_pca_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA energy audit: fit the top-_PCA_K principal components of the
    embedding corpus (operators/pca.py — one DECIMAL-summed moment pass +
    driver-side eigh), then score every vector's centered energy split into
    captured-by-top-k vs residual — the outlier/intrinsic-dimension signal
    an embedding pipeline checks before PCA-whitened quantization or IVF.

    All outputs are squared projections, so they are invariant to the
    eigenbasis sign ambiguity.

    Why this stays rows-only (no DuckDB value oracle — the documented
    non-expressibility proof): ``total_energy`` alone is SQL-recomputable
    (DECIMAL moment sums), but ``topk_energy`` requires the top-8
    eigenvectors of the 64x64 covariance. SQL has no eigensolver; unrolling
    power iteration + deflation as CTEs computes a DIFFERENT float
    trajectory than LAPACK ``eigh`` (divide-and-conquer on the
    tridiagonalized matrix), so their results agree only to iterative-
    convergence tolerance, not to the 9-significant-digit hash the driver
    uses — and swapping the operator itself to power iteration to match the
    oracle would trade the numerically right tool for a checkable one.
    The value-level check lives in tests/test_pca.py instead: a numpy twin
    on identical moment arithmetic, bit-stable across partitionings.
    """
    from ..operators.pca import covariance_moments, pca_residuals, top_components

    if sf_dir not in _PCA_CACHE:
        _, mean, cov = covariance_moments(_emb(spark, sf_dir))
        _, comps = top_components(cov, _PCA_K)
        _PCA_CACHE[sf_dir] = (mean, comps)
    mean, comps = _PCA_CACHE[sf_dir]
    return pca_residuals(_emb(spark, sf_dir), mean, comps).orderBy("vec_id")


_PCA_ENERGY_ORACLE = f"""
WITH ve AS (
    SELECT i, CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
              / (SELECT COUNT(*) FROM embeddings) AS mu
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
    GROUP BY i
),
means AS (SELECT list(mu ORDER BY i) AS mus FROM ve)
SELECT vec_id, label,
       list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, {DIM}),
               i -> (CAST(embedding[i] AS DOUBLE) - mus[i])
                    * (CAST(embedding[i] AS DOUBLE) - mus[i]))),
           (acc, x) -> acc + x) AS total_energy
FROM embeddings, means
ORDER BY vec_id
"""


@register("embedding_pca_energy_total", _PCA_ENERGY_ORACLE, extra=True)
def embedding_pca_energy_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-expressible external surface of the PCA capability
    (``embedding_pca_residuals`` stays rows-only — its docstring carries the
    eigensolver non-expressibility proof): per-vector centered TOTAL energy
    against the SAME DECIMAL-summed corpus mean the covariance pass uses
    (operators/pca.py::covariance_moments, shared memo). The eigenbasis
    split is pinned separately: captured + residual == total, per vector,
    in tests/test_pca.py — so the driver hash-checks the moment arithmetic
    while pytest pins the eigen split against the numpy twin.

    Scale: the mean is one posexplode + groupBy(i) — shuffle volume
    O(dim x mappers) after partial aggregation; the energy itself is
    map-only array math with the dim-size mean literal folded into the
    plan. Corpus never shuffles.
    """
    from ..operators.pca import covariance_moments

    if sf_dir not in _PCA_CACHE:
        from ..operators.pca import top_components

        _, mean, cov = covariance_moments(_emb(spark, sf_dir))
        _, comps = top_components(cov, _PCA_K)
        _PCA_CACHE[sf_dir] = (mean, comps)
    mean, _ = _PCA_CACHE[sf_dir]
    centered = F.zip_with(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    total = F.aggregate(centered, F.lit(0.0), lambda acc, x: acc + x * x)
    return (
        _emb(spark, sf_dir)
        .select("vec_id", "label", total.alias("total_energy"))
        .orderBy("vec_id")
    )


# --- product quantization: train / encode / ADC search -------------------------------

_PQ_M, _PQ_KSUB, _PQ_ITERS = 8, 16, 3

# codebooks are deterministic per fixture — train once per session (same
# memo pattern as the BPE merge table / k-means-adjacent caches)
_PQ_CACHE: dict[str, list] = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    from ..operators.pq import pq_train

    if sf_dir not in _PQ_CACHE:
        _PQ_CACHE[sf_dir] = pq_train(
            _emb(spark, sf_dir), m=_PQ_M, ksub=_PQ_KSUB, iterations=_PQ_ITERS
        )
    return _PQ_CACHE[sf_dir]


def _query_vectors(spark: SparkSession, sf_dir: str) -> list:
    """The standard query set (vec_id < _N_QUERIES) as [(q_id, vector)] —
    shared by every trained-search query so the set is defined once."""
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in _emb(spark, sf_dir)
        .where(F.col("vec_id") < _N_QUERIES)
        .orderBy("vec_id")
        .collect()
    ]


def _pq_ctes(m: int, ksub: int, iters: int) -> str:
    """Unroll joint-Lloyd PQ training + encode + query distance tables as
    chained MATERIALIZED CTEs — the ``_kmeans_oracle`` pattern applied to
    ``operators/pq.py`` with sub_id as an extra group key (all m subspaces
    train in the same CTE chain, mirroring the joint loop). Determinism
    carries over exactly: init = the ksub lowest-vec_id subvectors, argmin
    ties to the lowest cluster (numpy first-min ≡ ORDER BY d2, cluster),
    empty codes keep their codeword (COALESCE). Residual cross-engine float
    wobble (AVG partial-sum order, numpy pairwise vs SQL sequential sums)
    sits ~13 orders below the distances — same accepted class as
    ``_kmeans_oracle``, driver-green since round 2. MATERIALIZED for the
    same reason as ``_logreg_oracle``: pcb{{t-1}} is referenced twice per
    iteration, so inlining would expand exponentially."""
    dsub = DIM // m
    ctes = [
        f"sve AS MATERIALIZED (SELECT vec_id, CAST((i - 1) // {dsub} AS INT) AS sub_id, "
        f"CAST((i - 1) % {dsub} AS INT) AS j, CAST(embedding[i] AS DOUBLE) AS v "
        f"FROM embeddings, generate_series(1, {DIM}) AS t(i))",
        f"seed_ids AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster "
        f"FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub}))",
        "pcb0 AS MATERIALIZED (SELECT s.cluster, v.sub_id, v.j, v.v AS cv "
        "FROM seed_ids s JOIN sve v USING (vec_id))",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"pd{t} AS MATERIALIZED (SELECT ve.vec_id, ve.sub_id, c.cluster, "
            f"SUM((ve.v - c.cv) * (ve.v - c.cv)) AS d2 "
            f"FROM sve ve JOIN pcb{t - 1} c ON ve.sub_id = c.sub_id AND ve.j = c.j "
            f"GROUP BY ve.vec_id, ve.sub_id, c.cluster)"
        )
        ctes.append(
            f"pa{t} AS MATERIALIZED (SELECT vec_id, sub_id, cluster FROM ("
            f"SELECT vec_id, sub_id, cluster, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id ORDER BY d2, cluster) AS rnk "
            f"FROM pd{t}) WHERE rnk = 1)"
        )
        ctes.append(
            f"pcb{t} AS MATERIALIZED (SELECT p.cluster, p.sub_id, p.j, COALESCE(mu.cv, p.cv) AS cv "
            f"FROM pcb{t - 1} p LEFT JOIN ("
            f"SELECT a.cluster, a.sub_id, v.j, AVG(v.v) AS cv "
            f"FROM pa{t} a JOIN sve v ON a.vec_id = v.vec_id AND a.sub_id = v.sub_id "
            f"GROUP BY a.cluster, a.sub_id, v.j) mu "
            f"ON p.cluster = mu.cluster AND p.sub_id = mu.sub_id AND p.j = mu.j)"
        )
    # encode with the FINAL codebook (pq_encode runs one more assignment pass)
    ctes.append(
        f"pdF AS MATERIALIZED (SELECT ve.vec_id, ve.sub_id, c.cluster, "
        f"SUM((ve.v - c.cv) * (ve.v - c.cv)) AS d2 "
        f"FROM sve ve JOIN pcb{iters} c ON ve.sub_id = c.sub_id AND ve.j = c.j "
        f"GROUP BY ve.vec_id, ve.sub_id, c.cluster)"
    )
    ctes.append(
        "pq_codes AS MATERIALIZED (SELECT vec_id, sub_id, cluster FROM ("
        "SELECT vec_id, sub_id, cluster, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id ORDER BY d2, cluster) AS rnk "
        "FROM pdF) WHERE rnk = 1)"
    )
    # per-query ADC tables: distance of each query subvector to each codeword
    ctes.append(
        f"qtab AS MATERIALIZED (SELECT q.vec_id AS q_id, q.sub_id, c.cluster, "
        f"SUM((q.v - c.cv) * (q.v - c.cv)) AS td "
        f"FROM sve q JOIN pcb{iters} c ON q.sub_id = c.sub_id AND q.j = c.j "
        f"WHERE q.vec_id < {_N_QUERIES} GROUP BY q.vec_id, q.sub_id, c.cluster)"
    )
    return ",\n".join(ctes)


def _pq_adc_oracle(m: int, ksub: int, iters: int, k: int) -> str:
    return f"""
WITH {_pq_ctes(m, ksub, iters)},
scored AS (
    SELECT t.q_id, a.vec_id, SUM(t.td) AS adist
    FROM pq_codes a JOIN qtab t ON a.sub_id = t.sub_id AND a.cluster = t.cluster
    GROUP BY t.q_id, a.vec_id
)
SELECT CAST(q_id AS INT) AS q_id, vec_id, adist, CAST(rnk AS INT) AS rank
FROM (
    SELECT q_id, vec_id, adist,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rnk
    FROM scored
) WHERE rnk <= {k}
ORDER BY q_id, rank
"""


def _ivfpq_oracle(m: int, ksub: int, iters: int, k: int) -> str:
    # coarse half verbatim from _IVF_SEARCH_ORACLE (driver-green r2-r4),
    # fine half from the PQ chain above
    return f"""
WITH expanded AS (
    SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
centroids AS (
    SELECT label AS c_label, i, AVG(v) AS cv FROM expanded GROUP BY label, i
),
vec_expanded AS (
    SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, generate_series(1, {DIM}) AS t(i)
),
dists AS ({_IVF_DISTS_SQL}),
assign AS (
    SELECT vec_id, c_label AS cell FROM (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rnk
        FROM dists
    ) WHERE rnk = 1
),
probes AS (
    SELECT vec_id AS q_id, c_label AS cell FROM (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rnk
        FROM dists WHERE vec_id < {_N_QUERIES}
    ) WHERE rnk <= {_NPROBE}
),
cand AS (
    SELECT p.q_id, a.vec_id
    FROM probes p JOIN assign a ON p.cell = a.cell
    WHERE a.vec_id <> p.q_id
),
{_pq_ctes(m, ksub, iters)},
scored AS (
    SELECT c.q_id, c.vec_id, SUM(t.td) AS adist
    FROM cand c
    JOIN pq_codes kc ON kc.vec_id = c.vec_id
    JOIN qtab t ON t.q_id = c.q_id AND t.sub_id = kc.sub_id AND t.cluster = kc.cluster
    GROUP BY c.q_id, c.vec_id
)
SELECT q_id, vec_id, adist, CAST(rnk AS INT) AS rank
FROM (
    SELECT q_id, vec_id, adist,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rnk
    FROM scored
) WHERE rnk <= {k}
ORDER BY q_id, rank
"""


@register("pq_adc_search_topk", _pq_adc_oracle(_PQ_M, _PQ_KSUB, _PQ_ITERS, _TOPK), extra=True)
def pq_adc_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN end-to-end (operators/pq.py): train per-subspace
    codebooks (joint Lloyd, one corpus scan per iteration for all _PQ_M
    subspaces), encode the corpus to _PQ_M-byte codes, and answer the
    standard query set (vec_id < _N_QUERIES) by ADC — each corpus row
    scored with _PQ_M table lookups per query, queries riding the UDF
    closure as precomputed distance tables.

    This is the memory-side half of IVF-PQ, the standard 100 TB ANN layout
    (compose with ``ivf_search_topk``'s coarse cells). VALUE-checked since
    round 5: ``_pq_adc_oracle`` unrolls the joint-Lloyd training, encode,
    and ADC table math as chained CTEs, so the driver hashes (q_id, vec_id,
    adist, rank) rows. The training loop and recall floor remain
    differentially tested against a numpy twin in tests/test_pq.py.
    """
    from ..operators.pq import pq_adc_topk, pq_encode

    e = _emb(spark, sf_dir)
    cb = _pq_codebooks(spark, sf_dir)
    return pq_adc_topk(pq_encode(e, cb), cb, _query_vectors(spark, sf_dir), k=_TOPK)


@register("ivfpq_search_topk", _ivfpq_oracle(_PQ_M, _PQ_KSUB, _PQ_ITERS, _TOPK), extra=True)
def ivfpq_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end — the full 100 TB ANN layout composed from its two
    verified halves: coarse IVF cells gate candidates (each query probes its
    _NPROBE nearest cells; same broadcast-codebook machinery as
    ``ivf_search_topk``), then candidates rank by PQ ADC distance (m table
    lookups per pair via ``operators/pq.py::adc_distance_col``) instead of
    exact vectors — at scale only the m-byte codes ride the candidate join,
    the float corpus is never touched at query time.

    Output (q_id, vec_id, adist, rank); self-matches excluded like
    ``ivf_search_topk``. VALUE-checked since round 5 (``_ivfpq_oracle`` =
    the driver-green coarse-cell SQL composed with the unrolled PQ chain);
    invariants and the numpy ADC twin stay pinned in tests/test_pq.py.
    """
    from ..operators.pq import adc_distance_col, pq_encode

    e = _emb(spark, sf_dir)
    cb = _pq_codebooks(spark, sf_dir)
    queries = _query_vectors(spark, sf_dir)
    with_cells = e.crossJoin(F.broadcast(_codebook(e))).withColumn(
        "cell_dists", _cell_dists(F.col("cells"), F.col("embedding"))
    )
    assign = pq_encode(with_cells, cb).select(
        F.col("vec_id").alias("n_id"),
        F.col("cell_dists")[0]["cell"].alias("cell"),
        "codes",
    )
    probes = with_cells.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.explode(
            F.transform(F.slice("cell_dists", 1, _NPROBE), lambda s: s["cell"])
        ).alias("cell"),
    )
    adist = adc_distance_col(cb, queries)
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", F.col("n_id").alias("vec_id"), adist(F.col("codes"), F.col("q_id")).alias("adist"))
    )
    topk = Window.partitionBy("q_id").orderBy("adist", "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(topk).cast("int"))
        .where(F.col("rank") <= _TOPK)
        .orderBy("q_id", "rank")
    )


# --- hybrid text+vector retrieval (reciprocal rank fusion) ---------------------------

# RRF (Cormack et al. 2009): score(d) = sum over systems of 1/(k + rank_d),
# k=60 the standard damping. Items carry both modalities via the fixtures'
# id convention (doc_id == vec_id where both exist). Each side is cut to its
# own top-K FIRST (TakeOrdered — at corpus scale you fuse top-k lists, never
# full rankings), so the rank windows run over <= K rows.
_RRF_K = 60
_RRF_TOPK = 50
_RRF_QUERY_VEC = 0  # vec_id of the query embedding

_HYBRID_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{{TOKEN_RE}}') AS t FROM documents
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
hits AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(t) AS token FROM toks)
    WHERE token IN {{BM25_IN}}
    GROUP BY doc_id, token
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY token),
bm AS (
    SELECT h.doc_id AS item_id,
           CAST(SUM(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * h.tf * ({{K1}} + 1.0)
               / (h.tf + {{K1}} * (1.0 - {{B}} + {{B}} * d.dl / avgdl))
           AS DECIMAL(38,18))) AS DOUBLE) AS bm25
    FROM hits h JOIN df USING (token) JOIN dl d USING (doc_id), stats
    GROUP BY h.doc_id
),
t_top AS (SELECT * FROM bm ORDER BY bm25 DESC, item_id LIMIT {_RRF_TOPK}),
t_rank AS (
    SELECT item_id,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, item_id) AS INT) AS text_rank
    FROM t_top
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}),
cos AS (
    SELECT vec_id AS item_id,
           {{DOT}} / ({{QNORM}} * {{CNORM}}) AS cosine
    FROM embeddings, q WHERE vec_id <> {_RRF_QUERY_VEC}
),
v_top AS (SELECT * FROM cos ORDER BY cosine DESC, item_id LIMIT {_RRF_TOPK}),
v_rank AS (
    SELECT item_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, item_id) AS INT) AS vec_rank
    FROM v_top
)
SELECT COALESCE(t.item_id, v.item_id) AS item_id,
       t.text_rank, v.vec_rank,
       COALESCE(1.0 / ({_RRF_K} + t.text_rank), 0.0)
       + COALESCE(1.0 / ({_RRF_K} + v.vec_rank), 0.0) AS rrf
FROM t_rank t FULL OUTER JOIN v_rank v USING (item_id)
ORDER BY item_id
"""


def _hybrid_oracle() -> str:
    from .text import _BM25_B, _BM25_K1, _BM25_QUERY, _sql_in, TOKEN_RE

    return _HYBRID_ORACLE.format(
        TOKEN_RE=TOKEN_RE,
        BM25_IN=_sql_in(_BM25_QUERY),
        K1=_BM25_K1,
        B=_BM25_B,
        DOT=_dot_sql("q_emb", "embedding"),
        QNORM=_norm_sql("q_emb"),
        CNORM=_norm_sql("embedding"),
    )


@register("hybrid_search_rrf", _hybrid_oracle(), extra=True)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse BM25 text ranks (``doc_bm25_scores``) with
    exact-cosine vector ranks via reciprocal rank fusion
    (1/(60+rank), Cormack et al. 2009) — the standard first-stage ranker of
    a RAG / retrieval pipeline, here over the fixtures' shared id space
    (doc_id == vec_id where both modalities exist).

    Scale: each side cuts to its own top-K first — TakeOrderedAndProject on
    the corpus, so the only unpartitioned windows run over <= K rows (rank
    assignment inside a driver-sized list, exactly how production fusion
    works). The fuse itself is a K-row full outer join. BM25 sums are
    DECIMAL-exact, so the cut order is partition-independent.
    """
    from .text import doc_bm25_scores

    t_top = (
        doc_bm25_scores(spark, sf_dir)
        .select(F.col("doc_id").alias("item_id"), "bm25")
        .orderBy(F.desc("bm25"), "item_id")
        .limit(_RRF_TOPK)
    )
    t_rank = t_top.withColumn(
        "text_rank",
        F.row_number().over(Window.orderBy(F.desc("bm25"), "item_id")).cast("int"),
    ).select("item_id", "text_rank")

    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_norm"),
    )
    cos = (
        e.where(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("item_id"),
            (_dot("q_emb", "embedding") / (F.col("q_norm") * _norm("embedding"))).alias("cosine"),
        )
    )
    v_top = cos.orderBy(F.desc("cosine"), "item_id").limit(_RRF_TOPK)
    v_rank = v_top.withColumn(
        "vec_rank",
        F.row_number().over(Window.orderBy(F.desc("cosine"), "item_id")).cast("int"),
    ).select("item_id", "vec_rank")

    rrf = F.coalesce(1.0 / (_RRF_K + F.col("text_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)
    )
    return (
        t_rank.join(v_rank, "item_id", "full_outer")
        .select("item_id", "text_rank", "vec_rank", rrf.alias("rrf"))
        .orderBy("item_id")
    )


# --- margin-based bitext mining -------------------------------------------------------
# Mining parallel sentence/document pairs from two monolingual corpora by
# embedding similarity (CCMatrix / WikiMatrix): raw cosine over-selects hub
# vectors, so each candidate is scored by its MARGIN — cosine divided by the
# mean of both endpoints' k-NN cosines (Artetxe & Schwenk 2019, "ratio"
# margin) — and only MUTUAL best matches above a threshold are mined. The
# two deterministic vec_id-parity halves of the embeddings table stand in
# for the two languages' corpora.

_BITEXT_K = 4  # k-NN pool for the margin denominator (Artetxe & Schwenk use 4)
_BITEXT_THRESH = 1.01  # mined-pair margin cutoff

_BITEXT_ORACLE = f"""
WITH x AS (SELECT vec_id AS x_id, embedding AS x_emb, {_norm_sql('embedding')} AS x_nrm
           FROM embeddings WHERE vec_id % 2 = 0),
y AS (SELECT vec_id AS y_id, embedding AS y_emb, {_norm_sql('embedding')} AS y_nrm
      FROM embeddings WHERE vec_id % 2 = 1),
scored AS (
    SELECT x_id, y_id,
           {_dot_sql('x_emb', 'y_emb')} / (x_nrm * y_nrm) AS cosine
    FROM x CROSS JOIN y
),
rnk AS (
    SELECT x_id, y_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cosine DESC, y_id) AS rx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cosine DESC, x_id) AS ry
    FROM scored
),
mx AS (SELECT x_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / {_BITEXT_K}
               AS knn_x
       FROM rnk WHERE rx <= {_BITEXT_K} GROUP BY x_id),
my AS (SELECT y_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / {_BITEXT_K}
               AS knn_y
       FROM rnk WHERE ry <= {_BITEXT_K} GROUP BY y_id),
m AS (
    SELECT s.x_id, s.y_id, s.cosine,
           s.cosine / ((mx.knn_x + my.knn_y) / 2) AS margin
    FROM scored s JOIN mx USING (x_id) JOIN my USING (y_id)
),
best AS (
    SELECT x_id, y_id, cosine, margin,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS bx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id) AS by_
    FROM m
)
SELECT x_id, y_id, cosine, margin
FROM best
WHERE bx = 1 AND by_ = 1 AND margin >= {_BITEXT_THRESH}
ORDER BY x_id
"""


@register("embedding_bitext_mining", _BITEXT_ORACLE)
def embedding_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019): score every
    cross-corpus candidate by cosine / mean(k-NN cosines of both endpoints),
    keep mutual best matches above ``_BITEXT_THRESH``. The margin denominator
    deflates hub vectors (high cosine against EVERYTHING) that raw-cosine
    mining false-positives on; mutuality removes asymmetric one-way
    attractions. The vec_id-parity halves stand in for the two languages.

    Cross-engine determinism: the cosine is the shared sequential fold; the
    k-NN means sum in DECIMAL(38,18) (order-independent) before one double
    division, so margins are bit-identical and every rank tie-break (by id)
    agrees.

    Scale: this is the exact all-pairs baseline — the X side broadcasts and
    the corpus side never shuffles with its vectors attached (norms computed
    once per side; only fixed-width (id, cosine) rows enter the rank/mean
    exchanges). At 100 TB the candidate set is pre-bounded per query by LSH
    buckets (``ann_lsh_buckets``) or an IVF probe (``ivf_search_topk``)
    before this margin rank — k-NN means and mutual-best need only each
    vector's own candidate list, so the same windows apply unchanged to the
    bounded candidate frame.
    """
    from ..operators.bitext import margin_mutual_best

    return margin_mutual_best(
        _bitext_scored(spark, sf_dir), _BITEXT_K, _BITEXT_THRESH, mean_by="k"
    )


def _bitext_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-pairs scored-candidate frame of ``embedding_bitext_mining``,
    BEFORE the miner's localCheckpoint materializes it. Split out so the
    plan-quality test can assert the broadcast/cross-join shape here — the
    checkpoint truncates the query's own executed plan at a Scan
    ExistingRDD, hiding this subtree (round-13 lesson)."""
    e = _emb(spark, sf_dir)
    x = e.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("x_id"),
        F.col("embedding").alias("x_emb"),
        _norm("embedding").alias("x_nrm"),
    )
    y = e.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("y_id"),
        F.col("embedding").alias("y_emb"),
        _norm("embedding").alias("y_nrm"),
    )
    cosine = _dot("x_emb", "y_emb") / (F.col("x_nrm") * F.col("y_nrm"))
    return F.broadcast(x).crossJoin(y).select("x_id", "y_id", cosine.alias("cosine"))


# --- LSH-banded bitext mining (the production path) -----------------------------------
# The all-pairs baseline above is O(|X|·|Y|); at corpus scale candidates
# must be pre-bounded. Banding the 12-bit hyperplane signature into
# _BITEXT_BANDS bands (same trick as MinHash LSH: near vectors agree on at
# least one band with high probability) turns mining into a band-keyed
# equi-join — candidate volume is the sum of per-band bucket products, not
# the corpus square. The margin / mutual-best machinery then runs UNCHANGED
# on the candidate frame, with each vector's k-NN mean taken over its own
# candidate list (the denominator CCMatrix actually uses: the FAISS
# neighborhood, not the full corpus).

_BITEXT_BANDS = 4  # 12 planes -> 4 bands x 3 bits
_BITEXT_BAND_BITS = _N_PLANES // _BITEXT_BANDS

_BITEXT_LSH_ORACLE = f"""
WITH proj AS (
    SELECT vec_id,
           {", ".join(
               f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
               f"i -> CAST(embedding[i] AS DOUBLE) * ({_coeff_sql(p, 'i')}))), (acc, x) -> acc + x) AS d{p}"
               for p in range(_N_PLANES)
           )}
    FROM embeddings
),
sig AS (
    SELECT vec_id,
           CAST({" + ".join(f"CASE WHEN d{p} > 0 THEN {1 << p} ELSE 0 END" for p in range(_N_PLANES))} AS INT)
               AS bucket
    FROM proj
),
bands AS (
    SELECT vec_id, b.band_idx,
           (bucket // CAST(POW(2, band_idx * {_BITEXT_BAND_BITS}) AS INT))
               % {1 << _BITEXT_BAND_BITS} AS band_val
    FROM sig, (SELECT unnest(generate_series(0, {_BITEXT_BANDS - 1})) AS band_idx) b
),
cand AS (
    SELECT DISTINCT bx.vec_id AS x_id, by_.vec_id AS y_id
    FROM bands bx
    JOIN bands by_ ON bx.band_idx = by_.band_idx AND bx.band_val = by_.band_val
    WHERE bx.vec_id % 2 = 0 AND by_.vec_id % 2 = 1
),
n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
scored AS (
    SELECT x_id, y_id,
           {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
    FROM cand JOIN n a ON a.vec_id = x_id JOIN n b ON b.vec_id = y_id
),
rnk AS (
    SELECT x_id, y_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cosine DESC, y_id) AS rx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cosine DESC, x_id) AS ry
    FROM scored
),
mx AS (SELECT x_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
               AS knn_x
       FROM rnk WHERE rx <= {_BITEXT_K} GROUP BY x_id),
my AS (SELECT y_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
               AS knn_y
       FROM rnk WHERE ry <= {_BITEXT_K} GROUP BY y_id),
m AS (
    SELECT s.x_id, s.y_id, s.cosine,
           s.cosine / ((mx.knn_x + my.knn_y) / 2) AS margin
    FROM scored s JOIN mx USING (x_id) JOIN my USING (y_id)
),
best AS (
    SELECT x_id, y_id, cosine, margin,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS bx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id) AS by_
    FROM m
)
SELECT x_id, y_id, cosine, margin
FROM best
WHERE bx = 1 AND by_ = 1 AND margin >= {_BITEXT_THRESH}
ORDER BY x_id
"""


def _banded_pairs(
    sig_x: DataFrame,
    sig_y: DataFrame,
    bands: int = _BITEXT_BANDS,
    band_bits: int = _BITEXT_BAND_BITS,
) -> DataFrame:
    """Cross-corpus candidate pairs agreeing on >=1 signature band: explode
    each side's bucket into (band_idx, band_val) keys, equi-join, distinct.
    ``sig_x``/``sig_y`` carry (x_id|y_id, bucket). Shared by the
    embedding-table and document-level banded miners; ``bands``/``band_bits``
    (bands x band_bits must cover the signature planes) parametrize the
    recall/cost dial so the recall-curve harness can sweep band counts."""

    def _bands(sig: DataFrame, id_col: str) -> DataFrame:
        band_val = (
            F.floor(
                F.col("bucket") / F.pow(F.lit(2), F.col("band_idx") * band_bits)
            ).cast("int")
            % (1 << band_bits)
        )
        return sig.select(
            id_col,
            "bucket",
            F.posexplode(F.array(*[F.lit(i) for i in range(bands)])).alias(
                "band_idx", "_v"
            ),
        ).select(id_col, "band_idx", band_val.alias("band_val"))

    return (
        _bands(sig_x, "x_id")
        .join(_bands(sig_y, "y_id"), ["band_idx", "band_val"])
        .select("x_id", "y_id")
        .distinct()
    )


@register("embedding_bitext_lsh", _BITEXT_LSH_ORACLE)
def embedding_bitext_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining over LSH-banded candidates — how
    ``embedding_bitext_mining`` actually runs at 100 TB. The 12-bit
    hyperplane signature splits into 4 bands of 3 bits; a cross-corpus
    pair is a candidate iff it agrees on at least one band, so candidate
    generation is a band-keyed equi-join (shuffle keys: (band_idx,
    band_val) — fixed-width, skew-bounded by band width) instead of a
    cross join. The k-NN margin denominator averages each vector's own
    candidate cosines (÷ actual candidate count, not the fixed k — short
    lists must not deflate the mean), and mutual-best + threshold run
    unchanged on the candidate frame.

    Scale: signatures are the map-only ``ann_lsh_buckets`` projection; the
    candidate join and the vector re-attach joins shuffle fixed-width ids
    (embeddings cross an exchange only keyed by their own vec_id, never
    fanned out); everything downstream is bounded by candidate volume.
    Recall vs the exact baseline is measured by
    ``embedding_bitext_lsh_recall`` — the band count is the recall/cost
    dial, exactly like LSH near-dup banding.
    """
    e = _emb(spark, sf_dir)
    sig = _lsh_sig(e)
    cand = _banded_pairs(
        sig.where(F.col("vec_id") % 2 == 0).select(F.col("vec_id").alias("x_id"), "bucket"),
        sig.where(F.col("vec_id") % 2 == 1).select(F.col("vec_id").alias("y_id"), "bucket"),
    )

    n = e.select(
        "vec_id",
        F.col("embedding"),
        _norm("embedding").alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("x_id"),
        F.col("embedding").alias("x_emb"),
        F.col("nrm").alias("x_nrm"),
    )
    b = n.select(
        F.col("vec_id").alias("y_id"),
        F.col("embedding").alias("y_emb"),
        F.col("nrm").alias("y_nrm"),
    )
    cosine = _dot("x_emb", "y_emb") / (F.col("x_nrm") * F.col("y_nrm"))
    # spread the candidate ids before the (broadcast) vector attaches: the
    # per-pair fold runs at this frame's width, which AQE otherwise
    # coalesces by bytes, blind to the fold's per-row cost (same fix as
    # doc_crosslingual_lsh — see that comment for the measurements)
    scored = (
        cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
        .join(a, "x_id")
        .join(b, "y_id")
        .select("x_id", "y_id", cosine.alias("cosine"))
    )
    from ..operators.bitext import margin_mutual_best

    return margin_mutual_best(scored, _BITEXT_K, _BITEXT_THRESH, mean_by="count")


_BITEXT_RECALL_ORACLE = f"""
WITH exact_p AS (SELECT x_id, y_id FROM ({_BITEXT_ORACLE})),
lsh_p AS (SELECT x_id, y_id FROM ({_BITEXT_LSH_ORACLE})),
j AS (
    SELECT COALESCE(e.x_id, l.x_id) AS x_id,
           (e.x_id IS NOT NULL)::INT AS in_exact,
           (l.x_id IS NOT NULL)::INT AS in_lsh
    FROM exact_p e FULL OUTER JOIN lsh_p l
      ON e.x_id = l.x_id AND e.y_id = l.y_id
)
SELECT CAST(SUM(in_exact) AS BIGINT) AS n_exact,
       CAST(SUM(in_lsh) AS BIGINT) AS n_lsh,
       CAST(SUM(in_exact * in_lsh) AS BIGINT) AS n_common,
       ROUND(SUM(in_exact * in_lsh) * 1.0 / NULLIF(SUM(in_exact), 0), 6) AS recall,
       ROUND(SUM(in_exact * in_lsh) * 1.0 / NULLIF(SUM(in_lsh), 0), 6)
           AS precision_vs_exact
FROM j
"""


@register("embedding_bitext_lsh_recall", _BITEXT_RECALL_ORACLE)
def embedding_bitext_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the LSH-banded bitext miner against the exact
    all-pairs baseline — the quality dial for the band count, mirroring
    ``ann_recall_eval`` / ``doc_lsh_recall_curve``. Composes the two
    registered miners, so the number measures exactly what their users get.

    Scale: both inputs end at mined-pair volume (≤ min(|X|, |Y|) rows by
    mutuality); the membership join and the single-row rollup are
    negligible — and stay distributed (no driver-side counting)."""
    # the two arms are independent and both run eager materialization jobs
    # during construction (the miner's localCheckpoint) — build them from a
    # thread pool so those jobs overlap on the cluster (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(embedding_bitext_mining, spark, sf_dir)
        f_lsh = pool.submit(embedding_bitext_lsh, spark, sf_dir)
        exact = f_exact.result().select("x_id", "y_id", F.lit(1).alias("in_exact"))
        lsh = f_lsh.result().select(
            F.col("x_id").alias("l_x_id"),
            F.col("y_id").alias("l_y_id"),
            F.lit(1).alias("in_lsh"),
        )
    j = exact.join(
        lsh,
        (F.col("x_id") == F.col("l_x_id")) & (F.col("y_id") == F.col("l_y_id")),
        "full_outer",
    ).select(
        F.coalesce(F.col("in_exact"), F.lit(0)).alias("in_exact"),
        F.coalesce(F.col("in_lsh"), F.lit(0)).alias("in_lsh"),
    )
    both = F.col("in_exact") * F.col("in_lsh")
    return j.agg(
        F.sum("in_exact").cast("bigint").alias("n_exact"),
        F.sum("in_lsh").cast("bigint").alias("n_lsh"),
        F.sum(both).cast("bigint").alias("n_common"),
        F.round(F.sum(both) * 1.0 / F.nullif(F.sum("in_exact"), F.lit(0)), 6).alias(
            "recall"
        ),
        F.round(F.sum(both) * 1.0 / F.nullif(F.sum("in_lsh"), F.lit(0)), 6).alias(
            "precision_vs_exact"
        ),
    )


# --- LSH-banded cross-lingual document mining -------------------------------------------
# The production path for doc_crosslingual_mining (queries/text.py): the
# same hyperplane signatures over the HASHED TEXT embeddings, band-keyed
# candidate generation, then the count-mean margin miner on the bounded
# frame. Lives here with the rest of the LSH machinery; the exact arm owns
# the semantics docstring.

_XLSH_ORACLE_TMPL = """
WITH {CTE},
langside AS (
    SELECT e.doc_id, e.embedding, d.lang
    FROM emb e JOIN documents d ON d.doc_id = e.doc_id
    WHERE d.lang IN ('{XL}', '{YL}')
),
proj AS (
    SELECT doc_id, lang,
           {PROJS}
    FROM langside
),
sig AS (
    SELECT doc_id, lang,
           CAST({BUCKET} AS INT) AS bucket
    FROM proj
),
bands AS (
    SELECT doc_id, lang, b.band_idx,
           (bucket // CAST(POW(2, band_idx * {BB}) AS INT)) % {BW} AS band_val
    FROM sig, (SELECT unnest(generate_series(0, {NB} - 1)) AS band_idx) b
),
cand AS (
    SELECT DISTINCT bx.doc_id AS x_id, by_.doc_id AS y_id
    FROM bands bx
    JOIN bands by_ ON bx.band_idx = by_.band_idx AND bx.band_val = by_.band_val
    WHERE bx.lang = '{XL}' AND by_.lang = '{YL}'
),
scored AS (
    SELECT * FROM (
        SELECT c.x_id, c.y_id,
               {DOT} AS cosine
        FROM cand c
        JOIN emb ex ON ex.doc_id = c.x_id
        JOIN emb ey ON ey.doc_id = c.y_id
    ) WHERE cosine > 0
),
rnk AS (
    SELECT x_id, y_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cosine DESC, y_id) AS rx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cosine DESC, x_id) AS ry
    FROM scored
),
mx AS (SELECT x_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
               AS knn_x
       FROM rnk WHERE rx <= {K} GROUP BY x_id),
my AS (SELECT y_id, CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
               AS knn_y
       FROM rnk WHERE ry <= {K} GROUP BY y_id),
m AS (
    SELECT s.x_id, s.y_id, s.cosine,
           s.cosine / ((mx.knn_x + my.knn_y) / 2) AS margin
    FROM scored s JOIN mx USING (x_id) JOIN my USING (y_id)
),
best AS (
    SELECT x_id, y_id, cosine, margin,
           ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS bx,
           ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id) AS by_
    FROM m
)
SELECT x_id AS en_doc, y_id AS de_doc, cosine, margin
FROM best
WHERE bx = 1 AND by_ = 1 AND margin >= {T}
ORDER BY en_doc
"""


def _xlsh_oracle() -> str:
    from .text import _HASH_EMB_CTE, _HASH_EMB_DIM

    projs = ", ".join(
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {_HASH_EMB_DIM}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({_coeff_sql(p, 'i')}))), (acc, x) -> acc + x) AS d{p}"
        for p in range(_N_PLANES)
    )
    bucket = " + ".join(
        f"CASE WHEN d{p} > 0 THEN {1 << p} ELSE 0 END" for p in range(_N_PLANES)
    )
    dot = (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {_HASH_EMB_DIM}), "
        f"i -> ex.embedding[i] * ey.embedding[i])), (acc, x) -> acc + x)"
    )
    from .text import _XLING_K, _XLING_THRESH, _XLING_X_LANG, _XLING_Y_LANG

    return _XLSH_ORACLE_TMPL.format(
        CTE=_HASH_EMB_CTE,
        XL=_XLING_X_LANG,
        YL=_XLING_Y_LANG,
        PROJS=projs,
        BUCKET=bucket,
        BB=_BITEXT_BAND_BITS,
        BW=1 << _BITEXT_BAND_BITS,
        NB=_BITEXT_BANDS,
        DOT=dot,
        K=_XLING_K,
        T=_XLING_THRESH,
    )


@register("doc_crosslingual_lsh", _xlsh_oracle())
def doc_crosslingual_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded cross-lingual document mining — ``doc_crosslingual_mining``'s
    production path: hyperplane signatures over the hashed text embeddings,
    band-keyed candidate equi-join (never all-pairs), positive-cosine gate,
    count-mean ratio margin, mutual best + threshold. The capability's
    external verdicts ride on the driver-visible exact arm; this query pins
    the bounded path value-level against DuckDB every sweep.

    Scale: exactly the ``embedding_bitext_lsh`` shape with the text bridge
    in front — signatures map-only, candidates bounded by band geometry,
    vectors re-attach keyed by their own doc_id, the miner unchanged.
    """
    from ..operators.bitext import margin_mutual_best
    from .text import (
        _HASH_EMB_DIM,
        _XLING_K,
        _XLING_THRESH,
        _XLING_X_LANG,
        _XLING_Y_LANG,
        _docs,
        doc_embedding_hashed,
    )

    emb = doc_embedding_hashed(spark, sf_dir)
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    e = (
        emb.join(langs, "doc_id")
        .where(F.col("lang").isin(_XLING_X_LANG, _XLING_Y_LANG))
        .localCheckpoint()
    )
    sig = _lsh_sig(
        e.select(F.col("doc_id").alias("vec_id"), "embedding"),
        extra_cols=[],
        dim=_HASH_EMB_DIM,
    ).join(
        e.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    cand = _banded_pairs(
        sig.where(F.col("lang") == _XLING_X_LANG).select(
            F.col("vec_id").alias("x_id"), "bucket"
        ),
        sig.where(F.col("lang") == _XLING_Y_LANG).select(
            F.col("vec_id").alias("y_id"), "bucket"
        ),
    )
    a = e.select(F.col("doc_id").alias("x_id"), F.col("embedding").alias("xe"))
    b = e.select(F.col("doc_id").alias("y_id"), F.col("embedding").alias("ye"))
    dot = F.aggregate(
        F.zip_with(F.col("xe"), F.col("ye"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # the miner materializes scored once itself (operators/bitext.py) — a
    # checkpoint here double-materialized (r13 ADVICE). The a/b vector sides
    # BROADCAST (small), so the per-pair fold runs at the candidate frame's
    # width — which AQE's size-based coalescing collapses to a few tasks
    # (blind to per-row fold cost: measured 17.6 s of CPU in 8 tasks).
    # Spreading the CANDIDATE ids (16 B/row — the cheapest frame here)
    # before the joins pins the fold at cluster width with no array shuffle.
    scored = (
        cand.repartition(spark.sparkContext.defaultParallelism)
        .join(a, "x_id")
        .join(b, "y_id")
        .select("x_id", "y_id", dot.alias("cosine"))
        .where(F.col("cosine") > 0)
    )
    return margin_mutual_best(scored, _XLING_K, _XLING_THRESH, mean_by="count").select(
        F.col("x_id").alias("en_doc"),
        F.col("y_id").alias("de_doc"),
        "cosine",
        "margin",
    )
