"""Large-scale training-data operators over document/embedding tables:
exact + near deduplication and ANN similarity search — the 100-TB scale
paths (hash-first grouping, LSH candidate generation, exact re-rank).

These are not reference-parity operators (the reference crawler has no
dedup-suite analog); they are the pipeline ops a corpus this engine crawls
would immediately need. Query-catalog entries in ``queries.py`` wrap them
with DuckDB oracles; pytest covers collision handling and LSH recall.

Design rules applied throughout:

- **never shuffle document text or raw vectors when a fixed-size key works**:
  exact dedup exchanges (64-bit, 128-bit, length) keys, ~48 B/row, instead of
  the full text;
- **no quadratic joins in a scale path**: near-dup and ANN generate candidate
  pairs through LSH band buckets (minhash bands for Jaccard, signed
  hyperplane projections for cosine) and run the exact confirm/re-rank only
  on candidates;
- **JVM-side expressions wherever the formula allows** (xxhash64/md5 hashing,
  hyperplane dot products via left-to-right column sums — bit-identical
  across engines), Arrow-batched numpy where per-row compute is genuinely
  needed (minhash signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup — hash-first (no full-text shuffle)
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_hash: F.Column | None = None,
    confirm_cols: list[F.Column] | None = None,
) -> DataFrame:
    """Exact text dedup without shuffling text: group rows on
    ``xxhash64(text)`` and exact-confirm *within* each 64-bit hash group by
    additionally grouping on an independent 128-bit hash + the byte length.

    The exchange carries (int64, 32-hex-char, int) per row — fixed ~48 bytes
    — instead of full documents, and partial aggregation (map-side combine)
    collapses within-partition duplicates before the shuffle. Two distinct
    texts colliding on the 64-bit group hash are still separated by the
    confirm columns (the collision-handling path; see
    tests/test_dedup_suite.py); a joint collision across xxhash64 AND md5 AND
    length (< 2^-190 per pair) is treated as equality by design — the same
    trade every content-addressed store makes.

    ``group_hash``/``confirm_cols`` are injectable so tests can force 64-bit
    collisions with a weak primary hash and watch the confirm columns keep
    distinct texts apart.

    Output: one row per distinct text — (keep_doc_id = min id, n_copies).
    """
    t = F.col(text_col)
    if group_hash is None:
        group_hash = F.xxhash64(t)
    if confirm_cols is None:
        confirm_cols = [F.md5(t), F.length(t)]
    keyed = docs.select(
        F.col(id_col),
        group_hash.alias("__g"),
        *[c.alias(f"__c{i}") for i, c in enumerate(confirm_cols)],
    )
    return (
        keyed.groupBy("__g", *[f"__c{i}" for i in range(len(confirm_cols))])
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash signatures — Arrow-batched, numpy-vectorized
# ---------------------------------------------------------------------------

# Word hash = base-131 polynomial over the first 8 chars (rpad'd with 'x') —
# deterministic and exactly expressible in DuckDB SQL on the oracle side.
MH_P = 2147483647
MH_COEF = [(1299721 + 7 * j, 104729 + 13 * j) for j in range(8)]


def minhash_batches(iterator):
    """mapInPandas fn: 8-permutation MinHash over each doc's 3-word-shingle
    set, numpy-vectorized across the whole Arrow batch (the per-word/per-char
    Python loops of the first version were the dominant cost of the LSH
    pipeline at sf0.1).

    Bit-identical to the SQL oracle: every intermediate stays within int64
    by reducing mod p before multiplying (ord ≤ 0x10FFFF, p ≈ 2^31 ⇒ the
    largest product ≈ 2^31·131² ≈ 2^45; coefficient·shingle ≈ 2^52).
    Duplicate shingles need no dedup — min over a multiset equals min over
    its set.
    """
    import numpy as np
    import pandas as pd

    P = np.int64(MH_P)
    pow131 = (131 ** np.arange(8, dtype=np.int64)) % P  # 131^7 < 2^50, exact

    for pdf in iterator:
        out_ids = np.array([], dtype=np.int64)
        sigs = np.empty((0, 8), dtype=np.int64)
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        words_per_doc = [[w for w in t.split(" ") if w] for t in pdf["text"]]
        keep = [i for i, ws in enumerate(words_per_doc) if len(ws) >= 3]
        if keep:
            flat = [w for i in keep for w in words_per_doc[i]]
            counts = np.array([len(words_per_doc[i]) for i in keep])
            # dtype U8 truncates to 8 chars; UCS4 codepoint view = ord()
            raw = (
                np.array(flat, dtype="U8")
                .view(np.uint32)
                .reshape(len(flat), 8)
                .astype(np.int64)
            )
            codes = np.where(raw == 0, np.int64(ord("x")), raw)  # rpad(w, 8, 'x')
            fps = (codes * pow131[None, :]).sum(axis=1) % P

            starts = np.zeros(len(keep) + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            # 3-word shingles: position i valid iff i+2 stays inside its doc
            pos = np.arange(len(flat), dtype=np.int64)
            doc_idx = np.repeat(np.arange(len(keep)), counts)
            valid = pos < (starts[1:][doc_idx] - 2)
            sh_all = (((fps[:-2] * 131 + fps[1:-1]) % P) * 131 + fps[2:]) % P
            sh = sh_all[valid[:-2]]
            sh_doc = doc_idx[valid]  # ≥1 shingle per kept doc, nondecreasing
            sh_starts = np.flatnonzero(np.r_[True, sh_doc[1:] != sh_doc[:-1]])
            sigs = np.empty((len(keep), 8), dtype=np.int64)
            for j, (aj, bj) in enumerate(MH_COEF):
                perm = (np.int64(aj) * sh + np.int64(bj)) % P
                sigs[:, j] = np.minimum.reduceat(perm, sh_starts)
            out_ids = ids[keep]
        yield pd.DataFrame(
            {"doc_id": out_ids, **{f"mh{j}": sigs[:, j] for j in range(8)}}
        )


# ---------------------------------------------------------------------------
# Hyperplane LSH for cosine similarity (embeddings)
# ---------------------------------------------------------------------------

# Hyperplanes project over the leading EMB_DIMS dimensions — a deterministic
# sketch of the vector (the exact re-rank always uses the full vector). 16
# keeps the expression tree small and works for any corpus with ≥16 dims;
# at production scale generate planes over all dims.
EMB_DIMS = 16
ANN_TABLES = 4
ANN_PLANES = 4  # per table → 16 hyperplanes total


def plane_coef(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-6, 6] — the
    same closed form the DuckDB oracle inlines, so bucket assignment is
    bit-identical across engines (left-to-right double summation both
    sides)."""
    return float(((table * 131 + plane * 31 + dim * 17) % 13) - 6)


def hyperplane_bucket(emb_name: str, table: int, n_planes: int = ANN_PLANES,
                      n_dims: int = EMB_DIMS) -> F.Column:
    """Signed-projection bucket id for one LSH table: bit p of the bucket is
    1 iff the dot product with hyperplane p is > 0 (SimHash for cosine,
    Charikar STOC'02 — public algorithm).

    Built as ONE ``F.expr`` SQL string: composing the ~n_planes×n_dims-term
    tree column-by-column in Python costs a Py4J round-trip per operator
    (measured: ~9 s of driver time per ANN query at 4×4×16 terms); a single
    JVM-side parse is milliseconds. Addition is left-assoc in SQL exactly like
    the Python loop was, so bucket values are bit-identical to the previous
    form and to the DuckDB mirror (``hyperplane_bucket_sql``)."""
    parts = []
    for p in range(n_planes):
        proj = " + ".join(
            f"CAST(element_at({emb_name}, {d + 1}) AS DOUBLE) * ({plane_coef(table, p, d)!r}D)"
            for d in range(n_dims)
        )
        parts.append(f"(CASE WHEN ({proj}) > 0.0D THEN {2 ** p}L ELSE 0L END)")
    return F.expr("(" + " + ".join(parts) + ")")


def hyperplane_bucket_sql(emb_expr: str, table: int, n_planes: int = ANN_PLANES,
                          n_dims: int = EMB_DIMS) -> str:
    """DuckDB mirror of ``hyperplane_bucket`` (1-indexed list access)."""
    parts = []
    for p in range(n_planes):
        proj = " + ".join(
            f"CAST({emb_expr}[{d + 1}] AS DOUBLE) * ({plane_coef(table, p, d)})"
            for d in range(n_dims)
        )
        parts.append(f"CASE WHEN ({proj}) > 0 THEN {2 ** p} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id",
                emb_col: str = "embedding",
                n_tables: int = ANN_TABLES) -> DataFrame:
    """Explode each vector into ``n_tables`` (id, table, bucket) rows — the
    band-OR construction: two vectors are ANN/near-dup candidates iff they
    collide in ANY table. The downstream join shuffles on (table, bucket),
    never all-pairs.

    Output carries the id ONLY (24 B/row): candidate generation never needs
    the vector, so raw embeddings stay out of every bucket/candidate shuffle —
    callers re-join vectors by id for the exact re-rank."""
    rows = "array(" + ", ".join(
        f"named_struct('table', {t}, 'bucket', __hb{t})" for t in range(n_tables)
    ) + ")"
    with_buckets = emb.select(
        F.col(id_col),
        *[hyperplane_bucket(emb_col, t).alias(f"__hb{t}") for t in range(n_tables)],
    )
    return with_buckets.select(
        F.col(id_col), F.explode(F.expr(rows)).alias("tb")
    ).select(id_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Left-to-right double dot product of two array columns (matches
    DuckDB's list_dot_product evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: F.Column) -> F.Column:
    """sqrt(sum x_i^2), left-to-right — a per-VECTOR quantity: compute it
    once per row before any pair join so the per-pair cosine is one dot
    product, not three array aggregations."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Exact cosine between two array<float> columns (left-to-right double
    sums — matches DuckDB's list_dot_product evaluation order)."""
    return dot(a, b) / (vec_norm(a) * vec_norm(b))


def dot_expr(a_name: str, b_name: str, n_dims: int) -> F.Column:
    """Fixed-width dot product as ONE parsed SQL expression. Spark's array
    HOFs (``aggregate``/``zip_with``) are interpreted per element — measured
    ~27 µs per 64-dim dot, which dominated the near-dup confirm at ~700k
    candidate pairs — while an unrolled element_at chain runs inside
    whole-stage codegen. Left-assoc addition keeps the floats bit-identical
    to the HOF form (and to DuckDB's list_dot_product)."""
    # try_element_at + coalesce(0.0): dims beyond a shorter array's length
    # contribute +0.0 (float-exact no-op), so the n_dims-wide expression is
    # correct for any corpus of <= n_dims dimensions (ANSI element_at would
    # throw out-of-bounds instead).
    return F.expr(
        "(" + " + ".join(
            f"coalesce(CAST(try_element_at({a_name}, {i}) AS DOUBLE)"
            f" * CAST(try_element_at({b_name}, {i}) AS DOUBLE), 0.0D)"
            for i in range(1, n_dims + 1)
        ) + ")"
    )


def vec_norm_expr(a_name: str, n_dims: int) -> F.Column:
    """sqrt of the unrolled self-dot — codegen'd counterpart of
    ``vec_norm`` (same summation order, same doubles)."""
    return F.sqrt(dot_expr(a_name, a_name, n_dims))


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = ANN_TABLES,
    n_dims: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN with exact re-rank: candidates = corpus vectors
    sharing any hyperplane-LSH bucket with the query (band-OR over
    ``n_tables`` tables), then exact cosine on candidates only, top-k per
    query (rank ties broken by neighbor id — float-order-proof output).

    At 100 TB the candidate join shuffles on (table, bucket) — bucket
    occupancy, not corpus², bounds the pair count; recall is tuned by
    tables × planes (more tables → higher recall, more candidates). The
    exact path stays available as ``ann_bruteforce`` for ground truth.

    Shuffle discipline: candidate generation and the band-OR distinct carry
    ONLY (table, bucket, id) / (query_id, neighbor_id) — raw vectors never
    enter a pair-level exchange. Vectors re-join by id (a per-VECTOR
    shuffle, broadcastable when the query set is small) with their norms
    precomputed, so the per-pair work is exactly one dot product.
    """
    P = emb.sparkSession.sparkContext.defaultParallelism
    qb = lsh_buckets(queries, id_col, emb_col, n_tables).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    cb = lsh_buckets(emb, id_col, emb_col, n_tables).select(
        F.col(id_col).alias("neighbor_id"), "table", "bucket"
    )
    # The query side is small by definition (it's the ANN request batch):
    # broadcast it and spread the corpus side round-robin, so a popular
    # bucket costs candidate volume but never collapses onto one task —
    # bucket keys are few (2^planes × tables), so a hash-partitioned join
    # would serialize exactly when the corpus is densest.
    cand = (
        cb.repartition(P)
        .join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # band-OR: collapse multi-table collisions, ids only
    )
    return exact_rerank_topk(cand, emb, queries, k, id_col, emb_col, n_dims)


def exact_rerank_topk(
    cand: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_dims: int | None = None,
) -> DataFrame:
    """Exact cosine re-rank of an id-only candidate set ``(query_id,
    neighbor_id)`` → top-k per query with float-order-proof tie-breaks
    (cos DESC, neighbor_id ASC). Shared tail of every ANN scale path
    (LSH-bucketed, IVF): the candidate stream carries only ids; vectors
    re-join by id with norms precomputed, so per-pair work is one dot."""
    P = emb.sparkSession.sparkContext.defaultParallelism
    # Known vector width ⇒ unrolled codegen'd dot/norm (bit-identical floats,
    # ~2 orders of magnitude over the interpreted HOF); unknown ⇒ HOF form.
    if n_dims is not None:
        norm_col = vec_norm_expr(emb_col, n_dims)
        pair_cos = dot_expr("qe", "ne", n_dims) / (F.col("qn") * F.col("nn"))
    else:
        norm_col = vec_norm(F.col(emb_col))
        pair_cos = dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn"))
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("qe"),
        norm_col.alias("qn"),
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("ne"),
        norm_col.alias("nn"),
    )
    scored = (
        cand.repartition(P, "query_id")
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cos", pair_cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


IVF_NPROBE = 4


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "cell_id",
    n_dims: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN with exact re-rank: a coarse quantizer assigns
    every corpus vector to its nearest centroid cell (argmax cosine, ties →
    lowest cell id); a query probes its ``nprobe`` nearest cells and exact
    cosine re-ranks only the vectors posted in those cells. ``centroids``
    is a small DataFrame ``(cell_col, emb_col)`` — any deterministic coarse
    quantizer works (callers here seed it with a fixed corpus sample, which
    keeps the whole operator expressible in one SQL oracle; a k-means
    refinement would only move the centroid vectors, not the plan shape).

    Scale design (the IVF analog of ``ann_lsh_topk``'s discipline):
    - Assignment is a broadcast of the centroid table + a per-row argmax
      folded into a partial aggregation (``max_by(cell, struct(cos,
      -cell))``) — map-side combine means the only shuffled rows are one
      (id, cell) pair per corpus vector, never the N×C cross product and
      never a vector payload.
    - The probe→posting-list join broadcasts the (small) probe set and
      spreads the posting side round-robin: cell keys are few, so a
      hash-partitioned join would serialize on the densest cell.
    - The re-rank tail is ``exact_rerank_topk`` — ids-only candidate
      stream, vectors re-joined by id, one dot per pair.
    At 100 TB: centroids stay a broadcast table (C ≪ N), cell occupancy ×
    nprobe bounds the candidate count, and recall is tuned by C and nprobe
    exactly as in FAISS-style IVF-Flat."""
    P = emb.sparkSession.sparkContext.defaultParallelism
    if n_dims is not None:
        norm_col = vec_norm_expr(emb_col, n_dims)
        cell_cos = dot_expr(emb_col, "ce", n_dims) / (F.col("vn") * F.col("cn"))
    else:
        norm_col = vec_norm(F.col(emb_col))
        cell_cos = dot(F.col(emb_col), F.col("ce")) / (F.col("vn") * F.col("cn"))
    cent = centroids.select(
        F.col(cell_col).alias("cell_id"), F.col(emb_col).alias("ce")
    ).withColumn(
        "cn",
        vec_norm_expr("ce", n_dims) if n_dims is not None else vec_norm(F.col("ce")),
    )
    base = emb.select(F.col(id_col), F.col(emb_col), norm_col.alias("vn"))
    # max_by over struct(cos, -cell): highest cosine, then LOWEST cell id —
    # byte-identical to the oracle's row_number() ORDER BY cos DESC, cell ASC
    # even on exact float ties, but runs as a partial aggregation (map-side
    # combine) instead of shuffling the N×C scored rows through a window.
    assigned = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("cos", cell_cos)
        .groupBy(id_col)
        .agg(F.expr("max_by(cell_id, struct(cos, -cell_id))").alias("cell_id"))
    )
    # Probe: the query batch is small by definition — a window top-nprobe is
    # a per-query-partition sort over C rows, not a corpus-scale shuffle.
    qscored = (
        queries.select(F.col(id_col).alias("query_id"), F.col(emb_col), norm_col.alias("vn"))
        .crossJoin(F.broadcast(cent))
        .withColumn("cos", cell_cos)
        .select("query_id", "cell_id", "cos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cell_id").asc())
    probe = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cell_id")
    )
    # Posting-list join: each corpus vector lives in exactly one cell and a
    # query's probe cells are distinct ⇒ candidate pairs are unique, no
    # distinct needed. Ids only; spread the big side, broadcast the probes.
    cand = (
        assigned.repartition(P)
        .join(F.broadcast(probe), "cell_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    return exact_rerank_topk(cand, emb, queries, k, id_col, emb_col, n_dims)
