"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side only (zip_with + aggregate), the
  exact baseline; one shuffle for the global top-k.
- LSH-bucketed ANN: random-hyperplane sign bits via a broadcast plane
  matrix (deterministic seed) — candidates restricted to the query's
  bucket(s); the 100 TB path (touches ~1/2^bits of the corpus).
- IVF-style variant: k-means-free "coarse quantizer" using the sign
  bits as cells; per-cell exact rerank.

Embedding dot products stay in whole-stage codegen via
``F.zip_with``/``F.aggregate`` — no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_to_query(df: DataFrame, vec_col: str, query: list[float],
                    out_col: str = "cosine") -> DataFrame:
    # r12 note: an in-plan probe (broadcast 1-row crossJoin instead
    # of the caller's eager .first()) was A/B-measured SLOWER at
    # every scale tried — the BroadcastNestedLoopJoin stage costs
    # more than the one-row probe fetch, which is O(1) work at any
    # corpus size. The literal-array path stays.
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return df.withColumn(out_col, sim)


def brute_force_topk(df: DataFrame, vec_col: str, id_col: str,
                     query: list[float], k: int = 10,
                     digits: int = 6) -> DataFrame:
    """Exact cosine top-k: map-side score, TakeOrdered global top-k
    (no full sort shuffle — Spark's orderBy+limit optimizes)."""
    scored = cosine_to_query(df, vec_col, query)
    return (scored.select(id_col, F.round(F.col("cosine"), digits)
                          .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def _plane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (hash-based, no RNG
    state — reproducible across cluster restarts)."""
    import hashlib
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{plane_idx}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    n = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / n for x in out]


def lsh_bucket(vec_col, dim: int, n_planes: int = 8,
               seed: int = 42):
    """Sign-bit bucket id (0..2^n_planes-1) as a Column expression —
    planes are literal arrays (broadcast as constants into codegen)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(dim, p, seed)])
        bit = F.when(_dot(vec_col, plane) >= 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def ann_topk_lsh(df: DataFrame, vec_col: str, id_col: str,
                 query: list[float], k: int = 10, n_planes: int = 8,
                 seed: int = 42, digits: int = 6,
                 n_probes: int = 1) -> DataFrame:
    """ANN top-k: score only rows in the query's LSH bucket(s). At
    scale, precompute the bucket column at ingest (partition by
    bucket → partition pruning makes this a point read).

    ``n_probes > 1`` enables multi-probe: also scan the buckets one
    sign-bit flip away (in order of how close the query sits to each
    plane — the standard probing sequence), trading ~n_probes× scan
    for recall that one hyperplane bucket can't give."""
    dim = len(query)
    bucketed = df.withColumn("__bucket",
                             lsh_bucket(F.col(vec_col), dim, n_planes, seed))
    qb = 0
    margins = []          # |distance to plane| per bit — flip nearest first
    for p in range(n_planes):
        plane = _plane(dim, p, seed)
        d = sum(a * b for a, b in zip(query, plane))
        if d >= 0:
            qb |= 1 << p
        margins.append((abs(d), p))
    probes = [qb]
    for _, p in sorted(margins)[:max(0, n_probes - 1)]:
        probes.append(qb ^ (1 << p))
    cand = bucketed.where(F.col("__bucket").isin(probes))
    return brute_force_topk(cand, vec_col, id_col, query, k, digits)


def _centroid(dim: int, cell_idx: int, seed: int) -> list[float]:
    """Deterministic unit centroid (hash-based like _plane but tagged
    separately so cells and planes never coincide)."""
    import hashlib
    out = []
    for j in range(dim):
        h = hashlib.md5(f"ivf:{seed}:{cell_idx}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    n = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / n for x in out]


def _dot_lit_sql(vec_name: str, lit_vec: list[float]) -> str:
    """SQL string for the left-fold dot of column `vec_name` with a
    literal vector — replicates _dot's aggregate EXACTLY (leading
    0.0D reproduces the fold's zero accumulator, so even the ±0.0
    edge matches), but runs in whole-stage codegen instead of the
    interpreted HOF path (r12, guide §4.1). Literals embed via
    CAST('repr' AS DOUBLE) — repr round-trips exactly."""
    terms = " + ".join(
        f"(element_at(`{vec_name}`, {j + 1}) * CAST('{x!r}' AS DOUBLE))"
        for j, x in enumerate(lit_vec))
    return f"(0.0D + {terms})"


def ivf_cell(vec_col, dim: int, n_cells: int = 16, seed: int = 7):
    """IVF coarse-quantizer cell id (1..n_cells) as a Column: argmax
    dot(vec, centroid) over literal centroid arrays. Dots fold
    left-to-right so the doubles are bit-reproducible; ties resolve
    to the FIRST max on both Spark and DuckDB (array_position /
    list_indexof semantics). Pass the vector column NAME for the
    codegen form (r12: the interpreted n_cells-fold HOF spelling
    cost ~seconds per call at ANY scale); a Column falls back to the
    HOF path."""
    if isinstance(vec_col, str):
        dots = F.expr("array(" + ", ".join(
            _dot_lit_sql(vec_col, _centroid(dim, c, seed))
            for c in range(n_cells)) + ")")
    else:
        dots = F.array(*[
            _dot(vec_col,
                 F.array(*[F.lit(x) for x in _centroid(dim, c, seed)]))
            for c in range(n_cells)])
    return F.array_position(dots, F.array_max(dots)).cast("int")


def ivf_cells_topn(vec_col, dim: int, n_cells: int = 16,
                   n_assign: int = 2, seed: int = 7):
    """The `n_assign` nearest IVF cells (1..n_cells) as an
    array<int> Column, nearest first. Sorting (-dot, c) structs gives
    d-descending with first-cell tie-breaks — the same ranking as
    ``ivf_cell`` extended past the argmax. Name → codegen form,
    Column → HOF fallback (see ivf_cell)."""
    if isinstance(vec_col, str):
        entries = F.expr("array(" + ", ".join(
            f"named_struct('nd', -{_dot_lit_sql(vec_col, _centroid(dim, c, seed))}, "
            f"'c', {c + 1})"
            for c in range(n_cells)) + ")")
    else:
        entries = F.array(*[
            F.struct(
                (-_dot(vec_col, F.array(*[F.lit(x) for x in
                                          _centroid(dim, c, seed)])))
                .alias("nd"),
                F.lit(c + 1).alias("c"))
            for c in range(n_cells)])
    top = F.slice(F.array_sort(entries), 1, n_assign)
    return F.transform(top, lambda s: s["c"])


def semantic_dup_pairs(df: DataFrame, vec_col: str, id_col: str,
                       dim: int, threshold: float = 0.95,
                       n_cells: int = 16, n_assign: int = 2,
                       seed: int = 7, digits: int = 6) -> DataFrame:
    """Embedding near-duplicate pairs at corpus scale (the SemDeDup
    shape: cluster, then mine pairs only within clusters). Each
    vector joins its `n_assign` nearest IVF cells, pairs are mined
    per cell with an id_a < id_b equi-join, scored with exact cosine,
    and deduped across shared cells. Work is sum over cells of
    |cell|² — never corpus² — and the join shuffles on the cell id.
    Multi-assignment recovers boundary pairs that single-cell
    blocking misses (a pair is found iff the two vectors share ANY of
    their n_assign cells). Skew note: with hash centroids cells stay
    near-uniform; with trained centroids cap the hot cell by
    splitting it on a secondary LSH bit before the join.

    Extends the reference's `deduplicate`
    (python/zef/core/op_implementations/data_wrangling.py) to
    embedding space."""
    cells = ivf_cells_topn(vec_col, dim, n_cells, n_assign, seed)
    celled = df.select(F.col(id_col), F.col(vec_col).alias("__v"),
                       F.explode(cells).alias("__cell"))
    a = celled.select("__cell", F.col(id_col).alias("id_a"),
                      F.col("__v").alias("va"))
    b = celled.select("__cell", F.col(id_col).alias("id_b"),
                      F.col("__v").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) *
                                            _norm(F.col("vb")))
    return (a.join(b, "__cell")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.round(sim, digits))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .distinct())


def ivf_topk(df: DataFrame, vec_col: str, id_col: str,
             query: list[float], k: int = 10, n_cells: int = 16,
             n_probes: int = 2, seed: int = 7,
             digits: int = 6) -> DataFrame:
    """IVF-style ANN: restrict the exact rerank to the `n_probes`
    cells whose centroids are nearest the query (inverted-file
    search, the FAISS coarse-quantizer pattern). At 100 TB the cell
    id is computed once at ingest and the table is partitioned by it,
    so a probe is partition pruning, not a scan; reranking touches
    ~n_probes/n_cells of the corpus. Centroids here are
    deterministic hash vectors — swap in trained k-means centroids
    (same literal-array plumbing) when recall matters more than
    reproducibility."""
    dim = len(query)
    probes = sorted(range(1, n_cells + 1),
                    key=lambda c: (-sum(a * b for a, b in
                                        zip(query, _centroid(dim, c - 1,
                                                             seed))), c)
                    )[:n_probes]
    celled = df.withColumn("__cell",
                           ivf_cell(vec_col, dim, n_cells, seed))
    cand = celled.where(F.col("__cell").isin(probes))
    return brute_force_topk(cand, vec_col, id_col, query, k, digits)


def materialize_ann_index(df: DataFrame, path: str, vec_col: str,
                          dim: int, method: str = "ivf",
                          n_cells: int = 16, n_planes: int = 8,
                          seed: int | None = None) -> None:
    """Write the corpus partitioned by its ANN cell/bucket id — the
    ingest-time layout where a probe is PARTITION PRUNING, not a
    scan. ``method``: "ivf" (coarse-quantizer cells) or "lsh"
    (hyperplane sign buckets)."""
    if method == "ivf":
        cell = ivf_cell(vec_col, dim, n_cells,
                        7 if seed is None else seed)
    elif method == "lsh":
        cell = lsh_bucket(F.col(vec_col), dim, n_planes,
                          42 if seed is None else seed)
    else:
        raise ValueError("method must be 'ivf' or 'lsh'")
    df.withColumn("__cell", cell).write.mode("overwrite") \
        .partitionBy("__cell").parquet(path)


def ann_topk_indexed(spark, path: str, vec_col: str, id_col: str,
                     query: list[float], k: int = 10,
                     n_cells: int = 16, n_probes: int = 2,
                     seed: int = 7, digits: int = 6) -> DataFrame:
    """Probe a materialized IVF index: the cell predicate hits the
    partition column, so Spark lists only ~n_probes/n_cells of the
    files (check PartitionFilters in .explain) before the exact
    rerank."""
    dim = len(query)
    probes = sorted(range(1, n_cells + 1),
                    key=lambda c: (-sum(a * b for a, b in
                                        zip(query, _centroid(dim, c - 1,
                                                             seed))), c)
                    )[:n_probes]
    cand = spark.read.parquet(path).where(F.col("__cell").isin(probes))
    return brute_force_topk(cand, vec_col, id_col, query, k, digits)


def _pq_codebook(dim_sub: int, sub_idx: int, code: int,
                 seed: int) -> list[float]:
    """Deterministic codebook entry (hash-derived like _centroid).
    Reproducible across engines/restarts; swap in per-subspace
    k-means-trained entries (clustering.kmeans_assign on the sliced
    column — same literal plumbing) when recall matters more than
    reproducibility."""
    import hashlib
    out = []
    for j in range(dim_sub):
        h = hashlib.md5(f"pq:{seed}:{sub_idx}:{code}:{j}".encode()) \
            .hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    n = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / n for x in out]


def pq_encode(df: DataFrame, vec_col: str, id_col: str, dim: int,
              m: int = 8, n_codes: int = 16, seed: int = 11,
              out_col: str = "pq_code") -> DataFrame:
    """Product-quantize embeddings: split the vector into `m`
    subspaces and store, per subspace, the index of the nearest
    codebook entry — (id, array<int> of length m). At 64-dim float
    that is 256 B → `m` small ints (~8 B with byte codes): the
    compression that lets a 100 TB embedding corpus live in memory
    for first-pass retrieval. Encoding is a pure codegen projection
    (literal codebooks), zero shuffle."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    # r12 (guide §4.1): the HOF spelling ran m×(n_codes+1)
    # interpreted F.aggregate folds PER ROW (measured ~7 s at sf0.01
    # AND sf0.001 — interpreter overhead, not data). The same
    # arithmetic now unrolls into whole-stage-codegen scalar
    # expressions built as SQL strings: per (s, c),
    # round(Σx² − 2·Σx·cb + cc, 6) with the identical left-to-right
    # addition order and ((xx − 2·qc) + cc) association the fold
    # produced, codebook literals embedded via CAST('repr' AS
    # DOUBLE) (repr round-trips exactly). Values are bit-identical;
    # only the execution mode changes.
    def elem(i):
        return f"element_at(`{vec_col}`, {i})"

    codes = []
    for s in range(m):
        xx = " + ".join(f"({elem(s * w + j + 1)} * {elem(s * w + j + 1)})"
                        for j in range(w))
        dists = []
        for c in range(n_codes):
            cb = _pq_codebook(w, s, c, seed)
            cc = sum(x * x for x in cb)
            qc = " + ".join(
                f"({elem(s * w + j + 1)} * CAST('{cb[j]!r}' AS DOUBLE))"
                for j in range(w))
            dists.append(f"round(({xx}) - 2.0D * ({qc}) "
                         f"+ CAST('{cc!r}' AS DOUBLE), 6)")
        arr = F.expr("array(" + ", ".join(dists) + ")")
        codes.append((F.array_position(arr, F.array_min(arr)) - 1)
                     .cast("int"))
    return df.select(F.col(id_col), F.array(*codes).alias(out_col))


def pq_topk(codes: DataFrame, query: list[float], id_col: str,
            k: int = 10, m: int = 8, n_codes: int = 16,
            seed: int = 11, code_col: str = "pq_code") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: precompute the
    query→codebook distance lookup table driver-side (m × n_codes
    floats), then approx dist = Σ_s LUT[s][code_s] — a literal-array
    element_at sum per row, no vector math on the corpus, no shuffle
    before the TakeOrdered top-k."""
    dim = len(query)
    w = dim // m
    luts = []
    for s in range(m):
        q_sub = query[s * w:(s + 1) * w]
        qq = sum(a * a for a in q_sub)
        row = []
        for c in range(n_codes):
            cb = _pq_codebook(w, s, c, seed)
            # three separate sequential dots (qq - 2qc + cc), NOT one
            # fused (a-b)^2 fold: matches the fold structure an
            # external verifier's LIST_DOT_PRODUCT produces, so the
            # rounded values agree bit-for-bit
            qc = sum(a * b for a, b in zip(q_sub, cb))
            cc = sum(b * b for b in cb)
            row.append(round(qq - 2.0 * qc + cc, 6))
        luts.append(row)
    dist = None
    for s in range(m):
        lut = F.array(*[F.lit(x) for x in luts[s]])
        term = F.element_at(lut, F.element_at(F.col(code_col), s + 1) + 1)
        dist = term if dist is None else dist + term
    return (codes.select(id_col, F.round(dist, 4).alias("pq_dist"))
            .orderBy("pq_dist", id_col).limit(k))


def cosine_pairs(df: DataFrame, vec_col: str, id_col: str,
                 threshold: float = 0.95,
                 block_col: str | None = None) -> DataFrame:
    """All-pairs cosine ≥ threshold. With `block_col` (e.g. an LSH
    bucket or label) the self-join is per-block — the scalable form;
    without it this is a full cross join (small inputs only)."""
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).alias("va"),
                  *( [F.col(block_col).alias("__blk")] if block_col else []))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).alias("vb"),
                  *( [F.col(block_col).alias("__blk")] if block_col else []))
    joined = (a.join(b, ["__blk"]) if block_col else a.crossJoin(b)) \
        .where(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) *
                                            _norm(F.col("vb")))
    return (joined.withColumn("cosine", F.round(sim, 6))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ann_index_add(new_df: DataFrame, path: str, vec_col: str,
                  dim: int, method: str = "ivf", n_cells: int = 16,
                  n_planes: int = 8, seed: int | None = None) -> None:
    """Incrementally grow a materialized ANN index: assign the NEW
    vectors to their cells (row-local — the quantizer is
    deterministic hash-derived literals, so new data lands in the
    same cell space as the original build) and APPEND into the
    partitioned layout. No rebuild, no read of the existing index —
    the append only touches the partitions the new vectors hash to.
    Probes keep pruning identically; periodic compact_parquet bounds
    the per-partition file count on a long-running ingest."""
    if method == "ivf":
        cell = ivf_cell(vec_col, dim, n_cells,
                        7 if seed is None else seed)
    elif method == "lsh":
        cell = lsh_bucket(F.col(vec_col), dim, n_planes,
                          42 if seed is None else seed)
    else:
        raise ValueError("method must be 'ivf' or 'lsh'")
    new_df.withColumn("__cell", cell).write.mode("append") \
        .partitionBy("__cell").parquet(path)


def kmeans_assign(df: DataFrame, vec_col: str, id_col: str,
                  k: int = 8, n_iter: int = 3,
                  scale: int = 1_000_000,
                  with_centroids: bool = False):
    """(id, cluster) — Lloyd's k-means over an embedding column,
    ENGINE-EXACT: all arithmetic happens in scaled-integer space so
    every engine replays it bit-identically (the SemDeDup-style
    coarse clustering step; reference analogue is `deduplicate`'s
    grouping generalized to embedding space).

    - Quantize: X_j = floor(x_j·scale + 0.5) as int64 (pure IEEE ops
      on identical doubles — deterministic across engines; ±4e6 per
      coordinate leaves 64-dim squared distances < 2^52).
    - Init: the k vectors with the smallest md5(id) string become
      centroids 0..k-1 (md5 rank is the engine-portable shuffle this
      codebase uses for reproducible sampling, see epoch_shuffle).
    - Assign (ROW-LOCAL, zero shuffle): centroids ride into the plan
      as k·dim literals (metadata-sized — the k-rows collect is the
      same control-plane trade as a broadcast-join build side);
      nearest = array_min over (dist², cid) structs, so ties break
      on cluster id deterministically.
    - Update (ONE narrow shuffle): dim positional sums in a single
      groupBy with map-side combine — no explode, the shuffle
      carries k·dim partials per mapper, not N·dim rows.
      New centroid: C_j = SUM(X_j) DIV n (exact integer division).

    n_iter = number of ASSIGN passes (n_iter-1 updates between
    them). Scale posture at 100 TB: per round, one map over the data
    + one k×dim-sized aggregate; nothing quadratic, no vector ever
    leaves its row."""
    if k < 1 or n_iter < 1:
        raise ValueError("kmeans_assign: k and n_iter must be >= 1")
    q = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col).cast("array<double>"),
                    lambda v: F.floor(v * scale + F.lit(0.5))
                    .cast("long")).alias("x"))
    q = q.localCheckpoint()  # scanned once per round; cut re-plan cost

    # deterministic init: k smallest md5(id) → centroid ids 0..k-1
    # (dim rides along — no separate probe job)
    init = (q.select("id", "x",
                     F.md5(F.col("id").cast("string")).alias("h"))
            .orderBy("h").limit(k).collect())
    if not init:
        raise ValueError("kmeans_assign: empty input")
    cents = [list(r["x"]) for r in sorted(init, key=lambda r: r["h"])]
    dim = len(cents[0])

    assigned = None
    for it in range(n_iter):
        # row-local argmin over literal centroids
        choices = []
        for cid, c in enumerate(cents):
            cvec = F.array(*[F.lit(int(v)) for v in c])
            d = F.aggregate(
                F.zip_with(F.col("x"), cvec,
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, v: acc + v)
            choices.append(F.struct(d.alias("d"),
                                    F.lit(cid).alias("cid")))
        assigned = q.select(
            "id", "x",
            F.array_min(F.array(*choices))["cid"].alias("cluster"))
        if it == n_iter - 1:
            break
        # positional integer means, one hash agg (map-side combine)
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("x")[j]).alias(f"s{j}") for j in range(dim)])
        rows = {r["cluster"]: r for r in sums.collect()}

        def tdiv(s: int, n: int) -> int:
            # TRUNCATING integer division (SQL DIV semantics; Python
            # // floors, which differs on negative sums)
            return -(-s // n) if s < 0 else s // n

        cents = [
            [tdiv(int(rows[cid][f"s{j}"]), int(rows[cid]["n"]))
             if cid in rows else cents[cid][j]      # empty cluster:
             for j in range(dim)]                   # keep old centroid
            for cid in range(k)]
    out = assigned.select("id", "cluster")
    return (out, cents) if with_centroids else out


def kmeans_oracle_parts(table: str = "embeddings",
                        id_sql: str = "vec_id",
                        vec_sql: str = "embedding", k: int = 8,
                        n_iter: int = 3,
                        scale: int = 1_000_000) -> list[str]:
    """The CTE parts of the kmeans oracle (shared by the standalone
    assignment oracle and the IVF-probe oracle): final assignment is
    a{n_iter-1}, final centroids (long form) c{n_iter-1}."""
    # Python floor-div on positive ints == SQL DIV on positive n
    parts = [f"""q AS (
  SELECT {id_sql} AS id,
         list_transform(CAST({vec_sql} AS DOUBLE[]),
                        x -> CAST(FLOOR(x*{float(scale)}+0.5) AS BIGINT)) AS x
  FROM {table}
), qL AS (
  SELECT id, i AS pos, x[i] AS v
  FROM q, UNNEST(GENERATE_SERIES(1, len(x))) AS t(i)
), c0 AS (
  SELECT cid, pos, v FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY MD5(CAST(id AS VARCHAR)))
           - 1 AS cid
    FROM q ORDER BY MD5(CAST(id AS VARCHAR)) LIMIT {k}
  ) s JOIN qL USING (id)
)"""]
    for it in range(n_iter):
        parts.append(f"""d{it} AS (
  SELECT qL.id, c{it}.cid,
         SUM((qL.v - c{it}.v) * (qL.v - c{it}.v)) AS d
  FROM qL JOIN c{it} USING (pos) GROUP BY qL.id, c{it}.cid
), a{it} AS (
  SELECT id, cid AS cluster FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cid) AS rn
    FROM d{it}
  ) WHERE rn = 1
)""")
        if it < n_iter - 1:
            # empty clusters keep their previous centroid (COALESCE
            # over a full join against the prior round)
            parts.append(f"""u{it} AS (
  SELECT a{it}.cluster AS cid, qL.pos,
         SUM(qL.v) // COUNT(DISTINCT qL.id) AS v
  FROM a{it} JOIN qL USING (id) GROUP BY 1, 2
), c{it + 1} AS (
  SELECT c{it}.cid, c{it}.pos, COALESCE(u{it}.v, c{it}.v) AS v
  FROM c{it} LEFT JOIN u{it}
    ON u{it}.cid = c{it}.cid AND u{it}.pos = c{it}.pos
)""")
    return parts


def kmeans_oracle_sql(table: str = "embeddings", id_sql: str = "vec_id",
                      vec_sql: str = "embedding", k: int = 8,
                      n_iter: int = 3, scale: int = 1_000_000) -> str:
    """DuckDB SQL replaying `kmeans_assign` exactly: the same
    scaled-integer quantization, md5-rank init, (dist², cid)
    tie-break, and SUM DIV n centroid update, iterations unrolled in
    long (id, pos, v) form. Integer arithmetic end to end — no FP
    summation order anywhere — so equality is exact."""
    parts = kmeans_oracle_parts(table, id_sql, vec_sql, k, n_iter,
                                scale)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id, cluster FROM a{n_iter - 1} ORDER BY id")


def ivf_kmeans_topk(df: DataFrame, vec_col: str, id_col: str,
                    query: list[float], k: int = 10,
                    n_clusters: int = 8, n_iter: int = 3,
                    n_probe: int = 2, scale: int = 1_000_000,
                    digits: int = 4) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: k-means cells
    (kmeans_assign — engine-exact integer Lloyd's) instead of the
    hash centroids ivf_topk uses; the standard FAISS IVF-Flat shape.
    The query probes its ``n_probe`` nearest cells (decided
    driver-side from the k×dim integer centroids — pure-int
    arithmetic, deterministic), candidates are the rows assigned to
    those cells, reranked with exact cosine.

    Recall/efficiency: touches ~n_probe/k of the corpus. The
    assignment is the clustered-layout build step — at 100 TB
    materialize (id, cluster) partitioned by cluster once and this
    probe becomes a partition-pruned scan."""
    assigned, cents = kmeans_assign(df, vec_col, id_col,
                                    k=n_clusters, n_iter=n_iter,
                                    scale=scale, with_centroids=True)
    qi = [int(math.floor(x * scale + 0.5)) for x in query]
    dists = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qi, c)), cid)
        for cid, c in enumerate(cents))
    probes = [cid for _, cid in dists[:n_probe]]
    cand = (df.join(assigned.where(F.col("cluster").isin(probes))
                    .withColumnRenamed("id", id_col), id_col))
    return brute_force_topk(
        cand.withColumn(vec_col,
                        F.col(vec_col).cast("array<double>")),
        vec_col, id_col, query, k, digits)


def rrf_fuse(rankings, id_col: str, k: int = 60,
             digits: int = 6) -> DataFrame:
    """(id, n_lists, rrf) — Reciprocal Rank Fusion (Cormack et al.),
    the standard hybrid-search combiner: given candidate lists each
    scored on its own incomparable scale (BM25, embedding cosine,
    recency, ...), fuse by rank alone:

        rrf(d) = Σ_lists 1 / (k + rank_list(d))

    `rankings` is a list of (df, score_col) candidate lists; each is
    ranked by (score DESC, id) — callers should pre-round scores to
    their cross-engine-stable precision so ranks are deterministic;
    the id tie-break finishes the total order. Ranks come from a
    row_number over each CANDIDATE list (top-k bounded — search
    results, never the corpus; the window is list-sized by
    construction). Per-row reciprocal terms are decimal-rounded
    before summing, so the fused score is partition-order-exact.
    Items missing from a list simply contribute nothing (the RRF
    convention); n_lists reports coverage."""
    from functools import reduce
    from pyspark.sql import Window
    dec = "decimal(38,12)"
    parts = []
    for df, score_col in rankings:
        w = Window.orderBy(F.col(score_col).cast("double").desc(),
                           F.col(id_col))
        parts.append(df.select(
            F.col(id_col), F.row_number().over(w).alias("__r")))
    u = reduce(lambda a, b: a.unionByName(b), parts)
    term = F.round(1.0 / (F.lit(int(k)) + F.col("__r")), 12) \
        .cast(dec)
    return (u.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_lists"),
                 F.round(F.sum(term).cast("double"), digits)
                 .alias("rrf")))


from .._registry import register_op as _reg_sim  # noqa: E402


@_reg_sim("rrf_fuse", "df")
def _rrf_fuse_op(df, score_col, others, *args, **kw):
    """Pipe form: ``df | z.rrf_fuse[score_col, [(df2, s2), ...],
    id_col]`` — df is the first ranking."""
    return rrf_fuse([(df, score_col)] + list(others), *args, **kw)


# ---------------------------------------------------------------------
# Binary (1-bit) quantization + Hamming-distance ANN (r09b): the
# bit-vector prefilter of production vector stores — 32x smaller than
# float32, XOR+popcount candidate generation, optional exact cosine
# rerank. Sign bits pack 32 per BIGINT word so every shift/sum stays
# far from both engines' overflow edges (bit 63 is a hazard in either).
# ---------------------------------------------------------------------

_BITS_PER_WORD = 32


def _sign_word(vec_col, word: int, dim: int):
    """One 32-bit sign word as a BIGINT Column: bit j set iff
    element word*32+j is >= 0. Disjoint powers of two, so + is OR
    and the word stays < 2^32 — ANSI-overflow-proof.

    r12: assembled as ONE F.expr SQL string (identical Catalyst
    tree) instead of ~200 per-term py4j Column calls — building this
    expression twice per word dominated the driver-side latency of
    the hamming queries."""
    name = vec_col if isinstance(vec_col, str) else None
    if name is None:
        # Column object: fall back to the per-term builder
        v = vec_col
        terms = []
        for j in range(_BITS_PER_WORD):
            i = word * _BITS_PER_WORD + j
            if i >= dim:
                break
            terms.append(
                F.when(F.element_at(v, i + 1).cast("double") >= 0,
                       F.lit(1 << j).cast("long"))
                .otherwise(F.lit(0).cast("long")))
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    parts = []
    for j in range(_BITS_PER_WORD):
        i = word * _BITS_PER_WORD + j
        if i >= dim:
            break
        parts.append(
            f"(case when cast(element_at(`{name}`, {i + 1}) as double)"
            f" >= 0 then {1 << j}L else 0L end)")
    return F.expr(" + ".join(parts))


def binary_quantize(df: DataFrame, vec_col: str, dim: int,
                    out_prefix: str = "sign_w") -> DataFrame:
    """Input + ``sign_w0..sign_w{ceil(dim/32)-1}`` BIGINT columns —
    1-bit sign quantization of an embedding column (bit = v_i >= 0).
    The binary sketch preserves angular locality (hamming/bits is an
    unbiased estimator of angle/pi), stores 32x smaller than float32,
    and turns candidate generation into XOR+popcount. Row-local,
    ZERO shuffle, no UDF."""
    n_words = (dim + _BITS_PER_WORD - 1) // _BITS_PER_WORD
    # single select (one py4j projection call) with string-built
    # sign-word expressions — not n_words chained withColumns
    return df.select(
        "*", *[_sign_word(vec_col, w, dim).alias(f"{out_prefix}{w}")
               for w in range(n_words)])


def hamming_distance(words_a: list, words_b: list):
    """Σ popcount(a XOR b) over word Columns — exact integer."""
    d = None
    for a, b in zip(words_a, words_b):
        t = F.bit_count(a.bitwiseXOR(b)).cast("long")
        d = t if d is None else d + t
    return d


def hamming_topk(df: DataFrame, vec_col: str, id_col: str,
                 query: list[float], k: int = 10,
                 rerank: int = 0, digits: int = 6) -> DataFrame:
    """(id, hamming[, cosine]) — top-k nearest neighbors of a probe
    vector by sign-bit Hamming distance (ties by id), optionally
    exact-cosine-reranked over ``rerank``x k Hamming candidates
    (rerank=0 returns the pure binary ranking).

    The two-stage shape production binary indexes use: the XOR+
    popcount scan touches only 2 longs per 64-dim row (32x less I/O
    than float32), and the expensive float math runs on rerank*k
    rows instead of the corpus. Plan: map-side integer distance +
    TakeOrdered — no shuffle beyond the global top-k; everything
    whole-stage-codegen'd, exact-integer deterministic."""
    # r12 note: an in-plan DataFrame probe (broadcast sign words +
    # crossJoin) was A/B-measured slower than this literal path —
    # see cosine_to_query. The probe fetch is O(1) at any scale.
    dim = len(query)
    n_words = (dim + _BITS_PER_WORD - 1) // _BITS_PER_WORD
    qd = binary_quantize(df, vec_col, dim)
    q_words = []
    for w in range(n_words):
        word = 0
        for j in range(_BITS_PER_WORD):
            i = w * _BITS_PER_WORD + j
            if i < dim and query[i] >= 0:
                word |= 1 << j
        q_words.append(F.lit(word).cast("long"))
    ham = hamming_distance(
        [F.col(f"sign_w{w}") for w in range(n_words)], q_words)
    scored = qd.withColumn("hamming", ham)
    if rerank <= 0:
        return (scored.select(id_col, "hamming")
                .orderBy(F.col("hamming"), F.col(id_col))
                .limit(k))
    cand = (scored.select(id_col, vec_col, "hamming")
            .orderBy(F.col("hamming"), F.col(id_col))
            .limit(int(rerank) * k))
    exact = cosine_to_query(cand, vec_col, query)
    return (exact.select(id_col, "hamming",
                         F.round(F.col("cosine"), digits)
                         .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


@_reg_sim("binary_quantize", "df")
def _binary_quantize_op(df, *args, **kw):
    return binary_quantize(df, *args, **kw)


@_reg_sim("hamming_topk", "df")
def _hamming_topk_op(df, *args, **kw):
    return hamming_topk(df, *args, **kw)
