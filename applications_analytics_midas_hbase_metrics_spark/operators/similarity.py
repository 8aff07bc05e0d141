"""Similarity search over embedding columns (array<float>) — the ANN
surface of the training-data pipeline extensions (SURVEY.md §7 phase 7).

Two paths:
  * brute-force top-k — exact; query set broadcast against the corpus,
    one shuffle for the per-query top-k.  Right answer at any scale
    where (|queries| × |corpus|) dot products are affordable.
  * IVF (inverted-file) top-k — the scale path: corpus is assigned to
    the nearest of C centroids (built once, offline here via
    deterministic seeding + one Lloyd step), queries probe the
    ``nprobe`` nearest centroid lists only, cutting the scanned corpus
    to ~nprobe/C.  All DataFrame ops; the centroid table broadcasts.

Dot products use a strict left-fold (same order as the SQL oracle's
list_reduce) so doubles agree bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _dot, _self_join_ready


def _norm(v: Column) -> Column:
    """sqrt of the strict left-fold self-dot — hoisted per ROW by every
    scorer here: the per-pair cosine otherwise folds both operand norms
    once per pair (3 interpreted 64-element aggregates per pair instead
    of 1).  sqrt(dot(v,v)) is the identical double wherever computed,
    so scores and rankings are unchanged."""
    return F.sqrt(_dot(v, v))


def _cos_pre(dot_ab: Column, na: Column, nb: Column) -> Column:
    """Cosine from a pair dot and two hoisted norms — same try_divide
    null semantics as dedup.cosine (zero-norm → NULL, not an ANSI
    error)."""
    return F.try_divide(dot_ab, na * nb)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase per-query top-k over (query_id, corpus_id, cos) — the
    ``TakeOrderedAndProject`` shape generalized per group, same pattern
    as operators.sampling.top_k_per_group:

      1. partition-local top-k: a row_number window keyed on
         (query_id, input-partition) — fully parallel, never funnels a
         query's full score set through one task, and sort-based, so
         the only per-task state is the external sort's spillable
         buffer (the earlier collect_list formulation pinned every
         (query, task) score in the aggregation hash map — bounded by
         partition size but NOT by k, and unable to spill).
      2. global top-k + ranking over the reduced set — the window now
         sees <= k × n_partitions rows per query instead of |corpus|.

    Both phases order by (cos DESC, corpus_id), so the emitted rank is
    identical to the single-window formulation.

    Degenerate scores are dropped up front: a zero-norm vector yields
    NULL (operators.dedup.cosine uses try_divide under ANSI mode), and
    a NaN would rank first under a DESC ordering in both phases —
    surfacing a meaningless neighbor.  Filtering makes both phases
    (and the SQL oracle) agree: a degenerate vector is simply not a
    neighbor."""
    scored = scored.filter(F.col("cos").isNotNull() & ~F.isnan("cos"))
    wl = Window.partitionBy("query_id", "_p").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    local = (
        scored.withColumn("_p", F.spark_partition_id())
        .withColumn("_rk", F.row_number().over(wl))
        .filter(F.col("_rk") <= k)
        .select("query_id", "corpus_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query.  ``queries`` is broadcast (small by
    construction); the per-query ranking runs two-phase (see
    :func:`_topk_per_query`) so no task ever sees a query's full score
    set; ties break on corpus id so output is total-ordered and
    oracle-comparable."""
    c = corpus.select(
        F.col(id_col).cast("bigint").alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).cast("bigint").alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .withColumn(
            "cos", _cos_pre(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
        )
        .select("query_id", "corpus_id", "cos")
    )
    return _topk_per_query(scored, k)


def _assign_nearest(
    df: DataFrame, centroids: DataFrame, vec: str, out: str, id_col: str
) -> DataFrame:
    """Assign each row to its nearest centroid by cosine: broadcast the
    centroid table, score the cross product map-side, then take the
    per-row argmax with a ``max_by`` AGGREGATION keyed on the
    caller-named ``id_col`` — NOT a ranking window.  The distinction is
    the shuffle width: a window would exchange all |rows| x |C| scored
    rows before ranking, while the aggregation's map-side combine
    collapses each row's |C| candidates inside the scan partition, so
    the exchange carries one row per input row regardless of codebook
    size.  Ties break to the lowest centroid_id via the lexicographic
    (sim, -centroid_id) struct max — identical semantics to the
    (sim DESC, centroid_id ASC) ranking it replaces; a null cosine
    (zero-norm vector) orders below every real score."""
    cents = centroids.withColumn("_cn", _norm(F.col("centroid")))
    scored = (
        df.withColumn("_vn", _norm(F.col(vec)))
        .join(F.broadcast(cents), how="cross")
        .withColumn(
            "_sim",
            _cos_pre(_dot(F.col(vec), F.col("centroid")), F.col("_vn"), F.col("_cn")),
        )
    )
    payload = F.struct(*[F.col(c) for c in df.columns])
    order = F.struct(
        F.coalesce(F.col("_sim"), F.lit(-2.0)).alias("s"),
        (-F.col("centroid_id")).alias("nc"),
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(payload.alias("p"), F.col("centroid_id").alias("cid")), order
        ).alias("_b")
    )
    return best.select("_b.p.*", F.col("_b.cid").alias(out))


def build_ivf_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_steps: int = 1,
    train_mod: int | None = None,
) -> DataFrame:
    """Deterministic IVF codebook: seed with the ``num_centroids`` rows of
    lowest id (reproducible, no RNG), then ``lloyd_steps`` rounds of
    assign + mean.  Returns (centroid_id, centroid array<double>).

    ``train_mod=k`` trains the Lloyd steps on the deterministic
    ``id % k == 0`` sample — the production practice at scale: codebook
    quality needs a representative sample, not the corpus, and the
    N x C assignment cost of each training round drops by k (measured
    in SCALE.md).  Seeding stays on the full corpus's lowest ids so the
    codebook identity is sample-size-independent; the full-corpus
    assignment happens exactly once, in :func:`ivf_index`.  Hash-free
    modular sampling keeps the whole build replayable in SQL."""
    base = corpus.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    train = base.filter(F.col("id") % train_mod == 0) if train_mod else base
    # Seed selection via orderBy().limit() — TakeOrderedAndProject keeps
    # a per-partition top-N and merges N rows on the driver side of the
    # exchange.  (A global row_number() window here would sort the ENTIRE
    # corpus into one partition — a scale-killer at 100 TB.)  The
    # centroid_id ranking then runs on ≤ num_centroids rows: one
    # collect_list over the bounded seed set, never over the corpus.
    seeds = (
        base.orderBy("id")
        .limit(num_centroids)
        .agg(F.array_sort(F.collect_list(F.struct("id", "v"))).alias("s"))
        .select(F.posexplode("s").alias("centroid_id", "sv"))
        .select(
            F.col("centroid_id").cast("int").alias("centroid_id"),
            F.col("sv.v").alias("centroid"),
        )
    )
    cents = seeds
    for _ in range(lloyd_steps):
        assigned = _assign_nearest(
            train.select("id", "v"), cents, vec="v", out="cid", id_col="id"
        )
        # element-wise mean via posexplode: two shuffles on small keys,
        # no giant per-group array expressions — this is the shape that
        # survives 100 TB corpora (per-(centroid, dim) partial means)
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                F.col("cid").cast("int").alias("centroid_id"),
                F.transform(F.col("pm"), lambda s: s["m"]).alias("_new"),
            )
        )
        # empty-cluster guard: a centroid that attracted no (sampled)
        # trainees this round keeps its previous position instead of
        # silently vanishing from the codebook — |codebook| is an
        # invariant, not a function of the training sample
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("_new"), F.col("centroid")).alias("centroid"),
            )
        )
    return cents


def ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The persistable IVF artifact: every corpus vector assigned to its
    nearest centroid's inverted list — (corpus_id, cv, cn, list_id).

    Assignment cost is |corpus| x |C| cosine scores, which is the
    EXPENSIVE half of an IVF search (measured: it dominates wall time
    from C≈64 up) — and it is query-independent, so a deployment
    computes it once per corpus snapshot, writes it (partitioned by
    list_id for probe pruning), and every subsequent query batch
    probes the stored lists.  :func:`ivf_topk` accepts this frame via
    ``index=`` and skips re-assignment, exactly like
    dedup.minhash_signature_frame feeds lsh_pairs_between."""
    c = corpus.select(
        F.col(id_col).cast("bigint").alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    return _assign_nearest(c, centroids, vec="cv", out="list_id", id_col="corpus_id")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-approximate cosine top-k: corpus rows are searched only when
    their centroid is among the query's ``nprobe`` nearest centroids.
    Same output schema as brute_force_topk.  Pass ``index=`` (a frame
    from :func:`ivf_index`, typically read back from storage) to search
    a prebuilt index; otherwise the corpus is assigned inline."""
    c_assigned = (
        index
        if index is not None
        else ivf_index(corpus, centroids, vec_col=vec_col, id_col=id_col)
    )

    q = queries.select(
        F.col(id_col).cast("bigint").alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    cents = centroids.withColumn("_cn", _norm(F.col("centroid")))
    q_scored = q.join(F.broadcast(cents), how="cross").withColumn(
        "_sim",
        _cos_pre(_dot(F.col("qv"), F.col("centroid")), F.col("qn"), F.col("_cn")),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("centroid_id"))
    q_probes = (
        q_scored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("list_id"))
    )

    scored = (
        c_assigned.join(F.broadcast(q_probes), "list_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn(
            "cos", _cos_pre(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
        )
        .select("query_id", "corpus_id", "cos")
    )
    # probing already bounds the scanned lists, but a hot list can still
    # be corpus-scale — rank two-phase here too
    return _topk_per_query(scored, k)


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: bucket the corpus by
    nearest centroid, then inside each bucket drop every vector that has
    an EARLIER (lower-id) bucket-mate with cosine >= ``threshold``.
    Returns (id, cluster_id, keep) — keep = 1 marks the retained
    representative set (deterministic: the lowest id of every similar
    group inside a bucket always survives).

    The centroid bucketing is what makes this scale: the quadratic
    within-bucket compare runs per cluster, so its cost is bounded by
    the largest bucket — size the codebook so ~|corpus|/k fits a
    shuffle partition (k grows with the corpus; train the codebook on a
    sample and persist it, see build_ivf_centroids).  No all-pairs join
    ever touches the full corpus; the centroid table broadcasts.

    Caveat (inherent to SemDeDup, not this implementation): similar
    vectors assigned to DIFFERENT buckets are not compared — recall is
    traded for the bucket bound, exactly like the original method."""
    c = corpus.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    assigned = _assign_nearest(c, centroids, vec="cv", out="cluster_id", id_col="id")
    # assigned feeds BOTH pair sides and the final keep-join — without
    # materialization the full-corpus centroid assignment (the dominant
    # cost) executes once per consumer; see dedup._self_join_ready
    assigned = _self_join_ready(assigned, materialize)
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("cv").alias("va"),
        F.col("cn").alias("na"), "cluster_id",
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("cv").alias("vb"),
        F.col("cn").alias("nb"), "cluster_id",
    )
    dups = (
        a.join(b, "cluster_id")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(
            _cos_pre(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
            >= threshold
        )
        .select("id_a")
        .distinct()
    )
    return (
        assigned.join(dups, assigned.id == dups.id_a, "left")
        .select(
            "id",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.when(F.col("id_a").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
        )
    )


def semantic_dedup_cover(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    materialize: bool = True,
    max_iter: int = 50,
) -> DataFrame:
    """:func:`semantic_dedup` with COVER semantics: the >=threshold
    within-bucket pair graph is reduced by connected components and the
    minimum id of every component survives — so every dropped vector is
    (transitively) connected to its kept representative, and chains
    like A~B, B~C, A!~C keep A and drop B AND C with A recorded as the
    reason, instead of the upper-triangular rule's "drop B and C with
    no kept double for C" over-prune (round-6 advice observation).

    Same bucket bound as semantic_dedup (no cross-bucket compares, the
    SemDeDup recall trade); the component pass adds min-label
    propagation over the PAIR graph only — edge-proportional, never
    corpus-quadratic (operators.graph.connected_components).  Returns
    (id, cluster_id, keep, rep_id): rep_id is the surviving
    representative for dropped rows (itself for kept rows) — the
    provenance column a curation audit wants."""
    from .graph import connected_components

    c = corpus.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    assigned = _assign_nearest(c, centroids, vec="cv", out="cluster_id", id_col="id")
    # three consumers (both pair sides + the final keep-join): run the
    # full-corpus centroid assignment once, not three times
    assigned = _self_join_ready(assigned, materialize)
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("cv").alias("va"),
        F.col("cn").alias("na"), "cluster_id",
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("cv").alias("vb"),
        F.col("cn").alias("nb"), "cluster_id",
    )
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(
            _cos_pre(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
            >= threshold
        )
        .select("id_a", "id_b")
    )
    # strict: partial labels would break the every-dropped-row-connects-
    # to-its-kept-representative contract on chains longer than the
    # superstep budget — fail loudly, never mislabel
    comp = connected_components(pairs, max_iter=max_iter, strict=True)
    comp = comp.select("id", F.col("cluster_id").alias("rep_id"))
    return (
        assigned.join(comp, "id", "left")
        .select(
            "id",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.when(
                F.col("rep_id").isNull() | (F.col("rep_id") == F.col("id")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
            F.coalesce("rep_id", "id").cast("bigint").alias("rep_id"),
        )
    )


def replicate_embeddings(
    emb: DataFrame,
    factor: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nudge: float = 0.01,
) -> DataFrame:
    """``factor``x corpus replication for scaling experiments: replica i
    offsets ids by 1,000,000·i and nudges the first vector component by
    ``nudge``·i, so replicas are near- but not exact-duplicates (no
    degenerate cosine ties).  Dimension-agnostic (slices by the array's
    own size).  Shared by tools/ivf_scale.py and the plan-audit C=256
    twin so the scaling evidence and the audited plan can never
    desynchronize."""
    corpus = emb
    for i in range(1, factor):
        corpus = corpus.union(
            emb.select(
                (F.col(id_col) + 1_000_000 * i).alias(id_col),
                F.concat(
                    F.array(F.element_at(vec_col, 1) + F.lit(nudge * i)),
                    F.slice(F.col(vec_col), 2, F.size(vec_col) - 1),
                ).alias(vec_col),
            )
        )
    return corpus
