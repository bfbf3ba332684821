"""Deduplication operators for LLM training-data pipelines.

Beyond-reference surface (SURVEY.md §7 step 7). The reference's only
dedup is the exact full-row drop (``df.drop_duplicates()``,
src/etl_2022.py:178, src/etl_2025.py:201 — Qkey ``dedup_full_row``);
a corpus pipeline needs the whole near-dup ladder:

- exact content dedup (hash-groupBy on normalized text),
- MinHash + LSH banding (shingle → minhash → band → bucket-join),
- SimHash (weighted bit-vote fingerprint + hamming-radius pairs),
- word n-gram Jaccard (shingle-join with blocking),
- embedding-cosine near-dup (label-blocked pair scan).

Every derived value is built from the engine-portable fragments in
``hashing.py`` so the DuckDB oracle computes bit-identical results.

Scale design (the part that matters at 100 TB):

- **No all-pairs anywhere.** Every pair-producing operator goes
  through a *blocking key* — LSH band hash, SimHash chunk, shared
  n-gram, or embedding label — so the join is an equi-join Catalyst
  shuffles on the key, and candidate sets stay near-linear.
- **MinHash needs no shingle dedup**: MIN over a multiset equals MIN
  over the set, so the explode feeds the groupBy directly — one
  shuffle total for signatures, map-side partial MIN applied.
- **Skew**: a degenerate band bucket (all-identical docs) creates a
  hot key; AQE skew-join handles moderate cases, and the band hash
  can be salted with a bucket-size cutoff for adversarial corpora
  (documented, not needed on the fixtures).
- Expressions are pure Column algebra → whole-stage codegen; the
  only Python in the pipeline is plan construction.

To make the operators *provably fire* on the synthetic fixtures
(whose 500 random documents contain no true near-dups), each query
plants deterministic duplicates derived from the fixture itself —
exact copies or 7-char-truncated copies of docs 0..24, with ids
offset by 1,000,000 — identically in the Spark plan and the oracle
SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_jobs_spark import cache

from etl_jobs_spark.operators.hashing import (
    MERSENNE_P,
    char_shingles,
    dot_unrolled,
    hash60,
    minhash_expr,
    minhash_params,
    norm_text,
    norm_unrolled,
    popcount_unrolled,
    sig_match_frac,
    word_ngrams,
    word_tokens,
    xor_expr,
)

#: Planted-duplicate knobs (shared with the oracles).
PLANT_OFFSET = 1_000_000
PLANT_MAX_ID = 25
PLANT_TRUNC = 7

#: MinHash geometry: K permutations in B bands of R rows.
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4
_MINHASH_PARAMS = minhash_params(MINHASH_K)

#: SimHash width and reporting radius (banding over 4 byte-chunks is
#: complete for hamming distance <= 3 by pigeonhole).
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4
SIMHASH_RADIUS = 3

EMBED_DIM = 64
COSINE_DUP_THRESHOLD = 0.99


def planted_corpus(docs: DataFrame, mutate: bool) -> DataFrame:
    """Fixture docs + planted duplicates: ``(doc_id, lang, n)`` with
    normalized text; docs 0..24 reappear at ``doc_id + 1e6`` either
    verbatim (``mutate=False``) or with the last 7 chars dropped.

    The input is spread to the session's parallelism first
    (readers.spread, optimization r15): every consumer immediately
    runs a CPU-dense normalize/tokenize/explode stage, and the
    single-file fixture scan would otherwise execute that stage on
    1-2 tasks (byte-based split sizing assumes cost ∝ bytes — the
    guide §2.5 input-skew case). At real scale the scan already has
    ≥ session-parallelism splits and spread is a no-op."""
    from etl_jobs_spark.sources.readers import spread

    docs = spread(docs)
    base = docs.select(
        "doc_id", "lang", F.expr(norm_text("text", "spark")).alias("n")
    )
    plant = base.filter(F.col("doc_id") < PLANT_MAX_ID).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        "lang",
        (
            F.expr(f"substring(n, 1, greatest(length(n) - {PLANT_TRUNC}, 1))")
            if mutate
            else F.col("n")
        ).alias("n"),
    )
    return base.unionByName(plant)


def planted_corpus_sql(mutate: bool, engine: str = "duckdb") -> str:
    """Oracle-side mirror of :func:`planted_corpus`."""
    n = norm_text("text", engine)
    sub = "substr" if engine == "duckdb" else "substring"
    mut = (
        f"{sub}(n, 1, greatest(length(n) - {PLANT_TRUNC}, 1))"
        if mutate
        else "n"
    )
    return f"""
    (SELECT doc_id, lang, {n} AS n FROM documents
     UNION ALL
     SELECT doc_id + {PLANT_OFFSET}, lang, {mut}
     FROM (SELECT doc_id, lang, {n} AS n FROM documents)
     WHERE doc_id < {PLANT_MAX_ID})
    """


def exact_dedup(corpus: DataFrame) -> DataFrame:
    """Exact content dedup: groupBy(md5(text)) → group size +
    keep-first (min doc_id) survivor. One keyed shuffle with
    map-side partial agg; the canonical 100 TB exact-dedup shape
    (hash is computed in the map stage, so the shuffle carries
    16-byte keys, not document text)."""
    return (
        corpus.select("doc_id", F.expr("md5(n)").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """Char-5-shingle MinHash signatures, one column per permutation.

    explode(shingles) → groupBy(doc_id).agg(K mins). Duplicate
    shingles need no dedup (MIN is set-insensitive), so this is a
    single shuffle keyed on doc_id — and partial MIN aggregation
    means the shuffle carries only K partial mins per (doc,
    partition), NOT shingle rows, so the wire cost is ~docs × K
    regardless of document length.

    Measured alternative (rejected): a map-only form — per-row
    ``array_min(transform(bases, ...))`` per permutation — avoids
    the explode entirely but ran 6× SLOWER at sf0.1 (11.2s vs
    1.8s): K nested higher-order lambdas allocate K derived arrays
    per document and fall out of whole-stage codegen, while the
    explode feeds a tight vectorized hash-agg. See docs/SCALE.md."""
    sh = corpus.select(
        "doc_id", F.explode(F.expr(char_shingles("n", "spark"))).alias("s")
    ).select(
        "doc_id",
        (F.expr(hash60("s", "spark")) % MERSENNE_P).alias("base"),
    )
    aggs = [
        F.min(F.expr(minhash_expr("base", a, b))).alias(f"s{i}")
        for i, (a, b) in enumerate(_MINHASH_PARAMS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_hash(j: int) -> str:
    cols = ", ".join(
        f"s{i}" for i in range(j * MINHASH_ROWS, (j + 1) * MINHASH_ROWS)
    )
    return f"md5(concat_ws(',', {cols}))"


def minhash_lsh_pairs(corpus: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate
    pairs; similarity is estimated as the matching-signature
    fraction. The pair join is an equi-join on (band_id, band_hash) —
    shuffle on the bucket key, never all-pairs."""
    # The signature table feeds BOTH sides of the band self-join AND
    # the est_sim re-join — without persist, Spark recomputes the
    # explode+md5+groupBy subplan 4×. At cluster scale this is the
    # intermediate you'd checkpoint/bucket-write; in-session,
    # persist is the same decision.
    sig = cache.track(minhash_signatures(corpus))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.expr(_band_hash(j)).alias("band_hash"),
                    )
                    for j in range(MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a, b = bands.alias("ba"), bands.alias("bb")
    cand = (
        a.join(
            b,
            (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_hash") == F.col("bb.band_hash"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    out = cand.join(
        sig.alias("sa"), cand.doc_a == F.col("sa.doc_id")
    ).join(sig.alias("sb"), cand.doc_b == F.col("sb.doc_id"))
    return out.select(
        "doc_a",
        "doc_b",
        F.expr(f"round({sig_match_frac('sa', 'sb', MINHASH_K)}, 4)").alias(
            "est_sim"
        ),
    )


def simhash_fingerprints(corpus: DataFrame) -> DataFrame:
    """32-bit SimHash: each token occurrence votes ±1 per bit of its
    hash; the sign of each bit-sum becomes the fingerprint bit.
    explode → groupBy(doc_id) with 32 conditional SUMs — one shuffle,
    partial aggregation map-side."""
    toks = corpus.select(
        "doc_id",
        F.explode(F.expr(word_tokens("n", "spark"))).alias("tok"),
    ).select("doc_id", F.expr(hash60("tok", "spark")).alias("h"))
    bit_aggs = [
        F.sum(
            F.expr(f"CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END")
        ).alias(f"w{b}")
        for b in range(SIMHASH_BITS)
    ]
    bits = toks.groupBy("doc_id").agg(*bit_aggs)
    fp = " + ".join(
        f"CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return bits.select(
        "doc_id", F.expr(f"CAST({fp} AS BIGINT)").alias("simhash")
    )


def simhash_pairs(corpus: DataFrame) -> DataFrame:
    """Hamming-radius pairs via byte-chunk banding: split the 32-bit
    fingerprint into 4 bytes; any pair within hamming distance 3
    shares at least one byte (pigeonhole), so the equi-join on
    (chunk_id, chunk) finds all of them without an all-pairs scan."""
    # Feeds both sides of the chunk self-join → persist once.
    fp = cache.track(simhash_fingerprints(corpus))
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("chunk_id"),
                        F.expr(f"(simhash >> {8 * k}) & 255").alias("chunk"),
                    )
                    for k in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    a, b = chunks.alias("ca"), chunks.alias("cb")
    ham = popcount_unrolled("x", SIMHASH_BITS)
    return (
        a.join(
            b,
            (F.col("ca.chunk_id") == F.col("cb.chunk_id"))
            & (F.col("ca.chunk") == F.col("cb.chunk"))
            & (F.col("ca.doc_id") < F.col("cb.doc_id")),
        )
        .select(
            F.col("ca.doc_id").alias("doc_a"),
            F.col("cb.doc_id").alias("doc_b"),
            F.expr(
                xor_expr("ca.simhash", "cb.simhash", "spark")
            ).alias("x"),
        )
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST({ham} AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_RADIUS)
    )


def distinct_doc_grams(corpus: DataFrame) -> DataFrame:
    """(doc_id, lang, g): each document's DISTINCT word-3-grams —
    the shared input of the Jaccard and containment pair generators
    (callers may memoize + persist it once per corpus; it is the
    expensive normalize→tokenize→explode stage of both)."""
    toks = corpus.select(
        "doc_id", "lang", F.expr(word_tokens("n", "spark")).alias("toks"), "n"
    )
    return (
        toks.select(
            "doc_id",
            "lang",
            F.explode(F.expr(word_ngrams("toks", "n", "spark"))).alias("g"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    corpus: DataFrame, threshold: float = 0.5, grams: DataFrame | None = None
) -> DataFrame:
    """Exact word-3-gram Jaccard over language-blocked candidates.

    shingle-join: (gram, lang) equi-join counts the intersection per
    pair; per-doc distinct-gram counts re-join to finish
    J = |A∩B| / (|A|+|B|−|A∩B|). Word trigrams are near-unique per
    document, so shared-gram groups — the only quadratic risk — stay
    tiny; blocking on ``lang`` additionally partitions the space."""
    if grams is None:
        # Used 3× (both join sides + per-doc counts) → persist once.
        grams = cache.track(distinct_doc_grams(corpus))
    counts = grams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    a, b = grams.alias("ga"), grams.alias("gb")
    inter = (
        a.join(
            b,
            (F.col("ga.g") == F.col("gb.g"))
            & (F.col("ga.lang") == F.col("gb.lang"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(
            F.col("ga.doc_id").alias("doc_a"),
            F.col("gb.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("i"))
    )
    out = (
        inter.join(counts.alias("na"), inter.doc_a == F.col("na.doc_id"))
        .join(counts.alias("nb"), inter.doc_b == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "round(CAST(i AS DOUBLE) / (na.n_grams + nb.n_grams - i), 4)"
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


#: Containment threshold: fraction of the contained doc's distinct
#: grams that appear in the container.
CONTAIN_THRESHOLD = 0.9


def ngram_containment_pairs(
    corpus: DataFrame,
    threshold: float = CONTAIN_THRESHOLD,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-dup: containment C(A→B) = |A∩B| / |A| — the
    sub-document/quotation detector Jaccard misses (a paragraph
    pasted into a much longer doc has low Jaccard but containment
    ~1.0; the Broder resemblance/containment distinction). Same
    shared-gram equi-join skeleton as :func:`ngram_jaccard_pairs`
    (language-blocked, never all-pairs); the pair's larger
    containment direction is reported, ties (identical gram sets)
    assign the higher doc_id as the contained copy."""
    if grams is None:
        grams = cache.track(distinct_doc_grams(corpus))
    counts = grams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    a, b = grams.alias("ga"), grams.alias("gb")
    inter = (
        a.join(
            b,
            (F.col("ga.g") == F.col("gb.g"))
            & (F.col("ga.lang") == F.col("gb.lang"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(
            F.col("ga.doc_id").alias("doc_a"),
            F.col("gb.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("i"))
    )
    both = (
        inter.join(counts.alias("na"), inter.doc_a == F.col("na.doc_id"))
        .join(counts.alias("nb"), inter.doc_b == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("round(CAST(i AS DOUBLE) / na.n_grams, 4)").alias("ca"),
            F.expr("round(CAST(i AS DOUBLE) / nb.n_grams, 4)").alias("cb"),
        )
    )
    return (
        both.filter(
            (F.col("ca") >= threshold) | (F.col("cb") >= threshold)
        )
        .select(
            F.expr(
                "CASE WHEN ca > cb THEN doc_a WHEN cb > ca THEN doc_b"
                " ELSE greatest(doc_a, doc_b) END"
            ).alias("contained_doc"),
            F.expr(
                "CASE WHEN ca > cb THEN doc_b WHEN cb > ca THEN doc_a"
                " ELSE least(doc_a, doc_b) END"
            ).alias("container_doc"),
            F.expr("greatest(ca, cb)").alias("containment"),
        )
    )


def lsh_verified_pairs(
    cands: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Two-stage near-dup: probabilistic candidates verified by
    EXACT Jaccard — the production dedup shape. Stage 1 (MinHash
    LSH) prunes the pair space to ~linear in corpus size; stage 2
    computes true word-3-gram Jaccard ONLY for survivors, as a
    per-pair ``array_intersect`` over each doc's distinct-gram
    array (no gram explode-join at all — the candidate set is small
    enough that per-pair array math beats re-blocking). False
    positives die here; false-negative rate is stage 1's banding
    guarantee. ``cands``: (doc_a, doc_b)."""
    t = corpus.select(
        "doc_id", F.expr(word_tokens("n", "spark")).alias("toks"), "n"
    )
    g = t.select(
        "doc_id",
        F.expr(
            f"array_distinct({word_ngrams('toks', 'n', 'spark')})"
        ).alias("g"),
    ).withColumn("ng", F.size("g").cast("long"))
    out = (
        cands.join(g.alias("pa"), cands.doc_a == F.col("pa.doc_id"))
        .join(g.alias("pb"), cands.doc_b == F.col("pb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(size(array_intersect(pa.g, pb.g)) AS BIGINT)").alias("i"),
            F.col("pa.ng").alias("na"),
            F.col("pb.ng").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("round(CAST(i AS DOUBLE) / (na + nb - i), 4)").alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def planted_embeddings(emb: DataFrame) -> DataFrame:
    """Embeddings + planted exact copies of vec 0..24 (cosine 1.0)."""
    plant = emb.filter(F.col("vec_id") < PLANT_MAX_ID).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        "embedding",
        "label",
    )
    return emb.select("vec_id", "embedding", "label").unionByName(plant)


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    cell_map: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-dup pairs, blocked on coarse-quantizer cells.

    ``cell_map`` is a (vec_id, cell) assignment table for the BASE
    corpus — in practice the ANN index's already-materialized
    cell-partitioned layout (``operators/similarity.build_ivf_
    index``), whose quantizer is fit on a bounded sample with
    k ∝ corpus size. Blocking pairs on ``cell`` keeps block sizes
    ~constant as the corpus grows, so total pair work stays linear.
    (The earlier variant blocked on the fixture's fixed 10-value
    ``label`` column — O(n²/10), measured ×8.8 at 4× data;
    data-sized cells flatten that. See docs/SCALE.md.) Exact
    duplicates share a cell under ANY quantizer (identical input →
    identical assignment), so planted pairs — the only pairs at
    cosine ≥ 0.99 in gaussian fixtures — are found by both the
    cell-blocked plan and the label-blocked SQL oracle.

    Falls back to ``label`` blocking when no cell map is supplied
    (the oracle's own blocking — fine when a trusted pre-clustering
    exists and its cardinality scales with the data).

    Norms are precomputed per vector (one map pass), the pair join is
    an equi-join on the block key, and the dot product is an unrolled
    codegen'd expression — no UDF, no all-pairs."""
    planted = planted_embeddings(emb)
    if cell_map is not None:
        # planted copies carry their source row's id + PLANT_OFFSET →
        # map back to the base id so copies inherit the source's cell
        # (identical vector, same cell — by construction).
        orig = F.when(
            F.col("vec_id") >= PLANT_OFFSET, F.col("vec_id") - PLANT_OFFSET
        ).otherwise(F.col("vec_id"))
        cells = cell_map.select(
            F.col("vec_id").alias("orig_id"), F.col("cell").alias("blk")
        )
        planted = (
            planted.withColumn("orig_id", orig)
            .join(cells, "orig_id")
            .select("vec_id", "embedding", "blk")
        )
    else:
        planted = planted.select(
            "vec_id", "embedding", F.col("label").alias("blk")
        )
    # Both join sides read this — persist so norms compute once.
    vecs = planted.select(
        "vec_id",
        "blk",
        "embedding",
        F.expr(norm_unrolled("embedding", EMBED_DIM, "spark")).alias("nrm"),
    )
    vecs = cache.track(vecs)
    a, b = vecs.alias("va"), vecs.alias("vb")
    dot = dot_unrolled("va.embedding", "vb.embedding", EMBED_DIM, "spark")
    return (
        a.join(
            b,
            (F.col("va.blk") == F.col("vb.blk"))
            & (F.col("va.vec_id") < F.col("vb.vec_id")),
        )
        .select(
            F.col("va.vec_id").alias("vec_a"),
            F.col("vb.vec_id").alias("vec_b"),
            F.expr(f"round({dot} / (va.nrm * vb.nrm), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


#: Below this edge count the dedup graph fits comfortably on the
#: driver and a union-find beats 10+ distributed rounds of fixed
#: scheduling overhead. The blocking stages (LSH bands etc.) shrink
#: a 100 TB corpus's edge set by orders of magnitude before this
#: point — edges, not documents, are what must fit.
CC_DRIVER_EDGE_LIMIT = 5_000_000


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Dedup clustering: connected components over near-dup pair
    edges — the step that turns pairwise matches into
    keep-one-per-cluster groups.

    Hybrid strategy, the shape production dedup pipelines use:

    - **edge set small** (≤ CC_DRIVER_EDGE_LIMIT — the usual case
      AFTER blocking, since candidate pairs are ~linear in corpus
      size): collect edges, union-find on the driver, parallelize
      the labels back. One collect beats 10+ shuffle rounds whose
      per-round scheduling overhead dwarfs the work.
    - **edge set large**: iterative min-label propagation — every
      node takes min(own, neighbors') per round, converging to
      min-reachable-id in O(diameter) rounds (dup clusters are
      shallow). The standard large-graph CC recipe on Spark;
      ``localCheckpoint(eager=True)`` truncates lineage each round so
      the plan doesn't double per iteration.

    Both paths produce component = min reachable node id — the exact
    contract the recursive-CTE oracle states.
    """
    # Union-find treats edges as undirected, so the driver path needs
    # only the RAW (a, b) pairs: one probe-and-collect over half the
    # data, no union stage. Symmetrization is built lazily below, only
    # if the edge set overflows onto the distributed path.
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    raw = cache.track(raw)
    n_edges = raw.count()
    if 2 * n_edges <= CC_DRIVER_EDGE_LIMIT:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in raw.collect():
            a, b = int(row["a"]), int(row["b"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the component label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        return edges.sparkSession.createDataFrame(
            rows, "doc_id BIGINT, component BIGINT"
        )
    sym = raw.unionByName(
        raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    sym = cache.track(sym)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # max_iterations bounds the PROPAGATION rounds (rounds that still
    # change labels — convergence needs `diameter` of them); the
    # zero-change round that PROVES convergence doesn't consume the
    # budget, so a diameter == max_iterations graph succeeds instead
    # of spuriously raising on a fully-correct result.
    changed_rounds = 0
    while True:
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_min", F.col("component")),
                ).alias("component"),
            )
            # lazy: the `changed` count below materializes the
            # checkpoint inside its own job (eager=True doubled the
            # per-round action count — optimization r15)
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        changed_rounds += 1
        if changed_rounds > max_iterations:
            # Returning partial labels would silently violate the
            # min-reachable-id contract (a longer-than-budget chain
            # would split into several wrong component ids). Label
            # propagation shrinks distance 1 hop/round, so this means
            # the graph's diameter exceeds max_iterations; fail
            # loudly instead of silently splitting clusters.
            raise RuntimeError(
                f"connected_components: min-label propagation did "
                f"not converge within max_iterations={max_iterations} "
                f"propagation rounds (graph diameter exceeds the "
                f"budget); raise max_iterations"
            )
    return labels.select(F.col("node").alias("doc_id"), "component")


# --- Cross-document substring spans ------------------------------
#
# Suffix-array SEMANTICS (find long substrings repeated across
# documents) realized as seed-and-chain gram blocking — the BLAST /
# winnowing plan shape, which distributes, instead of a global
# suffix array, which does not. Reference anchor: generalizes the
# full-row identity of src/etl_2022.py:178 (drop_duplicates) to
# partial-content identity.

#: Seed width: character grams of this length are the match seeds.
SPAN_GRAM_W = 20
#: Grams occurring more often than this corpus-wide are dropped
#: before pair generation (the winnowing stop-gram rule): they are
#: both uninformative and the only quadratic risk in the seed join.
SPAN_FREQ_CAP = 32
#: Minimal reported span length (chars).
SPAN_MIN_LEN = 40


def substring_spans(corpus: DataFrame) -> DataFrame:
    """Maximal cross-document repeated substrings >= SPAN_MIN_LEN.

    Plan: (1) stride-1 character ``SPAN_GRAM_W``-grams with their
    positions — map-only explode; (2) corpus-wide gram frequency via
    one keyed window, dropping grams above ``SPAN_FREQ_CAP`` (bounds
    every gram group, so the seed join is never all-pairs); (3) the
    gram equi-join yields match seeds (doc_a, doc_b, pa, pb); (4)
    seeds on the same DIAGONAL (pa - pb) chain into maximal runs via
    the islands idiom (lag + running sum — one window family per
    pair/diagonal partition); a run of k consecutive positions is a
    common substring of k + W - 1 chars. All arithmetic is integer
    positions — bit-stable cross-engine. Scale shape: the only
    shuffles are the gram-frequency window, the seed equi-join, and
    the per-(pair, diagonal) window; each is keyed, none is
    quadratic in documents. At 100 TB the stop-gram cap is the knob:
    it bounds per-gram join fan-out regardless of corpus size.

    RECALL BOUND (explicit): any substring whose interior grams ALL
    occur in more than ``SPAN_FREQ_CAP`` documents — boilerplate
    repeated corpus-wide — loses those seeds, so its reported runs
    split into shorter spans or vanish below ``SPAN_MIN_LEN``. That
    is the winnowing trade: the cap is exactly what keeps the seed
    join non-quadratic, so the miss is priced, not accidental. Per
    the repo's no-silent-caps rule the drop is OBSERVABLE, not
    silent: ``substring_stop_gram_audit`` reports how many distinct
    grams / gram occurrences the cap removed (registered as query
    ``dedup_substring_drop_audit``), and high-duplication corpora
    should scale ``SPAN_FREQ_CAP`` with expected replication depth
    (it bounds fan-out per gram, not corpus size)."""
    from pyspark.sql import Window as W

    # Spread the explode across tasks (single-file fixture scan =
    # one input split; see substring_spans_decontam).
    n_part = int(
        corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    corpus = corpus.repartition(n_part, "doc_id")
    pos = corpus.filter(F.length("n") >= SPAN_GRAM_W).select(
        "doc_id",
        "n",
        F.explode(
            F.expr(f"sequence(1, length(n) - {SPAN_GRAM_W} + 1)")
        ).alias("p"),
    )
    grams = pos.select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.expr(f"substring(n, p, {SPAN_GRAM_W})").alias("g"),
    )
    rare = (
        grams.withColumn(
            "f", F.count(F.lit(1)).over(W.partitionBy("g"))
        )
        .filter(F.col("f") <= SPAN_FREQ_CAP)
        .drop("f")
    )
    a, b = rare.alias("a"), rare.alias("b")
    seeds = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
        (F.col("a.p") - F.col("b.p")).alias("diag"),
    )
    wseq = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    flagged = seeds.withColumn(
        "new_run",
        F.when(
            F.col("pa") - F.lag("pa", 1, -100).over(wseq) > 1, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(wseq.rowsBetween(W.unboundedPreceding, 0)),
    )
    spans = runs.groupBy("doc_a", "doc_b", "diag", "run_id").agg(
        F.min("pa").cast("long").alias("start_a"),
        F.min("pb").cast("long").alias("start_b"),
        (F.max("pa") - F.min("pa") + SPAN_GRAM_W)
        .cast("long")
        .alias("span_len"),
    )
    return spans.filter(F.col("span_len") >= SPAN_MIN_LEN).select(
        "doc_a", "doc_b", "start_a", "start_b", "span_len"
    )


def substring_spans_decontam(
    corpus: DataFrame, eval_max: int
) -> DataFrame:
    """Eval-vs-train substring spans — the DECONTAMINATION plan
    shape (VERDICT r7 item 3): spans where doc_a < ``eval_max`` <=
    doc_b, bit-identical to ``substring_spans`` filtered to that
    pair slice, but planned for the asymmetry. The eval set is tiny
    by definition, so its distinct gram set BROADCASTS, and the
    broadcast semi-join lands right after the gram explode — the
    full train-side gram stream is filtered MAP-SIDE, before any
    shuffle, instead of being shuffled whole for the corpus-wide
    frequency window.

    Exactness argument (why this equals the two-sided operator +
    filter): a seed for an (eval, train) pair needs a gram present
    in BOTH docs, so grams absent from every eval doc can neither
    seed nor chain into a reported span; and since the semi-join
    keeps EVERY corpus occurrence of each surviving gram, the
    full-corpus SPAN_FREQ_CAP frequencies of those grams are exact.
    At 100 TB: one map stage over train (explode + broadcast
    filter), one small groupBy for frequencies, one small seed join
    — nothing corpus-sized ever shuffles."""
    from pyspark.sql import Window as W

    # Spread the explode: the fixture corpus is one parquet file =
    # one input split, and the ~L-per-doc gram amplification plus
    # the broadcast probe would otherwise run on a single task.
    # Repartitioning the COMPACT pre-explode rows costs a tiny
    # shuffle of raw docs; at real scale the scan has many splits
    # and this is a cheap no-op-shaped rebalance.
    n_part = int(
        corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    corpus = corpus.repartition(n_part, "doc_id")
    pos = corpus.filter(F.length("n") >= SPAN_GRAM_W).select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, length(n) - {SPAN_GRAM_W} + 1)")
        ).alias("p"),
        "n",
    )
    grams = pos.select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.expr(f"substring(n, p, {SPAN_GRAM_W})").alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") < eval_max).select("g").distinct()
    )
    # Broadcast semi-join lands in the explode's map stage: the full
    # gram stream shrinks to eval-present grams BEFORE any shuffle.
    # Frequency then comes from ONE window over the shrunken stream
    # (not a groupBy + a second broadcast): both seed-join sides sit
    # above the SAME g-partitioned exchange, so ReuseExchange runs
    # the corpus-wide explode exactly once.
    cand = grams.join(F.broadcast(eval_grams), "g")
    rare = (
        cand.withColumn(
            "f", F.count(F.lit(1)).over(W.partitionBy("g"))
        )
        .filter(F.col("f") <= SPAN_FREQ_CAP)
        .drop("f")
    )
    a = rare.filter(F.col("doc_id") < eval_max).select(
        F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"), "g"
    )
    b = rare.filter(F.col("doc_id") >= eval_max).select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"), "g"
    )
    seeds = a.join(b, "g").select(
        "doc_a",
        "doc_b",
        "pa",
        "pb",
        (F.col("pa") - F.col("pb")).alias("diag"),
    )
    wseq = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    flagged = seeds.withColumn(
        "new_run",
        F.when(
            F.col("pa") - F.lag("pa", 1, -100).over(wseq) > 1, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(wseq.rowsBetween(W.unboundedPreceding, 0)),
    )
    spans = runs.groupBy("doc_a", "doc_b", "diag", "run_id").agg(
        F.min("pa").cast("long").alias("start_a"),
        F.min("pb").cast("long").alias("start_b"),
        (F.max("pa") - F.min("pa") + SPAN_GRAM_W)
        .cast("long")
        .alias("span_len"),
    )
    return spans.filter(F.col("span_len") >= SPAN_MIN_LEN).select(
        "doc_a", "doc_b", "start_a", "start_b", "span_len"
    )


def substring_stop_gram_audit(corpus: DataFrame) -> DataFrame:
    """Observability companion to :func:`substring_spans` (the
    no-silent-caps rule): quantify what the ``SPAN_FREQ_CAP``
    stop-gram filter removed. One row — distinct grams kept/dropped
    and gram OCCURRENCES kept/dropped (occurrences are what seed the
    pair join, so dropped_occurrences is the recall exposure). Plan:
    the same stride-1 gram explode, one groupBy(g).count(), then a
    single-row conditional aggregate — two keyed shuffles, nothing
    quadratic, same shape at 100 TB."""
    freq = (
        corpus.filter(F.length("n") >= SPAN_GRAM_W)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(n) - {SPAN_GRAM_W}"
                    f" + 1), p -> substring(n, p, {SPAN_GRAM_W}))"
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    cap = F.lit(SPAN_FREQ_CAP)
    return freq.agg(
        F.sum(F.when(F.col("f") <= cap, 1).otherwise(0))
        .cast("long")
        .alias("kept_grams"),
        F.sum(F.when(F.col("f") > cap, 1).otherwise(0))
        .cast("long")
        .alias("dropped_grams"),
        F.sum(F.when(F.col("f") <= cap, F.col("f")).otherwise(0))
        .cast("long")
        .alias("kept_occurrences"),
        F.sum(F.when(F.col("f") > cap, F.col("f")).otherwise(0))
        .cast("long")
        .alias("dropped_occurrences"),
    )
