"""Training-data pipeline queries (documents/embeddings tables) with DuckDB
oracle twins. Canonical operator definitions live in
:mod:`cdc_tools_spark.ops`; every oracle reproduces the same definition in
SQL (md5/sha256-based hashing keeps them bit-comparable)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cdc_tools_spark.ops import dedup as D
from cdc_tools_spark.ops import similarity as S
from cdc_tools_spark.ops import text as X
from cdc_tools_spark.sources.scan import parallel_read

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS) + "]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallel_read(spark, os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallel_read(spark, os.path.join(sf_dir, "embeddings.parquet"))


# -- text analysis ----------------------------------------------------------


def q_text_quality(spark, sf_dir):
    return X.quality_features(_docs(spark, sf_dir))


def q_text_lang_id(spark, sf_dir):
    return X.language_id(_docs(spark, sf_dir))


def q_text_fingerprint(spark, sf_dir):
    return X.fingerprint(_docs(spark, sf_dir))


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (top-bigram dominance,
    duplicate-trigram occupancy)."""
    return X.repetition_features(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 10 == 3 play the
    held-out eval set; every other doc is train. A train doc sharing >= 4
    distinct 3-grams with any eval doc is flagged (the GPT-3-style n-gram
    contamination rule, scaled-down thresholds for the fixture corpus)."""
    docs = _docs(spark, sf_dir)
    bench = docs.where((F.col("doc_id") % 10) == 3)
    train = docs.where((F.col("doc_id") % 10) != 3)
    return D.decontaminate(train, bench, n=3, min_shared=4, max_gram_freq=200)


def q_contamination_overlap(spark, sf_dir):
    """Pair-level contamination evidence: which (train, benchmark) doc
    pairs share >= 4 distinct 3-grams, and how many."""
    docs = _docs(spark, sf_dir)
    bench = docs.where((F.col("doc_id") % 10) == 3)
    train = docs.where((F.col("doc_id") % 10) != 3)
    return D.contamination_overlap(
        train, bench, n=3, min_shared=4, max_gram_freq=200
    )


def q_corpus_vocab(spark, sf_dir):
    """Vocabulary building: corpus-wide token occurrence count + document
    frequency for tokens appearing in >= 2 docs. One explode + hash
    aggregation (map-side partial count + approx-distinct-free exact
    doc_freq via per-(token, doc) pre-aggregation) — linear, skew-bounded
    by token frequency itself."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(X.tokens("text")).alias("token")
    )
    per_doc = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
        )
        .where(F.col("doc_freq") >= 2)
    )


def q_quality_filter(spark, sf_dir):
    """Gopher-style doc-level quality gate: token-count range, stop-word
    floor, uniqueness floor, mean-token-length band; per-doc kept flag +
    ordered fail_reasons audit trail (thresholds tuned to the fixture
    corpus so every rule fires somewhere)."""
    return X.quality_filter(_docs(spark, sf_dir))


def q_bpe_pairs(spark, sf_dir):
    """Initial BPE statistics (Sennrich 2016): char-level adjacent symbol
    pairs weighted by word-type corpus frequency."""
    return X.bpe_pair_counts(_docs(spark, sf_dir))


def q_bpe_merges(spark, sf_dir):
    """First 8 learned BPE merges (sequential argmax + vocab rewrite per
    round — inherently iterative, so no single-SQL oracle; verified by the
    hand-computed classic-corpus unit test instead)."""
    return X.bpe_train(_docs(spark, sf_dir), num_merges=8)


def q_key_profile_events(spark, sf_dir):
    """Heavy-hitter key-skew profile of events.user_id: top-20 keys with
    share and cumulative share — the pre-shuffle skew diagnostic."""
    from cdc_tools_spark.ops.profile import key_profile

    # plain read: one hash aggregation with map-side partial combine —
    # repartitioning the raw events first shuffles more bytes than the
    # single-task scan costs (r7 A/B)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return key_profile(ev, "user_id", top_k=20)


def q_pack_sequences(spark, sf_dir):
    """Chunk → shard-local concat-and-split sequence packing: each chunk's
    shard, token offset within the shard's concatenation, and the pack
    (training-sequence) index its first token lands in."""
    chunks = X.chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=8)
    return X.pack_sequences(chunks, seq_len=256, n_shards=8)


# -- dedup ------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    # plain read: one sha256 + hash aggregation — partial agg collapses in
    # the scan stage, so the parallel_read shuffle would cost more than it
    # buys (r7 A/B: 0.46 s plain vs 0.86 s repartitioned)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return D.exact_dedup_groups(docs)


def q_dedup_ngram_jaccard(spark, sf_dir):
    # max_doc_freq: deterministic stop-shingle cap — bounds the quadratic
    # shared-shingle join group a boilerplate shingle would create
    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_doc_freq=100
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_candidates(_docs(spark, sf_dir), num_hashes=32, rows_per_band=4)


def q_dedup_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


def q_dedup_neardup_pipeline(spark, sf_dir):
    """LSH discovery → candidate-bounded Jaccard verify (the scale path)."""
    return D.neardup_pairs(_docs(spark, sf_dir), num_hashes=32, rows_per_band=4,
                           threshold=0.5)


def q_dedup_keep_list(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = D.neardup_pairs(docs, num_hashes=32, rows_per_band=4, threshold=0.5)
    return D.keep_list(docs, pairs)


def _neardup(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs, D.neardup_pairs(docs, num_hashes=32, rows_per_band=4, threshold=0.5)


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup clustering: connected components (alternating
    large-star/small-star) over the verified pair graph; cluster_id = the
    component's minimum doc id, singletons are their own cluster."""
    docs, pairs = _neardup(spark, sf_dir)
    return D.dedup_clusters(docs, pairs)


def q_dedup_cluster_stats(spark, sf_dir):
    docs, pairs = _neardup(spark, sf_dir)
    return D.cluster_stats(docs, pairs)


def q_dedup_keep_list_transitive(spark, sf_dir):
    """keep_list rewired through the cluster map: exactly ONE survivor per
    transitive near-dup chain (A~B, B~C ⇒ only A kept), closing the
    half-dedup the pairwise form leaves."""
    docs, pairs = _neardup(spark, sf_dir)
    return D.keep_list_transitive(docs, pairs)


def q_dedup_incremental(spark, sf_dir):
    """Arriving-batch dedup (docs with doc_id % 10 == 0 play the daily
    increment): new x corpus candidates via a probe join against the
    corpus's persisted LSH band index + new x new, then exact-Jaccard
    verify reading only the batch and candidate corpus docs. The oracle is
    the FULL-corpus pipeline filtered to pairs touching the batch —
    passing proves incremental == batch-at-once."""
    docs = _docs(spark, sf_dir)
    new = docs.where((F.col("doc_id") % 10) == 0)
    corpus = docs.where((F.col("doc_id") % 10) != 0)
    return D.neardup_pairs_incremental(
        new, corpus, num_hashes=32, rows_per_band=4, threshold=0.5
    )


def q_dedup_simhash_neardup(spark, sf_dir):
    """SimHash hamming near-dups: block-collision discovery (4 blocks of
    16 bits — pigeonhole gives PERFECT recall at hamming <= 3) + exact
    bit-compare verify on candidates only. The hamming-space twin of the
    MinHash banding path."""
    return D.simhash_neardup_pairs(
        _docs(spark, sf_dir), max_hamming=3, n_blocks=4, max_block_freq=200
    )


def q_dedup_winnow(spark, sf_dir):
    """Winnowing copy detection (MOSS): k-gram rolling hashes -> window
    minima fingerprints -> shared-fp join. Catches substring-level copying
    that bag-of-shingles similarity dilutes."""
    return D.winnow_candidates(
        _docs(spark, sf_dir), min_shared=4, k=16, window=8, max_fp_freq=200
    )


def q_dedup_keep_list_quality(spark, sf_dir):
    """Transitive dedup keeping the BEST copy per cluster, not the first:
    representative = argmax quality score (BPE-ish token count — an
    integer, so ranking is float-tie-free), ties to the lower id."""
    docs, pairs = _neardup(spark, sf_dir)
    quality = X.quality_features(docs).select(
        "doc_id", F.col("n_bpe_tokens").cast("double").alias("score")
    )
    return D.keep_list_quality(docs, pairs, quality)


def q_text_chunking(spark, sf_dir):
    """Pre-training chunking: 64-token windows, 8-token overlap — integer-
    exact token windows (no float anywhere), chunk text fingerprinted by
    md5 so the compare stays compact."""
    chunks = X.chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=8)
    return chunks.select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"), "n_tokens"
    )


def q_corpus_split_sample(spark, sf_dir):
    """Deterministic corpus management: md5-uniform train/val/test split +
    an independent 20% Bernoulli sample flag, both stable under corpus
    growth and bit-reproducible in SQL."""
    docs = _docs(spark, sf_dir)
    split = X.hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v1")
    sampled = X.deterministic_sample(docs, rate=0.2, salt="s1").select(
        "doc_id", F.lit(True).alias("in_sample")
    )
    return split.join(sampled, "doc_id", "left").select(
        "doc_id", "split", F.coalesce("in_sample", F.lit(False)).alias("in_sample")
    )


def q_training_mix(spark, sf_dir):
    """Capstone composition — the full training-data pipeline as ONE flow:
    quality filter (n_tokens >= 30) -> transitive near-dup dedup (keep the
    min-id representative per cluster) -> 64/8 token chunking of the
    survivors -> deterministic train/val/test split. Every stage is an
    already-oracle-checked operator; this row proves they COMPOSE (the
    oracle replays the identical four stages in SQL)."""
    docs = _docs(spark, sf_dir)
    kept_q = docs.join(
        X.quality_features(docs).where(F.col("n_tokens") >= 30).select("doc_id"),
        "doc_id",
    )
    pairs = D.neardup_pairs(kept_q, num_hashes=32, rows_per_band=4, threshold=0.5)
    survivors = kept_q.join(
        D.keep_list_transitive(kept_q, pairs).where(F.col("kept")).select("doc_id"),
        "doc_id",
    )
    chunks = X.chunk_documents(survivors, chunk_tokens=64, overlap=8)
    split = X.hash_split(survivors, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v1")
    return chunks.join(split, "doc_id").select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"),
        "n_tokens", "split",
    )


def q_training_mix_simhash(spark, sf_dir):
    """Capstone variant driving the SIMHASH candidate path (VERDICT r5 #7)
    through the same composition: quality filter -> hamming-LSH near-dup
    pairs (block-collision discovery, exact bit-verify) -> transitive
    clustering keep-list -> chunk -> split. Proves the CC/keep/chunk/split
    stages are candidate-source-agnostic — any pair generator that emits
    (doc_a, doc_b) plugs in."""
    docs = _docs(spark, sf_dir)
    kept_q = docs.join(
        X.quality_features(docs).where(F.col("n_tokens") >= 30).select("doc_id"),
        "doc_id",
    )
    pairs = D.simhash_neardup_pairs(
        kept_q, max_hamming=3, n_blocks=4, max_block_freq=200
    )
    survivors = kept_q.join(
        D.keep_list_transitive(kept_q, pairs).where(F.col("kept")).select("doc_id"),
        "doc_id",
    )
    chunks = X.chunk_documents(survivors, chunk_tokens=64, overlap=8)
    split = X.hash_split(survivors, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v1")
    return chunks.join(split, "doc_id").select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"),
        "n_tokens", "split",
    )


# -- multimodal ---------------------------------------------------------------


def _media(spark, sf_dir):
    """Deterministic media table derived from documents: payload = UTF-8
    bytes of the text (the corpus is ASCII, so byte and char offsets agree
    — verified), kind cycles image/audio/video by id."""
    d = _docs(spark, sf_dir)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )


def q_mm_feature_extract(spark, sf_dir):
    """Multimodal decode plumbing through the REAL mapInPandas path
    (Arrow-batched; codec stub is sha256-seeded, so every output column is
    an exact function of the bytes and oracle-checkable). feat0 rounds at
    4 decimals: b/255 in float32 is > 9e-7 away from any rounding
    half-point, so float32 storage can never flip the rounded value."""
    from cdc_tools_spark.ops import multimodal as M

    out = M.extract_features(_media(spark, sf_dir))
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "payload_sha256",
        F.round(F.element_at("features", 1).cast("double"), 4).alias("feat0"),
    )


def q_mm_frame_sample(spark, sf_dir):
    """Video frame sampling (byte-stride stand-in): JVM-side
    posexplode/substring; frames fingerprinted by md5 for the oracle."""
    from cdc_tools_spark.ops import multimodal as M

    frames = M.frame_sample(_media(spark, sf_dir), every_n_bytes=256, frame_bytes=64)
    return frames.select(
        "media_id",
        "frame_no",
        F.md5(F.col("frame_bytes").cast("string")).alias("frame_md5"),
    )


# -- similarity -------------------------------------------------------------


# Banded-LSH parameters shared by the Spark queries and their DuckDB
# oracles below. 8 bands × 4 planes: at test scale recall stays high while
# the structure (multi-table bands + bucket cap) is the 100-TB shape —
# production raises planes_per_band with corpus size.
_ANN_BANDS, _ANN_PLANES, _ANN_CAP = 8, 4, 100


def q_embed_neardup_cosine(spark, sf_dir):
    # 0.35 sits at the ~99.9th percentile of this corpus's pairwise cosines
    # (max 0.51): a non-vacuous near-dup set. Discovery is banded LSH —
    # never all pairs; exact cosine verifies candidates only.
    return S.cosine_pairs_lsh(
        _emb(spark, sf_dir), threshold=0.35,
        num_bands=_ANN_BANDS, planes_per_band=_ANN_PLANES, bucket_cap=_ANN_CAP,
    )


def q_embed_lsh_buckets(spark, sf_dir):
    out = S.lsh_buckets(_emb(spark, sf_dir), num_planes=8, dim=64)
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


def q_ann_topk_ivf(spark, sf_dir):
    """IVF-flat ANN: deterministic coarse centroids (lowest 16 vec_ids,
    standing in for offline k-means output), 6-list probe, exact re-rank
    within probed lists only — the trained-centroid scale path next to the
    training-free banded LSH."""
    return S.topk_cosine_ivf(_emb(spark, sf_dir), k=5, n_lists=16, n_probe=6)


def q_ann_topk_ivf_bcast(spark, sf_dir):
    """IVF-flat ANN past the literal-projection cap: 256 coarse lists
    dispatch centroid assignment to the broadcast-join path
    (BroadcastHashJoin against the broadcast centroid table + one hash-agg
    top-n per vector) — no O(K·dim) literal expression in the plan
    (VERDICT r3 #4). Semantics identical to ann_topk_ivf, so the same
    DuckDB oracle shape checks it at the wider K."""
    return S.topk_cosine_ivf(_emb(spark, sf_dir), k=5, n_lists=256, n_probe=6)


def q_ann_topk_ivf_index(spark, sf_dir):
    """Persisted-IVF serving twin of ann_topk_ivf: write the corpus as a
    list_id-partitioned index + centroid sidecar, then serve top-k with
    the probed lists statically pruned at the file index (the scan's
    PartitionFilters — plan-asserted in tests). Same centroids/probes as
    ann_topk_ivf, so the same oracle checks storage round-trip + pruned
    serving end to end."""
    import tempfile

    emb = _emb(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ivf_index_")
    S.ivf_index_write(emb, work, n_lists=16)
    return S.ivf_index_topk(spark, work, emb, k=5, n_probe=6)


def q_ann_recall_sweep(spark, sf_dir):
    """Serving-quality tuning table: recall@5 of IVF-flat at n_probe in
    {1, 2, 4} vs the exact scan, measured over a deterministic 20% query
    sample (vec_id % 5 == 0) — the bounded-cost recall measurement an
    operator runs to size n_probe before turning on a 100-TB deployment."""
    emb = _emb(spark, sf_dir)
    qs = emb.where((F.col("vec_id") % 5) == 0)
    return S.ivf_recall_sweep(emb, qs, k=5, n_lists=16, probes=(1, 2, 4))


def q_embed_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization — the 4x storage shrink an
    at-scale embedding corpus rides. Codes are serialized to a CSV string
    (engine-agnostic array compare); scale rounds at 6."""
    q = S.quantize_embeddings(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.concat_ws(",", F.col("qvec").cast("array<string>")).alias("q_csv"),
    )


def q_ann_kmeans_assign(spark, sf_dir):
    """In-engine Lloyd's k-means (k=8, 2 fixed iterations, deterministic
    lowest-id init) followed by assignment serving with the TRAINED
    centroids — the training loop that produces what ann_topk_ivf
    previously only consumed. Returns integer (vec_id, list_id): the
    oracle replays the identical unrolled iterations in SQL, so a
    divergence anywhere in train-or-serve flips an assignment."""
    emb = _emb(spark, sf_dir)
    cents = S.kmeans_train(emb, k=8, n_iter=2)
    return S.ivf_assignments(
        emb,
        n_probe=1,
        centroids=cents.select(
            F.col("list_id").alias("vec_id"), F.col("centroid").alias("embedding")
        ),
    ).select("vec_id", F.col("list_id").cast("long").alias("list_id"))


def q_ann_topk_lsh(spark, sf_dir):
    """Banded-LSH ANN top-k — fully oracle-checked (deterministic md5
    hyperplanes); recall@k vs the exact scan is asserted in
    tests/test_ops.py::test_ann_lsh_recall."""
    return S.topk_cosine_lsh(
        _emb(spark, sf_dir), k=5,
        num_bands=_ANN_BANDS, planes_per_band=_ANN_PLANES, bucket_cap=_ANN_CAP,
    )


# -- oracle SQL -------------------------------------------------------------

_TOKS_CTE = r"""
WITH toks_arr AS (
  SELECT doc_id, text, trim(text) AS tt,
    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents)
"""

_SHINGLE_CTE = r"""
WITH tok_pos AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '\s+')) AS tok,
    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE len(trim(text)) > 0),
grams AS (
  SELECT doc_id,
    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM tok_pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (SELECT DISTINCT doc_id, shingle FROM grams WHERE shingle IS NOT NULL)
"""

_FLAT_CTE = """
WITH flat AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM flat GROUP BY vec_id)
"""

# Banded multi-table hyperplane LSH (ops.similarity.banded_buckets /
# ann_candidates) in SQL: global plane index p ∈ [0, bands·planes);
# band = p // planes; plane weight = ±1 from the first md5 nibble of "p:d".
_BANDED_CTE = """,
planes AS (
  SELECT p, CAST(floor(p / {planes}) AS INT) AS band, d,
    CASE WHEN (strpos('0123456789abcdef',
      substr(md5(CAST(p AS STRING) || ':' || CAST(d AS STRING)), 1, 1)) - 1) % 2 = 1
    THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(generate_series(0, {max_p})) AS p) pp,
       (SELECT unnest(generate_series(0, 63)) AS d) dd),
proj AS (
  SELECT f.vec_id, pl.band, pl.p, sum(f.val * pl.w) AS pr
  FROM flat f JOIN planes pl ON pl.d = f.pos - 1
  GROUP BY 1, 2, 3),
buckets AS (
  SELECT vec_id, band,
    string_agg(CASE WHEN pr > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM proj GROUP BY vec_id, band),
ok AS (
  SELECT band, bucket FROM buckets GROUP BY band, bucket
  HAVING count(*) <= {cap}),
pruned AS (
  SELECT b.vec_id, b.band, b.bucket
  FROM buckets b JOIN ok ON ok.band = b.band AND ok.bucket = b.bucket),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM pruned a
  JOIN pruned b ON a.band = b.band AND a.bucket = b.bucket
    AND a.vec_id < b.vec_id)
""".format(
    planes=_ANN_PLANES, max_p=_ANN_BANDS * _ANN_PLANES - 1, cap=_ANN_CAP
)


# LSH candidates (same sigs/bands as the dedup_minhash_lsh oracle) +
# candidate-bounded Jaccard verify — the neardup_pairs pipeline in SQL.
_NEARDUP_CTE = """,
sigs AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS STRING) || ':' || shingle)) AS minhash
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS seed) s
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, CAST(floor(seed / 4) AS INT)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
    AND a.doc_id < b.doc_id),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
verified AS (
  SELECT doc_a, doc_b,
    round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
  FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.5)
"""

# Transitive clustering twin: the engine runs large-star/small-star; the
# oracle computes the same fixpoint as a recursive reachability closure
# (min reachable id per node = component minimum). UNION (set) semantics
# terminate the recursion; the closure is O(component² ) per component —
# fine at oracle scale, which is exactly why the ENGINE uses star rounds.
_RECURSIVE_SHINGLE_CTE = _SHINGLE_CTE.replace("WITH tok_pos", "WITH RECURSIVE tok_pos", 1)

_CLUSTER_CTE = """,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION SELECT doc_b, doc_a FROM verified),
reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, re.r FROM edges e JOIN reach re ON re.node = e.v),
comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
clusters AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
"""



def _lang_score_sql(lang: str) -> str:
    markers = "[" + ", ".join(f"'{w}'" for w in X.LANG_MARKERS[lang]) + "]"
    return (
        f"CAST(len(list_filter(toks, x -> list_contains({markers}, x))) AS BIGINT)"
    )


_LANG_SQL = (
    _TOKS_CTE
    + ", scored AS (SELECT doc_id, "
    + ", ".join(f"{_lang_score_sql(lang)} AS score_{lang}" for lang in X.LANG_ORDER)
    + " FROM toks_arr)\nSELECT doc_id, "
    + ", ".join(f"score_{lang}" for lang in X.LANG_ORDER)
    + ", CASE WHEN greatest("
    + ", ".join(f"score_{lang}" for lang in X.LANG_ORDER)
    + ") = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = greatest("
        + ", ".join(f"score_{k}" for k in X.LANG_ORDER)
        + f") THEN '{lang}'"
        for lang in X.LANG_ORDER
    )
    + " END AS lang_pred FROM scored"
)

ORACLES: dict[str, str | None] = {  # None => sequential algorithm, no single-SQL oracle (rows-only driver check)
    "text_quality": _TOKS_CTE
    + rf"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
    AS n_bpe_tokens,
  round(CASE WHEN len(toks) > 0
    THEN CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(toks)
    ELSE 0 END, 6) AS stopword_ratio,
  round(CASE WHEN len(toks) > 0
    THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0 END, 6) AS unique_ratio,
  round(CASE WHEN len(toks) > 0
    THEN CAST(length(regexp_replace(tt, '\s+', '', 'g')) AS DOUBLE) / len(toks)
    ELSE 0 END, 6) AS avg_token_len
FROM toks_arr
""",
    "text_lang_id": _LANG_SQL,
    "text_repetition": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE len(trim(text)) > 0),
bi AS (
  SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 1)) g(i)
  WHERE len(t) >= 2),
bic AS (SELECT doc_id, gram, count(*) AS c FROM bi GROUP BY 1, 2),
bitop AS (
  SELECT doc_id, gram, c, sum(c) OVER (PARTITION BY doc_id) AS tot,
    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) AS rn
  FROM bic),
bsel AS (
  SELECT doc_id, gram AS top_bigram, CAST(c AS BIGINT) AS top_bigram_count,
         round(c * 1.0 / tot, 6) AS top_bigram_frac
  FROM bitop WHERE rn = 1),
tri AS (
  SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
    || ' ' || t[CAST(i AS INT) + 2] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 2)) g(i)
  WHERE len(t) >= 3),
tric AS (SELECT doc_id, gram, count(*) AS c FROM tri GROUP BY 1, 2),
trid AS (
  SELECT doc_id,
    round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
      AS dup_trigram_frac
  FROM tric GROUP BY doc_id)
SELECT d.doc_id, b.top_bigram,
  COALESCE(b.top_bigram_count, 0) AS top_bigram_count,
  COALESCE(b.top_bigram_frac, 0.0) AS top_bigram_frac,
  COALESCE(t.dup_trigram_frac, 0.0) AS dup_trigram_frac
FROM documents d
LEFT JOIN bsel b ON b.doc_id = d.doc_id
LEFT JOIN trid t ON t.doc_id = d.doc_id
""",
    "decontaminate": _SHINGLE_CTE + """,
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 != 3),
be AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 3),
okg AS (SELECT shingle FROM tr GROUP BY shingle HAVING count(*) <= 200),
trc AS (SELECT t.doc_id, t.shingle FROM tr t JOIN okg o ON o.shingle = t.shingle),
hits AS (
  SELECT t.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS c
  FROM trc t JOIN be b ON b.shingle = t.shingle
  GROUP BY 1, 2 HAVING count(*) >= 4),
agg AS (SELECT train_id, max(c) AS mx FROM hits GROUP BY train_id)
SELECT d.doc_id, (a.train_id IS NULL) AS kept,
  CAST(COALESCE(a.mx, 0) AS BIGINT) AS n_shared_max
FROM documents d LEFT JOIN agg a ON a.train_id = d.doc_id
WHERE d.doc_id % 10 != 3
""",
    "contamination_overlap": _SHINGLE_CTE + """,
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 != 3),
be AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 3),
okg AS (SELECT shingle FROM tr GROUP BY shingle HAVING count(*) <= 200),
trc AS (SELECT t.doc_id, t.shingle FROM tr t JOIN okg o ON o.shingle = t.shingle)
SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
  CAST(count(*) AS BIGINT) AS n_shared
FROM trc t JOIN be b ON b.shingle = t.shingle
GROUP BY 1, 2 HAVING count(*) >= 4
""",
    "corpus_vocab": r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents WHERE len(trim(text)) > 0),
per_doc AS (
  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT token, CAST(sum(c) AS BIGINT) AS n_occurrences,
  CAST(count(*) AS BIGINT) AS doc_freq
FROM per_doc GROUP BY token HAVING count(*) >= 2
""",
    "quality_filter": _TOKS_CTE
    + rf""",
feats AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    round(CASE WHEN len(toks) > 0
      THEN CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(toks)
      ELSE 0 END, 6) AS stopword_ratio,
    round(CASE WHEN len(toks) > 0
      THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0 END, 6) AS unique_ratio,
    round(CASE WHEN len(toks) > 0
      THEN CAST(length(regexp_replace(tt, '\s+', '', 'g')) AS DOUBLE) / len(toks)
      ELSE 0 END, 6) AS avg_token_len
  FROM toks_arr),
flagged AS (
  SELECT doc_id, n_tokens,
    concat_ws(',',
      CASE WHEN n_tokens < 20 THEN 'too_short' END,
      CASE WHEN n_tokens > 90 THEN 'too_long' END,
      CASE WHEN stopword_ratio < 0.02 THEN 'low_stopword' END,
      CASE WHEN unique_ratio < 0.35 THEN 'repetitive' END,
      CASE WHEN avg_token_len < 3.8 OR avg_token_len > 5.2 THEN 'token_len' END
    ) AS fail_reasons
  FROM feats)
SELECT doc_id, n_tokens, fail_reasons = '' AS kept, fail_reasons FROM flagged
""",
    "bpe_pairs": r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE len(trim(text)) > 0),
wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
pr AS (
  SELECT substr(w, CAST(i AS INT), 1) AS sym_left,
         substr(w, CAST(i AS INT) + 1, 1) AS sym_right, c
  FROM wc, unnest(generate_series(1, length(w) - 1)) g(i)
  WHERE length(w) >= 2)
SELECT sym_left, sym_right, CAST(sum(c) AS BIGINT) AS pair_count
FROM pr GROUP BY 1, 2
""",
    "bpe_merges": None,  # sequential argmax loop: no single-SQL oracle
    "key_profile_events": """
WITH c AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
t AS (SELECT sum(n_rows) AS tot FROM c),
top AS (SELECT user_id, n_rows FROM c ORDER BY n_rows DESC, user_id LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, user_id) AS BIGINT) AS "rank",
  user_id, CAST(n_rows AS BIGINT) AS n_rows,
  round(n_rows * 1.0 / t.tot, 6) AS share,
  round(sum(n_rows) OVER (ORDER BY n_rows DESC, user_id ROWS UNBOUNDED PRECEDING)
        * 1.0 / t.tot, 6) AS cum_share
FROM top, t
""",
    "text_fingerprint": _TOKS_CTE
    + """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens
FROM toks_arr
""",
    "dedup_exact": """
SELECT sha256(text) AS text_sha256, min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY 1
""",
    "dedup_ngram_jaccard": _SHINGLE_CTE
    + """,
shf AS (  -- stop-shingle cap: drop shingles in > 100 docs (max_doc_freq)
  SELECT doc_id, shingle FROM sh WHERE shingle IN
    (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100)),
counts AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.5
""",
    "dedup_minhash_lsh": _SHINGLE_CTE
    + """,
sigs AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS STRING) || ':' || shingle)) AS minhash
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS seed) s
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, CAST(floor(seed / 4) AS INT))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
    "dedup_neardup_pipeline": _SHINGLE_CTE + _NEARDUP_CTE
    + "SELECT doc_a, doc_b, jaccard FROM verified",
    "dedup_keep_list": _SHINGLE_CTE + _NEARDUP_CTE
    + """
SELECT d.doc_id, (dr.doc_id IS NULL) AS kept
FROM documents d
LEFT JOIN (SELECT DISTINCT doc_b AS doc_id FROM verified) dr
  ON dr.doc_id = d.doc_id
""",
    "dedup_clusters": _RECURSIVE_SHINGLE_CTE + _NEARDUP_CTE + _CLUSTER_CTE
    + """
SELECT doc_id, cluster_id FROM clusters
""",
    "dedup_cluster_stats": _RECURSIVE_SHINGLE_CTE + _NEARDUP_CTE + _CLUSTER_CTE
    + """
SELECT cluster_id, min(doc_id) AS representative,
       CAST(count(*) AS BIGINT) AS cluster_size
FROM clusters GROUP BY cluster_id
""",
    "dedup_keep_list_transitive": _RECURSIVE_SHINGLE_CTE + _NEARDUP_CTE + _CLUSTER_CTE
    + """
SELECT doc_id, (doc_id = cluster_id) AS kept FROM clusters
""",
    "dedup_incremental": _SHINGLE_CTE + _NEARDUP_CTE
    + """
SELECT doc_a, doc_b, jaccard FROM verified
WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
""",
    "dedup_winnow": r"""
WITH d AS (SELECT doc_id, trim(text) AS t FROM documents
           WHERE len(trim(text)) >= 23),
grams AS (
  SELECT doc_id, i,
    CAST(('0x' || substr(md5(substr(t, CAST(i AS INT), 16)), 1, 15)) AS BIGINT) AS h
  FROM d, unnest(generate_series(1, len(t) - 15)) g(i)),
wins AS (
  SELECT doc_id, i,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
    max(i) OVER (PARTITION BY doc_id) AS mi
  FROM grams),
fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE i <= mi - 7),
okfp AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 200),
capped AS (SELECT f.doc_id, f.fp FROM fps f JOIN okfp o ON o.fp = f.fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 4
""",
    "dedup_simhash_neardup": r"""
WITH tok_d AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents WHERE len(trim(text)) > 0),
h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok_d),
bits AS (
  SELECT doc_id, b,
    strpos('0123456789abcdef', substr(h, CAST(floor(b / 4) AS INT) + 1, 1)) - 1 AS v,
    CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END AS d
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb),
sums AS (
  SELECT doc_id, b, sum((CAST(floor(v / d) AS INT) % 2) * 2 - 1) AS s
  FROM bits GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sh
  FROM sums GROUP BY doc_id),
blocks AS (
  SELECT doc_id, blk, substr(sh, blk * 16 + 1, 16) AS block_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS blk) t),
okblk AS (
  SELECT blk, block_key FROM blocks GROUP BY blk, block_key
  HAVING count(*) <= 200),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN okblk o ON o.blk = a.blk AND o.block_key = a.block_key
  JOIN blocks b ON b.blk = a.blk AND b.block_key = a.block_key
    AND a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST((SELECT count(*) FROM unnest(generate_series(1, 64)) g(i)
          WHERE substr(sa.sh, CAST(i AS INT), 1) <> substr(sb.sh, CAST(i AS INT), 1))
      AS BIGINT) AS hamming
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
""",
    "dedup_keep_list_quality": _RECURSIVE_SHINGLE_CTE + _NEARDUP_CTE + _CLUSTER_CTE
    + r""",
q AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS DOUBLE)
      AS score
  FROM documents),
reps AS (
  SELECT cluster_id, doc_id AS representative FROM (
    SELECT c.cluster_id, c.doc_id,
      row_number() OVER (
        PARTITION BY c.cluster_id ORDER BY q.score DESC, c.doc_id) AS rn
    FROM clusters c JOIN q ON q.doc_id = c.doc_id) WHERE rn = 1)
SELECT c.doc_id, (c.doc_id = r.representative) AS kept
FROM clusters c JOIN reps r ON r.cluster_id = c.cluster_id
""",
    "dedup_simhash": r"""
WITH tok_d AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents WHERE len(trim(text)) > 0),
h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok_d),
bits AS (
  SELECT doc_id, b,
    strpos('0123456789abcdef', substr(h, CAST(floor(b / 4) AS INT) + 1, 1)) - 1 AS v,
    CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END AS d
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb),
sums AS (
  SELECT doc_id, b, sum((CAST(floor(v / d) AS INT) % 2) * 2 - 1) AS s
  FROM bits GROUP BY doc_id, b)
SELECT doc_id,
  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
FROM sums GROUP BY doc_id
""",
    "mm_feature_extract": """
WITH media AS (
  SELECT doc_id AS media_id,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         ELSE 'video' END AS kind,
    text FROM documents)
SELECT media_id, kind,
  CAST(length(text) AS BIGINT) AS n_bytes,
  sha256(text) AS payload_sha256,
  round(((strpos('0123456789abcdef', substr(sha256(text), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(sha256(text), 2, 1)) - 1)) / 255.0,
      4) AS feat0
FROM media
""",
    "mm_frame_sample": """
SELECT doc_id AS media_id,
  CAST(f AS BIGINT) AS frame_no,
  md5(substr(text, CAST(f * 256 + 1 AS INT), 64)) AS frame_md5
FROM documents,
  unnest(generate_series(0,
    GREATEST(1, CAST(floor(length(text) / 256) AS INT)) - 1)) AS t(f)
WHERE CAST(doc_id % 3 AS INT) = 2
""",
    "embed_neardup_cosine": _FLAT_CTE
    + _BANDED_CTE
    + """,
dots AS (
  SELECT c.id_a, c.id_b, sum(fa.val * fb.val) AS dp
  FROM cand c
  JOIN flat fa ON fa.vec_id = c.id_a
  JOIN flat fb ON fb.vec_id = c.id_b AND fb.pos = fa.pos
  GROUP BY 1, 2)
SELECT id_a, id_b, round(dp / (na.nrm * nb.nrm), 6) AS cos
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE round(dp / (na.nrm * nb.nrm), 6) >= 0.35
""",
    "embed_lsh_buckets": _FLAT_CTE
    + """,
planes AS (
  SELECT p, d,
    CASE WHEN (strpos('0123456789abcdef',
      substr(md5(CAST(p AS STRING) || ':' || CAST(d AS STRING)), 1, 1)) - 1) % 2 = 1
    THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(generate_series(0, 7)) AS p) pp,
       (SELECT unnest(generate_series(0, 63)) AS d) dd),
proj AS (
  SELECT f.vec_id, pl.p, sum(f.val * pl.w) AS pr
  FROM flat f JOIN planes pl ON pl.d = f.pos - 1
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id, string_agg(CASE WHEN pr > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM proj GROUP BY vec_id)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors, min(vec_id) AS min_vec_id
FROM buckets GROUP BY bucket
""",
    "ann_topk_ivf": _FLAT_CTE
    + """,
cents AS (
  SELECT vec_id AS cent_id, pos, val FROM flat WHERE vec_id < 16),
cnorm AS (SELECT cent_id, sqrt(sum(val * val)) AS cnrm FROM cents GROUP BY cent_id),
assign_dots AS (
  SELECT f.vec_id, c.cent_id, sum(f.val * c.val) AS dp
  FROM flat f JOIN cents c ON c.pos = f.pos
  GROUP BY 1, 2),
assign_cos AS (
  SELECT a.vec_id, a.cent_id,
    round(a.dp / (n.nrm * cn.cnrm), 6) AS cos
  FROM assign_dots a
  JOIN norms n ON n.vec_id = a.vec_id
  JOIN cnorm cn ON cn.cent_id = a.cent_id),
assign_rank AS (
  SELECT vec_id, cent_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS pr
  FROM assign_cos),
base AS (SELECT vec_id AS id_b, cent_id AS list_id FROM assign_rank WHERE pr = 1),
probes AS (SELECT vec_id AS id_a, cent_id AS list_id FROM assign_rank WHERE pr <= 6),
cand AS (
  SELECT DISTINCT p.id_a, b.id_b
  FROM probes p JOIN base b ON b.list_id = p.list_id AND p.id_a != b.id_b),
dots AS (
  SELECT c.id_a, c.id_b, sum(fa.val * fb.val) AS dp
  FROM cand c
  JOIN flat fa ON fa.vec_id = c.id_a
  JOIN flat fb ON fb.vec_id = c.id_b AND fb.pos = fa.pos
  GROUP BY 1, 2),
scored AS (
  SELECT id_a, id_b, round(dp / (na.nrm * nb.nrm), 6) AS cos
  FROM dots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b),
ranked AS (
  SELECT id_a, id_b, cos,
    CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS BIGINT) AS rank
  FROM scored)
SELECT id_a, id_b, cos, rank FROM ranked WHERE rank <= 5
""",
    "ann_topk_lsh": _FLAT_CTE
    + _BANDED_CTE
    + """,
dcand AS (
  SELECT id_a, id_b FROM cand
  UNION ALL
  SELECT id_b AS id_a, id_a AS id_b FROM cand),
dots AS (
  SELECT c.id_a, c.id_b, sum(fa.val * fb.val) AS dp
  FROM dcand c
  JOIN flat fa ON fa.vec_id = c.id_a
  JOIN flat fb ON fb.vec_id = c.id_b AND fb.pos = fa.pos
  GROUP BY 1, 2),
scored AS (
  SELECT id_a, id_b, round(dp / (na.nrm * nb.nrm), 6) AS cos
  FROM dots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b),
ranked AS (
  SELECT id_a, id_b, cos,
    CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS BIGINT) AS rank
  FROM scored)
SELECT id_a, id_b, cos, rank FROM ranked WHERE rank <= 5
""",
}


# broadcast-path twin: identical IVF semantics at a centroid count past the
# literal cap — only the WHERE bound differs from the ann_topk_ivf oracle
ORACLES["ann_topk_ivf_bcast"] = ORACLES["ann_topk_ivf"].replace(
    "vec_id < 16", "vec_id < 256"
)


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as CTEs — the SQL twin of
    ops.similarity.kmeans_train + one serving assignment. Each iteration:
    round-6 cosine argmax (ties to the lower list id), element-wise mean
    update, empty lists keep their previous centroid (per-pos COALESCE —
    equivalent to the engine's whole-array fallback since a non-empty list
    updates every position)."""
    sql = _FLAT_CTE + f""",
c0 AS (SELECT vec_id AS list_id, pos, val FROM flat WHERE vec_id < {k})"""
    prev = "c0"
    for i in range(1, iters + 2):  # iters updates + 1 final serving assign
        sql += f""",
dots{i} AS (
  SELECT f.vec_id, c.list_id, sum(f.val * c.val) AS dp,
         sqrt(sum(c.val * c.val)) AS cnrm
  FROM flat f JOIN {prev} c ON c.pos = f.pos
  GROUP BY f.vec_id, c.list_id),
asg{i} AS (
  SELECT vec_id, list_id FROM (
    SELECT d.vec_id, d.list_id,
      row_number() OVER (
        PARTITION BY d.vec_id
        ORDER BY round(d.dp / (n.nrm * d.cnrm), 6) DESC, d.list_id) AS rn
    FROM dots{i} d JOIN norms n ON n.vec_id = d.vec_id) WHERE rn = 1)"""
        if i <= iters:
            sql += f""",
c{i} AS (
  SELECT p.list_id, p.pos, COALESCE(u.m, p.val) AS val
  FROM {prev} p
  LEFT JOIN (
    SELECT a.list_id, f.pos, avg(f.val) AS m
    FROM asg{i} a JOIN flat f ON f.vec_id = a.vec_id
    GROUP BY a.list_id, f.pos) u
  ON u.list_id = p.list_id AND u.pos = p.pos)"""
            prev = f"c{i}"
    sql += f"""
SELECT vec_id, list_id FROM asg{iters + 1}
"""
    return sql


ORACLES["ann_kmeans_assign"] = _kmeans_oracle(k=8, iters=2)

_FILTERED_DOCS_CTE = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents
  WHERE len(trim(text)) > 0
    AND len(string_split_regex(trim(text), '\s+')) >= 30),
tok_pos AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '\s+')) AS tok,
    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM docs),
grams AS (
  SELECT doc_id,
    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM tok_pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (SELECT DISTINCT doc_id, shingle FROM grams WHERE shingle IS NOT NULL)
"""

# chunk + split over the keep-list — shared by every capstone variant: any
# CTE chain that produces `clusters(doc_id, cluster_id)` over the filtered
# `docs`/`tok_pos` plugs in above this tail.
_CAPSTONE_TAIL = """,
kept AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
tcounts AS (
  SELECT t.doc_id, max(t.pos) AS n FROM tok_pos t JOIN kept k ON k.doc_id = t.doc_id
  GROUP BY t.doc_id),
nch AS (
  SELECT doc_id,
    CASE WHEN n <= 64 THEN 1
         ELSE 1 + CAST(floor((n - 64 + 55) / 56.0) AS BIGINT) END AS n_chunks
  FROM tcounts),
cseq AS (
  SELECT doc_id, unnest(generate_series(0, CAST(n_chunks AS INT) - 1)) AS c
  FROM nch),
chunked AS (
  SELECT t.doc_id, s.c AS chunk_id,
    string_agg(t.tok, ' ' ORDER BY t.pos) AS chunk_text,
    CAST(count(*) AS BIGINT) AS n_tokens
  FROM cseq s
  JOIN tok_pos t ON t.doc_id = s.doc_id
    AND t.pos BETWEEN s.c * 56 + 1 AND s.c * 56 + 64
  GROUP BY t.doc_id, s.c),
splits AS (
  SELECT k.doc_id,
    CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
      CAST(('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        / 4294967296.0 AS u
    FROM kept) k)
SELECT c.doc_id, c.chunk_id, md5(c.chunk_text) AS chunk_md5, c.n_tokens, s.split
FROM chunked c JOIN splits s ON s.doc_id = c.doc_id
"""

ORACLES["training_mix"] = (
    _FILTERED_DOCS_CTE
    + _NEARDUP_CTE
    + _CLUSTER_CTE.replace("FROM documents d", "FROM docs d")
    + _CAPSTONE_TAIL
)

# SimHash pair generation over the FILTERED corpus, emitting the same
# `verified(doc_a, doc_b)` contract _NEARDUP_CTE does, so _CLUSTER_CTE +
# _CAPSTONE_TAIL compose unchanged. Signature CTE renamed sh_sig: `sh`
# already names the shingle set in _FILTERED_DOCS_CTE.
_SIMHASH_PAIRS_FILTERED_CTE = """,
tok_d AS (SELECT DISTINCT doc_id, tok FROM tok_pos),
th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok_d),
bits AS (
  SELECT doc_id, b,
    strpos('0123456789abcdef', substr(h, CAST(floor(b / 4) AS INT) + 1, 1)) - 1 AS v,
    CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END AS d
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb),
sums AS (
  SELECT doc_id, b, sum((CAST(floor(v / d) AS INT) % 2) * 2 - 1) AS s
  FROM bits GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sh_sig
  FROM sums GROUP BY doc_id),
blocks AS (
  SELECT doc_id, blk, substr(sh_sig, blk * 16 + 1, 16) AS block_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS blk) t),
okblk AS (
  SELECT blk, block_key FROM blocks GROUP BY blk, block_key
  HAVING count(*) <= 200),
scand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN okblk o ON o.blk = a.blk AND o.block_key = a.block_key
  JOIN blocks b ON b.blk = a.blk AND b.block_key = a.block_key
    AND a.doc_id < b.doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM scand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
  WHERE (SELECT count(*) FROM unnest(generate_series(1, 64)) g(i)
         WHERE substr(sa.sh_sig, CAST(i AS INT), 1)
            <> substr(sb.sh_sig, CAST(i AS INT), 1)) <= 3)
"""

ORACLES["training_mix_simhash"] = (
    _FILTERED_DOCS_CTE
    + _SIMHASH_PAIRS_FILTERED_CTE
    + _CLUSTER_CTE.replace("FROM documents d", "FROM docs d")
    + _CAPSTONE_TAIL
)

ORACLES["text_chunking"] = r"""
WITH tok_pos AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '\s+')) AS tok,
    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE len(trim(text)) > 0),
counts AS (SELECT doc_id, max(pos) AS n FROM tok_pos GROUP BY doc_id),
nch AS (
  SELECT doc_id,
    CASE WHEN n <= 64 THEN 1
         ELSE 1 + CAST(floor((n - 64 + 55) / 56.0) AS BIGINT) END AS n_chunks
  FROM counts),
cseq AS (
  SELECT doc_id, unnest(generate_series(0, CAST(n_chunks AS INT) - 1)) AS c
  FROM nch),
chunked AS (
  SELECT t.doc_id, s.c AS chunk_id,
    string_agg(t.tok, ' ' ORDER BY t.pos) AS chunk_text,
    CAST(count(*) AS BIGINT) AS n_tokens
  FROM cseq s
  JOIN tok_pos t ON t.doc_id = s.doc_id
    AND t.pos BETWEEN s.c * 56 + 1 AND s.c * 56 + 64
  GROUP BY t.doc_id, s.c)
SELECT doc_id, chunk_id, md5(chunk_text) AS chunk_md5, n_tokens FROM chunked
"""

ORACLES["pack_sequences"] = r"""
WITH tok_pos AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '\s+')) AS tok,
    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE len(trim(text)) > 0),
counts AS (SELECT doc_id, max(pos) AS n FROM tok_pos GROUP BY doc_id),
nch AS (
  SELECT doc_id,
    CASE WHEN n <= 64 THEN 1
         ELSE 1 + CAST(floor((n - 64 + 55) / 56.0) AS BIGINT) END AS n_chunks
  FROM counts),
cseq AS (
  SELECT doc_id, unnest(generate_series(0, CAST(n_chunks AS INT) - 1)) AS c
  FROM nch),
chunked AS (
  SELECT t.doc_id, s.c AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM cseq s
  JOIN tok_pos t ON t.doc_id = s.doc_id
    AND t.pos BETWEEN s.c * 56 + 1 AND s.c * 56 + 64
  GROUP BY t.doc_id, s.c),
sh AS (
  SELECT doc_id, chunk_id, n_tokens,
    CAST(('0x' || substr(md5('p1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
      AS shard
  FROM chunked),
packed AS (
  SELECT doc_id, chunk_id, shard, n_tokens,
    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM sh)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, CAST(shard AS BIGINT) AS shard,
  CAST(start_tok AS BIGINT) AS start_tok,
  CAST(floor(start_tok / 256.0) AS BIGINT) AS pack_id,
  n_tokens
FROM packed
"""

ORACLES["corpus_split_sample"] = """
WITH u AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 AS us,
    CAST(('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 AS up
  FROM documents)
SELECT doc_id,
  CASE WHEN us < 0.9 THEN 'train' WHEN us < 0.95 THEN 'val' ELSE 'test' END AS split,
  (up < 0.2) AS in_sample
FROM u
"""

ORACLES["embed_quantize"] = _FLAT_CTE + """,
scales AS (SELECT vec_id, max(abs(val)) / 127.0 AS scale FROM flat GROUP BY vec_id),
codes AS (
  SELECT f.vec_id,
    CASE WHEN s.scale <= 0 THEN 0
         ELSE GREATEST(-127, LEAST(127, CAST(round(f.val / s.scale) AS INT)))
    END AS q, f.pos
  FROM flat f JOIN scales s ON s.vec_id = f.vec_id)
SELECT c.vec_id, round(s.scale, 6) AS scale,
       string_agg(CAST(c.q AS VARCHAR), ',' ORDER BY c.pos) AS q_csv
FROM codes c JOIN scales s ON s.vec_id = c.vec_id
GROUP BY c.vec_id, s.scale
"""

# persisted-index serving is semantically identical to the in-memory IVF
# (same centroids, probes, re-rank): the oracle is shared
ORACLES["ann_topk_ivf_index"] = ORACLES["ann_topk_ivf"]


def _ivf_recall_oracle(k: int = 5, probes=(1, 2, 4)) -> str:
    """Recall sweep twin: exact top-k over the sampled queries + the
    ann_topk_ivf pipeline at each probe setting; recall = one integer hit
    sum / one division (matches the engine's bit-deterministic form)."""
    sql = _FLAT_CTE + f""",
cents AS (SELECT vec_id AS cent_id, pos, val FROM flat WHERE vec_id < 16),
cnorm AS (SELECT cent_id, sqrt(sum(val * val)) AS cnrm FROM cents GROUP BY cent_id),
assign_dots AS (
  SELECT f.vec_id, c.cent_id, sum(f.val * c.val) AS dp
  FROM flat f JOIN cents c ON c.pos = f.pos
  GROUP BY 1, 2),
assign_cos AS (
  SELECT a.vec_id, a.cent_id, round(a.dp / (n.nrm * cn.cnrm), 6) AS cos
  FROM assign_dots a
  JOIN norms n ON n.vec_id = a.vec_id
  JOIN cnorm cn ON cn.cent_id = a.cent_id),
assign_rank AS (
  SELECT vec_id, cent_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS pr
  FROM assign_cos),
base AS (SELECT vec_id AS id_b, cent_id AS list_id FROM assign_rank WHERE pr = 1),
exact_dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.val * b.val) AS dp
  FROM flat a JOIN flat b ON b.pos = a.pos AND b.vec_id != a.vec_id
  WHERE a.vec_id % 5 = 0
  GROUP BY 1, 2),
exact_k AS (
  SELECT id_a, id_b FROM (
    SELECT d.id_a, d.id_b,
      row_number() OVER (PARTITION BY d.id_a
        ORDER BY round(d.dp / (na.nrm * nb.nrm), 6) DESC, d.id_b) AS rnk
    FROM exact_dots d
    JOIN norms na ON na.vec_id = d.id_a
    JOIN norms nb ON nb.vec_id = d.id_b) WHERE rnk <= {k})"""
    for p in probes:
        sql += f""",
probes{p} AS (
  SELECT vec_id AS id_a, cent_id AS list_id FROM assign_rank
  WHERE pr <= {p} AND vec_id % 5 = 0),
cand{p} AS (
  SELECT DISTINCT pp.id_a, b.id_b
  FROM probes{p} pp JOIN base b ON b.list_id = pp.list_id AND pp.id_a != b.id_b),
dots{p} AS (
  SELECT c.id_a, c.id_b, sum(fa.val * fb.val) AS dp
  FROM cand{p} c
  JOIN flat fa ON fa.vec_id = c.id_a
  JOIN flat fb ON fb.vec_id = c.id_b AND fb.pos = fa.pos
  GROUP BY 1, 2),
topk{p} AS (
  SELECT id_a, id_b FROM (
    SELECT d.id_a, d.id_b,
      row_number() OVER (PARTITION BY d.id_a
        ORDER BY round(d.dp / (na.nrm * nb.nrm), 6) DESC, d.id_b) AS rnk
    FROM dots{p} d
    JOIN norms na ON na.vec_id = d.id_a
    JOIN norms nb ON nb.vec_id = d.id_b) WHERE rnk <= {k}),
hits{p} AS (
  SELECT e.id_a, count(*) AS h
  FROM exact_k e JOIN topk{p} t ON t.id_a = e.id_a AND t.id_b = e.id_b
  GROUP BY 1),
rec{p} AS (
  SELECT CAST({p} AS BIGINT) AS n_probe,
    round(sum(COALESCE(h.h, 0)) * 1.0 / ({k} * count(*)), 6) AS avg_recall,
    CAST(count(*) AS BIGINT) AS n_queries
  FROM (SELECT DISTINCT id_a FROM exact_k) q
  LEFT JOIN hits{p} h ON h.id_a = q.id_a)"""
    sql += "\n" + "\nUNION ALL\n".join(
        f"SELECT * FROM rec{p}" for p in probes
    )
    return sql


ORACLES["ann_recall_sweep"] = _ivf_recall_oracle()


def queries():
    return {
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "text_repetition": q_text_repetition,
        "decontaminate": q_decontaminate,
        "contamination_overlap": q_contamination_overlap,
        "corpus_vocab": q_corpus_vocab,
        "quality_filter": q_quality_filter,
        "bpe_pairs": q_bpe_pairs,
        "bpe_merges": q_bpe_merges,
        "key_profile_events": q_key_profile_events,
        "text_chunking": q_text_chunking,
        "pack_sequences": q_pack_sequences,
        "corpus_split_sample": q_corpus_split_sample,
        "training_mix": q_training_mix,
        "training_mix_simhash": q_training_mix_simhash,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_neardup_pipeline": q_dedup_neardup_pipeline,
        "dedup_keep_list": q_dedup_keep_list,
        "dedup_clusters": q_dedup_clusters,
        "dedup_cluster_stats": q_dedup_cluster_stats,
        "dedup_keep_list_transitive": q_dedup_keep_list_transitive,
        "dedup_keep_list_quality": q_dedup_keep_list_quality,
        "dedup_simhash_neardup": q_dedup_simhash_neardup,
        "dedup_winnow": q_dedup_winnow,
        "dedup_incremental": q_dedup_incremental,
        "dedup_simhash": q_dedup_simhash,
        "mm_feature_extract": q_mm_feature_extract,
        "mm_frame_sample": q_mm_frame_sample,
        "embed_neardup_cosine": q_embed_neardup_cosine,
        "embed_lsh_buckets": q_embed_lsh_buckets,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_bcast": q_ann_topk_ivf_bcast,
        "ann_kmeans_assign": q_ann_kmeans_assign,
        "ann_topk_ivf_index": q_ann_topk_ivf_index,
        "ann_recall_sweep": q_ann_recall_sweep,
        "embed_quantize": q_embed_quantize,
    }


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if v is not None}
