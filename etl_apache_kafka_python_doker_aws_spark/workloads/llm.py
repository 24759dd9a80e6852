"""LLM-data-pipeline queries — SURVEY.md §2.11 (L1-L5) over the
`documents` and `embeddings` fixtures. SQL-expressible ops carry DuckDB
oracles; sketch/LSH ops (seeded, deterministic) are rows-only and their
accuracy is asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.functions import text as tx
from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
    content_hash,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
    attach_fake_media,
    decode_image_features,
)
from etl_apache_kafka_python_doker_aws_spark.functions.similarity import cosine_topk, lsh_topk
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "l1_exact_dedup",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_unique_contents,
           CAST(COUNT(*) - COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_exact_dupes
    FROM documents
    GROUP BY lang
    """,
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact-content dedup accounting by language (sha256 content
    hash; dedup itself = dropDuplicates on the hash)."""
    d = load_table(spark, sf_dir, "documents")
    return d.withColumn("_h", content_hash("text")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_h").alias("n_unique_contents"),
        (F.count("*") - F.countDistinct("_h")).alias("n_exact_dupes"),
    )


@query("l2_minhash_near_dup")  # LSH candidate set → rows-only (tests assert recall)
def l2_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join),
    seeded → deterministic. Rows-only: the candidate set depends on the
    LSH parameters, not on ANSI-SQL-expressible semantics."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        d, "doc_id", "text", num_hashes=32, bands=4, shingle_n=3, threshold=0.5
    )


@query(
    "l2_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'))) AS tok
      FROM documents WHERE doc_id < 200
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.4
    """,
)
def l2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: exact token-set Jaccard pairs via inverted-index self-join
    (restricted to doc_id < 200 to bound the quadratic verify step)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", min_jaccard=0.4)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query("l2_simhash")  # Pandas-UDF fingerprint → rows-only
def l2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: 64-bit SimHash fingerprints (Arrow-batched Pandas UDF) +
    bucket key for banded near-dup search."""
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        simhash("text").alias("simhash64"),
    ).withColumn("bucket_hi16", F.shiftrightunsigned("simhash64", 48))


@query(
    "l3_cosine_topk",
    oracle="""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
               AS cos_sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    """,
)
def l3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: exact brute-force top-5 cosine neighbors for 10 query vectors
    (broadcast queries ⋈ corpus, HOF dot products, window top-k)."""
    e = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"
    )


@query("l3_ann_lsh")  # approximate → rows-only (tests assert recall vs exact)
def l3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: sign-LSH bucketed approximate top-k (band equi-join
    instead of full scan; recall asserted ≥0.6 in tests vs brute force)."""
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_planes=48, band_bits=4, dim=64)


@query(
    "l4_token_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'))), 4) AS avg_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def l4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-language token statistics (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    ntok = tx.token_count_whitespace("text")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "l4_word_topk",
    oracle="""
    WITH words AS (
      SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS word
      FROM documents
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM words WHERE word != ''
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
)
def l4_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus-wide top-20 words — explode + partial-agg word count
    (shuffle carries (word, partial-count), never raw tokens)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tx.tokenize("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@query(
    "l4_quality",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_calc,
           LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS n_tokens,
           ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                                      t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
                 / LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')), 6) AS stopword_ratio
    FROM documents
    WHERE doc_id < 100
    """,
)
def l4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: quality-scoring features (char/token counts, stopword ratio)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = tx.quality_features("text")
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars_calc"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
    )


@query(
    "l4_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'))), ' ')) AS fp_md5
    FROM documents
    """,
)
def l4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: canonical-form document fingerprint (md5 of the sorted distinct
    token set); the order-sensitive rolling-hash variant is Spark-only and
    covered in tests."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint_md5("text").alias("fp_md5"))


@query("l4_lang_id")  # heuristic → rows-only (fixture text is synthetic word soup)
def l4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: language-ID heuristics — marker-word scoring and the literal
    char-trigram n-gram form, side by side (JVM-only, deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        tx.lang_id_heuristic("text").alias("lang_pred_words"),
        tx.lang_id_char_ngrams("text").alias("lang_pred_trigrams"),
    )


@query(
    "l4_pii_mask",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 (555) 010-'
                  || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           REGEXP_REPLACE(
             REGEXP_REPLACE(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS masked,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
    FROM aug
    """,
)
def l4_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: PII scrub pass (emails/phones → typed placeholders) before
    corpus export. The fixture text carries no PII, so the query plants a
    deterministic email+phone per doc (same expression in the oracle) and
    masking must remove every one — pure regexp_replace, JVM codegen.
    Patterns stay in the Java∩RE2 regex subset (functions/text.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        tx.mask_pii("text").alias("masked"),
        F.size(F.regexp_extract_all("text", F.lit(tx.EMAIL_RE), 0)).cast("bigint").alias(
            "n_emails"
        ),
    )


@query(
    "l4_chunk_tokens",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id < 200
    ),
    idx AS (
      SELECT doc_id, t,
             UNNEST(GENERATE_SERIES(0, CAST(FLOOR((LEN(t) - 1) / 80.0) AS INT))) AS ci
      FROM toks WHERE LEN(t) > 0
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           ARRAY_TO_STRING(LIST_SLICE(t, ci * 80 + 1, ci * 80 + 100), ' ') AS chunk,
           CAST(LEN(LIST_SLICE(t, ci * 80 + 1, ci * 80 + 100)) AS BIGINT) AS n_tokens
    FROM idx
    """,
)
def l4_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: overlapping token-window chunking (context-window packing for
    training pipelines): chunk_size=100, overlap=20 → stride 80. The
    chunk array is built with JVM HOFs and exploded; the shuffle-free
    plan is one Generate over the scan."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chunked = d.select(
        "doc_id", F.posexplode(tx.chunk_tokens("text", 100, 20)).alias("chunk_idx", "chunk")
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.size(F.split("chunk", " ")).cast("bigint").alias("n_tokens"),
    )


@query("l5_multimodal")  # binary plumbing + stubbed decode → rows-only
def l5_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: multimodal column plumbing — attach deterministic binary media
    payload + metadata struct to documents, then run the Arrow-batched
    mapInPandas feature extractor (fake decode; real decode raises by
    design in this container)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = attach_fake_media(d, "doc_id")
    return decode_image_features(media, "doc_id", fake=True)


@query(
    "l2_embedding_cosine_dup",
    oracle="""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
             AS cos_sim
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.5
    """,
)
def l2_embedding_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 variant 5: embedding-cosine near-dup pairs — exact all-pairs on
    a bounded subset (the oracle-checkable form; the LSH-bucketed form is
    l2_embedding_cosine_lsh)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    pairs = embedding_near_dup_pairs(e, threshold=0.5, exact=True)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


@query("l2_embedding_cosine_lsh")  # LSH candidates → rows-only (recall in tests)
def l2_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 variant 5 at scale: the same cosine-threshold pairs via sign-LSH
    band self-join (bucket-then-verify; no cross join)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    # dim is a required parameter since r5 (the probe-a-row fallback was
    # deleted per VERDICT r4 #2); fixture embeddings are 64-d
    return embedding_near_dup_pairs(e, threshold=0.5, exact=False, dim=64)


@query("l3_ann_ivf")  # approximate → rows-only (recall vs exact in tests)
def l3_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path #2: IVF top-k (seeded KMeans cells + n_probe search) —
    data-adaptive alternative to the LSH variant."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_cells=16, n_probe=4)


@query("l4_tfidf")  # MLlib vectors → rows-only (weight ordering asserted in tests)
def l4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: TF-IDF document vectors (HashingTF + IDF, feature hashing —
    no vocab broadcast). Output: doc_id + top hashed-term weight."""
    from pyspark.ml.functions import vector_to_array

    from etl_apache_kafka_python_doker_aws_spark.functions.text import tfidf_features

    d = load_table(spark, sf_dir, "documents")
    feats = tfidf_features(d, "doc_id", "text")
    arr = vector_to_array(F.col("tfidf"))
    return feats.select(
        "doc_id",
        F.array_max(arr).alias("top_weight"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_terms"),
    )


@query("l2_simhash_pairs")  # banded Hamming search → rows-only
def l2_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: SimHash near-dup pairs — split-and-index banded Hamming search
    (pigeonhole band join + exact bit_count verify)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import simhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=3)


@query("l2_dedup_pipeline")  # iterative clustering → rows-only
def l2_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 capstone: full near-dedup pipeline — MinHash-LSH pairs →
    connected components (iterative min-label propagation) → keep the
    minimum-id doc per cluster. Returns per-language before/after counts."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import dedup_corpus_near

    d = load_table(spark, sf_dir, "documents")
    deduped = dedup_corpus_near(d, threshold=0.9)
    before = d.groupBy("lang").agg(F.count("*").alias("n_before"))
    after = deduped.groupBy("lang").agg(F.count("*").alias("n_after"))
    return before.join(after, "lang").select("lang", "n_before", "n_after")


@query(
    "l4_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    freqs AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM toks WHERE tok != '' GROUP BY doc_id, tok
    ),
    totals AS (SELECT doc_id, SUM(c) AS n FROM freqs GROUP BY doc_id)
    SELECT f.doc_id,
           ROUND(-SUM((c / n) * LN(c / n)), 6)          AS token_entropy,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n), 6) AS distinct_ratio
    FROM freqs f JOIN totals t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
    """,
)
def l4_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-document token Shannon entropy + repetition (distinct/total)
    ratio — the statistical quality signals behind repetition filters in
    training-data pipelines. Pure explode + two aggregations; the shuffle
    carries (doc, token, count) partials."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    freqs = (
        d.select("doc_id", F.explode(tx.tokenize("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    totals = freqs.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        freqs.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("token_entropy"),
            F.round(F.count("*") / F.first("n"), 6).alias("distinct_ratio"),
        )
    )


@query("l5_multimodal_raw8")  # numpy raster decode → rows-only
def l5_multimodal_raw8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: REAL binary decode — deterministic RAW8 raster tiles (a
    documented toy format: magic + uint16 dims + uint8 channels + raw
    pixels) generated per document, then decoded with actual numpy pixel
    math over Arrow batches: header parse, length validation,
    per-channel mean/std, 4x4 mean-pooled thumbnails. Unlike l5's gated
    JPEG path this performs the full decode computation; exact expected
    values are pinned in tests/test_llm_ops.py."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        attach_raw8_media,
        decode_raw8_features,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )
    )
    feats = decode_raw8_features(attach_raw8_media(d, "doc_id"), "doc_id")
    return feats.select(
        "doc_id", "width", "height", "channels",
        F.round(F.element_at("mean_per_channel", 1), 4).alias("mean_c0"),
        F.round(F.element_at("thumbnail_4x4", 1), 4).alias("thumb_00"),
        "valid",
    )


@query(
    "l5_multimodal_wav",
    oracle="""
    SELECT doc_id,
           TRUE AS valid,
           CAST(8000 AS INT) AS sample_rate,
           CAST(800 + (doc_id % 17) * 40 AS BIGINT) AS n_samples,
           CAST((800 + (doc_id % 17) * 40) * 1000 // 8000 AS BIGINT) AS duration_ms,
           TRUE AS rms_le_peak,
           TRUE AS peak_in_range,
           TRUE AS has_zero_crossings
    FROM documents WHERE doc_id < 200
    """,
)
def l5_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5c: REAL audio decode — deterministic RIFF/PCM16 WAV clips (true
    44-byte-header files, sine tones parameterized by doc_id) generated
    per document, then chunk-walked and decoded with numpy sample math
    over Arrow batches: RMS, peak, zero-crossing count. The generation
    parameters are pure functions of doc_id, so the integer features
    (sample_rate, n_samples, duration_ms) are EXACTLY mirrored by the
    DuckDB oracle, and the float features are emitted as always-true
    acoustic invariants (RMS <= peak; peak within [0.9a, a] of the
    commanded amplitude a; an audible tone crosses zero). Exact RMS for
    a known clip is pinned in tests/test_llm_ops.py; poison blobs yield
    valid=false there too."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        attach_wav_media,
        decode_wav_features,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )
    )
    feats = decode_wav_features(attach_wav_media(d, "doc_id"), "doc_id")
    amp = F.lit(3000) + F.pmod(F.col("doc_id"), F.lit(9)) * 3000
    return feats.select(
        "doc_id",
        "valid",
        "sample_rate",
        "n_samples",
        "duration_ms",
        (F.col("rms") <= F.col("peak")).alias("rms_le_peak"),
        ((F.col("peak") <= amp) & (F.col("peak") >= amp * 0.9)).alias("peak_in_range"),
        (F.col("zero_crossings") > 0).alias("has_zero_crossings"),
    )


@query(
    "l5_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(UNNEST(GENERATE_SERIES(0, 2000 + (doc_id % 20) * 500, 1000))
                AS BIGINT) AS frame_ts_ms
    FROM documents WHERE doc_id < 100
    """,
)
def l5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d: video frame-sampling plumbing — each clip row expands to one
    row per sampled frame timestamp (sequence + explode, JVM-side; the
    per-frame pixel decode is the same gated/RAW8 path as images). Clip
    duration is a pure function of doc_id (2000 + (id % 20) * 500 ms), so
    the sampled timestamp grid is EXACTLY mirrored by the DuckDB oracle's
    GENERATE_SERIES — the row-explosion semantics (inclusive bounds,
    1000 ms stride) are what is being verified."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )
    clips = d.withColumn(
        "media_meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.lit(2000) + F.pmod(F.col("doc_id"), F.lit(20)) * 500)
            .cast("long")
            .alias("duration_ms"),
            F.lit(0).cast("long").alias("n_bytes"),
        ),
    )
    return sample_frames(clips, "doc_id", payload_col="media", every_ms=1000)
