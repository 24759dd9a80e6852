"""LLM-data-pipeline queries — SURVEY.md §2.11 (L1-L5) over the
`documents` and `embeddings` fixtures. SQL-expressible ops carry exact
DuckDB oracles; sketch/LSH ops (seeded, deterministic) carry exact
BOOLEAN-CONTRACT oracles since r5 — planted verbatim duplicates that any
sound near-dup detector must recover (the oracle enumerates the planted
pairs, ids included), recall bounds vs engine-computed brute force, and
determinism/range invariants — so every registered query is
driver-checkable; finer-grained accuracy is asserted in tests.
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


@query(
    "l1_incremental_exact_dedup",
    oracle="""
    SELECT doc_id AS id_a,
           doc_id + 200000 AS id_b,
           TRUE AS dup_found,
           TRUE AS keeper_ok,
           TRUE AS novel_is_new,
           TRUE AS same_after_compact
    FROM documents d1
    WHERE doc_id % 25 = 0 AND text IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM documents d2
                      WHERE d2.text = d1.text AND d2.doc_id <> d1.doc_id)
    """,
)
def l1_incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 INCREMENTAL exact dedup against a persisted content-hash
    table (r12, ``functions/exact_index.py`` — the L1 analog of
    l2_incremental_dedup/l2_incremental_semdedup, completing the
    lifecycle symmetry across all three dedup tiers): each crawl
    snapshot appends its sha256 hashes once and asks "which of MY
    documents duplicate something already ingested" at
    batch-proportional cost; retraction is a request-sized tombstone.

    Script: index the corpus (b0) and verbatim copies of every 25th
    unique-text doc under id+100000 (b1); TOMBSTONE-DELETE the even
    SOURCES (doc_id % 50 == 0) via ``sha_table_delete``; append b2 =
    fresh copies under id+200000 plus NOVEL texts under id+300000;
    verdict b2 with ``sha_table_dedup_batch``; compact; verdict again.

    Contract (oracle enumerates every unique-text plant): (a)
    ``dup_found`` — every b2 copy is flagged (its content survives:
    the b1 copy is never retracted); (b) ``keeper_ok`` — first
    occurrence wins AND respects retraction: the keeper is the source
    doc d itself unless d was retracted, in which case it falls to the
    earliest LIVE copy d+100000; (c) ``novel_is_new`` — suffixed texts
    are not flagged; (d) ``same_after_compact`` — the CTAS fold-in
    (which also recomputes nothing per-row: hashes are content-pure)
    changes no verdict, compared between the eagerly-pinned pre-compact
    snapshot and the post-compact run (the r11 swap-vs-laziness rule).
    The unique-text restriction (both sides) keeps the expected keeper
    well-defined if the corpus carries natural exact dupes."""
    from etl_apache_kafka_python_doker_aws_spark.functions.exact_index import (
        drop_sha_table,
        sha_table_append,
        sha_table_compact,
        sha_table_dedup_batch,
        sha_table_delete,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup_texts = (
        d.groupBy("text").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > 1).select("text")
    )
    # persisted: the corpus-wide dup-text anti-join would otherwise be
    # re-evaluated by every append/delete/expected lineage below
    # (review r12 — ~6 separate evaluations)
    eligible = (
        d.filter(
            (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
            & F.col("text").isNotNull()
        )
        .join(dup_texts, "text", "left_anti")
        .persist()
    )
    b1 = eligible.select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
    )
    retract = eligible.filter(
        F.pmod(F.col("doc_id"), F.lit(2 * _PLANT_STEP)) == 0
    ).select("doc_id")
    b2 = eligible.select(
        (F.col("doc_id") + 2 * _PLANT_OFFSET).alias("doc_id"), "text"
    ).unionByName(
        eligible.select(
            (F.col("doc_id") + 3 * _PLANT_OFFSET).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" __r12novel__"), F.col("doc_id")
            ).alias("text"),
        )
    )
    tbl = _session_table(spark, "l1_sha_incr")
    drop_sha_table(spark, tbl)
    sha_table_append(d, "doc_id", "text", tbl, batch_id="b0", buckets=8)
    sha_table_append(b1, "doc_id", "text", tbl, batch_id="b1", buckets=8)
    sha_table_delete(spark, tbl, retract, compact_threshold=2.0)
    sha_table_append(b2, "doc_id", "text", tbl, batch_id="b2", buckets=8)
    pre = sha_table_dedup_batch(spark, tbl, "b2").localCheckpoint(eager=True)
    sha_table_compact(spark, tbl)
    post = sha_table_dedup_batch(spark, tbl, "b2")
    # SYMMETRIC anti-join diff (review r12 — an inner join on doc_id
    # would hide rows compaction wrongly dropped or duplicated, passing
    # the invariance contract exactly when compaction corrupted the
    # index); keeper_id is nullable and anti-join keys never match
    # NULL, so it is coalesced to a sentinel outside the id space
    norm = lambda df: df.select(  # noqa: E731
        "doc_id", "is_dup", F.coalesce("keeper_id", F.lit(-1)).alias("_k")
    )
    n_diff = (
        norm(pre).join(norm(post), ["doc_id", "is_dup", "_k"], "left_anti")
        .unionByName(
            norm(post).join(norm(pre), ["doc_id", "is_dup", "_k"], "left_anti")
        )
        .agg(F.count("*").alias("_nd"))
    )
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 2 * _PLANT_OFFSET).alias("id_b"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(2 * _PLANT_STEP)) == 0,
            F.col("doc_id") + _PLANT_OFFSET,
        ).otherwise(F.col("doc_id")).alias("_want_keeper"),
        (F.col("doc_id") + 3 * _PLANT_OFFSET).alias("_novel_id"),
    )
    return (
        expected.join(post, expected["id_b"] == post["doc_id"], "left")
        .join(
            post.select(
                F.col("doc_id").alias("_nid"),
                F.col("is_dup").alias("_novel_dup"),
            ),
            F.col("_novel_id") == F.col("_nid"),
            "left",
        )
        .crossJoin(F.broadcast(n_diff))
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("dup_found"),
            F.coalesce(
                F.col("keeper_id") == F.col("_want_keeper"), F.lit(False)
            ).alias("keeper_ok"),
            F.coalesce(~F.col("_novel_dup"), F.lit(False)).alias(
                "novel_is_new"
            ),
            (F.col("_nd") == 0).alias("same_after_compact"),
        )
    )


@query(
    "l1_payload_verdict",
    oracle="""
    WITH dup AS (
      SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           (doc_id % 2 = 0) AS copy_en,
           TRUE AS en_hit_iff_en,
           TRUE AS en_verdict_ok,
           TRUE AS broad_all_dup
    FROM documents
    WHERE doc_id % 25 = 0 AND text IS NOT NULL
      AND text NOT IN (SELECT text FROM dup)
    """,
)
def l1_payload_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: stored-payload PREDICATE on the exact-dedup verdict (r15 —
    the payload rule completed across all THREE dedup tiers):
    ``sha_table_append(payload_cols=["lang"])`` stores the attribute on
    every hash row; ``sha_table_dedup_batch(where="lang = 'en'")``
    answers "is this batch a duplicate of any LICENSED earlier
    document?" with the predicate as a pushed scan filter on the
    co-located bucketed plan (zero extra joins/shuffles — the
    l2_payload_pairs / l3_payload_ann rule on the exact tier).

    Script: index corpus with ``lang`` = 'en' iff doc_id even; batch =
    verbatim copies of every 25th unique-text doc under id+100000
    (+100000 preserves parity, so a copy shares its source's lang).
    Contract (oracle enumerates every plant): (a) ``en_hit_iff_en`` —
    the copy appears in the 'en'-filtered verdict iff it is 'en'
    (filtered-out batch rows are ABSENT, per-filtered-corpus); (b)
    ``en_verdict_ok`` — every 'en' verdict row is flagged dup with
    keeper = its source doc (the keeper satisfies the predicate;
    unique texts make it well-defined); (c) ``broad_all_dup`` — under
    the all-covering predicate every planted copy is flagged."""
    from etl_apache_kafka_python_doker_aws_spark.functions.exact_index import (
        drop_sha_table,
        sha_table_append,
        sha_table_dedup_batch,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lang_of = F.when(
        F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit("en")
    ).otherwise(F.lit("de"))
    dup_texts = (
        d.groupBy("text").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > 1).select("text")
    )
    eligible = (
        d.filter(
            (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
            & F.col("text").isNotNull()
        )
        .join(dup_texts, "text", "left_anti")
        .persist()
    )
    b1 = eligible.select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
    )
    tbl = _session_table(spark, "l1_sha_payload")
    drop_sha_table(spark, tbl)
    sha_table_append(
        d.withColumn("lang", lang_of), "doc_id", "text", tbl,
        batch_id="b0", buckets=8, payload_cols=["lang"],
    )
    sha_table_append(
        b1.withColumn("lang", lang_of), "doc_id", "text", tbl,
        batch_id="b1", buckets=8,
    )
    en = sha_table_dedup_batch(
        spark, tbl, "b1", where="lang = 'en'"
    ).localCheckpoint(eager=True)  # two consumers (presence join +
    # verdict audit): pin one evaluation (the r10 rule)
    broad = sha_table_dedup_batch(
        spark, tbl, "b1", where="lang IN ('en', 'de')"
    )
    n_bad_en = en.filter(
        (~F.col("is_dup"))
        | (F.col("keeper_id") != F.col("doc_id") - _PLANT_OFFSET)
    ).agg(F.count("*").alias("_nbe"))
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(
            en.select(F.col("doc_id").alias("_ed")),
            F.col("id_b") == F.col("_ed"),
            "left",
        )
        .join(
            broad.select(
                F.col("doc_id").alias("_bd"), F.col("is_dup").alias("_bdup")
            ),
            F.col("id_b") == F.col("_bd"),
            "left",
        )
        .crossJoin(F.broadcast(n_bad_en))
        .select(
            "id_a",
            "id_b",
            (F.pmod(F.col("id_a"), F.lit(2)) == 0).alias("copy_en"),
            (
                F.col("_ed").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2)) == 0)
            ).alias("en_hit_iff_en"),
            (F.col("_nbe") == 0).alias("en_verdict_ok"),
            F.coalesce(F.col("_bdup"), F.lit(False)).alias("broad_all_dup"),
        )
    )


#: Planted-duplicate scaffold shared by the near-dup contract queries:
#: copy every 25th document verbatim under doc_id + 100000 (far above the
#: fixture id range). A verbatim copy has Jaccard 1.0 with its original
#: by DEFINITION, so any sound near-dup detector must pair (id, id+1e5)
#: — which turns the approximate operator into a driver-checkable one:
#: the oracle enumerates the planted pairs exactly, and the Spark side
#: reports whether the operator recovered each (the a4/l7/l11
#: boolean-contract pattern, VERDICT r4 next-round #1).
_PLANT_STEP = 25
_PLANT_OFFSET = 100000


def _with_planted_copies(d: DataFrame, min_tokens: int = 0) -> DataFrame:
    base = d.select("doc_id", "text")
    eligible = base.filter(F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
    if min_tokens > 0:
        eligible = eligible.filter(F.size(tx.tokenize("text")) >= min_tokens)
    copies = eligible.select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
    )
    return base.unionByName(copies)


@query(
    "l2_minhash_near_dup",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           TRUE AS found,
           TRUE AS est_is_one
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def l2_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join),
    seeded → deterministic. Driver contract: every 25th document is
    planted as a verbatim copy under id+100000; identical text gives an
    identical signature, which collides in EVERY band and estimates
    Jaccard exactly 1.0 — so each planted pair must appear in the
    operator's output with est_jaccard = 1.0. The oracle enumerates the
    planted pairs exactly (ids included); recall over the organic corpus
    is asserted separately in tests/test_llm_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    aug = _with_planted_copies(d, min_tokens=3)  # <3-token docs have no shingles
    pairs = minhash_near_dup_pairs(
        aug, "doc_id", "text", num_hashes=32, bands=4, shingle_n=3, threshold=0.5
    )
    expected = (
        d.filter(
            (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
            & (F.size(tx.tokenize("text")) >= 3)
        )
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
        )
    )
    return expected.join(pairs, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.col("est_jaccard").isNotNull().alias("found"),
        (F.col("est_jaccard") == 1.0).alias("est_is_one"),
    )


@query(
    "l2_incremental_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           TRUE AS found_cross_batch,
           TRUE AS no_missing,
           TRUE AS no_extra
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def l2_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 INCREMENTAL dedup (VERDICT r6 #1): dedup a NEW batch against a
    PERSISTED MinHash band index instead of recomputing the corpus —
    the crawl-snapshot shape a 100 TB pipeline actually runs
    (functions/dedup_index.py; index = the banded signatures parquet'd,
    partitionBy band_idx, params pinned in meta).

    Contract, two layers: (a) planted duplicates — every 25th eligible
    document arrives in the NEW batch as a verbatim copy under
    id+100000; the copy's signature equals the original's, so the
    batch-vs-index equi-join must pair them (``found_cross_batch``; the
    oracle enumerates the planted pairs exactly). (b) union
    losslessness — pairs_vs_batch(b0) ∪ pairs_vs_batch(b1) must equal
    the from-scratch whole-corpus ``minhash_near_dup_pairs`` on
    base∪new, both directions (``no_missing``/``no_extra`` — the d6
    losslessness pattern; exact here because the skew cap doesn't bind
    on the fixture)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_dedup_batch,
        minhash_index_pairs_vs_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
        & (F.size(tx.tokenize("text")) >= 3)
    )
    new = eligible.select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    path = _scratch_dir(spark, "mh_idx_l2incr")
    minhash_index_append(d, "doc_id", "text", path, batch_id="b0")
    p0 = minhash_index_pairs_vs_batch(spark, path, "b0")
    p1 = minhash_index_dedup_batch(new, "doc_id", "text", path, batch_id="b1")
    whole = minhash_near_dup_pairs(
        _with_planted_copies(d, min_tokens=3), "doc_id", "text"
    )
    incr = p0.unionByName(p1)
    n_missing = whole.join(incr, ["id_a", "id_b"], "left_anti").agg(
        F.count("*").alias("_nm")
    )
    n_extra = incr.join(whole, ["id_a", "id_b"], "left_anti").agg(
        F.count("*").alias("_ne")
    )
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(p1, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(n_missing))
        .crossJoin(F.broadcast(n_extra))
        .select(
            "id_a",
            "id_b",
            F.col("est_jaccard").isNotNull().alias("found_cross_batch"),
            (F.col("_nm") == 0).alias("no_missing"),
            (F.col("_ne") == 0).alias("no_extra"),
        )
    )


@query(
    "l2_filtered_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           (doc_id % 50 = 0) AS pair_allowed,
           TRUE AS hit_iff_allowed,
           TRUE AS all_pairs_allowed
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def l2_filtered_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: ATTRIBUTE-FILTERED near-dup pairs over the persisted band
    index (r14, VERDICT r13 #3 — the l3_filtered_ann shape on the
    dedup tier): "near-duplicates among the licensed/English subset".
    ``minhash_index_pairs_vs_batch(..., allowed=)`` semi-joins the
    caller's id set onto the index frame BEFORE the band self-join, so
    BOTH pair sides are allowed and candidate enumeration is
    per-FILTERED-corpus (a post-filter would pay the full m² candidate
    mass first — the r8 blowup).

    Script: index corpus + verbatim copies of every 25th eligible doc
    under id+100000 as one batch. allowed = BOTH endpoints of every
    SECOND planted pair (source id % 50 == 0). Contract (oracle
    enumerates every plant): (a) ``hit_iff_allowed`` — the planted pair
    appears iff both endpoints are allowed (identical signature ⇒
    found when permitted; filtered out when not, despite being a
    certain candidate); (b) ``all_pairs_allowed`` — zero emitted pairs
    name ANY id outside the allowed set, either side (engine-side
    anti-join audit)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_pairs_vs_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
        & (F.size(tx.tokenize("text")) >= 3)
    )
    aug = _with_planted_copies(d, min_tokens=3)
    path = _scratch_dir(spark, "mh_idx_filtered")
    minhash_index_append(aug, "doc_id", "text", path, batch_id="b0")
    sel = eligible.filter(F.pmod(F.col("doc_id"), F.lit(2 * _PLANT_STEP)) == 0)
    allowed = sel.select("doc_id").unionByName(
        sel.select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"))
    )
    pairs = minhash_index_pairs_vs_batch(
        spark, path, "b0", allowed=allowed
    ).localCheckpoint(eager=True)  # two consumers (pair join + audit):
    # pin one evaluation (the r10 multi-consumer determinism rule)
    out_a = pairs.join(
        allowed.select(F.col("doc_id").alias("id_a")), "id_a", "left_anti"
    )
    out_b = pairs.join(
        allowed.select(F.col("doc_id").alias("id_b")), "id_b", "left_anti"
    )
    n_outside = out_a.unionByName(out_b).agg(F.count("*").alias("_no"))
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(pairs, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(n_outside))
        .select(
            "id_a",
            "id_b",
            (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0).alias(
                "pair_allowed"
            ),
            (
                F.col("est_jaccard").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0)
            ).alias("hit_iff_allowed"),
            (F.col("_no") == 0).alias("all_pairs_allowed"),
        )
    )


@query(
    "l2_payload_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           (doc_id % 50 = 0) AS pair_en,
           TRUE AS hit_iff_en,
           TRUE AS all_pairs_en,
           TRUE AS broad_hit
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def l2_payload_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: PREDICATE-PUSHDOWN filtered near-dup pairs over STORED
    payload columns (r15 — the l3_payload_ann rule on the band tier):
    "near-duplicates among the English subset" with the attribute
    living IN the index. ``minhash_index_append(payload_cols=["lang"])``
    stores the attribute on every band row;
    ``minhash_index_pairs_vs_batch(where="lang = 'en'")`` filters BOTH
    pair sides as a PUSHED parquet scan predicate (plan-pinned in
    test_plans) — no caller-materialized allowed-id frame, no semi-join
    shuffle, at ANY selectivity. This closes the broad-filter gap of
    l2_filtered_pairs' id-set API exactly as l3_payload_ann closes
    l3_filtered_ann's.

    Script: index corpus + verbatim copies of every 25th eligible doc
    under id+100000, payload ``lang`` = 'en' iff doc_id is even
    (+100000 preserves parity, so a copy shares its source's lang and
    the planted pair is en-en iff source id % 50 == 0). Contract
    (oracle enumerates every plant): (a) ``hit_iff_en`` — the planted
    pair appears under the narrow predicate iff both endpoints are
    'en' (identical signature ⇒ certain candidate; found when
    permitted, filtered when not); (b) ``all_pairs_en`` — zero emitted
    pairs name an odd (non-'en') id on either side (engine-side audit
    via the id-derived lang rule); (c) ``broad_hit`` — under the
    all-covering predicate ``lang IN ('en','de')`` every planted pair
    is found (a broad predicate costs nothing and drops nothing —
    the scan-filter form's whole point)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_pairs_vs_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
        & (F.size(tx.tokenize("text")) >= 3)
    )
    lang_of = F.when(
        F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit("en")
    ).otherwise(F.lit("de"))
    aug = _with_planted_copies(d, min_tokens=3).withColumn("lang", lang_of)
    path = _scratch_dir(spark, "mh_idx_payload")
    minhash_index_append(
        aug, "doc_id", "text", path, batch_id="b0", payload_cols=["lang"]
    )
    narrow = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang = 'en'"
    ).localCheckpoint(eager=True)  # two consumers (pair join + audit):
    # pin one evaluation (the r10 multi-consumer determinism rule)
    broad = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang IN ('en', 'de')"
    )
    # lang is a pure function of the id — the audit needs no corpus scan
    n_bad = narrow.filter(
        (F.pmod(F.col("id_a"), F.lit(2)) != 0)
        | (F.pmod(F.col("id_b"), F.lit(2)) != 0)
    ).agg(F.count("*").alias("_nb"))
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    b_pair = broad.select(
        F.col("id_a").alias("_ba"), F.col("id_b").alias("_bb")
    )
    return (
        expected.join(narrow, ["id_a", "id_b"], "left")
        .join(
            b_pair,
            (F.col("id_a") == F.col("_ba")) & (F.col("id_b") == F.col("_bb")),
            "left",
        )
        .crossJoin(F.broadcast(n_bad))
        .select(
            "id_a",
            "id_b",
            (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0).alias(
                "pair_en"
            ),
            (
                F.col("est_jaccard").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0)
            ).alias("hit_iff_en"),
            (F.col("_nb") == 0).alias("all_pairs_en"),
            F.col("_ba").isNotNull().alias("broad_hit"),
        )
    )


@query(
    "l2_incremental_dedup_bucketed",
    scale_form="bounded",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           TRUE AS found_cross_batch,
           TRUE AS same_as_path_form
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def l2_incremental_dedup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 incremental dedup, BUCKETED-TABLE tier (round 8 — the
    SCALING.md upgrade built): the band index is a table bucketed on
    (band_idx, band_hash) with an equally-bucketed counts sidecar
    table, so the per-batch pairs query plans with ZERO Exchange except
    the tiny pair-dedup — no index shuffle per crawl snapshot at any
    index size (functions/dedup_index.py minhash_table_*; plan pinned
    in tests/test_plans.py::test_bucketed_index_join_has_no_exchange).

    Contract: (a) planted cross-batch duplicates (every 25th eligible
    doc arrives in the new batch verbatim under id+100000) are paired
    by the bucketed query (``found_cross_batch``, oracle-enumerated
    exactly); (b) the bucketed form emits EXACTLY the pair set of the
    path-backed form on the same two batches
    (``same_as_path_form`` — both directions empty anti-joins; the two
    forms share ``_pairs_for_batch``, this pins the storage layer)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_index_append,
        minhash_index_pairs_vs_batch,
        minhash_table_append,
        minhash_table_pairs_vs_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
        & (F.size(tx.tokenize("text")) >= 3)
    )
    new = eligible.select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    # applicationId suffix (ADVICE r8, the _scratch_dir rule applied to
    # the table tier): two concurrent sessions sharing a warehouse dir
    # would otherwise drop each other's live table mid-query
    tbl = _session_table(spark, "l2_band_index_bucketed")
    # drops locations too: a fresh session's catalog no-ops the DROP
    # while the warehouse dir persists → LOCATION_ALREADY_EXISTS
    drop_minhash_table(spark, tbl)
    minhash_table_append(d, "doc_id", "text", tbl, batch_id="b0", buckets=8)
    minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1", buckets=8)
    pb = minhash_table_pairs_vs_batch(spark, tbl, "b1")
    path = _scratch_dir(spark, "mh_idx_eq")
    minhash_index_append(d, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    pp = minhash_index_pairs_vs_batch(spark, path, "b1")
    n_diff = (
        pb.join(pp, ["id_a", "id_b"], "left_anti")
        .unionByName(pp.join(pb, ["id_a", "id_b"], "left_anti"))
        .agg(F.count("*").alias("_nd"))
    )
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(pb, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(n_diff))
        .select(
            "id_a",
            "id_b",
            F.col("est_jaccard").isNotNull().alias("found_cross_batch"),
            (F.col("_nd") == 0).alias("same_as_path_form"),
        )
    )


@query(
    "l2_bucketed_retraction",
    scale_form="bounded",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           TRUE AS found_cross_batch,
           TRUE AS retracted_absent,
           TRUE AS same_after_compact
    FROM t WHERE doc_id % 25 = 0 AND doc_id % 50 <> 0 AND n >= 3
    """,
)
def l2_bucketed_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 retraction on the bucketed band index (r11, VERDICT r10 #2 —
    the tombstone sidecar, oracle-checked end-to-end rather than only
    unit-tested): index the corpus (b0) plus planted verbatim copies of
    every 25th eligible doc under id+100000 (b1), then TOMBSTONE-DELETE
    every other plant (source doc_id % 50 == 0) via
    ``minhash_table_delete`` — a request-sized sidecar append, no table
    rewrite — and finally fold the tombstones in with
    ``minhash_table_compact``.

    Contract (oracle enumerates the SURVIVING plants exactly):
    (a) ``found_cross_batch`` — every surviving plant still pairs with
    its source through the tombstone anti-join; (b) ``retracted_absent``
    — zero post-delete pairs touch ANY retracted id (GDPR holds even
    for natural near-dups of the retracted plant); (c)
    ``same_after_compact`` — the CTAS fold-in changes no pair (both
    anti-join directions empty between the pre-compact snapshot and the
    post-compact query). The pre-compact pairs are eagerly
    ``localCheckpoint``-ed BEFORE compacting: compaction swaps the
    underlying table, and a lazy pre-swap lineage evaluated after the
    swap would read the wrong files (the r11 swap-vs-laziness rule)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0)
        & (F.size(tx.tokenize("text")) >= 3)
    )
    new = eligible.select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    retract = eligible.filter(
        F.pmod(F.col("doc_id"), F.lit(2 * _PLANT_STEP)) == 0
    ).select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"))
    tbl = _session_table(spark, "l2_band_retraction")
    drop_minhash_table(spark, tbl)
    minhash_table_append(d, "doc_id", "text", tbl, batch_id="b0", buckets=8)
    minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1", buckets=8)
    minhash_table_delete(spark, tbl, retract)
    # pre-compact snapshot, pinned eagerly (see docstring)
    pre = minhash_table_pairs_vs_batch(spark, tbl, "b1").localCheckpoint(
        eager=True
    )
    n_excluded = (
        pre.join(retract, pre["id_a"] == retract["doc_id"], "left_semi")
        .unionByName(
            pre.join(retract, pre["id_b"] == retract["doc_id"], "left_semi")
        )
        .agg(F.count("*").alias("_nr"))
    )
    minhash_table_compact(spark, tbl)
    post = minhash_table_pairs_vs_batch(spark, tbl, "b1")
    n_diff = (
        pre.join(post, ["id_a", "id_b"], "left_anti")
        .unionByName(post.join(pre, ["id_a", "id_b"], "left_anti"))
        .agg(F.count("*").alias("_nd"))
    )
    expected = eligible.filter(
        F.pmod(F.col("doc_id"), F.lit(2 * _PLANT_STEP)) != 0
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(post, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(n_excluded))
        .crossJoin(F.broadcast(n_diff))
        .select(
            "id_a",
            "id_b",
            F.col("est_jaccard").isNotNull().alias("found_cross_batch"),
            (F.col("_nr") == 0).alias("retracted_absent"),
            (F.col("_nd") == 0).alias("same_after_compact"),
        )
    )


@query(
    "l2_incremental_semdedup",
    oracle="""
    SELECT vec_id AS id_a,
           vec_id + 100000 AS id_b,
           TRUE AS found_cross_batch,
           TRUE AS rank1_dist0,
           TRUE AS no_extra
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l2_incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 INCREMENTAL semantic dedup (r9): dedup a NEW embedding batch
    against a PERSISTED ANN index — the embedding analog of
    l2_incremental_dedup, and the second half of the crawl-snapshot
    story: lexical near-dups go through the band index, semantic
    near-dups through this (functions/ann_index.ann_index_dedup_batch —
    append the batch encoded with the PINNED models, search it, keep
    pairs with squared-L2 dist ≤ threshold; for a cosine rule τ,
    normalize first and use 2(1−τ)). Per-snapshot cost is encode +
    one cell equi-join + the pruned refine lookup for the BATCH only —
    never re-embeds or re-scans the corpus.

    Contract (the planted-duplicate pattern): every 25th corpus vector
    arrives in the new batch as a VERBATIM copy under id+100000.
    Identical vector ⇒ same cell + same codes under pinned models ⇒
    always shortlisted ⇒ exact re-rank dist 0 at rank 1 — so the pairs
    are enumerable exactly (``found_cross_batch``/``rank1_dist0``), and
    with threshold 0.25 far below the fixture's natural minimum
    distance (measured 1.08 at sf0.01, 0.80 at sf0.1; decorrelated
    replicas keep it high at sf1) the planted pairs are ALSO the
    complete result (``no_extra``). Planted-vs-random separation, not
    a distribution-statistic bound (the r8 sweep rule)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_dedup_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    new = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    path = _scratch_dir(spark, "ann_idx_semincr")
    ann_index_build(
        e, "vec_id", "embedding", path, dim=64, n_cells=16, n_subspaces=8,
        n_centroids=32,
    )
    pairs = ann_index_dedup_batch(
        new, "vec_id", "embedding", path, batch_id="b1", threshold=0.25,
        k=5, n_probe=8, shortlist=_ann_shortlist(e),
    )
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    n_extra = pairs.join(
        expected,
        (pairs["query_id"] == expected["id_b"])
        & (pairs["neighbor_id"] == expected["id_a"]),
        "left_anti",
    ).agg(F.count("*").alias("_ne"))
    return (
        expected.join(
            pairs,
            (expected["id_b"] == pairs["query_id"])
            & (expected["id_a"] == pairs["neighbor_id"]),
            "left",
        )
        .crossJoin(F.broadcast(n_extra))
        .select(
            "id_a",
            "id_b",
            F.col("dist").isNotNull().alias("found_cross_batch"),
            F.coalesce(
                (F.col("rk") == 1) & (F.col("dist") == 0.0), F.lit(False)
            ).alias("rank1_dist0"),
            (F.col("_ne") == 0).alias("no_extra"),
        )
    )


@query(
    "l2_filtered_semdedup",
    oracle="""
    SELECT vec_id + 100000 AS query_id,
           vec_id AS neighbor_id,
           (vec_id % 50 = 0) AS src_allowed,
           TRUE AS hit_iff_allowed,
           TRUE AS all_hits_allowed
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l2_filtered_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: ATTRIBUTE-FILTERED incremental semantic dedup (r14 — the
    l2_filtered_pairs / l3_filtered_ann rule on the embedding dedup
    shape): "does this batch duplicate anything in the LICENSED
    subset?" — ``ann_index_dedup_batch(..., allowed=)`` passes the
    filter to the underlying search (pre-filter semi-join before the
    shortlist window, probes re-targeted to cells holding allowed
    rows), so the batch pairs per-FILTERED-corpus.

    Script: index the corpus (b0); the new batch is a verbatim copy of
    every 25th vector under id+100000; allowed = the SOURCE vectors of
    every 50th only (the batch's own ids excluded — within-batch pairs
    are filtered out by construction, the documented allowed contract).
    Contract (oracle enumerates every plant): (a) ``hit_iff_allowed``
    — the copy pairs its source at dist 0 iff the source is allowed
    (found when permitted despite the filter, invisible when not,
    though it is the global nearest); (b) ``all_hits_allowed`` — zero
    emitted pairs name a neighbor outside the allowed set."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_dedup_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    new = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    path = _scratch_dir(spark, "ann_idx_fsemdedup")
    ann_index_build(
        e, "vec_id", "embedding", path, dim=64, n_cells=16, n_subspaces=8,
        n_centroids=32,
    )
    allowed = planted.filter(
        F.pmod(F.col("vec_id"), F.lit(2 * _PLANT_STEP)) == 0
    ).select("vec_id")
    pairs = ann_index_dedup_batch(
        new, "vec_id", "embedding", path, batch_id="b1", threshold=0.25,
        k=5, n_probe=8, shortlist=_ann_shortlist(e), allowed=allowed,
    ).localCheckpoint(eager=True)  # two consumers (pair join + audit):
    # pin one evaluation (the r10 multi-consumer rule)
    n_outside = pairs.join(
        allowed.select(F.col("vec_id").alias("neighbor_id")),
        "neighbor_id",
        "left_anti",
    ).agg(F.count("*").alias("_no"))
    expected = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
    )
    return (
        expected.join(pairs, ["query_id", "neighbor_id"], "left")
        .crossJoin(F.broadcast(n_outside))
        .select(
            "query_id",
            "neighbor_id",
            (F.pmod(F.col("neighbor_id"), F.lit(2 * _PLANT_STEP)) == 0).alias(
                "src_allowed"
            ),
            (
                F.col("dist").isNotNull()
                == (F.pmod(F.col("neighbor_id"), F.lit(2 * _PLANT_STEP)) == 0)
            ).alias("hit_iff_allowed"),
            (F.col("_no") == 0).alias("all_hits_allowed"),
        )
    )


@query(
    "l3_ann_retraction",
    scale_form="bounded",
    oracle="""
    SELECT vec_id AS id_a,
           vec_id + 100000 AS id_b,
           TRUE AS found_after_reappend,
           TRUE AS pre_reappend_state_ok,
           TRUE AS retracted_absent,
           TRUE AS same_after_compact
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l3_ann_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 retraction on the persisted ANN index (r12, VERDICT r11 #1 —
    the tombstone sidecar, oracle-checked end-to-end like the band
    tier's l2_bucketed_retraction): index the corpus (b0) plus planted
    verbatim copies of every 25th vector under id+100000 (b1), then
    TOMBSTONE-DELETE every other plant (source vec_id % 50 == 0) via
    ``ann_index_delete`` — a request-sized sidecar append, both data
    tiers byte-untouched — then RE-APPEND the retracted copies under a
    new batch (b2: the seq-scoping contract — a re-ingested id lives
    while its retracted history stays dead), and finally fold the
    tombstones in with ``ann_index_compact``.

    Contract (oracle enumerates ALL plants — the re-append restores the
    full set; queries are the SOURCE vectors, so a plant pairs iff its
    copy is live at squared-L2 dist 0 ≤ 0.25, far below the fixture's
    natural minimum distance — the planted-vs-random separation rule):
    (a) ``found_after_reappend`` — every plant pairs with its source
    after b2; (b) ``pre_reappend_state_ok`` — BETWEEN delete and
    re-append, a plant paired iff it was NOT retracted (surviving
    plants served through the anti-join, retracted ones invisible);
    (c) ``retracted_absent`` — in that window zero pairs named ANY
    retracted id as a neighbor (GDPR holds); (d) ``same_after_compact``
    — the physical fold-in changes no pair (both anti-join directions
    empty between the eagerly-pinned pre-compact snapshot and the
    post-compact query — the r11 swap-vs-laziness rule)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_compact,
        ann_index_delete,
        ann_index_search,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    new = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    retract_src = planted.filter(
        F.pmod(F.col("vec_id"), F.lit(2 * _PLANT_STEP)) == 0
    )
    retract = retract_src.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id")
    )
    path = _scratch_dir(spark, "ann_idx_retract")
    ann_index_build(
        e, "vec_id", "embedding", path, dim=64, n_cells=16, n_subspaces=8,
        n_centroids=32,
    )
    ann_index_append(new, "vec_id", "embedding", path, batch_id="b1")
    # request-proportional delete; compaction deferred to the explicit
    # call below (the latency-sensitive-endpoint pattern)
    ann_index_delete(spark, path, retract, compact_threshold=2.0)
    shortlist = _ann_shortlist(e)

    def plant_pairs():
        hits = ann_index_search(
            planted, path, "vec_id", "embedding", k=5,
            n_probe=8, shortlist=shortlist,
        )
        return hits.filter(F.col("dist") <= F.lit(0.25))

    # pre-re-append window, pinned eagerly (search lineage must not be
    # re-evaluated after later appends/compaction move the files)
    mid = plant_pairs().localCheckpoint(eager=True)
    n_excluded = (
        mid.join(retract, mid["neighbor_id"] == retract["vec_id"], "left_semi")
        .agg(F.count("*").alias("_nr"))
    )
    ann_index_append(new.join(retract, "vec_id", "left_semi"),
                     "vec_id", "embedding", path, batch_id="b2")
    pre = plant_pairs().localCheckpoint(eager=True)
    ann_index_compact(spark, path)
    post = plant_pairs()
    n_diff = (
        pre.join(post, ["query_id", "neighbor_id"], "left_anti")
        .unionByName(post.join(pre, ["query_id", "neighbor_id"], "left_anti"))
        .agg(F.count("*").alias("_nd"))
    )
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(
            post,
            (expected["id_a"] == post["query_id"])
            & (expected["id_b"] == post["neighbor_id"]),
            "left",
        )
        .join(
            mid.select(
                F.col("query_id").alias("_mq"),
                F.col("neighbor_id").alias("_mn"),
            ),
            (F.col("id_a") == F.col("_mq")) & (F.col("id_b") == F.col("_mn")),
            "left",
        )
        .crossJoin(F.broadcast(n_excluded))
        .crossJoin(F.broadcast(n_diff))
        .select(
            "id_a",
            "id_b",
            F.col("dist").isNotNull().alias("found_after_reappend"),
            (
                F.col("_mn").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) != 0)
            ).alias("pre_reappend_state_ok"),
            (F.col("_nr") == 0).alias("retracted_absent"),
            (F.col("_nd") == 0).alias("same_after_compact"),
        )
    )


@query(
    "l3_filtered_ann",
    oracle="""
    SELECT vec_id AS id_a,
           vec_id + 100000 AS id_b,
           (vec_id % 50 = 0) AS twin_allowed,
           TRUE AS hit_iff_allowed,
           TRUE AS all_hits_allowed,
           TRUE AS broad_hit_iff_even
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l3_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: ATTRIBUTE-FILTERED ANN search (r13) — the production serving
    shape "nearest neighbors among documents satisfying a predicate"
    (lang = 'en', license = permissive, date range). The engine's
    ``ann_index_search(..., allowed=)`` applies the filter as a
    PRE-filter semi-join on the slim codes projection, BEFORE the
    shortlist window — so top-k is per-FILTERED-corpus (a post-filter
    of an unfiltered top-k returns < k rows under any selective
    predicate, the classic filtered-ANN failure).

    Script: index the corpus (b0) + verbatim copies of every 25th
    vector under id+100000 (b1). Two filter shapes: NARROW — allowed =
    copies whose source id % 50 == 0 (a request-sized set; AQE
    broadcast semi-join, zero corpus shuffle); BROAD — allowed = all
    EVEN ids (half the index; shuffled semi-join on ~10-byte rows).

    Contract (oracle enumerates every plant): (a) ``hit_iff_allowed``
    — under the narrow filter a source pairs with its copy at dist 0
    iff the copy is in the allowed set (identical vector ⇒ found when
    permitted; filtered out when not, even though it is the GLOBAL
    nearest neighbor — the pre-filter at work); (b)
    ``all_hits_allowed`` — zero narrow-leg hits name a neighbor
    outside the allowed set (exact filter semantics, engine-side
    anti-join); (c) ``broad_hit_iff_even`` — under the broad filter
    the copy (parity = source's parity) is found iff the source id is
    even. dist ≤ 0.25 is the planted-vs-natural separation bound (the
    l3_ann_retraction rule)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    new = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    path = _scratch_dir(spark, "ann_idx_filtered")
    ann_index_build(
        e, "vec_id", "embedding", path, dim=64, n_cells=16, n_subspaces=8,
        n_centroids=32,
    )
    ann_index_append(new, "vec_id", "embedding", path, batch_id="b1")
    shortlist = _ann_shortlist(e)
    narrow_allowed = planted.filter(
        F.pmod(F.col("vec_id"), F.lit(2 * _PLANT_STEP)) == 0
    ).select((F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"))
    narrow = (
        ann_index_search(
            planted, path, "vec_id", "embedding", k=5,
            n_probe=8, shortlist=shortlist, allowed=narrow_allowed,
        )
        .filter(F.col("dist") <= F.lit(0.25))
        .localCheckpoint(eager=True)  # two consumers below (pair join +
        # outside-allowed audit): pin one evaluation (the r10
        # dropDuplicates/multi-consumer determinism rule)
    )
    n_outside = (
        narrow.join(
            narrow_allowed.select(F.col("vec_id").alias("neighbor_id")),
            "neighbor_id",
            "left_anti",
        ).agg(F.count("*").alias("_no"))
    )
    broad_allowed = e.select("vec_id").unionByName(
        new.select("vec_id")
    ).filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    broad = ann_index_search(
        planted, path, "vec_id", "embedding", k=5,
        n_probe=8, shortlist=shortlist, allowed=broad_allowed,
    ).filter(F.col("dist") <= F.lit(0.25))
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    n_pair = narrow.select(
        F.col("query_id").alias("_nq"), F.col("neighbor_id").alias("_nn")
    )
    b_pair = broad.select(
        F.col("query_id").alias("_bq"), F.col("neighbor_id").alias("_bn")
    )
    return (
        expected.join(
            n_pair,
            (F.col("id_a") == F.col("_nq")) & (F.col("id_b") == F.col("_nn")),
            "left",
        )
        .join(
            b_pair,
            (F.col("id_a") == F.col("_bq")) & (F.col("id_b") == F.col("_bn")),
            "left",
        )
        .crossJoin(F.broadcast(n_outside))
        .select(
            "id_a",
            "id_b",
            (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0).alias(
                "twin_allowed"
            ),
            (
                F.col("_nn").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0)
            ).alias("hit_iff_allowed"),
            (F.col("_no") == 0).alias("all_hits_allowed"),
            (
                F.col("_bn").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2)) == 0)
            ).alias("broad_hit_iff_even"),
        )
    )


@query(
    "l3_payload_ann",
    oracle="""
    SELECT vec_id AS id_a,
           vec_id + 100000 AS id_b,
           (vec_id % 50 = 0) AS twin_en,
           TRUE AS hit_iff_en,
           TRUE AS all_hits_en,
           TRUE AS payload_doc_ok,
           TRUE AS broad_hit_iff_even
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l3_payload_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: PREDICATE-PUSHDOWN filtered ANN search over stored PAYLOAD
    columns (r15, VERDICT r14 #2) — the production shape "nearest
    neighbors WHERE lang = 'en'" with the attribute living IN the
    index: ``ann_index_build(payload_cols=["doc_id","lang"])`` stores
    the attributes next to the codes, ``ann_index_search(where=...)``
    evaluates the predicate as a PUSHED parquet filter on the slim tier
    (plan-pinned in test_ann_index) — no caller-materialized allowed-id
    frame, no semi-join shuffle, at ANY selectivity. This closes the
    broad-filter gap of l3_filtered_ann's id-set API: there,
    "lang = 'en'" forces a corpus-sized allowed frame; here it is one
    scan predicate. Hits RETURN the stored payload columns, which the
    contract audits directly.

    Script: index the corpus (payloads: doc_id = vec_id % 100, lang =
    'base') + verbatim copies of every 25th vector under id+100000
    (lang 'en' when the source id % 50 == 0, else 'de'). NARROW
    predicate ``lang = 'en'`` (only half the copies qualify); BROAD
    predicate ``doc_id % 2 = 0`` (half the index).

    Contract (oracle enumerates every plant): (a) ``hit_iff_en`` — a
    source pairs with its copy at dist 0 under the narrow predicate iff
    the copy is 'en' (identical vector ⇒ found when permitted; filtered
    out when not, though it is the GLOBAL nearest — the pre-filter +
    probe re-targeting at work); (b) ``all_hits_en`` — every narrow-leg
    hit's RETURNED ``lang`` payload is 'en' (predicate semantics AND
    payload round-trip, engine-side audit); (c) ``payload_doc_ok`` —
    every hit's returned ``doc_id`` equals neighbor_id % 100 (stored
    values, not recomputed ones); (d) ``broad_hit_iff_even`` — under
    the broad predicate the copy is found iff the source doc id is even
    (copies share the source's doc parity: +100000 ≡ 0 mod 100).
    dist ≤ 0.25 is the planted-vs-natural separation bound."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.select(
        "vec_id",
        "embedding",
        F.pmod(F.col("vec_id"), F.lit(100)).alias("doc_id"),
        F.lit("base").alias("lang"),
    )
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    new = planted.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    ).select(
        "vec_id",
        "embedding",
        F.pmod(F.col("vec_id"), F.lit(100)).alias("doc_id"),
        F.when(
            F.pmod(F.col("vec_id"), F.lit(2 * _PLANT_STEP)) == 0, F.lit("en")
        ).otherwise(F.lit("de")).alias("lang"),
    )
    path = _scratch_dir(spark, "ann_idx_payload")
    ann_index_build(
        corpus, "vec_id", "embedding", path, dim=64, n_cells=16,
        n_subspaces=8, n_centroids=32, payload_cols=["doc_id", "lang"],
    )
    ann_index_append(new, "vec_id", "embedding", path, batch_id="b1")
    shortlist = _ann_shortlist(e)
    narrow = (
        ann_index_search(
            planted, path, "vec_id", "embedding", k=5,
            n_probe=8, shortlist=shortlist, where="lang = 'en'",
        )
        .filter(F.col("dist") <= F.lit(0.25))
        .localCheckpoint(eager=True)  # three consumers below (pair join
        # + two payload audits): pin one evaluation (the r10 rule)
    )
    n_bad_lang = narrow.filter(F.col("lang") != "en").agg(
        F.count("*").alias("_nl")
    )
    n_bad_doc = narrow.filter(
        F.col("doc_id") != F.pmod(F.col("neighbor_id"), F.lit(100))
    ).agg(F.count("*").alias("_ndc"))
    broad = ann_index_search(
        planted, path, "vec_id", "embedding", k=5,
        n_probe=8, shortlist=shortlist, where="doc_id % 2 = 0",
    ).filter(F.col("dist") <= F.lit(0.25))
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    n_pair = narrow.select(
        F.col("query_id").alias("_nq"), F.col("neighbor_id").alias("_nn")
    )
    b_pair = broad.select(
        F.col("query_id").alias("_bq"), F.col("neighbor_id").alias("_bn")
    )
    return (
        expected.join(
            n_pair,
            (F.col("id_a") == F.col("_nq")) & (F.col("id_b") == F.col("_nn")),
            "left",
        )
        .join(
            b_pair,
            (F.col("id_a") == F.col("_bq")) & (F.col("id_b") == F.col("_bn")),
            "left",
        )
        .crossJoin(F.broadcast(n_bad_lang))
        .crossJoin(F.broadcast(n_bad_doc))
        .select(
            "id_a",
            "id_b",
            (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0).alias(
                "twin_en"
            ),
            (
                F.col("_nn").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2 * _PLANT_STEP)) == 0)
            ).alias("hit_iff_en"),
            (F.col("_nl") == 0).alias("all_hits_en"),
            (F.col("_ndc") == 0).alias("payload_doc_ok"),
            (
                F.col("_bn").isNotNull()
                == (F.pmod(F.col("id_a"), F.lit(2)) == 0)
            ).alias("broad_hit_iff_even"),
        )
    )


@query(
    "l2_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_FILTER(
        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), t -> t <> ''))) AS tok
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


@query(
    "l2_simhash",
    oracle="""
    SELECT doc_id, TRUE AS deterministic, TRUE AS bucket_in_range
    FROM documents
    """,
)
def l2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: 64-bit SimHash fingerprints (JVM token hashing + Arrow-batched
    numpy bit-packing) + hi-16-bit bucket key for banded near-dup search.
    Driver contract (per doc): the fingerprint must be DETERMINISTIC —
    recomputing it on a differently-partitioned copy of the corpus yields
    the identical 64-bit value (the property that makes retried tasks and
    incremental runs safe at 100 TB) — and the bucket key must fit 16
    bits. Exact fingerprint values are engine-defined (xxhash64 bit
    votes), hence booleans rather than literals; verbatim-dup capture is
    checked by l2_simhash_pairs."""
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    fp1 = d.select("doc_id", simhash("text").alias("fp1"))
    fp2 = (
        d.select("doc_id", "text")
        .repartition(7, "doc_id")
        .select("doc_id", simhash("text").alias("fp2"))
    )
    joined = fp1.join(fp2, "doc_id")
    bucket = F.shiftrightunsigned("fp1", 48)
    return joined.select(
        "doc_id",
        (F.col("fp1") == F.col("fp2")).alias("deterministic"),
        ((bucket >= 0) & (bucket < 65536)).alias("bucket_in_range"),
    )


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


@query(
    "l3_grouped_maxsim",
    oracle="""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id % 100 AS doc_id,
             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
               AS cos_sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id
    ),
    pooled AS (
      SELECT query_id, doc_id, MAX(cos_sim) AS max_sim
      FROM scored GROUP BY query_id, doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, max_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY max_sim DESC, doc_id ASC) AS BIGINT) AS rk
      FROM pooled
    )
    SELECT query_id, doc_id, ROUND(max_sim, 6) AS max_sim, rk
    FROM ranked WHERE rk <= 3
    """,
)
def l3_grouped_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: MULTI-VECTOR (grouped) retrieval with max-pooling (r13) — the
    late-interaction-lite serving shape: documents are represented by
    MANY chunk vectors, a document's score for a query is the MAX
    cosine over its chunks, and retrieval returns top-k DOCUMENTS.
    Here the embeddings fixture plays the chunk tier with doc_id =
    vec_id % 100 (chunks of one doc scattered across the corpus —
    the worst case for locality, so the groupBy is a real shuffle).

    Plan: broadcast the 5 query vectors ⋈ corpus chunks (one pass, HOF
    dot products — chunk scoring is embarrassingly parallel), partial
    max per (query, doc) map-side, one shuffle on the (query, doc)
    group key, window top-3. At 100 TB the chunk scan dominates and
    never re-shuffles the corpus: the only exchange carries one row
    per (query, doc) pair. Exact-hash oracle: cosine is +,×,÷,sqrt on
    both engines (correctly rounded IEEE, identical parenthesization),
    MAX of exact doubles is exact, round once at the end (the r6
    float-oracle discipline). Self-chunk (the query vector itself)
    excluded; its doc may still score via its other chunks."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    cos = dot(F.col("_q"), F.col("embedding")) / (
        F.sqrt(dot(F.col("_q"), F.col("_q")))
        * F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    from pyspark.sql.window import Window

    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.pmod(F.col("vec_id"), F.lit(100)).alias("doc_id"),
            cos.alias("cos_sim"),
        )
    )
    pooled = scored.groupBy("query_id", "doc_id").agg(
        F.max("cos_sim").alias("max_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("max_sim").desc(), F.col("doc_id").asc()
    )
    return (
        pooled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "doc_id", F.round("max_sim", 6).alias("max_sim"), "rk")
    )


# grouped-retrieval twin-doc id space: doc ids live in 0..99 (vec_id %
# 100) — twins park far above, well clear of both real docs and the
# chunk-id plant space semantics (doc ids never mix with chunk ids)
_GDOC_OFFSET = 5000


@query(
    "l2_grouped_semdedup",
    oracle="""
    SELECT vec_id + 5000 AS query_doc,
           vec_id AS neighbor_doc,
           TRUE AS found_at_zero,
           TRUE AS no_extra
    FROM embeddings WHERE vec_id < 5
    """,
)
def l2_grouped_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: DOC-level incremental semantic dedup for MULTI-CHUNK
    documents (r14 — the dedup twin of l3_grouped_ann):
    `similarity.ann_grouped_dedup_batch` appends a crawl snapshot's
    chunk vectors to the persisted ANN index, searches only the new
    chunks, maps both hit sides to documents and min-pools — "which of
    my NEW documents near-duplicate anything ever ingested", scored by
    best chunk pair. The chunk-level form (l2_incremental_semdedup)
    misses a re-crawled doc whose chunk ids changed; this form pairs
    the DOCUMENTS.

    Script: embeddings = chunk tier, doc = vec_id % 100; index the
    corpus (b0); the new snapshot is 5 verbatim TWIN DOCS — every chunk
    of docs 0-4 copied under chunk id + 100000, doc id + 5000 (b1).
    Contract (oracle enumerates the 5 new docs): (a) ``found_at_zero``
    — each twin doc pairs its source doc at dist exactly 0 (verbatim
    chunk ⇒ identical cell + codes ⇒ exact re-rank 0; min-pool keeps
    it); (b) ``no_extra`` — zero pairs beyond the 5 planted ones at
    threshold 0.25 (natural inter-doc distances far exceed it — the
    planted-vs-natural separation rule), same-doc pairs excluded by
    construction.

    r15 (VERDICT r14 #1): the index stores ``doc_id`` as a PAYLOAD
    column and the serving call passes NO doc_map — the neighbor's doc
    id rides each hit and the query's rides the batch frame (zero
    corpus-cardinality map scans per snapshot)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ann_grouped_dedup_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doc_of = F.pmod(F.col("vec_id"), F.lit(100))
    corpus = e.withColumn("doc_id", doc_of)
    twins_src = e.filter(doc_of < 5)
    new = twins_src.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        "embedding",
        (doc_of + _GDOC_OFFSET).alias("doc_id"),
    )
    path = _scratch_dir(spark, "ann_idx_gsemdedup")
    ann_index_build(
        corpus, "vec_id", "embedding", path, dim=64, n_cells=16,
        n_subspaces=8, n_centroids=32, payload_cols=["doc_id"],
    )
    pairs = ann_grouped_dedup_batch(
        new, "vec_id", "embedding", path,
        batch_id="b1", threshold=0.25, chunk_k=20, n_probe=8,
        shortlist=_ann_shortlist(e),
    ).localCheckpoint(eager=True)  # two consumers (pair join + no-extra
    # audit): pin one evaluation (the r10 multi-consumer rule)
    expected = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + _GDOC_OFFSET).alias("query_doc"),
        F.col("vec_id").alias("neighbor_doc"),
    )
    n_extra = pairs.join(
        expected, ["query_doc", "neighbor_doc"], "left_anti"
    ).agg(F.count("*").alias("_nx"))
    return (
        expected.join(pairs, ["query_doc", "neighbor_doc"], "left")
        .crossJoin(F.broadcast(n_extra))
        .select(
            "query_doc",
            "neighbor_doc",
            (F.col("dist").isNotNull() & (F.col("dist") == 0.0)).alias(
                "found_at_zero"
            ),
            (F.col("_nx") == 0).alias("no_extra"),
        )
    )


@query(
    "l3_grouped_ann",
    oracle="""
    SELECT vec_id AS query_id,
           TRUE AS twin_top1,
           TRUE AS twin_hit_iff_allowed,
           TRUE AS recall_ok,
           TRUE AS k_bound_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def l3_grouped_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: INDEX-BACKED multi-vector retrieval (r14, VERDICT r13 #1) —
    the serving form of l3_grouped_maxsim: chunk vectors live in the
    persisted IVF-PQ index, `functions/similarity.ann_grouped_topk`
    searches the chunks (`ann_index_search`, all index machinery
    composing), maps hits to documents, min-pools squared-L2 per
    (query, doc) and returns top-k DOCUMENTS — the exact form scans the
    whole chunk tier per query batch and cannot serve at 100 TB.

    Script: embeddings play the chunk tier with doc_id = vec_id % 100;
    index the corpus (b0), then append a verbatim TWIN DOC of each of
    docs 0-4 — every chunk copied under chunk id + 100000, grouped
    under doc id + 5000 (b1). Queries are the 5 chunks vec_id < 5 (one
    per source doc).

    Contract (oracle enumerates the 5 queries): (a) ``twin_top1`` —
    query q's twin doc (5000+q) ranks 1 at dist exactly 0: the twin
    holds a verbatim copy of the query chunk under a DIFFERENT chunk id
    (the query's own chunk is excluded by the shared-id-space rule, so
    rank-1-at-zero can only come from the copy — identical vector ⇒
    identical cell+codes under pinned models ⇒ exact re-rank 0);
    (b) ``twin_hit_iff_allowed`` — under a DOC-level filter allowing
    only the twins of EVEN sources, the twin pair appears iff q is even
    (payload-column semi-join + per-filtered-corpus semantics,
    mirroring l3_filtered_ann); (c) ``recall_ok`` — grouped top-3 docs
    vs the ENGINE-COMPUTED exact grouped min-squared-L2 top-3 over
    corpus∪twins, recall ≥ 0.6 (the l3_pq_search pattern); (d)
    ``k_bound_ok`` — at most k doc rows per query.

    r15 (VERDICT r14 #1): the index is built with
    ``payload_cols=["doc_id"]`` and the serving calls pass NO doc_map —
    doc ids come straight off the hits (zero corpus-cardinality map
    scans per call; the doc_map form stays unit-tested for payload-less
    indexes). The exact recall reference constructs its own chunk→doc
    frame, as any engine-side verification may."""
    from pyspark.sql.window import Window

    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_append,
        ann_index_build,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ann_grouped_topk,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import tiny_rows_df

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doc_of = F.pmod(F.col("vec_id"), F.lit(100))
    corpus = e.withColumn("doc_id", doc_of)
    twins_src = e.filter(doc_of < 5)
    twins = twins_src.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        "embedding",
        (doc_of + _GDOC_OFFSET).alias("doc_id"),
    )
    doc_map = corpus.select(
        F.col("vec_id").alias("chunk_id"), "doc_id"
    ).unionByName(
        twins.select(F.col("vec_id").alias("chunk_id"), "doc_id")
    )
    path = _scratch_dir(spark, "ann_idx_grouped")
    ann_index_build(
        corpus, "vec_id", "embedding", path, dim=64, n_cells=16,
        n_subspaces=8, n_centroids=32, payload_cols=["doc_id"],
    )
    ann_index_append(twins, "vec_id", "embedding", path, batch_id="b1")
    q = e.filter(F.col("vec_id") < 5)
    shortlist = _ann_shortlist(e)
    # three consumers below (twin check, recall join, k-bound) — pin one
    # evaluation (the r10 multi-consumer determinism rule)
    got = ann_grouped_topk(
        q, path, id_col="vec_id", vec_col="embedding", k=3,
        chunk_k=20, n_probe=8, shortlist=shortlist,
    ).localCheckpoint(eager=True)
    # engine-exact grouped min-squared-L2 top-3 (the recall reference):
    # brute force over corpus∪twins, self-chunk excluded like the index
    qn = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_q"), F.col("embedding"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("doc_id").asc()
    )
    exact = (
        e.unionByName(twins.select("vec_id", "embedding"))
        .join(F.broadcast(qn), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("chunk_id"), d2.alias("dist"))
        .join(doc_map, "chunk_id")
        .groupBy("query_id", "doc_id")
        .agg(F.min("dist").alias("dist"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    recall = (
        exact.select("query_id", "doc_id")
        .join(
            got.select("query_id", "doc_id").withColumn("_hit", F.lit(1)),
            ["query_id", "doc_id"],
            "left",
        )
        .agg(
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*")
                >= 0.6
            ).alias("recall_ok")
        )
    )
    k_ok = (
        got.groupBy("query_id")
        .agg(F.count("*").alias("_k"))
        .agg((F.max("_k") <= 3).alias("k_bound_ok"))
    )
    # DOC-level filter: only the twins of EVEN sources are allowed
    allowed_docs = tiny_rows_df(
        spark,
        [(_GDOC_OFFSET + d,) for d in range(5) if d % 2 == 0],
        "doc_id long",
    )
    filt = ann_grouped_topk(
        q, path, id_col="vec_id", vec_col="embedding", k=3,
        chunk_k=20, n_probe=8, shortlist=shortlist, allowed=allowed_docs,
    )
    tw = got.filter((F.col("rk") == 1) & (F.col("dist") == 0.0)).select(
        F.col("query_id").alias("_tq"), F.col("doc_id").alias("_td")
    )
    fp = filt.select(
        F.col("query_id").alias("_fq"), F.col("doc_id").alias("_fd")
    )
    base = q.select(F.col("vec_id").alias("query_id"))
    return (
        base.join(
            tw,
            (F.col("query_id") == F.col("_tq"))
            & (F.col("_td") == F.col("query_id") + _GDOC_OFFSET),
            "left",
        )
        .join(
            fp,
            (F.col("query_id") == F.col("_fq"))
            & (F.col("_fd") == F.col("query_id") + _GDOC_OFFSET),
            "left",
        )
        .crossJoin(F.broadcast(recall))
        .crossJoin(F.broadcast(k_ok))
        .select(
            "query_id",
            F.col("_td").isNotNull().alias("twin_top1"),
            (
                F.col("_fd").isNotNull()
                == (F.pmod(F.col("query_id"), F.lit(2)) == 0)
            ).alias("twin_hit_iff_allowed"),
            "recall_ok",
            "k_bound_ok",
        )
    )


def _session_table(spark: SparkSession, tag: str) -> str:
    """Session-scoped CATALOG TABLE name (the table twin of
    _scratch_dir): applicationId-suffixed so concurrent sessions
    sharing a warehouse dir never drop each other's live tables —
    one definition for every table-tier contract query (review r12:
    the sanitization snippet had been pasted per query)."""
    app = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    ).lower()
    return f"{tag}_{app}"


def _scratch_dir(spark: SparkSession, tag: str) -> str:
    """Session-scoped scratch path, WIPED on entry (review r8): contract
    queries that materialize corpus-sized index fixtures (band index,
    persisted ANN index) previously mkdtemp'd a fresh dir per invocation
    and never removed it — ten driver-sim sweeps in one round accumulate
    GBs of dead index in /tmp. One fixed path per (session, tag) bounds
    the garbage to a single live copy; queries within a session run
    serially, and the applicationId suffix keeps concurrent SESSIONS
    apart. The path is returned non-existent (index builds require
    that)."""
    import os
    import shutil
    import tempfile

    p = os.path.join(
        tempfile.gettempdir(), f"graft_{tag}_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(p, ignore_errors=True)
    return p


def _ann_shortlist(e) -> int:
    """Corpus-scaled exact-re-rank shortlist — delegates to the library
    helper (promoted to functions/similarity.ann_shortlist in r9,
    VERDICT r8 #2, where the rationale and measured numbers live).
    Costs one cheap count() job."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ann_shortlist,
    )

    return ann_shortlist(e.count())


def _ann_contract(
    approx: DataFrame, exact: DataFrame, recall_bound: float, k: int = 5
) -> DataFrame:
    """Reduce an approximate top-k result to the driver-checkable contract
    row: recall vs the exact top-k is >= recall_bound, no query returns
    more than k rows (k passed by the caller — a hardcoded bound would
    silently decouple from the operator's k argument), and no
    self-matches leak through. All three are computed distributed
    (joins + aggregates, no collect)."""
    a = approx.select("query_id", "neighbor_id")
    ex = exact.select("query_id", "neighbor_id")
    recall = (
        ex.join(a.withColumn("_hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .agg(
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*")
                >= recall_bound
            ).alias("recall_ok")
        )
    )
    k_ok = (
        a.groupBy("query_id")
        .agg(F.count("*").alias("_k"))
        .agg((F.max("_k") <= k).alias("k_bound_ok"))
    )
    no_self = a.agg(
        (F.sum((F.col("query_id") == F.col("neighbor_id")).cast("long")) == 0).alias(
            "no_self_matches"
        )
    )
    return recall.crossJoin(k_ok).crossJoin(no_self)


@query(
    "l3_ann_lsh",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches
    """,
)
def l3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: sign-LSH bucketed approximate top-k (band equi-join
    instead of full scan). Driver contract: with 48 seeded hyperplanes in
    4-bit bands the approximate top-5 must recover >= 60% of the exact
    brute-force top-5 (deterministic for the fixed fixture + seed;
    measured ~0.8 at sf0.01), return at most k rows per query, and never
    pair a query with itself. The exact neighbor sets are engine-computed
    (cosine_topk) — the oracle checks the accuracy CONTRACT, the a4
    pattern for sketch ops."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = lsh_topk(e, q, k=5, n_planes=48, band_bits=4, dim=64)
    return _ann_contract(approx, cosine_topk(e, q, k=5), recall_bound=0.6, k=5)


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


@query(
    "l4_lang_id",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS t,
             lower(text) AS lt
      FROM documents
    ),
    marks(mlang, markers) AS (VALUES
      ('de', ['der','die','und','das','ist']),
      ('en', ['the','and','of','to','a']),
      ('es', ['el','la','de','que','y']),
      ('fr', ['le','la','et','les','des']),
      ('zh', ['de5','shi4','le5','zai4','he2'])),
    profiles(plang, grams) AS (VALUES
      ('de', ['der','ein','ich','sch','und']),
      ('en', ['the','ing','and','ion','ent']),
      ('es', ['que','ión','ent','ado','los']),
      ('fr', ['les','ent','ion','que','eur']),
      ('zh', ['zh1','sh4','ng1','ao4','an2'])),
    wscored AS (
      SELECT doc_id, lang, mlang,
             len(list_filter(t, x -> list_contains(markers, x))) AS hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY len(list_filter(t, x -> list_contains(markers, x))) DESC,
                        mlang DESC) AS rn
      FROM toks CROSS JOIN marks
    ),
    gscored AS (
      SELECT doc_id, plang,
             len(list_filter(grams, g -> POSITION(g IN lt) > 0)) AS hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY len(list_filter(grams, g -> POSITION(g IN lt) > 0)) DESC,
                        plang DESC) AS rn
      FROM toks CROSS JOIN profiles
    )
    SELECT w.doc_id, w.lang,
           CASE WHEN w.hits > 0 THEN w.mlang ELSE 'und' END AS lang_pred_words,
           CASE WHEN g.hits > 0 THEN g.plang ELSE 'und' END AS lang_pred_trigrams
    FROM wscored w JOIN gscored g ON w.doc_id = g.doc_id
    WHERE w.rn = 1 AND g.rn = 1
    """,
)
def l4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: language-ID heuristics — marker-word scoring and the literal
    char-trigram n-gram form, side by side (JVM-only, deterministic).
    EXACT oracle (new in r5): both heuristics are pure functions of fixed
    marker/profile tables, so DuckDB reproduces the argmax verbatim —
    occurrence counts of marker TOKENS for the word form, presence of
    profile trigrams (a trigram is in the doc's distinct-trigram set iff
    it is a substring of the lowered text) for the n-gram form, ties
    broken by max language code, 'und' on zero hits — mirroring Spark's
    array_max(struct(hits, lang)) semantics."""
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


#: Shared oracle scaffold for the PNG queries: the generated image is a
#: pure function of doc_id (attach_png_media), so the decoded dims are
#: id-derived integers and the channel-0 pixel mean is the exact average
#: of (x*7 + y*13 + id) % 256 over the raster grid — DuckDB reproduces it
#: with a two-stage UNNEST(GENERATE_SERIES) cross product (multiple
#: UNNESTs in ONE select zip instead of cross-joining, hence two CTEs).
_PNG_ORACLE_PX = """
    dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id*3) % 8 AS h
      FROM documents WHERE doc_id < 200
    ),
    xs AS (SELECT doc_id, h, UNNEST(GENERATE_SERIES(0, w - 1)) AS x FROM dims),
    px AS (SELECT doc_id, x, UNNEST(GENERATE_SERIES(0, h - 1)) AS y FROM xs),
    means AS (
      SELECT doc_id, AVG((x*7 + y*13 + doc_id) % 256) AS mean_c0
      FROM px GROUP BY doc_id
    )
"""


@query(
    "l5_multimodal",
    oracle=f"""
    WITH {_PNG_ORACLE_PX}
    SELECT d.doc_id,
           TRUE                            AS valid,
           CAST(d.w AS INT)                AS width,
           CAST(d.h AS INT)                AS height,
           CAST(3 AS INT)                  AS channels,
           CAST(8 AS INT)                  AS bit_depth,
           m.mean_c0                       AS mean_c0,
           TRUE                            AS std_in_range
    FROM dims d JOIN means m ON d.doc_id = m.doc_id
    """,
)
def l5_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: REAL image decode — deterministic RGB PNGs (true IHDR/IDAT/IEND
    chunks, zlib-compressed, all five scanline filters) generated per
    document, then decoded with the stdlib-only spec-subset codec over
    Arrow batches: chunk-CRC validation, IDAT inflate, per-scanline
    unfilter, per-channel stats. Pixel values are pure functions of
    doc_id, so width/height/channels/bit_depth AND the exact channel-0
    mean are mirrored by the DuckDB oracle; std is emitted as an
    always-true range invariant (a uint8 raster's std is in [0, 127.5]).
    Replaces the r1-r4 fake-decode registration (VERDICT r4 #3); the
    gated JPEG path (entropy coding needs a codec lib) remains
    decode_image_features."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        attach_png_media,
        decode_png_features,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )
    )
    feats = decode_png_features(attach_png_media(d, "doc_id"), "doc_id")
    std0 = F.element_at("std_per_channel", 1)
    return feats.select(
        "doc_id", "valid", "width", "height", "channels", "bit_depth",
        F.element_at("mean_per_channel", 1).alias("mean_c0"),
        ((std0 >= 0) & (std0 <= 127.5)).alias("std_in_range"),
    )


@query(
    "l5_multimodal_png",
    oracle=f"""
    WITH {_PNG_ORACLE_PX}
    SELECT d.doc_id,
           d.doc_id % 37 <> 0                                        AS valid,
           CAST(CASE WHEN d.doc_id % 37 = 0 THEN 0 ELSE d.w END AS INT) AS width,
           CAST(CASE WHEN d.doc_id % 37 = 0 THEN 0 ELSE d.h END AS INT) AS height,
           CASE WHEN d.doc_id % 37 = 0 THEN NULL ELSE m.mean_c0 END  AS mean_c0
    FROM dims d JOIN means m ON d.doc_id = m.doc_id
    """,
)
def l5_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 poison-path: same PNG pipeline with every 37th payload truncated
    mid-IDAT. The decoder must flag exactly those rows invalid (zlib
    inflate fails / chunk stream truncated) with zero dims and NULL stats
    — never crash the stage — and the oracle mirrors the poison pattern
    exactly, so the VALIDITY decision itself is driver-checked."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        attach_png_media,
        decode_png_features,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )
    )
    feats = decode_png_features(
        attach_png_media(d, "doc_id", poison_every=37), "doc_id"
    )
    return feats.select(
        "doc_id", "valid", "width", "height",
        F.element_at("mean_per_channel", 1).alias("mean_c0"),
    )


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


@query(
    "l2_embedding_cosine_lsh",
    oracle="""
    SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
           TRUE AS found, TRUE AS cos_near_one
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l2_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 variant 5 at scale: cosine-threshold pairs via sign-LSH band
    self-join (bucket-then-verify; no cross join). Driver contract:
    every 25th embedding is planted as an IDENTICAL copy under
    id+100000; an identical vector has the identical sign signature —
    collides in every band — and cosine 1.0 (within float ulp), so each
    planted pair must be recovered above the 0.5 threshold. The oracle
    enumerates those pairs exactly; organic-pair recall vs the exact
    all-pairs form is asserted in tests."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    aug = e.select("vec_id", "embedding").unionByName(
        planted.select((F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding")
    )
    # dim is a required parameter since r5 (the probe-a-row fallback was
    # deleted per VERDICT r4 #2); fixture embeddings are 64-d
    pairs = embedding_near_dup_pairs(aug, threshold=0.5, exact=False, dim=64)
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return expected.join(pairs, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.col("cos_sim").isNotNull().alias("found"),
        (F.col("cos_sim") >= 0.999999).alias("cos_near_one"),
    )


@query(
    "l2_semdedup",
    oracle="""
    SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
           TRUE AS found, TRUE AS cos_near_one, TRUE AS no_truncation
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def l2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 variant 6: SemDeDup-style semantic dedup — seeded KMeans cells
    as DATA-ADAPTIVE buckets, exact cosine verify within each cell
    (functions/similarity.semantic_dedup_pairs; the published
    cluster-then-compare recipe, complementing the sign-LSH variant).
    Driver contract, same planted-duplicate construction as
    l2_embedding_cosine_lsh: every 25th embedding replayed verbatim
    under id+100000 — identical vectors share identical centroid
    distances hence the same cell, and must pair at cosine ~1.0. The
    oracle enumerates the planted pairs exactly. ``no_truncation`` pins
    the max_cell_size guard's observability (VERDICT r6 #5): on the
    fixture no cell exceeds the cap, so the excluded-member count the
    operator now reports must be exactly zero."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        semantic_dedup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(_PLANT_STEP)) == 0)
    aug = e.select("vec_id", "embedding").unionByName(
        planted.select((F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding")
    )
    pairs, excluded = semantic_dedup_pairs(
        aug, threshold=0.5, n_cells=16, return_excluded=True
    )
    n_excluded = excluded.agg(
        F.coalesce(F.sum("n_excluded"), F.lit(0)).alias("_n_excl")
    )
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return (
        expected.join(pairs, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(n_excluded))
        .select(
            "id_a",
            "id_b",
            F.col("cos_sim").isNotNull().alias("found"),
            (F.col("cos_sim") >= 0.999999).alias("cos_near_one"),
            (F.col("_n_excl") == 0).alias("no_truncation"),
        )
    )


@query(
    "l3_ann_ivf",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches
    """,
)
def l3_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path #2: IVF top-k (seeded KMeans cells + n_probe search) —
    data-adaptive alternative to the LSH variant. Same contract shape as
    l3_ann_lsh: recall >= 0.6 vs exact brute force (seeded KMeans is
    deterministic for the fixed fixture), k-bound, no self-matches.

    n_probe=8 of 16 (r8): on a NEAR-UNIFORM corpus raw-IVF recall is
    bounded by the probed fraction — with no exact re-rank tier to
    recover ranking error, n_probe=4 decayed with corpus scale and
    decorrelation (measured recall-of-exact-top-5: 0.70 at sf0.01, 0.66
    at sf0.1, 0.58 on the 20k-vector synthetic sf1 — under the 0.6
    bound), while 8 probes hold 0.84-0.92 across all three. Cell-scan
    reduction drops from 4× to 2×; probe count is THE recall/scan dial
    on uniform data (clustered corpora probe fewer — same FAISS
    playbook as the ivf_pq tier)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = ivf_topk(e, q, k=5, n_cells=16, n_probe=8)
    return _ann_contract(approx, cosine_topk(e, q, k=5), recall_bound=0.6, k=5)


@query(
    "l4_tfidf",
    oracle="""
    SELECT doc_id,
           TRUE AS has_terms,
           TRUE AS n_terms_le_distinct_tokens,
           TRUE AS weights_nonneg
    FROM documents
    WHERE TRIM(text) <> ''
    """,
)
def l4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: TF-IDF document vectors (HashingTF + IDF, feature hashing —
    no vocab broadcast). Driver contract (per doc): a non-empty document
    hashes to at least one feature; the number of non-zero features can
    never EXCEED the document's distinct-token count (feature hashing
    only merges buckets, never splits — the invariant that pins the
    hashing direction); and IDF-smoothed weights are non-negative. The
    weight VALUES are MLlib-defined floats, hence contract booleans
    rather than literals; weight ordering is asserted in tests.

    Whitespace is NORMALIZED before Tokenizer (review r5 finding):
    MLlib's Tokenizer splits on single \\s and emits EMPTY tokens for
    runs of whitespace — which HashingTF hashes as a feature — while
    tx.tokenize drops them, so un-normalized input could make n_terms
    exceed the distinct-token bound on a doc with doubled spaces."""
    from pyspark.ml.functions import vector_to_array

    from etl_apache_kafka_python_doker_aws_spark.functions.text import tfidf_features

    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("text", F.trim(F.regexp_replace("text", r"\s+", " ")))
        # whitespace-only docs excluded on BOTH sides: "" tokenizes to a
        # single empty token (n_terms 1 > n_distinct 0) — not a TF-IDF
        # property worth contracting
        .filter(F.col("text") != "")
    )
    feats = tfidf_features(d, "doc_id", "text")
    arr = vector_to_array(F.col("tfidf"))
    stats = feats.select(
        "doc_id",
        F.array_max(arr).alias("top_weight"),
        F.array_min(arr).alias("min_weight"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_terms"),
    )
    ntok = d.select(
        "doc_id", F.size(F.array_distinct(tx.tokenize("text"))).alias("n_distinct")
    )
    return stats.join(ntok, "doc_id").select(
        "doc_id",
        (F.col("n_terms") >= 1).alias("has_terms"),
        (F.col("n_terms") <= F.col("n_distinct")).alias("n_terms_le_distinct_tokens"),
        (F.col("min_weight") >= 0.0).alias("weights_nonneg"),
    )


@query(
    "l2_simhash_pairs",
    oracle="""
    SELECT doc_id AS id_a, doc_id + 100000 AS id_b, TRUE AS found_at_zero
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def l2_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: SimHash near-dup pairs — split-and-index banded Hamming search
    (pigeonhole band join + exact bit_count verify). Driver contract:
    verbatim planted copies (every 25th doc under id+100000) have the
    IDENTICAL fingerprint, i.e. Hamming distance 0 — the pigeonhole
    guarantee means they collide in every band, so each planted pair
    must surface with hamming = 0. The oracle enumerates those pairs
    exactly; organic near-dup behavior is asserted in tests."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import simhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    aug = _with_planted_copies(d)
    pairs = simhash_near_dup_pairs(aug, "doc_id", "text", max_hamming=3)
    expected = d.filter(F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + _PLANT_OFFSET).alias("id_b"),
    )
    return expected.join(pairs, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        (F.col("hamming") == 0).alias("found_at_zero"),
    )


@query(
    "l2_dedup_pipeline",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    ),
    planted AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_planted
      FROM t WHERE doc_id % 25 = 0 AND n >= 3 GROUP BY lang
    )
    SELECT t.lang,
           CAST(COUNT(*) + COALESCE(ANY_VALUE(p.n_planted), 0) AS BIGINT) AS n_before,
           TRUE AS no_copy_survives,
           TRUE AS copies_all_removed
    FROM t LEFT JOIN planted p ON t.lang = p.lang
    GROUP BY t.lang
    """,
)
def l2_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 capstone: full near-dedup pipeline — MinHash-LSH pairs →
    connected components (iterative min-label propagation) → keep the
    minimum-id doc per cluster. Driver contract: verbatim copies of every
    25th doc are planted under id+100000 (ids strictly greater than every
    original), so a planted copy is NEVER its cluster's minimum — the
    dedup must remove every one of them. Per language the query reports
    the exact augmented input count (oracle-computed) plus two booleans:
    no id >= 100000 survives, and the survivor count is <= n_before minus
    the planted count (each copy clusters with its original)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import dedup_corpus_near

    d = load_table(spark, sf_dir, "documents")
    eligible = (F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0) & (
        F.size(tx.tokenize("text")) >= 3
    )
    copies = d.filter(eligible).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "lang", "text"
    )
    aug = d.select("doc_id", "lang", "text").unionByName(copies)
    deduped = dedup_corpus_near(aug, threshold=0.9)
    before = aug.groupBy("lang").agg(F.count("*").alias("n_before"))
    planted = copies.groupBy("lang").agg(F.count("*").alias("n_planted"))
    after = deduped.groupBy("lang").agg(
        F.count("*").alias("n_after"),
        F.sum((F.col("doc_id") >= _PLANT_OFFSET).cast("long")).alias("n_copies_left"),
    )
    return (
        before.join(after, "lang")
        .join(planted, "lang", "left")
        .select(
            "lang",
            "n_before",
            (F.col("n_copies_left") == 0).alias("no_copy_survives"),
            (
                F.col("n_after")
                <= F.col("n_before") - F.coalesce(F.col("n_planted"), F.lit(0))
            ).alias("copies_all_removed"),
        )
    )


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


@query(
    "l3_pq_codes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS codes_in_range,
           CAST(64.0 AS DOUBLE) AS compression_ratio,
           TRUE AS beats_mean_baseline,
           TRUE AS max_mse_bounded
    FROM embeddings
    """,
)
def l3_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 storage path: product-quantization encode of the embedding
    corpus (functions/similarity.pq_encode — 4 seeded per-subspace
    KMeans codebooks; codes + reconstruction error are JVM expressions,
    only codebook training iterates). Contract row: every vector coded
    (exact count), codes within [0, 16), the exact 64x compression
    ratio (64 float32 -> 4 byte codes), average reconstruction MSE
    beats the predict-the-mean baseline (per-component variance — the
    bar any quantizer must clear), and max MSE within 1.5× that same
    baseline (measured max/var 0.86-0.92 on the sf0.01/sf0.1 fixtures).
    Both MSE bounds are RELATIVE to the data's variance on purpose: the
    r8 synthetic-sf1 sweep caught the previous absolute bound (0.02,
    calibrated to the fixture spread) failing on a wider-variance
    corpus — an absolute bound tests the fixture, a variance-relative
    bound tests the quantizer."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    enc = pq_encode(e, dim=64, n_subspaces=4, n_centroids=16)
    comp_var = e.select(
        F.explode(F.transform("embedding", lambda x: x.cast("double"))).alias("v")
    ).agg(F.variance("v").alias("_var"))
    stats = enc.agg(
        F.count("*").alias("n_vectors"),
        (
            (F.min(F.array_min("codes")) >= 0) & (F.max(F.array_max("codes")) < 16)
        ).alias("codes_in_range"),
        F.lit(64.0).alias("compression_ratio"),
        F.avg("reconstruction_mse").alias("_avg_mse"),
        F.max("reconstruction_mse").alias("_max_mse"),
    )
    return stats.crossJoin(F.broadcast(comp_var)).select(
        "n_vectors",
        "codes_in_range",
        "compression_ratio",
        (F.col("_avg_mse") < F.col("_var")).alias("beats_mean_baseline"),
        (F.col("_max_mse") <= 1.5 * F.col("_var")).alias("max_mse_bounded"),
    )


#: Shared BM25 oracle CTEs (lens/tf/stats/bm) — l3_bm25_topk and
#: l3_hybrid_rrf build their oracles from this ONE string so the formula,
#: tokenizer mirror and query terms can never drift apart (review r6; the
#: _DUCK_TOKS pattern from workloads/curation.py).
_BM25_LEX_CTES = r"""lens AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    tf AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS dl,
             CAST(len(list_filter(toks, t -> t = 'spark')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(toks, t -> t = 'vector')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(toks, t -> t = 'merge')) AS DOUBLE) AS tf2
      FROM lens
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM tf
    ),
    bm AS (
      SELECT doc_id,
          ROUND(LN((n - df0 + 0.5) / (df0 + 0.5) + 1.0), 6)
            * ((tf0 * 2.2) / (tf0 + 1.2 * (0.25 + (0.75 * (CASE WHEN avgdl = 0 THEN 0.0 ELSE (dl / avgdl) END)))))
        + ROUND(LN((n - df1 + 0.5) / (df1 + 0.5) + 1.0), 6)
            * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + (0.75 * (CASE WHEN avgdl = 0 THEN 0.0 ELSE (dl / avgdl) END)))))
        + ROUND(LN((n - df2 + 0.5) / (df2 + 0.5) + 1.0), 6)
            * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + (0.75 * (CASE WHEN avgdl = 0 THEN 0.0 ELSE (dl / avgdl) END)))))
          AS score
      FROM tf, stats
    )"""


@query(
    "l3_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_LEX_CTES},
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM bm ORDER BY rk LIMIT 20
    ),
    qv AS (SELECT * FROM embeddings WHERE vec_id = 0),
    cos AS (
      SELECT c.vec_id AS doc_id,
             list_dot_product(qv.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(qv.embedding::DOUBLE[], qv.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
               AS cos_sim
      FROM embeddings c, qv
      WHERE c.vec_id != qv.vec_id
    ),
    dense AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS rk
      FROM cos ORDER BY rk LIMIT 20
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + l.rk), 0.0)
           + COALESCE(1.0 / (60 + d.rk), 0.0) AS s
      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, ROUND(s, 6) AS rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS BIGINT) AS rk
    FROM fused ORDER BY rk LIMIT 20
    """,
)
def l3_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 hybrid retrieval: Reciprocal Rank Fusion of the sparse BM25
    top-20 (terms: spark, vector, merge) and the dense exact-cosine
    top-20 for query vector 0 (functions/similarity.rrf_fuse) — the
    standard calibration-free sparse+dense combiner. Exact-hash oracle:
    RRF arithmetic is integer ranks + one exactly-rounded division per
    list summed in fixed list order (no transcendental beyond BM25's
    already-rounded idf), so fused scores are bit-identical across
    engines. Doc and vector ids share the fixture id space."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        cosine_topk,
        rrf_fuse,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.text import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, ["spark", "vector", "merge"], k=20).select("doc_id", "rk")
    dense = cosine_topk(e, e.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rk"
    )
    fused = rrf_fuse([lex, dense], top=20)
    return fused.select("doc_id", "rrf_score", F.col("rk").cast("long"))


@query(
    "l4_bigram_perplexity",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c1
      FROM (SELECT UNNEST(tk) AS w FROM toks)
      GROUP BY w
    ),
    vocab AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bi AS (
      SELECT doc_id, UNNEST(range(1, greatest(len(tk), 1))) AS pos, tk
      FROM toks
    ),
    bi2 AS (
      SELECT doc_id, pos, tk[pos] AS w1, tk[pos + 1] AS w2 FROM bi
    ),
    bic AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM bi2 GROUP BY w1, w2
    ),
    scored AS (
      SELECT b.doc_id, b.pos,
             ROUND(LN((bc.c2 + 1.0) / (u.c1 + v.v)), 6) AS lnp
      FROM bi2 b
      JOIN bic bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
      JOIN uni u ON b.w1 = u.w
      CROSS JOIN vocab v
    ),
    perdoc AS (
      SELECT doc_id, list(lnp ORDER BY pos) AS ls
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_bigrams,
           ROUND(-(list_reduce(ls, (a, b) -> a + b)) / len(ls), 6) AS cross_entropy
    FROM perdoc
    """,
)
def l4_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: perplexity-style quality scoring — per-doc cross-entropy under
    an add-one-smoothed bigram LM trained on the corpus itself
    (functions/text.bigram_cross_entropy), the KenLM-shaped filter
    without an external model. Exact-hash oracle by the bm25 discipline:
    round each ln (the only transcendental) to 6 dp, integer counts,
    per-doc LEFT FOLD over position-sorted ln-probs (DuckDB mirror:
    list(lnp ORDER BY pos) + list_reduce — a left fold with the same
    association as Spark's aggregate-from-0.0)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.text import (
        bigram_cross_entropy,
    )

    d = load_table(spark, sf_dir, "documents")
    return bigram_cross_entropy(d)


@query(
    "l3_bm25_topk",
    oracle=f"""
    WITH {_BM25_LEX_CTES}
    SELECT doc_id, ROUND(score, 6) AS score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
    FROM bm ORDER BY rk LIMIT 20
    """,
)
def l3_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 lexical tier: BM25 top-20 for the literal query (spark, vector,
    merge) — the sparse-retrieval counterpart of the cosine/ANN vector
    tier (hybrid retrieval unions the two candidate sets). Exact-hash
    oracle BY CONSTRUCTION, not luck: ln() is the only transcendental
    (Java Math.log vs libm differ by 1 ulp on ~4% of inputs — measured),
    so each idf is rounded to 6 dp immediately; tf/df/N are integers,
    avgdl is an exact BIGINT sum over the count, multiplies/divides are
    IEEE exactly-rounded with the SAME parenthesization in both
    engines, and the per-doc sum runs in literal term order. The plan is
    one corpus pass + two 1-row broadcasts + TakeOrderedAndProject (no
    global sort, no single-reducer window)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.text import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    out = bm25_topk(d, ["spark", "vector", "merge"], k=20)
    return out.select("doc_id", "score", F.col("rk").cast("long"))


@query(
    "l3_pq_search",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches
    """,
)
def l3_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path #3 (VERDICT r5 #3): PQ asymmetric-distance search —
    ADC lookup-table shortlist over the 8-byte PQ codes (32x less scan
    memory than the raw 64-float vectors), then exact re-rank of the
    200-candidate shortlist only (functions/similarity.pq_topk — the
    standard ADC-then-refine tier). Contract (the l3_ann pattern):
    recall >= 0.6 vs the ENGINE-COMPUTED exact squared-L2 top-5 (same
    metric, uncompressed — isolates quantization loss; ADC-only is
    0.24 — the fixture's near-uniform embeddings are PQ's worst case),
    at most k rows per query, no self-matches. Shortlist sizing is the
    round-7 sf0.1-sweep lesson: shortlist=50 measured 0.86 at sf0.01
    (500 vectors) but 0.60-0.64 at sf0.1 (2000 — distance concentration
    shrinks ADC's ranking signal as the corpus grows, and seeded KMeans
    shifts slightly with session partitioning), a boundary contract;
    shortlist=200 restores 0.86 at sf0.1 with margin on any session."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        l2_topk,
        pq_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = pq_topk(
        e, q, k=5, dim=64, n_subspaces=8, n_centroids=32,
        shortlist=_ann_shortlist(e)
    )
    return _ann_contract(approx, l2_topk(e, q, k=5), recall_bound=0.6, k=5)


@query(
    "l3_ivf_pq_search",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches
    """,
)
def l3_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 deployable ANN shape (VERDICT r6 #2): IVF + PQ COMPOSED — the
    coarse quantizer restricts each query to its 8 nearest of 16 cells
    (≈half the corpus rows scanned) and the scan reads 8-byte PQ codes
    instead of 512-byte raw vectors (ADC lookup tables), with the exact
    re-rank touching only the 50-id shortlist
    (functions/similarity.ivf_pq_topk — the FAISS-IVFPQ layout).
    Contract (the l3_pq_search pattern): recall >= 0.6 vs the
    ENGINE-COMPUTED exact squared-L2 top-5 (measured 0.88 at sf0.1 with
    shortlist 200 — shortlist 50 sat at the 0.6 boundary there, the
    round-7 sweep lesson documented on l3_pq_search), ≤ k rows per
    query, no self-matches."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ivf_pq_topk,
        l2_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = ivf_pq_topk(
        e, q, k=5, dim=64, n_cells=16, n_probe=8, n_subspaces=8,
        n_centroids=32, shortlist=_ann_shortlist(e),
    )
    return _ann_contract(approx, l2_topk(e, q, k=5), recall_bound=0.6, k=5)


@query(
    "l3_ivf_pq_residual_search",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches
    """,
)
def l3_ivf_pq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 residual-encoded IVFPQ (VERDICT r7 #6): identical plan to
    l3_ivf_pq_search, but the PQ codebooks are trained on and the codes
    encode per-cell RESIDUALS (vec − centroid[cell]) — the classic
    FAISS layout, finer quantization when cells are tight. ADC lookup
    tables move after the probe explode (per probed cell, n_probe tiny
    tables per query); the cell equi-join / window shortlist / exact
    broadcast re-rank are unchanged. Contract: same recall ≥ 0.6 vs the
    engine-exact squared-L2 top-5 (measured ≈ parity with the
    global-codebook form on the near-uniform fixture — cells are wide
    there; SCALING.md "residual IVFPQ" records both numbers), ≤ k rows
    per query, no self-matches."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ivf_pq_topk,
        l2_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = ivf_pq_topk(
        e, q, k=5, dim=64, n_cells=16, n_probe=8, n_subspaces=8,
        n_centroids=32, shortlist=_ann_shortlist(e), residual=True,
    )
    return _ann_contract(approx, l2_topk(e, q, k=5), recall_bound=0.6, k=5)


@query(
    "l3_persisted_ann_search",
    oracle="""
    SELECT TRUE AS recall_ok, TRUE AS k_bound_ok, TRUE AS no_self_matches,
           TRUE AS twins_found
    """,
)
def l3_persisted_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 SERVING shape (round 7): the persisted IVF-PQ index —
    build once (models pinned in meta), APPEND a new batch encoded with
    those pinned models (no retrain — stored codes stay comparable),
    search from disk (functions/ann_index.py; codes = scan tier,
    raw-vector refine tier read only for the broadcast shortlist
    lookup). Contract: recall >= 0.6 vs engine-exact squared-L2 top-5
    over corpus∪appended (the l3_pq_search pattern), ≤ k rows/query, no
    self-matches, AND every appended verbatim twin of a query vector is
    found at rank 1 / dist 0 (``twins_found`` — identical vector ⇒
    identical cell + codes under pinned models ⇒ exact re-rank 0)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import l2_topk

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 10)
    twins = q.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    path = _scratch_dir(spark, "ann_idx_persist")
    ann_index_build(
        e, "vec_id", "embedding", path, dim=64, n_cells=16, n_subspaces=8,
        n_centroids=32,
    )
    ann_index_append(twins, "vec_id", "embedding", path, batch_id="b1")
    approx = ann_index_search(q, path, k=5, n_probe=8,
                              shortlist=_ann_shortlist(e))
    exact = l2_topk(e.unionByName(twins), q, k=5)
    n_q = q.agg(F.count("*").alias("_nq"))
    n_tw = approx.filter(
        (F.col("neighbor_id") == F.col("query_id") + _PLANT_OFFSET)
        & (F.col("rk") == 1)
        & (F.col("dist") == 0.0)
    ).agg(F.count("*").alias("_ntw"))
    return (
        _ann_contract(approx, exact, recall_bound=0.6, k=5)
        .crossJoin(F.broadcast(n_q))
        .crossJoin(F.broadcast(n_tw))
        .select(
            "recall_ok",
            "k_bound_ok",
            "no_self_matches",
            (F.col("_ntw") == F.col("_nq")).alias("twins_found"),
        )
    )


@query(
    "l4_collapse_repeats",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id < 300
    ),
    collapsed AS (
      SELECT doc_id, t,
             list_filter(t, (x, i) -> i = 1 OR x <> t[i - 1]) AS c
      FROM toks
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_before,
           CAST(len(c) AS BIGINT) AS n_after,
           md5(array_to_string(c, ' ')) AS collapsed_md5
    FROM collapsed
    """,
)
def l4_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: consecutive-duplicate-token collapse — the run-length
    normalization pass crawled corpora need (scrape artifacts repeat
    words: "a a the the"). Pure JVM HOF: filter each token stream
    keeping position i only when it differs from position i-1. EXACT
    oracle: DuckDB's indexed list lambda reproduces the collapse
    verbatim, so before/after counts AND the md5 of the collapsed text
    are value-checked per document."""
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    )
    toks = tx.tokenize("text")
    with_t = d.select("doc_id", toks.alias("_t"))
    # filter with (element, 0-based index): keep i==0 or t[i] != t[i-1];
    # element_at is 1-based, so t[i-1] (0-based) = element_at(_t, i)
    collapsed = F.filter(
        F.col("_t"),
        lambda x, i: (i == 0) | (x != F.element_at(F.col("_t"), i)),
    )
    return with_t.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_before"),
        F.size(collapsed).cast("long").alias("n_after"),
        F.md5(F.concat_ws(" ", collapsed)).alias("collapsed_md5"),
    )


@query(
    "l4_stopword_discovery",
    oracle=r"""
    WITH doc_toks AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))) AS tok
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    df AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS doc_freq
      FROM doc_toks GROUP BY tok
    )
    SELECT tok, doc_freq,
           ROUND(doc_freq / n_docs, 6) AS df_ratio
    FROM df, n
    WHERE doc_freq / n_docs >= 0.2
    """,
)
def l4_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus-driven stopword discovery — tokens whose DOCUMENT
    frequency exceeds 20% of the corpus. This is the list that feeds the
    inverted-index skew guards (ngram_jaccard's hot-token cap, the dedup
    band bucket analysis): at 100 TB you compute it once per corpus
    snapshot, broadcast it, and stop-word the quadratic joins. Plan:
    distinct-tokens-per-doc explode → (token, partial count) two-phase
    agg → ratio filter; the exact doc-frequency arithmetic is mirrored
    by DuckDB."""
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n_docs = d.agg(F.count("*").cast("double").alias("_n"))
    df = (
        d.select("doc_id", F.explode(F.array_distinct(tx.tokenize("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
    )
    return (
        df.crossJoin(F.broadcast(n_docs))
        .withColumn("df_ratio", F.round(F.col("doc_freq") / F.col("_n"), 6))
        .filter(F.col("doc_freq") / F.col("_n") >= 0.2)
        .select("tok", "doc_freq", "df_ratio")
    )


@query(
    "l5_multimodal_jpeg",
    oracle=f"""
    WITH {_PNG_ORACLE_PX}
    SELECT d.doc_id,
           d.doc_id % 37 <> 0                   AS valid,
           CAST(CASE WHEN d.doc_id % 37 = 0 THEN 0 ELSE d.w END AS INT) AS width,
           CAST(CASE WHEN d.doc_id % 37 = 0 THEN 0 ELSE d.h END AS INT) AS height,
           CASE WHEN d.doc_id % 37 = 0 THEN NULL ELSE m.mean_c0 END AS mean_c0_expected,
           CASE WHEN d.doc_id % 37 = 0 THEN NULL ELSE TRUE END AS mean_within_quant_err
    FROM dims d JOIN means m ON d.doc_id = m.doc_id
    """,
)
def l5_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: REAL baseline-JPEG round-trip — deterministic RGB JPEGs
    (functions/jpeg.py: JFIF framing, generated canonical Huffman
    tables, 8x8 DCT + quantization, byte stuffing) generated per
    document, every 37th truncated mid-stream as poison, then decoded
    with the same module's GENERAL baseline decoder (parses whatever
    DQT/DHT/SOF0 the stream declares). JPEG is lossy, so the contract
    differs from PNG/RAW8: dimensions and validity are exact
    (oracle-mirrored, poison pattern included), the EXPECTED channel-0
    mean is computed exactly on both engines (Spark: nested
    sequence/aggregate HOFs over the pixel grid — JVM, no UDF; DuckDB:
    UNNEST cross product), and the DECODED mean must sit within 2.0 of
    it — quantization-bounded (measured max drift 0.354 at q=90), so a
    broken DCT/Huffman/dequant path fails the row. Round-trip PSNR >=
    25 dB is asserted in tests."""
    from etl_apache_kafka_python_doker_aws_spark.functions.multimodal import (
        attach_jpeg_media,
        decode_jpeg_features,
    )
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )
    )
    feats = decode_jpeg_features(
        attach_jpeg_media(d, "doc_id", poison_every=37), "doc_id"
    )
    did = F.col("doc_id")
    w, h = F.lit(8) + F.pmod(did, F.lit(16)), F.lit(8) + F.pmod(did * 3, F.lit(8))
    # exact integer pixel-mean, all JVM: sum over x of sum over y of
    # (x*7 + y*13 + id) % 256, divided by w*h
    pix_sum = F.aggregate(
        F.sequence(F.lit(0), w - 1),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.aggregate(
            F.sequence(F.lit(0), h - 1),
            F.lit(0).cast("long"),
            lambda a2, y: a2 + F.pmod(x * 7 + y * 13 + did, F.lit(256)),
        ),
    )
    expected = pix_sum / (w * h).cast("double")
    mean0 = F.element_at("mean_per_channel", 1)
    return feats.select(
        "doc_id",
        "valid",
        "width",
        "height",
        F.when(F.col("valid"), expected).alias("mean_c0_expected"),
        F.when(F.col("valid"), F.abs(mean0 - expected) <= 2.0).alias(
            "mean_within_quant_err"
        ),
    )


@query(
    "l5_multimodal_raw8",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id*3) % 8 AS h
      FROM documents WHERE doc_id < 200
    ),
    xs AS (SELECT doc_id, h, UNNEST(GENERATE_SERIES(0, w - 1)) AS x FROM dims),
    px AS (SELECT doc_id, x, UNNEST(GENERATE_SERIES(0, h - 1)) AS y FROM xs),
    means AS (
      SELECT doc_id, AVG((x*7 + y*13 + doc_id) % 256) AS mean_c0
      FROM px GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(3 AS INT)   AS channels,
           m.mean_c0        AS mean_c0,
           TRUE             AS thumb_in_range,
           TRUE             AS valid
    FROM dims d JOIN means m ON d.doc_id = m.doc_id
    """,
)
def l5_multimodal_raw8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: REAL binary decode — deterministic RAW8 raster tiles (a
    documented toy format: magic + uint16 dims + uint8 channels + raw
    pixels) generated per document, then decoded with actual numpy pixel
    math over Arrow batches: header parse, length validation,
    per-channel mean/std, 4x4 mean-pooled thumbnails. The generator's
    pixel grid is a pure function of doc_id (pixel = (x*7+y*13+id)%256),
    so the decoded channel-0 mean is EXACTLY reproduced by the DuckDB
    oracle (integer sums are exact in float64 on both engines; no
    rounding needed); the pooled thumbnail cell is emitted as a range
    invariant. Exact thumbnail values are pinned in tests/test_llm_ops.py."""
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
    thumb0 = F.element_at("thumbnail_4x4", 1)
    return feats.select(
        "doc_id", "width", "height", "channels",
        F.element_at("mean_per_channel", 1).alias("mean_c0"),
        ((thumb0 >= 0) & (thumb0 <= 255)).alias("thumb_in_range"),
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


@query(
    "l2_bloom_dedup",
    oracle="""
    SELECT doc_id + 100000 AS probe_id,
           TRUE AS flagged,
           TRUE AS fp_ok
    FROM documents
    WHERE doc_id % 25 = 0
    """,
)
def l2_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: incremental dedup against a Bloom filter of the existing
    corpus (functions/sketches.bloom_build / bloom_might_contain) — the
    production shape for "is this newly crawled document already in the
    100 TB corpus?" where an exact anti-join would shuffle the whole
    corpus per increment and the bitmap costs m/8 bytes once.

    Contract (the planted-duplicate pattern): every 25th document is
    replayed VERBATIM as a probe under doc_id+100000 — a Bloom filter
    has NO false negatives, so each must probe true (`flagged`). The
    false-positive side is bounded by a second probe set of provably
    novel texts (text || ' zqxj' || doc_id, absent from the corpus):
    their flagged rate must stay under 5% — at m=2^22 bits / k=4 the
    expected rate is <1e-3 even at the sf0.1 corpus — folded into the
    `fp_ok` boolean on every output row. Both probe families and the
    filter are deterministic (xxhash64), so the oracle enumerates the
    planted rows exactly.

    Plan note: the fp aggregate and the planted output form a diamond
    over the same probe pipeline; AQE's runtime exchange reuse dedups
    the expensive shared stage (verified: the post-execution plan shows
    a ReusedExchange — the corpus-scan + bit_or bitmap build runs once).
    A production incremental-dedup job emitting per-probe rows would
    persist() the probed frame instead; a registered query must stay
    side-effect-free (builders run many times per session)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.select("text")
    planted = d.filter(F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 0).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("probe_id"),
        F.col("text"),
        F.lit(True).alias("is_planted"),
    )
    novel = d.filter(F.pmod(F.col("doc_id"), F.lit(_PLANT_STEP)) == 1).select(
        (F.col("doc_id") + 2 * _PLANT_OFFSET).alias("probe_id"),
        F.concat(F.col("text"), F.lit(" zqxj"), F.col("doc_id")).alias("text"),
        F.lit(False).alias("is_planted"),
    )
    probes = planted.unionByName(novel)

    bitmap = bloom_build(corpus, "text")
    probed = bloom_might_contain(probes, "text", bitmap, result_col="flagged")
    fp = probed.filter(~F.col("is_planted")).agg(
        (
            F.coalesce(F.avg(F.col("flagged").cast("double")), F.lit(0.0)) <= 0.05
        ).alias("fp_ok")
    )
    return (
        probed.filter(F.col("is_planted"))
        .crossJoin(F.broadcast(fp))
        .select("probe_id", "flagged", "fp_ok")
    )


@query(
    "l4_length_histogram",
    oracle="""
    WITH t AS (
        SELECT LEAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) // 10, 19)
                   AS bucket
        FROM documents
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t)
    SELECT CAST(bucket AS BIGINT)      AS bucket,
           CAST(bucket * 10 AS BIGINT) AS lo_tokens,
           CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(COUNT(*) AS DOUBLE) / n_total AS share
    FROM t, tot
    GROUP BY bucket, n_total
    """,
)
def l4_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: token-length histogram (fixed-width 10-token buckets, top
    bucket open-ended) — the length-distribution profile a training-data
    pipeline uses to size context windows and packing bins. One narrow
    pass + a 6-ish-group hash agg; the corpus share joins a 1-row total
    (broadcast), never a window over the whole table."""
    d = load_table(spark, sf_dir, "documents")
    ntok = tx.token_count_whitespace("text")
    bucketed = d.select(
        F.least(F.floor(ntok / 10), F.lit(19)).cast("long").alias("bucket")
    )
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("n_docs"))
    total = bucketed.agg(F.count("*").alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        (F.col("bucket") * 10).alias("lo_tokens"),
        "n_docs",
        (F.col("n_docs") / F.col("n_total")).alias("share"),
    )


@query(
    "l2_jaccard_prefix",
    scale_form="bounded",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_FILTER(
        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), t -> t <> ''))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b,
             CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS jaccard
      FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.4
    )
    SELECT CAST(id_a % 97 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(ROUND(jaccard * 1000000, 0) AS BIGINT)) AS BIGINT)
             AS jaccard_millionths,
           CAST(SUM((id_a * 1000003 + id_b) % 2147483647) AS BIGINT)
             AS id_checksum
    FROM pairs GROUP BY 1
    """,
)
def l2_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: exact token-set Jaccard pairs over the WHOLE corpus via prefix
    filtering (functions/dedup.jaccard_pairs_prefix_filtered) — same
    semantics as l2_ngram_jaccard but without that query's doc_id < 200
    cap: the candidate self-join touches only each document's rare-token
    prefix, so the quadratic verify that forced the cap disappears. The
    oracle is the brute-force all-pairs SQL over the full table.

    Contract shape (round-7 sf0.1-sweep lesson): the fixture corpus's
    true near-dup mass is QUADRATIC at threshold 0.4 (10.4M pairs at
    sf0.1 — tiny shared vocabulary), so emitting raw pairs made the
    contract row set unbounded in fixture size and the compare's fetch
    the bottleneck. The output is instead a per-bucket rollup that still
    proves exact set equality: pair count, the integer sum of
    jaccard·1e6 (exact BIGINT arithmetic — no float summation order),
    and an id-pair checksum, grouped by id_a mod 97. Any dropped or
    extra or mis-scored pair moves its bucket's row."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
        jaccard_pairs_prefix_filtered,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_prefix_filtered(d, "doc_id", "text", min_jaccard=0.4)
    return pairs.groupBy(F.pmod("id_a", F.lit(97)).cast("long").alias("bucket")).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.round(F.col("jaccard") * 1000000, 0).cast("long")).alias(
            "jaccard_millionths"
        ),
        F.sum(
            F.pmod(F.col("id_a") * 1000003 + F.col("id_b"), F.lit(2147483647))
        ).alias("id_checksum"),
    )
