"""Text-analysis operators (SURVEY.md §2.11 L4): tokenization, quality
scoring, language-ID heuristic, token counting, document fingerprinting.

Everything is built-in `pyspark.sql.functions` column expressions (JVM,
whole-stage codegen) — no Python in the row path, so these run at full
scan speed over 100 TB of documents. Each returns a Column (composable)
rather than a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the n-gram/stopword heuristic
# language ID. Real deployments swap in fastText et al. via a Pandas UDF;
# the heuristic keeps the 100 TB path JVM-only.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def tokenize(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        col = F.lower(col)
    toks = F.split(F.trim(col), r"\s+")
    return F.filter(toks, lambda t: t != "")


def token_count_whitespace(text: Column | str) -> Column:
    """Token count by whitespace split."""
    return F.size(tokenize(text, lowercase=False))


def token_count_bpe_ish(text: Column | str) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs the way a byte-pair tokenizer roughly fragments text. Uses a
    regex split on letter/digit/punct boundaries, ~chars/4 fallback-free."""
    col = F.col(text) if isinstance(text, str) else text
    pieces = F.split(col, r"(?<=[a-zA-Z])(?=[^a-zA-Z\s])|(?<=[^a-zA-Z\s])(?=[a-zA-Z])|\s+")
    return F.size(F.filter(pieces, lambda t: t != ""))


def quality_features(text: Column | str, stopwords: tuple[str, ...] = _LANG_MARKERS["en"]):
    """Quality-scoring feature columns: length, word count, mean word
    length, punctuation ratio, stopword ratio. Returns a dict of Columns
    to be select()ed with aliases."""
    col = F.col(text) if isinstance(text, str) else text
    toks = tokenize(col)
    n_tokens = F.size(toks)
    n_chars = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    total_token_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        # from the tokens themselves — (n_chars - n_tokens + 1)/n_tokens
        # assumes exactly single-space separators and breaks on runs of
        # whitespace; NULL (not error) on token-less docs
        "mean_word_len": F.when(
            n_tokens > 0, total_token_chars / n_tokens
        ),
        # guarded like the token ratios: ANSI mode makes a bare /0 on an
        # empty doc a job-aborting DIVIDE_BY_ZERO, not an Inf/NULL
        "punct_ratio": F.when(n_chars > 0, punct / n_chars),
        "stopword_ratio": F.when(n_tokens > 0, stop_hits / n_tokens),
    }


def lang_id_heuristic(text: Column | str) -> Column:
    """Marker-word language ID: score each candidate language by marker
    hits in the token set; return the argmax language code ('und' when no
    marker hits). Deterministic, JVM-only."""
    toks = tokenize(text)

    def marker_hit(markers: tuple[str, ...]):
        # closure factory: a default arg on the lambda itself would be
        # treated as an extra HOF parameter by PySpark
        mlist = list(markers)
        return lambda t: t.isin(mlist)

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, marker_hit(markers))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(_LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def fingerprint_md5(text: Column | str) -> Column:
    """Canonical-form content fingerprint: md5 over the sorted, lowercased
    token set — robust to word order & duplication (SQL-expressible)."""
    toks = tokenize(text)
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(toks))))


def fingerprint_rolling(text: Column | str, modulus: int = (1 << 31) - 1) -> Column:
    """Order-sensitive rolling polynomial hash over token hashes
    (acc*31 + (xxhash64(token) mod p) mod p, p = 2^31-1 so intermediate
    values never overflow a long under ANSI mode). Spark-only."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + F.pmod(F.xxhash64(t), F.lit(modulus)), F.lit(modulus)),
    )


def word_counts(df, text_col: str):
    """Corpus-wide (word, count) pairs — the scalable word-count shape:
    map-side partial aggregation means the shuffle carries (word, partial)
    not raw tokens."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def tfidf_features(df, id_col: str, text_col: str, n_features: int = 1 << 12):
    """L4: TF-IDF document vectors via MLlib HashingTF + IDF (the
    feature-hashing path — no vocabulary broadcast, so it scales to any
    corpus; CountVectorizer would need a fitted vocab).

    Returns (id_col, tfidf: ml VectorUDT). Downstream cosine similarity
    can consume it directly, or convert with vector_to_array.
    """
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=n_features)
    words = tok.transform(df.select(F.col(id_col), F.lower(F.col(text_col)).alias(text_col)))
    tfd = tf.transform(words)
    idf = IDF(inputCol="_tf", outputCol="tfidf").fit(tfd)
    return idf.transform(tfd).select(id_col, "tfidf")


# Char-trigram profiles per language (top distinctive trigrams; real
# deployments learn these from a labeled corpus — the mechanics are what
# matter: trigram extraction + profile scoring, all JVM HOFs).
_CHAR_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "ent"),
    "es": ("que", "ión", "ent", "ado", "los"),
    "de": ("der", "ein", "ich", "sch", "und"),
    "fr": ("les", "ent", "ion", "que", "eur"),
    "zh": ("zh1", "sh4", "ng1", "ao4", "an2"),
}


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of the lowercased text as array<string>
    (empty array for texts shorter than n)."""
    col = F.lower(F.col(text) if isinstance(text, str) else text)
    k = F.length(col) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(col, i, n))
    )


def lang_id_char_ngrams(text: Column | str) -> Column:
    """Language ID via char-trigram profile scoring (the literal 'n-gram
    heuristic' form): score each language by how many of its profile
    trigrams occur in the document's trigram set; argmax, 'und' when no
    profile hits. Deterministic, JVM-only, single pass."""
    grams = F.array_distinct(char_ngrams(text, 3))

    def profile_hits(profile: tuple[str, ...]):
        plist = list(profile)
        return lambda g: g.isin(plist)

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(grams, profile_hits(profile))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, profile in sorted(_CHAR_TRIGRAM_PROFILES.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


# PII patterns kept to the regex subset Java and RE2 interpret identically
# (char classes, bounded/unbounded repeats — no backrefs, no lookaround),
# so the same pattern drives Spark and the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def mask_pii(text: Column | str) -> Column:
    """Mask emails then phone numbers with typed placeholders — the
    standard scrub pass before corpus export. Pure regexp_replace (JVM,
    codegen); order matters: emails first so their digit runs are not
    half-eaten by the phone pattern."""
    col = F.col(text) if isinstance(text, str) else text
    masked = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(masked, PHONE_RE, "<PHONE>")


def chunk_tokens(
    text: Column | str, chunk_size: int = 100, overlap: int = 20
) -> Column:
    """Split a document into overlapping token windows — the training-
    pipeline chunking step (context-window packing). Returns
    array<string>: chunk i covers tokens [i*step, i*step + chunk_size)
    with step = chunk_size - overlap; the last window may be short. Empty
    docs yield an empty array. All JVM HOFs — no Python in the row path.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    step = chunk_size - overlap
    toks = tokenize(text)
    n = F.size(toks)
    # 1-indexed starts: 1, 1+step, ... last start <= n
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / F.lit(step)).cast("int") + 1
    )
    # POSITIVE guard: `n <= 0` is NULL (not true) for a NULL document
    # under ANSI size(NULL) semantics, which used to fall through to the
    # otherwise-branch and emit one phantom empty chunk ['']
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, chunk_size)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bm25_topk(
    docs,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Lexical retrieval baseline: BM25 top-k documents for a literal
    term query — the standard sparse counterpart to the L3 vector tier
    (hybrid retrieval = union of this and cosine/ANN top-k).

    Plan (one corpus pass + 1-row broadcasts, no per-term shuffle): per
    doc, tf for each query term via a JVM array filter over the shared
    tokenization; corpus stats (N, Σdl — an exact BIGINT sum so avgdl is
    a deterministic double) and per-term document frequencies reduce to
    1-row frames that broadcast back; the score is a fixed-order literal
    expression per doc, then one window shuffle for the top-k.

    Cross-engine determinism (oracle-exact by construction): ln() is the
    ONLY transcendental and Java's Math.log can differ from libm by one
    ulp (measured: 54/1374 probed inputs), so each idf is ROUNDED to 6
    dp immediately after the ln; every other step — integer tf/df/N,
    exact-sum avgdl, exactly-rounded IEEE mults/divs, and a summation
    pinned to the literal term order — is then bit-identical on any
    engine, and the DuckDB mirror writes the same expression shape with
    the same parenthesization. rk ties break on id.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    def _tf_expr(term: str):
        # NB: a `lambda t, w=w:` closure would give the HOF lambda TWO
        # parameters and PySpark would bind the second to the array
        # INDEX — a real one-arg closure is required
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    toks = tokenize(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        *[_tf_expr(w).alias(f"_tf{i}") for i, w in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_dl").cast("double") / F.count("*")).alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double").alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.round(
            F.ln(
                (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
                / (F.col(f"_df{i}") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        tf = F.col(f"_tf{i}").cast("double")
        # avgdl = 0 (an all-empty corpus) would make dl/avgdl a
        # job-aborting ANSI divide-by-zero; tf is 0 for every doc then,
        # so pinning the length ratio to 0 keeps every score 0
        ratio = F.when(F.col("_avgdl") == 0, F.lit(0.0)).otherwise(
            F.col("_dl").cast("double") / F.col("_avgdl")
        )
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * ratio))
        term = idf * ((tf * F.lit(k1 + 1.0)) / denom)
        score = term if score is None else score + term
    # orderBy().limit(k) plans TakeOrderedAndProject (map-side partial
    # top-k, no single-reducer global sort); the rank window then runs
    # over only the k survivors.
    top = (
        scored.withColumn("_score", score)
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_score").desc(), F.col(id_col).asc())
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(F.col(id_col), F.round("_score", 6).alias("score"), "rk")
    )


def bigram_cross_entropy(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Perplexity-style quality scoring: per-document cross-entropy under
    an add-one-smoothed BIGRAM language model trained on the corpus
    itself — the classic KenLM-shaped filter (prune documents whose
    cross-entropy is far from the corpus median) without an external
    model artifact. p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).

    Plan: explode bigrams once, count bigrams/unigrams (map-side partial
    aggs on token keys), join the counts back, and fold each document's
    per-position ln-probs in POSITION order. Returns
    (id_col, n_bigrams, cross_entropy) — documents with fewer than two
    tokens have no bigrams and are omitted.

    Cross-engine determinism (same discipline as bm25_topk): each ln is
    rounded to 6 dp immediately (the only transcendental); counts and V
    are integers; the per-doc sum is a LEFT FOLD over the
    position-sorted array (DuckDB mirror: list(lnp ORDER BY pos) +
    list_reduce), so the result is bit-identical across engines.
    """
    from pyspark.sql import functions as F

    toks = tokenize(text_col)
    # r15 (guide §2.4/§5): the tokenized frame feeds THREE independent
    # subtrees of one plan (bigram stream twice — candidate + count —
    # and the unigram/vocab counts); Catalyst does not CSE across join
    # branches, so each subtree re-ran scan + regex tokenize. A lazy
    # localCheckpoint pins the (id, tokens) projection — compact, one
    # row per doc — and the tokenizer runs ONCE per query instead of
    # 3×. Measured at sf0.1 (interleaved same-session A/B, medians of
    # 4): 1.61 s → 1.34 s (−17%); see OPTIMIZATION_r15.md.
    t = docs.select(F.col(id_col), toks.alias("_tk")).localCheckpoint(eager=False)
    bigrams = F.zip_with(
        F.slice("_tk", 1, F.greatest(F.size("_tk") - 1, F.lit(0))),
        F.slice("_tk", 2, F.greatest(F.size("_tk") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = t.select(
        F.col(id_col), F.posexplode(bigrams).alias("pos", "bg")
    ).select(
        F.col(id_col), "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    uni = (
        t.select(F.explode("_tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("_c1"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("_v"))
    bic = (
        bi.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("_c2"))
    )
    lnp = F.round(
        F.ln((F.col("_c2") + F.lit(1.0)) / (F.col("_c1") + F.col("_v"))), 6
    )
    scored = (
        bi.join(bic, ["w1", "w2"])
        .join(uni, bi["w1"] == uni["w"])
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), "pos", lnp.alias("_lnp"))
    )
    perdoc = scored.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("p"), F.col("_lnp").alias("l")))
        ).alias("_ls")
    )
    total = F.aggregate(
        F.transform("_ls", lambda s: s.getField("l")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return perdoc.select(
        F.col(id_col),
        F.size("_ls").cast("long").alias("n_bigrams"),
        F.round((-total) / F.size("_ls").cast("double"), 6).alias("cross_entropy"),
    )
