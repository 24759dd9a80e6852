"""Property-based cross-engine check (SURVEY.md §5.2): hypothesis
generates random predicate/aggregation combos; Spark and DuckDB must
agree on the result. Catches operator-semantics drift the curated
corpus misses."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from tests.conftest import SF_SMOKE

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "!="]

predicate = st.one_of(
    st.tuples(st.sampled_from(NUM_COLS), st.sampled_from(OPS),
              st.floats(min_value=0, max_value=100, allow_nan=False,
                        allow_infinity=False).map(lambda x: round(x, 2))),
    st.tuples(st.sampled_from(STR_COLS), st.sampled_from(["=", "!="]),
              st.sampled_from(["A", "N", "R", "O", "F"])),
)


def sql_of(preds) -> str:
    clauses = [
        f"{c} {op} {v!r}" if isinstance(v, str) else f"{c} {op} {v}"
        for c, op, v in preds
    ]
    return " AND ".join(clauses)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(preds=st.lists(predicate, min_size=1, max_size=3))
def test_random_conjunctive_predicates(spark, duck_smoke, preds):
    where = sql_of(preds)
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.createOrReplaceTempView("li_prop")
    spark_n = spark.sql(f"SELECT COUNT(*) FROM li_prop WHERE {where}").first()[0]
    duck_n = duck_smoke.execute(
        f"SELECT COUNT(*) FROM lineitem WHERE {where}"
    ).fetchone()[0]
    assert spark_n == duck_n, f"WHERE {where}: spark={spark_n} duck={duck_n}"


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    group_col=st.sampled_from(STR_COLS),
    agg_col=st.sampled_from(["l_quantity", "l_orderkey"]),
    pred=predicate,
)
def test_random_grouped_counts(spark, duck_smoke, group_col, agg_col, pred):
    where = sql_of([pred])
    q = (
        f"SELECT {group_col}, COUNT(*), MIN({agg_col}), MAX({agg_col}) "
        f"FROM {{t}} WHERE {where} GROUP BY {group_col}"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_prop")
    s = {tuple(r) for r in spark.sql(q.format(t="li_prop")).collect()}
    d = {tuple(r) for r in duck_smoke.execute(q.format(t="lineitem")).fetchall()}
    assert s == d


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicate, status=st.sampled_from(["F", "O", "P"]))
def test_random_join_counts(spark, duck_smoke, pred, status):
    """Filtered fact ⋈ filtered dim must agree across engines."""
    where = sql_of([pred])
    q = (
        "SELECT COUNT(*) FROM {li} l JOIN {o} o ON l.l_orderkey = o.o_orderkey "
        f"WHERE {where} AND o.o_orderstatus = '{status}'"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_pj")
    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView("o_pj")
    s = spark.sql(q.format(li="li_pj", o="o_pj")).first()[0]
    d = duck_smoke.execute(q.format(li="lineitem", o="orders")).fetchone()[0]
    assert s == d


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(part_col=st.sampled_from(STR_COLS),
       order_col=st.sampled_from(["l_extendedprice", "l_quantity", "l_orderkey"]),
       k=st.integers(min_value=1, max_value=5))
def test_random_topk_per_group(spark, duck_smoke, part_col, order_col, k):
    """Window top-k with a unique tiebreaker must agree across engines for
    any (partition, order, k) combination."""
    q = (
        f"SELECT {part_col}, l_orderkey, l_linenumber FROM ("
        f"  SELECT {part_col}, l_orderkey, l_linenumber,"
        f"         ROW_NUMBER() OVER (PARTITION BY {part_col}"
        f"             ORDER BY {order_col} DESC, l_orderkey, l_linenumber) AS rk"
        f"  FROM {{t}}) WHERE rk <= {k}"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_prop")
    s = {tuple(r) for r in spark.sql(q.format(t="li_prop")).collect()}
    d = {tuple(r) for r in duck_smoke.execute(q.format(t="lineitem")).fetchall()}
    assert s == d


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(group_col=st.sampled_from(STR_COLS),
       min_count=st.integers(min_value=1, max_value=5000))
def test_random_having_counts(spark, duck_smoke, group_col, min_count):
    """GROUP BY + HAVING must agree across engines at any threshold."""
    q = (
        f"SELECT {group_col}, COUNT(*) AS n, SUM(l_quantity) AS sq "
        f"FROM {{t}} GROUP BY {group_col} HAVING COUNT(*) >= {min_count}"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_prop")
    s = {tuple(r) for r in spark.sql(q.format(t="li_prop")).collect()}
    d = {tuple(r) for r in duck_smoke.execute(q.format(t="lineitem")).fetchall()}
    assert s == d


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicate)
def test_random_rollup(spark, duck_smoke, pred):
    """ROLLUP totals (integer-valued sums) must agree under any filter.

    Known cross-engine divergence (found by this property): on an EMPTY
    filtered input, DuckDB emits the ANSI grand-total row
    (NULL, NULL, NULL, 0) while Spark's expand-then-aggregate produces no
    rows at all. Non-empty inputs agree, so the empty case is excluded
    here and the divergence documented.
    """
    where = sql_of([pred])
    q = (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq, COUNT(*) AS n "
        f"FROM {{t}} WHERE {where} GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_prop")
    if duck_smoke.execute(f"SELECT COUNT(*) FROM lineitem WHERE {where}").fetchone()[0] == 0:
        return  # documented divergence above
    s = {tuple(r) for r in spark.sql(q.format(t="li_prop")).collect()}
    d = {tuple(r) for r in duck_smoke.execute(q.format(t="lineitem")).fetchall()}
    assert s == d


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(group_col=st.sampled_from(STR_COLS + ["l_suppkey"]), pred=predicate)
def test_random_decimal_money_sums_exact(spark, duck_smoke, pred, group_col):
    """The money house style (workloads/money.py) must be EXACTLY equal
    across engines for any grouping/filter — decimal sums are order-
    independent, so no rounding boundary can flip (the q7/q9 failure
    class this style exists to kill)."""
    where = sql_of([pred])
    q = (
        f"SELECT {group_col}, "
        "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(8,2)))), 2) AS DOUBLE) AS rev "
        f"FROM {{t}} WHERE {where} GROUP BY {group_col}"
    )
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("li_prop")
    s = {(r[0], str(r[1])) for r in spark.sql(q.format(t="li_prop")).collect()}
    d = {(r[0], str(r[1])) for r in duck_smoke.execute(q.format(t="lineitem")).fetchall()}
    assert s == d


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=8
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_word_ngrams_matches_python_reference(spark, texts, n):
    """word_ngrams (slice/sequence HOFs) must agree with a trivial Python
    reference on arbitrary whitespace-soup inputs."""
    from etl_apache_kafka_python_doker_aws_spark.functions.curation import word_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: list(r["g"])
        for r in df.select("id", word_ngrams("text", n).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().strip().split() if w]
        want = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        assert got[i] == want, (t, n)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1), st.integers(0, 100),
                  st.integers(0, 1000)),
        min_size=0, max_size=25,
    ),
)
def test_asof_join_multikey_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """Multi-key as-of join (j7b, VERDICT r5 #4) vs the pandas
    ``merge_asof(by=[k1, k2])`` reference on arbitrary grouped fixtures.
    The engine's greatest-tiebreak-wins rule maps to merge_asof's
    last-row-wins once the right side is sorted by (ts, tiebreak)."""
    import pandas as pd

    from etl_apache_kafka_python_doker_aws_spark.operators.joins import asof_join

    lrows = [(i, k1, k2, ts) for i, (k1, k2, ts) in enumerate(left_rows)]
    ldf = spark.createDataFrame(lrows, "rid long, k1 long, k2 long, ts long")
    rschema = "k1 long, k2 long, ts long, payload long"
    rdf = spark.createDataFrame(right_rows, rschema)
    out = asof_join(ldf, rdf, ["k1", "k2"], "ts", "ts", ["payload"],
                    tiebreak="payload")
    got = {r.rid: r.asof_payload for r in out.collect()}

    lp = pd.DataFrame(lrows, columns=["rid", "k1", "k2", "ts"]).sort_values(
        "ts", kind="mergesort"
    )
    if right_rows:
        rp = pd.DataFrame(
            right_rows, columns=["k1", "k2", "ts", "payload"]
        ).sort_values(["ts", "payload"], kind="mergesort")
        ref = pd.merge_asof(lp, rp, on="ts", by=["k1", "k2"],
                            direction="backward", allow_exact_matches=True)
    else:
        ref = lp.assign(payload=None)
    want = {
        int(r.rid): (None if pd.isna(r.payload) else int(r.payload))
        for r in ref.itertuples()
    }
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    base_keys=st.sets(st.integers(0, 6), max_size=5),
    log_rows=st.lists(
        st.tuples(st.integers(0, 6),            # key
                  st.integers(0, 999),          # value payload
                  st.sampled_from(["I", "U", "D"])),
        max_size=20,
    ),
)
def test_cdc_apply_matches_python_replay(spark, base_keys, log_rows):
    """cdc_apply vs a trivial sequential dict replay: same final state
    for any random I/U/D log (seq = arrival order, unique per key by
    construction here)."""
    from etl_apache_kafka_python_doker_aws_spark.plans.merge import cdc_apply

    base = spark.createDataFrame(
        [(k, -k) for k in (sorted(base_keys) or [99])], "k long, v long"
    )
    log = [(k, v, i, op) for i, (k, v, op) in enumerate(log_rows)]
    ldf = spark.createDataFrame(log, "k long, v long, seq long, op string")

    state = {k: -k for k in (sorted(base_keys) or [99])}
    for k, v, _, op in log:                      # seq == arrival order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    want = set(state.items())
    got = {(r.k, r.v) for r in cdc_apply(base, ldf, ["k"], "seq").collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30), min_size=1, max_size=10
    ),
)
def test_bm25_matches_python_reference(spark, texts):
    """bm25_topk vs an independent pure-Python BM25 (same formula, same
    idf rounding) on arbitrary whitespace-soup corpora — checks the
    whole tf/df/avgdl/score pipeline, not just the DuckDB mirror."""
    import math

    from etl_apache_kafka_python_doker_aws_spark.functions.text import bm25_topk

    terms = ["a", "ab", "abc"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.score for r in bm25_topk(docs, terms, k=len(texts)).collect()}

    toks = {i: [w for w in t.lower().strip().split() if w] for i, t in enumerate(texts)}
    n = float(len(texts))
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    dfs = {w: float(sum(1 for v in toks.values() if w in v)) for w in terms}
    for i, v in toks.items():
        score = 0.0
        for w in terms:
            tf = float(v.count(w))
            idf = round(math.log((n - dfs[w] + 0.5) / (dfs[w] + 0.5) + 1.0), 6)
            ratio = (float(len(v)) / avgdl) if avgdl else 0.0
            denom = tf + k1 * ((1.0 - b) + (b * ratio))
            score += idf * ((tf * (k1 + 1.0)) / denom)
        assert abs(got[i] - round(score, 6)) < 2e-6, (texts[i], got[i], score)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="xy ", min_size=0, max_size=25), min_size=1, max_size=8
    ),
)
def test_bigram_cross_entropy_matches_python_reference(spark, texts):
    """bigram_cross_entropy vs an independent pure-Python add-one bigram
    LM on arbitrary corpora (docs with <2 tokens omitted)."""
    import math
    from collections import Counter

    from etl_apache_kafka_python_doker_aws_spark.functions.text import (
        bigram_cross_entropy,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.cross_entropy)
           for r in bigram_cross_entropy(docs).collect()}

    toks = {i: [w for w in t.lower().strip().split() if w] for i, t in enumerate(texts)}
    uni = Counter(w for v in toks.values() for w in v)
    bi = Counter(
        (v[j], v[j + 1]) for v in toks.values() for j in range(len(v) - 1)
    )
    vocab = float(len(uni))
    for i, v in toks.items():
        pairs = [(v[j], v[j + 1]) for j in range(len(v) - 1)]
        if not pairs:
            assert i not in got
            continue
        lnps = [round(math.log((bi[p] + 1.0) / (uni[p[0]] + vocab)), 6) for p in pairs]
        xent = round(-sum(lnps) / len(lnps), 6)
        assert got[i][0] == len(pairs)
        assert abs(got[i][1] - xent) < 2e-6, (texts[i], got[i], xent)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(st.integers(-500, 500), min_size=1, max_size=25),
    intervals=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(0, 200)),
        min_size=1, max_size=12,
    ),
    bin_width=st.integers(1, 97),
)
def test_binned_range_join_matches_bruteforce(spark, points, intervals, bin_width):
    """binned_range_join vs brute-force half-open containment for random
    (possibly negative) points/intervals and arbitrary bin widths — the
    candidate-bin explosion must never drop or invent a pair."""
    from etl_apache_kafka_python_doker_aws_spark.operators.joins import (
        binned_range_join,
    )

    prows = [(i, x) for i, x in enumerate(points)]
    irows = [(j, lo, lo + span) for j, (lo, span) in enumerate(intervals)]
    pts = spark.createDataFrame(prows, "pid long, x long")
    ivs = spark.createDataFrame(irows, "iid long, lo long, hi long")
    got = {
        (r.pid, r.iid)
        for r in binned_range_join(pts, ivs, None, "x", "lo", "hi", bin_width).collect()
    }
    want = {
        (i, j)
        for i, x in prows
        for j, lo, hi in irows
        if lo <= x < hi
    }
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1, max_size=30, unique=True,
    ),
)
def test_sessionize_matches_python_reference(spark, events):
    """Batch sessionize (lag + cumsum) vs a sequential Python reference
    on random per-user second offsets (30-min gap)."""
    import datetime as dt

    from etl_apache_kafka_python_doker_aws_spark.operators.windows import sessionize

    base = dt.datetime(2024, 6, 1)
    rows = [
        (u, base + dt.timedelta(seconds=s)) for u, s in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize(df, "user_id", "ts", gap_minutes=30).collect()
    }
    by_user: dict[int, list] = {}
    for u, s in events:
        by_user.setdefault(u, []).append(s)
    for u, secs in by_user.items():
        secs.sort()
        sid = 1
        prev = None
        for s in secs:
            if prev is not None and (s - prev) > 30 * 60:
                sid += 1
            prev = s
            ts = base + dt.timedelta(seconds=s)
            assert got[(u, ts)] == sid, (u, s, got[(u, ts)], sid)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2),          # key
                  st.integers(0, 20),         # day offset
                  st.integers(0, 500)),       # value (cents avoid fp issues)
        min_size=1, max_size=25,
    ),
)
def test_gapfill_locf_matches_python_reference(spark, events):
    """gapfill_locf vs a sequential Python reference: per key, a dense
    daily grid from first to last event, exact per-day sums carried
    forward across gaps, is_gap marking carried rows."""
    import datetime as dt
    from collections import defaultdict

    from etl_apache_kafka_python_doker_aws_spark.operators.timeseries import (
        gapfill_locf,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (k, base + dt.timedelta(days=d, hours=5), float(v)) for k, d, v in events
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {
        (r.k, r.day.date()): (r.total_value, r.is_gap)
        for r in gapfill_locf(df, "k", "ts", "v").collect()
    }

    per_day = defaultdict(float)
    days = defaultdict(set)
    for k, d, v in events:
        per_day[(k, d)] += float(v)
        days[k].add(d)
    want = {}
    for k, ds in days.items():
        lo, hi = min(ds), max(ds)
        carry = None
        for d in range(lo, hi + 1):
            if d in ds:
                carry = round(per_day[(k, d)], 2)
                want[(k, (base + dt.timedelta(days=d)).date())] = (carry, False)
            else:
                want[(k, (base + dt.timedelta(days=d)).date())] = (carry, True)
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(st.tuples(st.integers(0, 300), st.integers(0, 60)),
                    min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(st.integers(0, 300), st.integers(1, 80)),
        min_size=1, max_size=8,
    ),
)
def test_interval_join_matches_bruteforce(spark, events, intervals):
    """interval_join (equi-key + half-open range) vs brute force on
    random keyed events/intervals."""
    from etl_apache_kafka_python_doker_aws_spark.operators.joins import interval_join

    erows = [(i, i % 3, t) for i, (t, _) in enumerate(events)]
    irows = [(j, j % 3, lo, lo + span) for j, (lo, span) in enumerate(intervals)]
    ev = spark.createDataFrame(erows, "eid long, k long, t long")
    iv = spark.createDataFrame(irows, "iid long, k long, lo long, hi long")
    got = {
        (r.eid, r.iid)
        for r in interval_join(ev, iv, key="k", ts_col="t",
                               lo_col="lo", hi_col="hi").collect()
    }
    want = {
        (i, j)
        for i, ke, t in erows
        for j, ki, lo, hi in irows
        if ke == ki and lo <= t < hi
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    budget=st.integers(5, 100),
)
def test_pack_bins_matches_python_reference(spark, lens, budget):
    """pack_bins (contiguous-fill sequence packing) vs a sequential
    Python reference: identical per-(shard, bin) doc counts and token
    sums for random doc lengths and budgets."""
    from collections import defaultdict

    from etl_apache_kafka_python_doker_aws_spark.functions.curation import pack_bins

    shards = 3
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.shard, r.bin_id): (r.n_docs, r.bin_tokens)
        for r in pack_bins(df, budget=budget, shards=shards).collect()
    }
    ref = defaultdict(lambda: [0, 0])
    cum = defaultdict(int)
    for i, n in enumerate(lens):
        sh = i % shards
        b = cum[sh] // budget
        cum[sh] += n
        ref[(sh, b)][0] += 1
        ref[(sh, b)][1] += n
    assert got == {k: tuple(v) for k, v in ref.items()}
