"""Property-based spot checks (SURVEY.md §5.2 tier 4, hypothesis).

The JVM-side expressions the engine builds must agree with their Python
reference semantics on arbitrary inputs, not just fixtures: the tokenizer
contract (``[A-Za-z0-9]+`` runs — NOT ``\\w+``; underscore and unicode
word-chars are delimiters) and conservation laws of the count aggregates.
One Spark job per property run (all examples batched into one DataFrame),
so the suite stays fast."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.functions.textfns import tokens_nonempty

_REF_RE = re.compile(r"[A-Za-z0-9]+")

# printable-ish text with heavy delimiter coverage, incl. unicode + _
_texts = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 _-'.,!\t\né中ß")
    ),
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=40))
def test_tokenizer_matches_reference_regex(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["toks"] for r in df.select(tokens_nonempty("text").alias("toks")).collect()]
    assert got == [_REF_RE.findall(t) for t in texts]


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=30))
def test_wordcount_conserves_tokens(spark, texts):
    """Σ per-token counts == total token occurrences (the reduce loses and
    invents nothing) and every count is ≥ 1."""
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    counts = (
        df.select(F.explode(tokens_nonempty("text")).alias("token"))
        .groupBy("token")
        .count()
        .collect()
    )
    expected_total = sum(len(_REF_RE.findall(t)) for t in texts)
    assert sum(r["count"] for r in counts) == expected_total
    assert all(r["count"] >= 1 for r in counts)
    assert {r["token"] for r in counts} == {
        tok for t in texts for tok in _REF_RE.findall(t)
    }


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=50
    )
)
def test_group_sums_partition_invariant(spark, rows):
    """groupBy sums are independent of physical partitioning (the shuffle
    merge is associative/commutative): 1 partition vs 7 give equal results."""
    df1 = spark.createDataFrame(rows, ["k", "v"]).coalesce(1)
    df7 = spark.createDataFrame(rows, ["k", "v"]).repartition(7)
    agg = lambda d: sorted(
        (r["k"], r["s"], r["n"])
        for r in d.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    )
    assert agg(df1) == agg(df7)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("ab1@.+-() _x093")), max_size=40),
        min_size=1,
        max_size=25,
    )
)
def test_pii_scrub_matches_python_reference(spark, texts):
    """Spark's Java regex must agree with Python re on the PII dialect
    subset (classes + greedy quantifiers, no alternation/lookaround) for
    counts AND replacement bytes; scrubbing must be idempotent (the
    placeholder tokens can never re-match either pattern)."""
    from mapreduce_framework_api_spark.operators.pipeline import _PII_EMAIL, _PII_PHONE

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select(
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("ne"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("np"),
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ).alias("s"),
    ).collect()
    for t, r in zip(texts, got):
        assert r["ne"] == len(re.findall(_PII_EMAIL, t))
        assert r["np"] == len(re.findall(_PII_PHONE, t))
        s_ref = re.sub(_PII_PHONE, "<PHONE>", re.sub(_PII_EMAIL, "<EMAIL>", t))
        assert r["s"] == s_ref
        assert re.sub(_PII_PHONE, "<PHONE>", re.sub(_PII_EMAIL, "<EMAIL>", s_ref)) == s_ref


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 10**6), max_size=40), st.integers(1, 20))
def test_capped_bucket_pair_count_law(spark, members, cap):
    """For ANY sorted distinct bucket membership and ANY cap, pair
    expansion emits exactly C(min(n, cap), 2) pairs — the bound the LSH
    hot-bucket guard promises."""
    from mapreduce_framework_api_spark.operators.dedup import _pairs_within, capped_bucket

    arr = sorted(set(members))
    df = spark.createDataFrame([(arr,)], "recs: array<bigint>")
    n = df.select(
        F.size(_pairs_within(capped_bucket(F.col("recs"), cap=cap))).alias("n")
    ).collect()[0]["n"]
    k = min(len(arr), cap)
    assert n == k * (k - 1) // 2


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2000), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_pack_chunks_distributed_scan_matches_sequential(spark, docs):
    """The two-level distributed prefix scan in q_pipe_pack_chunks must be
    bit-identical to a sequential scan for ARBITRARY doc sets: sparse and
    clustered doc_ids (crossing the block size), zero-token docs, single
    docs. Tokens are synthesized as n one-letter words."""
    import tempfile

    from mapreduce_framework_api_spark.operators.pipeline import _PACK_BUDGET
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [
        (doc_id, " ".join(["w"] * n_tokens), "en", "s", n_tokens)
        for doc_id, n_tokens in docs
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = (
            load_all_queries()["q_pipe_pack_chunks"].fn(spark, tmp).orderBy("doc_id").collect()
        )
    pos = 0
    for r, (doc_id, n_tokens) in zip(got, sorted(docs)):
        assert r["doc_id"] == doc_id
        assert r["n_tokens"] == n_tokens
        assert r["pos"] == pos
        assert r["chunk_id"] == pos // _PACK_BUDGET
        pos += n_tokens


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # user_id
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(min_value=0, max_value=10_000), # offset seconds
        ),
        min_size=1,
        max_size=80,
    )
)
def test_funnel_matches_python_reference(spark, events):
    """q_events_funnel on arbitrary event logs (duplicate timestamps,
    interleaved users, stages out of order) equals a sequential Python
    state machine over the same per-user event-time order."""
    import datetime as dt
    import tempfile

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=sec), uid, typ, 1.0, "{}")
        for i, (uid, typ, sec) in enumerate(events)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        (got,) = load_all_queries()["q_events_funnel"].fn(spark, tmp).collect()

    # Python reference: earliest view; earliest click strictly after it;
    # earliest purchase strictly after that (min-based, order-independent).
    want = [0, 0, 0]
    for uid in {u for u, _, _ in events}:
        evs = [(sec, typ) for u, typ, sec in events if u == uid]
        tv = min((s for s, t in evs if t == "view"), default=None)
        if tv is None:
            continue
        want[0] += 1
        tc = min((s for s, t in evs if t == "click" and s > tv), default=None)
        if tc is None:
            continue
        want[1] += 1
        tp = min((s for s, t in evs if t == "purchase" and s > tc), default=None)
        if tp is not None:
            want[2] += 1
    assert [got["n_view"], got["n_view_click"], got["n_view_click_purchase"]] == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2000), st.integers(min_value=0, max_value=400)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_chunk_overlap_tiles_every_document(spark, docs):
    """q_pipe_chunk_overlap on arbitrary token counts: chunk starts advance
    by exactly the stride, every chunk is non-empty and at most the chunk
    size, the last chunk ends at the document end, and a document shorter
    than one chunk yields exactly one chunk. Zero-token docs yield none."""
    import tempfile

    from mapreduce_framework_api_spark.operators.pipeline import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [
        (doc_id, " ".join(["w"] * n_tokens), "en", "s", n_tokens)
        for doc_id, n_tokens in docs
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = (
            load_all_queries()["q_pipe_chunk_overlap"]
            .fn(spark, tmp)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
    per_doc: dict[int, list] = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n_tokens in docs:
        chunks = per_doc.pop(doc_id, [])
        if n_tokens == 0:
            assert chunks == []
            continue
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for i, c in enumerate(chunks):
            assert c["start_tok"] == i * _CHUNK_STRIDE
            assert 0 < c["end_tok"] - c["start_tok"] <= _CHUNK_SIZE
        assert chunks[-1]["end_tok"] == n_tokens
        if n_tokens <= _CHUNK_SIZE:
            assert len(chunks) == 1
        else:
            # the penultimate chunk must NOT already reach the end
            assert chunks[-2]["start_tok"] + _CHUNK_SIZE < n_tokens or len(chunks) == 2
    assert not per_doc  # no chunks for unknown docs


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # user_id
            st.integers(min_value=0, max_value=200_000),    # offset seconds
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sessionize_matches_python_reference(spark, events):
    """q_events_sessionize on arbitrary event logs (duplicate timestamps,
    interleaved users, gaps straddling the threshold) equals a sequential
    per-user Python sessionizer."""
    import datetime
    import tempfile

    from mapreduce_framework_api_spark.operators.events import _SESSION_GAP_US
    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=off), uid, "view", 1.0, "{}")
        for i, (uid, off) in enumerate(events)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = [
            (r["event_id"], r["user_id"], r["session_seq"])
            for r in load_all_queries()["q_events_sessionize"].fn(spark, tmp).collect()
        ]
    want = []
    by_user: dict[int, list] = {}
    for i, (uid, off) in enumerate(events):
        by_user.setdefault(uid, []).append((off * 1_000_000, i))
    for uid in sorted(by_user):
        last, seq = None, 0
        for ts_us, event_id in sorted(by_user[uid]):
            if last is None or ts_us - last > _SESSION_GAP_US:
                seq += 1
            last = ts_us
            want.append((event_id, uid, seq))
    assert sorted(got) == sorted(want)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=0, max_size=12 * 12 * 3),
)
def test_png_codec_roundtrip_arbitrary_pixels(w, h, seed):
    """encode→decode is the identity for arbitrary pixel bytes and
    dimensions (pads/truncates the seed to w*h*3)."""
    from mapreduce_framework_api_spark.functions.pngcodec import decode_png, encode_png

    need = w * h * 3
    rgb = (seed * (need // max(1, len(seed)) + 1))[:need] if seed else bytes(need)
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3000),   # doc_id
            st.sampled_from(["en", "de", "zh"]),        # lang
            st.integers(min_value=0, max_value=60),     # n_tokens
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_token_budget_matches_sequential_scan(spark, docs):
    """q_pipe_token_budget's per-language two-level scan must equal a
    sequential per-language scan in md5 order for arbitrary doc sets —
    including hash-prefix block boundaries, zero-token docs, and budgets
    hit mid-language."""
    import hashlib
    import tempfile

    from mapreduce_framework_api_spark.operators.pipeline import _BUDGET_TOKENS
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [
        (doc_id, " ".join(["w"] * n), lang, "s", n) for doc_id, lang, n in docs
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = [
            tuple(r)
            for r in load_all_queries()["q_pipe_token_budget"].fn(spark, tmp).collect()
        ]
    want = []
    by_lang: dict[str, list] = {}
    for doc_id, lang, n in docs:
        h = hashlib.md5(f"budget#{doc_id}".encode()).hexdigest()
        by_lang.setdefault(lang, []).append((h, doc_id, n))
    for lang in by_lang:
        cum = 0
        for _h, doc_id, n in sorted(by_lang[lang]):
            cum += n
            if cum <= _BUDGET_TOKENS:
                want.append((doc_id, lang, n, cum))
    assert sorted(got) == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),                 # flag
            st.integers(min_value=1, max_value=30_000),  # price cents
            st.integers(min_value=1, max_value=9),       # weight
        ),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_median_matches_sequential_reference(spark, rows):
    """The two-level bin-then-refine weighted median must equal the
    sequential definition — smallest price with 2*cum_weight >= total —
    for arbitrary (flag, price, weight) sets: duplicate prices, weights
    straddling the half point, values crossing 1024-cent bin boundaries."""
    import tempfile

    from mapreduce_framework_api_spark.registry import load_all_queries

    data = [(f, c / 100.0, float(w)) for f, c, w in rows]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            data, "l_returnflag string, l_extendedprice double, l_quantity double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
        got = {
            r["flag"]: (r["total_weight"], r["wmedian"])
            for r in load_all_queries()["q_agg_weighted_median"]
            .fn(spark, tmp)
            .collect()
        }
    # sequential reference
    from collections import defaultdict

    per_flag = defaultdict(lambda: defaultdict(int))
    for f, c, w in rows:
        per_flag[f][c] += w
    for f, by_price in per_flag.items():
        total = sum(by_price.values())
        cum = 0
        for c in sorted(by_price):
            cum += by_price[c]
            if 2 * cum >= total:
                assert got[f] == (total, round(c / 100.0, 2)), (f, rows)
                break


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),       # user_id
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=5_000),   # offset seconds
        ),
        min_size=1,
        max_size=60,
    )
)
def test_scd2_matches_python_reference(spark, events):
    """q_dim_scd2 on arbitrary event logs (duplicate timestamps resolved by
    the event_id tiebreak, interleaved users) equals a sequential Python
    run-collapse over the same per-user total order."""
    import datetime as dt
    import tempfile

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (i, (t0 + dt.timedelta(seconds=sec)).replace(tzinfo=None), uid, typ, 1.0, "{}")
        for i, (uid, typ, sec) in enumerate(events)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = [
            tuple(r)
            for r in load_all_queries()["q_dim_scd2"].fn(spark, tmp).collect()
        ]

    base_us = int(t0.timestamp()) * 1_000_000
    want = []
    for uid in sorted({u for u, _, _ in events}):
        seq = sorted(
            (sec, i, typ)
            for i, (u, typ, sec) in enumerate(events)
            if u == uid
        )
        runs = []
        for sec, _, typ in seq:
            ts_us = base_us + sec * 1_000_000
            if runs and runs[-1][0] == typ:
                runs[-1][2] += 1
            else:
                runs.append([typ, ts_us, 1])
        for v, (typ, vfrom, nev) in enumerate(runs):
            vto = runs[v + 1][1] if v + 1 < len(runs) else None
            want.append((uid, typ, v + 1, vfrom, vto, vto is None, nev))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                # event_type
            st.integers(min_value=0, max_value=30),     # hour offset
            # negative cents included: they force floor-vs-truncate
            # divergence unless the query's pmod floor-division is right
            st.integers(min_value=-99_999, max_value=99_999),  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_interpolate_matches_python_reference(spark, events):
    """q_events_interpolate on arbitrary sparse hourly series equals a
    sequential Python fill: observed hours get the exact fixed-point
    average, interior gaps the IEEE-identical line formula, edges the
    nearest observation."""
    import datetime as dt
    import tempfile

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (
            i,
            (t0 + dt.timedelta(hours=h, minutes=i % 60)).replace(tzinfo=None),
            1,
            typ,
            cents / 100.0,
            "{}",
        )
        for i, (typ, h, cents) in enumerate(events)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = {
            (r["hour_us"], r["event_type"]): (
                r["n_events"], r["avg_filled"], r["fill_kind"]
            )
            for r in load_all_queries()["q_events_interpolate"].fn(spark, tmp).collect()
        }

    base_us = int(t0.timestamp()) * 1_000_000
    hour_us = 3_600 * 1_000_000
    hix0 = base_us // hour_us
    # exact fixed-point hourly averages per (type, hour index)
    agg = {}
    for typ, h, cents in events:
        k = (typ, hix0 + h)
        n, s = agg.get(k, (0, 0))
        agg[k] = (n + 1, s + cents)
    lo = min(h for _, h in agg)
    hi = max(h for _, h in agg)
    types = sorted({t for t, _ in agg})
    want = {}
    for typ in types:
        obs = {h: (n, s * 10_000 // n) for (t, h), (n, s) in agg.items() if t == typ}
        hours = sorted(obs)
        for h in range(lo, hi + 1):
            if h in obs:
                n, micro = obs[h]
                want[(h * hour_us, typ)] = (n, micro / 1_000_000, "obs")
                continue
            prev = max((x for x in hours if x < h), default=None)
            nxt = min((x for x in hours if x > h), default=None)
            if prev is None:
                want[(h * hour_us, typ)] = (0, obs[nxt][1] / 1_000_000, "lead_edge")
            elif nxt is None:
                want[(h * hour_us, typ)] = (0, obs[prev][1] / 1_000_000, "trail_edge")
            else:
                pv, nv = float(obs[prev][1]), float(obs[nxt][1])
                v = (pv + (nv - pv) * float(h - prev) / float(nxt - prev)) / 1_000_000
                want[(h * hour_us, typ)] = (0, v, "interp")
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # order key
            st.integers(min_value=1, max_value=30),  # part key
        ),
        min_size=1,
        max_size=60,
    )
)
def test_bfs_matches_python_reference(spark, lines):
    """q_graph_bfs on arbitrary order/part incidence equals a sequential
    Python BFS over the same adjacent-lineitem graph and hash seed set."""
    import hashlib
    import tempfile

    from mapreduce_framework_api_spark.registry import load_all_queries

    # assign line numbers per order in list order (1-based, unique)
    seen, rows = {}, []
    for ok, pk in lines:
        ln = seen.get(ok, 0) + 1
        seen[ok] = ln
        rows.append((ok, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     __import__("datetime").datetime(2024, 1, 1)))
    parts = sorted({pk for _, pk in lines})
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
        spark.createDataFrame(
            [(p, "x", "b", "t", 1, 1.0) for p in parts],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
        got = {
            r["node"]: r["level"]
            for r in load_all_queries()["q_graph_bfs"].fn(spark, tmp).collect()
        }

    # Python reference: adjacency from consecutive line numbers, BFS <=3 hops
    per_order = {}
    for ok, pk in lines:
        per_order.setdefault(ok, []).append(pk)
    adj = {}
    for seq in per_order.values():
        for a, b in zip(seq, seq[1:]):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    seeds = {
        p for p in parts
        if hashlib.md5(f"bfs#{p}".encode()).hexdigest()[0] == "0"
    }
    want = {p: 0 for p in seeds}
    frontier = set(seeds)
    for lvl in (1, 2, 3):
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in want
        }
        for v in frontier:
            want[v] = lvl
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=4),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bpe_merges_match_python_reference(spark, docs):
    """q_text_bpe_merges on arbitrary tiny corpora equals a sequential
    CANONICAL BPE trainer: same frequency-weighted pair counts, same
    (count DESC, pair ASC) winner, and the true leftmost-first list-walk
    merge — the reference walks symbol LISTS, so a boundary-crossing
    string replace on the Spark side (the bug the double-separator
    encoding fixes) would fail this test."""
    import tempfile

    from mapreduce_framework_api_spark.operators.text import _BPE_SEP, _BPE_STEPS
    from mapreduce_framework_api_spark.registry import load_all_queries

    texts = [" ".join(words) for words in docs]
    rows = [(i, t, "en", "unit", len(t)) for i, t in enumerate(texts)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = [
            (r["step"], r["merged_pair"], r["pair_count"])
            for r in load_all_queries()["q_text_bpe_merges"].fn(spark, tmp).collect()
        ]

    from collections import Counter

    def merge_leftmost(parts, pair):
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and (parts[i], parts[i + 1]) == pair:
                out.append(parts[i] + parts[i + 1])
                i += 2
            else:
                out.append(parts[i])
                i += 1
        return out

    tokens = Counter(w for words in docs for w in words if w)
    syms = Counter()
    for w, f in tokens.items():
        syms[tuple(w)] += f
    want = []
    for step in range(1, _BPE_STEPS + 1):
        pc = Counter()
        for parts, f in syms.items():
            for a, b in zip(parts, parts[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        pair, c = sorted(
            pc.items(), key=lambda kv: (-kv[1], _BPE_SEP.join(kv[0]))
        )[0]
        want.append((step, _BPE_SEP.join(pair), c))
        nxt = Counter()
        for parts, f in syms.items():
            nxt[tuple(merge_leftmost(list(parts), pair))] += f
        syms = nxt
    assert got == want


# ---- vectorized kernel top-k vs per-row reference -------------------------

_topk_scores = st.integers(min_value=-3, max_value=3)  # tiny pool => many ties


@settings(max_examples=80, deadline=None)
@given(
    data=st.data(),
    nq=st.integers(min_value=1, max_value=7),
    ni=st.integers(min_value=1, max_value=12),
    k=st.integers(min_value=1, max_value=15),
    as_int=st.booleans(),
    exclude=st.booleans(),
)
def test_rowwise_topk_property(data, nq, ni, k, as_int, exclude):
    """_rowwise_topk == the per-row np.lexsort((ids, -s)) reference on
    arbitrary matrices: tiny score pools force boundary ties (the case a
    partition-based shortcut would get wrong), ids are arbitrary distinct
    longs in arbitrary order, k may exceed the column count, and
    self-exclusion removes each row's own id. Complements the fixed-case
    unit test with adversarial shapes."""
    import numpy as np

    from mapreduce_framework_api_spark.operators.similarity import _rowwise_topk

    ids = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=-(10**9), max_value=10**9),
                min_size=ni,
                max_size=ni,
                unique=True,
            )
        ),
        dtype=np.int64,
    )
    vals = data.draw(
        st.lists(_topk_scores, min_size=nq * ni, max_size=nq * ni)
    )
    s = np.array(vals, dtype=np.int64).reshape(nq, ni)
    if not as_int:
        s = s.astype(np.float64) * 0.25
    q_ids = None
    if exclude:
        # each row's own id: sometimes present in ids, sometimes not
        pick = data.draw(
            st.lists(st.integers(min_value=0, max_value=ni), min_size=nq, max_size=nq)
        )
        q_ids = np.array(
            [ids[p] if p < ni else 10**10 + i for i, p in enumerate(pick)],
            dtype=np.int64,
        )

    expect = []
    for row in range(nq):
        if q_ids is not None:
            mask = ids != q_ids[row]
            cand_ids, cand_s = ids[mask], s[row][mask]
        else:
            cand_ids, cand_s = ids, s[row]
        order = np.lexsort((cand_ids, -cand_s))[:k]
        expect.extend(
            (row, int(cand_ids[j]), float(cand_s[j])) for j in order
        )

    rows, nids, scs = _rowwise_topk(s, ids, k, q_ids=q_ids)
    got = [(int(r), int(n), float(v)) for r, n, v in zip(rows, nids, scs)]
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("abAB 01")), min_size=0, max_size=90),
        min_size=2,
        max_size=25,
    )
)
def test_prefix_pairs_match_python_reference(spark, texts):
    """q_dedup_prefix's block-then-verify plan == the naive all-pairs
    Python reference on arbitrary texts: every strict-prefix pair whose
    truncated side is >= 40 chars is found (blocking is lossless there),
    and nothing else is emitted — hash collisions and equal-head
    non-prefixes die in verification."""
    from mapreduce_framework_api_spark.operators import dedup as dd

    # pad half the rows so some clear the 40-char contract with shared heads
    texts = [("headblock-" * 5) + t if i % 2 else t for i, t in enumerate(texts)]
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.xxhash64(F.substring("text", 1, dd._PREFIX_BLOCK)).alias("bh"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_trunc"), F.col("text").alias("ta"),
        F.col("n").alias("na"), "bh",
    )
    b = d.select(
        F.col("doc_id").alias("doc_full"), F.col("text").alias("tb"),
        F.col("n").alias("nb"), "bh",
    )
    got = {
        (r["doc_trunc"], r["doc_full"])
        for r in a.join(b, "bh")
        .filter(
            (F.col("na") < F.col("nb"))
            & (F.expr("substring(tb, 1, na)") == F.col("ta"))
        )
        .collect()
    }
    want = {
        (i, j)
        for i, ti in enumerate(texts)
        for j, tj in enumerate(texts)
        if len(ti) >= dd._PREFIX_BLOCK and len(ti) < len(tj) and tj.startswith(ti)
    }
    assert got == want


@settings(max_examples=120, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=1 << 20), min_size=1, max_size=120),
    st.sets(st.integers(min_value=0, max_value=1 << 20), min_size=1, max_size=120),
)
def test_bottomk_estimator_membership_invariant(a, b):
    """Pure-math property behind q_dedup_containment_bk (no Spark): with
    S_k(X) = the k smallest of X and L = the k smallest of S_k(A) ∪
    S_k(B), (1) L equals the k smallest of the TRUE union A ∪ B
    (mergeability), and (2) for every x in L, sketch membership decides
    true membership exactly: x ∈ S_k(A) iff x ∈ A, likewise for B. So
    the estimator's sample (L ∩ S(A)) and hits (L ∩ S(A) ∩ S(B)) are
    computed over exact membership tests, and for a true inclusion
    A ⊆ B the estimate is exactly 1.0 — the assertions the tier's
    docstring claims, checked on arbitrary hash sets."""
    k = 32
    ska = set(sorted(a)[:k])
    skb = set(sorted(b)[:k])
    low = set(sorted(ska | skb)[:k])
    assert low == set(sorted(a | b)[:k])  # (1) sketch mergeability
    for x in low:  # (2) membership is exact inside L
        assert (x in ska) == (x in a)
        assert (x in skb) == (x in b)
    sample = low & ska
    hits = sample & skb
    # For a genuine inclusion every sampled element of A is in B, so the
    # estimate is exactly 1.0 WHENEVER the sample is non-empty. The
    # sample CAN be empty (all of A ranking past B's bottom-k — e.g.
    # A = {2^20}, B = {0..32, 2^20}); the engine guards sample > 0 and
    # treats that as a probabilistic miss, so the test must not demand
    # more than the tier claims.
    if a <= b:
        assert hits == sample
    # The estimate never exceeds 1 and is defined whenever sample is.
    if sample:
        assert 0.0 <= len(hits) / len(sample) <= 1.0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.binary(max_size=400)),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from([1, 7, 64]),
    st.sampled_from([1, 4]),
)
def test_frame_sample_matches_python_reference(spark, payloads, fb, every_n):
    """The flipbook frame sampler's 1→many contract on arbitrary binary
    payloads (round-10 q_multimodal_video_frames substrate): for every
    non-NULL payload, frames are b[i*fb:(i+1)*fb] for i in
    range(0, max(1, len(b)//fb), every_n) — NULL payloads drop, empty
    payloads yield one empty frame, tail bytes past the last full frame
    never surface. The mapInPandas generator must reproduce the Python
    reference exactly, frame bytes included."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.operators.multimodal import frame_sample

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(i, "video", p) for i, p in enumerate(payloads)], schema
    )
    got = sorted(
        (r["doc_id"], r["frame_idx"], bytes(r["frame"]))
        for r in frame_sample(df, frame_bytes=fb, every_n=every_n, fake=True).collect()
    )
    want = sorted(
        (i, fi, bytes(p[fi * fb : (fi + 1) * fb]))
        for i, p in enumerate(payloads)
        if p is not None
        for fi in range(0, max(1, len(p) // fb), every_n)
    )
    assert got == want
