"""Property-based spot checks (hypothesis) for engine invariants that
must hold at any scale: decimal-sum order independence, as-of join
semantics, shingle construction, sanitizer idempotence."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()

MONEY = st.decimals(
    min_value=-10**9, max_value=10**9, places=2, allow_nan=False, allow_infinity=False
)


@given(st.lists(MONEY, min_size=1, max_size=50), st.randoms())
@settings(max_examples=30, deadline=None)
def test_decimal_sum_is_order_independent(values, rnd):
    """core.dec's premise: decimal addition is exact, so any partition
    order / aggregation tree gives the same total."""
    shuffled = list(values)
    rnd.shuffle(shuffled)
    assert sum(values) == sum(shuffled)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
)
@settings(max_examples=10, deadline=None)
def test_asof_join_matches_naive(left_rows, right_rows):
    """asof_join_latest == per-row argmax over right_ts <= left_ts."""
    spark = _spark()
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.joins import asof_join_latest

    base = datetime(2024, 1, 1)
    left = [
        (i, k, base + timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)
    ]
    right = [
        (k, base + timedelta(seconds=s), v) for (k, s, v) in right_rows
    ]
    ldf = spark.createDataFrame(left, "id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right or [(99, base, 0.0)], "k long, ts timestamp, v double").filter(
        F.lit(bool(right))
    )
    got = {
        r.id: r.asof_v
        for r in asof_join_latest(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }
    for i, k, ts in left:
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, cands)


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


@given(st.text(alphabet="abc '", min_size=0, max_size=30))
@settings(max_examples=50, deadline=None)
def test_sanitizer_idempotent(name):
    """A-15 sanitizer: idempotent and quote-free (driver-side model)."""
    once = name.replace("'", "_")
    assert "'" not in once
    assert once.replace("'", "_") == once


@given(st.lists(st.sampled_from(["a", "bb", "ccc", "dd"]), min_size=1, max_size=12))
@settings(max_examples=15, deadline=None)
def test_shingles_count_and_width(tokens):
    """shingles(text, n) emits max(len-n+1, 1) n-grams of n tokens
    (shorter only for docs smaller than n)."""
    spark = _spark()
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.dedup import shingles

    text = " ".join(tokens)
    df = spark.createDataFrame([(text,)], "text string").select(
        shingles(F.col("text"), 3).alias("sh")
    )
    got = df.collect()[0].sh
    expect_n = max(len(tokens) - 2, 1)
    assert len(got) == expect_n
    for s in got[: expect_n - 1] if len(tokens) >= 3 else got:
        assert len(s.split(" ")) == min(3, len(tokens))


def test_key_results_partition_invariant(spark, sf_dir):
    """Operators whose scale story depends on partial aggregation /
    candidate joins must give BIT-IDENTICAL results under different
    shuffle-partition settings — the local stand-in for 'same answer
    on a 1000-executor cluster'."""
    import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

    engine.load_all()
    keys = [
        "dedup_jaccard_prefix",
        "text_lm_quality",
        "corpus_dedup_pipeline",
        "text_repetition_filter",
        "agg_approx_quantile",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.catalog.clearCache()
            for k in keys:
                rows = sorted(
                    map(tuple, engine.QUERIES[k](spark, sf_dir).collect())
                )
                results.setdefault(k, []).append(rows)
        for k, (a, b) in results.items():
            assert a == b, f"{k} differs across partition counts"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 200_000)),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=5, deadline=None)
def test_bitmap_bucket_counts_sum_to_exact_distinct(rows):
    """agg_bitmap_distinct's premise: bitmap_bucket_number partitions
    the key space, so per-(group, bucket) bitmap cardinalities sum to
    the exact per-group distinct count for ANY key distribution."""
    spark = _spark()
    df = spark.createDataFrame(rows, "g int, k long")
    got = {
        r.g: r.n
        for r in (
            df.groupBy("g", F.expr("bitmap_bucket_number(k)").alias("b"))
            .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(k))").alias("bm"))
            .groupBy("g")
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
            .collect()
        )
    }
    want = {}
    for g, k in rows:
        want.setdefault(g, set()).add(k)
    assert got == {g: len(s) for g, s in want.items()}


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
)
@settings(max_examples=10, deadline=None)
def test_asof_next_matches_naive(left_rows, right_rows):
    """asof_join_next == per-row argmin over right_ts >= left_ts (the
    forward mirror; duplicate right (k, ts) rows reduce to max value,
    matching the operator's deterministic tie-break)."""
    spark = _spark()
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.joins import asof_join_next

    base = datetime(2024, 1, 1)
    left = [
        (i, k, base + timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)
    ]
    right = [
        (k, base + timedelta(seconds=s), v) for (k, s, v) in right_rows
    ]
    ldf = spark.createDataFrame(left, "id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right or [(99, base, 0.0)], "k long, ts timestamp, v double").filter(
        F.lit(bool(right))
    )
    got = {
        r.id: r.asof_v
        for r in asof_join_next(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }
    for i, k, ts in left:
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts >= ts]
        if cands:
            mn = min(rts for rts, _ in cands)
            want = max(v for rts, v in cands if rts == mn)
        else:
            want = None
        assert got[i] == want, (i, k, ts, cands)


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 40)), min_size=1, max_size=60
    )
)
@settings(max_examples=25, deadline=None)
def test_gaps_islands_streaks_match_bruteforce(user_days):
    """The row_number-difference trick finds exactly the maximal
    consecutive-day runs: for random (user, day-offset) activity sets,
    the derived streaks equal a brute-force scan."""
    from datetime import date, timedelta

    base = date(2024, 1, 1)
    by_user: dict[int, set] = {}
    for u, d in user_days:
        by_user.setdefault(u, set()).add(d)
    # brute force: maximal runs per user
    expect = {}
    for u, ds in by_user.items():
        runs = []
        for d in sorted(ds):
            if runs and d == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], d)
            else:
                runs.append((d, d))
        expect[u] = sorted((b - a + 1, base + timedelta(days=a)) for a, b in runs)
    # the operator's core: day - row_number() grouping (pure python
    # replica of the window+groupBy the Spark plan runs)
    got = {}
    for u, ds in by_user.items():
        groups: dict[int, list] = {}
        for rn, d in enumerate(sorted(ds), start=1):
            groups.setdefault(d - rn, []).append(d)
        got[u] = sorted(
            (len(v), base + timedelta(days=min(v))) for v in groups.values()
        )
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 40)),  # (start_day, length)
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=20, deadline=None)
def test_sweepline_interval_count_matches_direct(intervals):
    """Sweep-line invariant (pure python mirror of orders_open_backlog's
    algebra): cumulative +1/-1 deltas at interval starts/ends equal
    the direct 'how many intervals cover day d' count at every
    delta day, for arbitrary interval sets."""
    from collections import defaultdict

    deltas: dict = defaultdict(int)
    for s, ln in intervals:
        deltas[s] += 1
        deltas[s + ln] -= 1
    days = sorted(deltas)
    cum = 0
    for d in days:
        cum += deltas[d]
        direct = sum(1 for s, ln in intervals if s <= d < s + ln)
        assert cum == direct


@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=200),
    st.integers(2, 8),
)
@settings(max_examples=20, deadline=None)
def test_two_phase_prefix_sum_matches_sequential(cents, n_parts):
    """The distributed two-phase prefix sum (orders_pareto_abc /
    text_pack_sequences): carving an ordered sequence into contiguous
    partitions, locally prefix-summing, and offsetting by the
    prefix-sum of partition totals must equal the sequential running
    sum — for ANY partitioning."""
    ordered = sorted(cents, reverse=True)
    # sequential truth
    truth, run = [], 0
    for v in ordered:
        run += v
        truth.append(run)
    # two-phase replay: split into n_parts contiguous chunks
    k = max(1, len(ordered) // n_parts)
    chunks = [ordered[i : i + k] for i in range(0, len(ordered), k)]
    out, offset = [], 0
    for ch in chunks:
        local = 0
        for v in ch:
            local += v
            out.append(offset + local)
        offset += sum(ch)
    assert out == truth


@given(
    st.integers(5, 40),   # days before the shift
    st.integers(5, 40),   # days after
    st.integers(1, 50),   # base level
    st.integers(5, 60),   # shift size
)
@settings(max_examples=25, deadline=None)
def test_cusum_argmax_locates_a_clean_level_shift(n1, n2, base, shift):
    """events_changepoint_cusum's statistic: on a clean step series
    (constant level, then constant level + shift) the |n·prefix_k −
    k·total| argmax lands exactly on the last pre-shift day."""
    ys = [base] * n1 + [base + shift] * n2
    n = len(ys)
    total = sum(ys)
    best_k, best_v = None, -1
    prefix = 0
    for k, y in enumerate(ys, start=1):
        prefix += y
        v = abs(n * prefix - k * total)
        if v > best_v:  # ties keep the earliest day — the Spark tiebreak
            best_v, best_k = v, k
    assert best_k == n1


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.floats(0, 1, allow_nan=False)),
        min_size=2,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.randoms(),
)
@settings(max_examples=40, deadline=None)
def test_mmr_greedy_matches_bruteforce_replay(cands, rnd):
    """The cogrouped MMR kernel's greedy trajectory equals a naive
    replay: round 1 takes (rel desc, id) argmax; round r takes the
    (round6(0.7*rel - 0.3*maxsim) desc, id) argmax over unpicked."""
    import pandas as pd

    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.similarity import (
        _mmr_greedy_kernel,
    )

    k = 5
    ids = [i for i, _ in cands]
    rel = {i: round(r, 6) for i, r in cands}
    sim = {}
    for a in ids:
        for b in ids:
            if a != b and (b, a) not in sim:
                s = round(rnd.random(), 6)
                sim[(a, b)] = s
                sim[(b, a)] = s
    cand_pdf = pd.DataFrame(
        {"q_id": 7, "vec_id": list(rel), "rel": [rel[i] for i in rel]}
    )
    sims_pdf = pd.DataFrame(
        [(7, a, b, s) for (a, b), s in sim.items()],
        columns=["q_id", "ca", "cb", "sim"],
    )
    out = _mmr_greedy_kernel(k)(cand_pdf, sims_pdf)

    from decimal import ROUND_HALF_UP, Decimal

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    picked = [min(ids, key=lambda v: (-rel[v], v))]
    expect = [(7, picked[0], 1, rel[picked[0]])]
    for r in range(2, k + 1):
        remaining = [v for v in ids if v not in picked]
        if not remaining:
            break
        scored = {
            v: round6(0.7 * rel[v] - 0.3 * max(sim[(v, p)] for p in picked))
            for v in remaining
        }
        best = min(remaining, key=lambda v: (-scored[v], v))
        picked.append(best)
        expect.append((7, best, r, scored[best]))
    got = [tuple(t) for t in out.itertuples(index=False)]
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.floats(0, 9)),
        min_size=0,
        max_size=25,
    ),
)
@settings(max_examples=25, deadline=None)
def test_asof_nearest_matches_naive(left_rows, right_rows):
    """asof_join_nearest == per-row argmin |right_ts - left_ts|, ties
    to the at-or-before match, max-value dedup at equal right ts."""
    spark = _spark()
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.joins import (
        asof_join_nearest,
    )

    base = datetime(2024, 1, 1)
    left = [
        (i, k, base + timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)
    ]
    right = [(k, base + timedelta(seconds=s), v) for (k, s, v) in right_rows]
    ldf = spark.createDataFrame(left, "id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        right or [(99, base, 0.0)], "k long, ts timestamp, v double"
    ).filter(F.lit(bool(right)))
    got = {
        r.id: (r.asof_ts, r.asof_v)
        for r in asof_join_nearest(ldf, rdf, "k", "ts", "ts", ["ts", "v"]).collect()
    }
    # naive reference: dedup right to max v per (k, ts), then argmin
    # distance with backward winning ties
    dedup = {}
    for rk, rts, v in right:
        dedup[(rk, rts)] = max(dedup.get((rk, rts), v), v)
    for i, k, ts in left:
        cands = [(rts, v) for (rk, rts), v in dedup.items() if rk == k]
        if not cands:
            assert got[i] == (None, None), (i, got[i])
            continue
        back = [c for c in cands if c[0] <= ts]
        fwd = [c for c in cands if c[0] >= ts]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if f is None or (b is not None and ts - b[0] <= f[0] - ts):
            want = b
        else:
            want = f
        assert got[i] == want, (i, k, ts, got[i], want, b, f)


@given(
    st.integers(2, 10**7),          # n_pair
    st.integers(1, 10**8),          # n_a  (>= n_pair in real data; not required by the expression)
    st.integers(1, 10**8),          # n_b
    st.integers(10**6, 10**9),      # n_baskets — large N forces n_pair*N*1e6 past 2^63
)
@settings(max_examples=25, deadline=None)
def test_lift_ppm_expression_survives_int64_overflow(n_pair, n_a, n_b, n_baskets):
    """events_cooccurrence_lift's guard, pinned by test: the
    decimal(38,0) widening in LIFT_PPM_EXPR must produce the exact
    integer quotient even when the numerator n_pair*N*1e6 exceeds
    2^63 (where a bigint product wraps silently in non-ANSI Spark).
    Hypothesis ranges guarantee overflow cases: n_pair >= 2 and
    N >= 1e6 gives a numerator >= 4e12*1e6 = 4e18 at the top of the
    range, well past 2^63 ~ 9.2e18 for much of the space."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.analytics import LIFT_PPM_EXPR

    spark = _spark()
    row = spark.createDataFrame(
        [(n_pair, n_a, n_b, n_baskets)], "n_pair long, n_a long, n_b long, n_baskets long"
    )
    got = row.select(F.expr(LIFT_PPM_EXPR).alias("lift_ppm")).collect()[0]["lift_ppm"]
    want = (n_pair * n_baskets * 1_000_000) // (n_a * n_b)
    assert int(got) == want, (n_pair, n_a, n_b, n_baskets, got, want)


@given(
    st.integers(0, 2**63 - 1),     # doc_id — full bigint id domain
    st.sampled_from([0, 555, 9176]),  # the salts production keys use
)
@settings(max_examples=20, deadline=None)
def test_mix32_sampling_hash_survives_bigint_ids(doc_id, salt):
    """The deterministic sampling hash (corpus_sample_stratified /
    text_dataset_split / corpus_quality_weighted_sample) must compute
    ((id+salt)*K) mod 2^32 EXACTLY for any bigint id: the bigint form
    wrapped once id crossed ~3.5e9 (ANSI Spark raises, DuckDB errors,
    non-ANSI Spark silently diverges from 128-bit engines) — found by
    the synthesized 10x sweep whose replica ids sit at +9e9; real
    corpus ids at 100 TB live well past 2^32."""
    from ingest_sharepoint_file_to_fabric_lakehouse_spark.operators.pipeline import _mix32

    spark = _spark()
    row = spark.createDataFrame([(doc_id,)], "doc_id long")
    got = row.select(_mix32(F.col("doc_id"), salt=salt).alias("m")).collect()[0]["m"]
    want = ((doc_id + salt) * 2654435761) % 4294967296
    assert got == want, (doc_id, salt, got, want)


@given(st.data())
@settings(max_examples=2000, deadline=None)
def test_ppjoin_prefix_filters_are_lossless(data):
    """Mirror of dedup_jaccard_prefix's candidate-join predicate (the
    asymmetric PPJoin prefixes + integer-exact length and position
    filters, dedup.py) over ARBITRARY set configurations: for every
    pair with J >= tau=0.8, at least one shared element must survive
    ALL the filters — the fixtures pin specific shapes, this pins the
    bound arithmetic itself (`div`-based ceils, the 8n/9 index prefix,
    the 4(na+nb)/9 occurrence cap) on thousands of random (sizes,
    overlap, rarity-order) draws.

    Construction: |a| = na <= nb = |b| (the canonical side order),
    overlap o chosen so J = o/(na+nb-o) >= 0.8; global rarity order =
    element value; which elements are shared is a random draw."""
    na = data.draw(st.integers(1, 60), label="na")
    # max achievable J is na/nb, so nb beyond 5na/4 can't reach tau
    nb = data.draw(st.integers(na, max(na, (5 * na) // 4)), label="nb")
    o_min = -(-4 * (na + nb) // 9)  # ceil(4(na+nb)/9): J >= 0.8
    if o_min > na:
        return  # J >= 0.8 unreachable at these sizes — vacuous draw
    o = data.draw(st.integers(o_min, na), label="overlap")

    universe = list(range(na + nb - o))
    shared = set(data.draw(st.permutations(universe), label="order")[:o])
    rest = [e for e in universe if e not in shared]
    a_set = sorted(shared | set(rest[: na - o]))
    b_set = sorted(shared | set(rest[na - o :]))
    assert len(a_set) == na and len(b_set) == nb
    ra = {e: i + 1 for i, e in enumerate(a_set)}  # rank by rarity order
    rb = {e: i + 1 for i, e in enumerate(b_set)}

    # the exact filter expressions from the candidate join:
    a_prefix = na - (8 * na + 8) // 9 + 1          # index prefix (8n/9 bound)
    b_prefix = nb - (4 * nb + 4) // 5 + 1          # probe prefix (tau*n bound)
    assert 5 * na >= 4 * nb                        # length filter must hold
    occurrence_cap = (4 * (na + nb) + 8) // 9      # ceil(tau/(1+tau)*(na+nb))
    survivors = [
        e
        for e in shared
        if ra[e] <= a_prefix
        and rb[e] <= b_prefix
        and 1 + min(na - ra[e], nb - rb[e]) >= occurrence_cap
    ]
    jacc = o / (na + nb - o)
    assert survivors, (
        f"true pair lost: na={na} nb={nb} o={o} J={jacc:.3f} "
        f"a_prefix={a_prefix} b_prefix={b_prefix} cap={occurrence_cap}"
    )
