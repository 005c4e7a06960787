"""Round-12 statistical queries vs INDEPENDENT brute-force references.

The driver's oracle gate proves Spark ≡ DuckDB on the shared SQL; these
pins prove the shared definition is the REAL statistic: each test
recomputes the answer from the raw sf0.001 parquet with naive Python
(sorted lists, explicit rank averaging, O(n²) pair loops) and compares
exactly — an algebra slip that landed identically in both engines would
still fail here.
"""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def orders_rows(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.sources import load_table

    return [
        (
            r["o_orderkey"],
            r["o_orderstatus"],
            int(math.floor(r["o_totalprice"] * 100 + 0.5)),
            r["o_orderdate"].date(),
        )
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .collect()
    ]


def test_mwu_matches_naive_rank_computation(spark, sf_dir, orders_rows):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    g1 = sorted(c for _, st, c, _ in orders_rows if st == "F")
    g2 = sorted(c for _, st, c, _ in orders_rows if st == "O")
    n1, n2 = len(g1), len(g2)
    merged = sorted(g1 + g2)
    # naive average ranks with explicit tie runs, doubled to stay integer
    rank2 = {}
    i = 0
    while i < len(merged):
        j = i
        while j < len(merged) and merged[j] == merged[i]:
            j += 1
        # ranks i+1 .. j average to (i+1+j)/2; doubled = i+1+j
        rank2[merged[i]] = i + 1 + j
        i = j
    r1_x2 = sum(rank2[v] for v in g1)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    # tie term over the merged sample
    from collections import Counter

    t = sum(ct**3 - ct for ct in Counter(merged).values())
    nn = n1 + n2
    z = float(u1_x2 - n1 * n2) / (
        2.0
        * math.sqrt(
            (float(n1) * float(n2) / 12.0)
            * (float(nn + 1) - float(t) / (float(nn) * float(nn - 1)))
        )
    )
    want = (n1, n2, u1_x2, math.floor(z * 1000000.0 + 0.5))
    got = load_all()["mwu_spend_by_status"].builder(spark, sf_dir).collect()
    assert len(got) == 1
    assert (
        got[0]["n1"],
        got[0]["n2"],
        got[0]["u1_x2"],
        got[0]["z_ppm"],
    ) == want


def _naive_mk(series):
    """(n, S, z_ppm) for one day-ordered value list, O(n²) by intent."""
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (series[j] > series[i]) - (series[j] < series[i])
    from collections import Counter

    b = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(series).values()
    )
    var_int = n * (n - 1) * (2 * n + 5) - b
    if s > 0:
        z = float(s - 1) / math.sqrt(float(var_int) / 18.0)
    elif s < 0:
        z = float(s + 1) / math.sqrt(float(var_int) / 18.0)
    else:
        return n, 0, 0
    return n, s, math.floor(z * 1000000.0 + 0.5)


def test_mann_kendall_matches_naive_pair_loop(spark, sf_dir, orders_rows):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    ckey = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    mx = max(d for _, _, _, d in orders_rows)
    import datetime

    lo = mx - datetime.timedelta(days=364)
    daily = {}
    for ok, _, cents, d in orders_rows:
        if d < lo:
            continue
        name = nat[cust[ckey[ok]]]
        daily.setdefault(name, {}).setdefault(d, 0)
        daily[name][d] += cents
    got = {
        r["n_name"]: (r["n_days"], r["s_stat"], r["z_ppm"])
        for r in load_all()["mann_kendall_trend"]
        .builder(spark, sf_dir)
        .collect()
    }
    want = {}
    for name, by_day in daily.items():
        series = [by_day[d] for d in sorted(by_day)]
        if len(series) >= 2:
            want[name] = _naive_mk(series)
    assert got == want


def test_spc_violations_matches_naive_walk(spark, sf_dir, orders_rows):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    daily = {}
    for _, _, cents, d in orders_rows:
        daily[d] = daily.get(d, 0) + cents
    days = sorted(daily)
    ys = [daily[d] for d in days]
    n, s = len(ys), sum(ys)
    q = sum(y * y for y in ys)
    sides = [(y * n > s) - (y * n < s) for y in ys]
    rule1 = [(y * n - s) ** 2 > 9 * (n * q - s * s) for y in ys]
    # naive run lengths over the day-ordered side sequence
    run_len = [0] * n
    i = 0
    while i < n:
        j = i
        while j < n and sides[j] == sides[i]:
            j += 1
        for k in range(i, j):
            run_len[k] = j - i
        i = j
    want = {
        days[i].strftime("%Y-%m-%d"): (
            ys[i],
            sides[i],
            run_len[i],
            rule1[i],
            sides[i] != 0 and run_len[i] >= 8,
        )
        for i in range(n)
        if rule1[i] or (sides[i] != 0 and run_len[i] >= 8)
    }
    got = {
        r["day"]: (
            r["cents"],
            r["side"],
            r["run_len"],
            r["rule1"],
            r["rule2"],
        )
        for r in load_all()["spc_violations"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_revenue_acf_matches_naive_pairing(spark, sf_dir, orders_rows):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    daily = {}
    for _, _, cents, d in orders_rows:
        daily[d] = daily.get(d, 0) + cents
    import datetime

    want = {}
    for k in range(1, 8):
        pairs = [
            (daily[d], daily[d + datetime.timedelta(days=k)])
            for d in daily
            if d + datetime.timedelta(days=k) in daily
        ]
        m = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        denx, deny = m * sxx - sx * sx, m * syy - sy * sy
        if denx > 0 and deny > 0:
            corr = float(m * sxy - sx * sy) / (
                math.sqrt(float(denx)) * math.sqrt(float(deny))
            )
            want[k] = (m, math.floor(corr * 1000000 + 0.5))
    got = {
        r["lag"]: (r["n_pairs"], r["acf6"])
        for r in load_all()["revenue_acf"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_order_price_reconcile_matches_naive(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    recon = {}
    for r in li:
        c = math.floor(
            r["l_extendedprice"]
            * (1 - r["l_discount"])
            * (1 + r["l_tax"])
            * 100
            + 0.5
        )
        recon[r["l_orderkey"]] = recon.get(r["l_orderkey"], 0) + c
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    agg = {}
    for r in o:
        drift = recon.get(r["o_orderkey"], 0) - math.floor(
            r["o_totalprice"] * 100 + 0.5
        )
        st = agg.setdefault(r["o_orderstatus"], [0, 0, 0, 0])
        st[0] += 1
        st[1] += drift != 0
        st[2] = max(st[2], abs(drift))
        st[3] += abs(drift)
    got = {
        r["o_orderstatus"]: (
            r["n_orders"],
            r["n_mismatch"],
            r["max_abs_drift_cents"],
            r["total_abs_drift_cents"],
        )
        for r in load_all()["order_price_reconcile"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_interorder_gap_quantiles_matches_naive(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    by_cust = {}
    rows = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["o_orderdate"].date(), r["o_orderkey"])
        )
    gaps = []
    for seq in by_cust.values():
        seq.sort()
        for (d1, _), (d2, _) in zip(seq, seq[1:]):
            gaps.append((d2 - d1).days)
    gaps.sort()
    n = len(gaps)
    q = lambda k: gaps[(k * n + 3) // 4 - 1]  # noqa: E731
    got = (
        load_all()["interorder_gap_quantiles"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert (got["n_gaps"], got["p25"], got["p50"], got["p75"]) == (
        n,
        q(1),
        q(2),
        q(3),
    )


def test_vocab_coverage_matches_naive_sort(spark, sf_dir):
    from collections import Counter

    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    freq = Counter()
    for t in texts:
        if t:
            freq.update(w for w in t.lower().split() if w)
    counts = sorted(freq.values(), reverse=True)
    total = sum(counts)
    got = {
        r["k"]: (r["covered_tokens"], r["coverage_ppm"])
        for r in load_all()["vocab_coverage_curve"]
        .builder(spark, sf_dir)
        .collect()
    }
    for k in (100, 1000, 10000):
        covered = sum(counts[:k])
        assert got[k] == (covered, covered * 1000000 // total), k
