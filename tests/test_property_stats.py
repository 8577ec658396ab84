"""Round-10 randomized differentials for the statistics family
(VERDICT r9 item 4): random group shapes / planted effects / censoring
/ lookback-cap parameters through welch_ttest, proportion_ztest,
cuped_adjust, srm_check, conversion_attribution, kaplan_meier and the
r9-rewritten logrank_test_df, each against an independent pure-python
reference — the fixed 4-fixture tests pin known answers; these pin the
FORMULAS under randomization."""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normal_sf2(t):
    """Two-sided normal tail, exact (math.erfc)."""
    return math.erfc(abs(t) / math.sqrt(2.0))


# ------------------------------------------------------------- welch


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_welch_ttest_random_shapes(spark, seed):
    from distributedqueryengine_spark.operators.abtest import welch_ttest

    rng = random.Random(seed)
    effect = rng.choice([0.0, 0.4])
    rows = []
    by_cells = ["x", "y"]
    for cell in by_cells:
        for _ in range(rng.randint(20, 80)):
            rows.append((cell, "c", rng.gauss(10, 2)))
        for _ in range(rng.randint(20, 80)):
            rows.append((cell, "t", rng.gauss(10 + effect, 2 * rng.uniform(0.5, 2))))
    df = spark.createDataFrame(rows, "cell string, grp string, m double")
    got = {
        r.cell: r
        for r in welch_ttest(df, "grp", "m", "c", "t", by=["cell"]).collect()
    }
    for cell in by_cells:
        cs = [m for c, g, m in rows if c == cell and g == "c"]
        ts = [m for c, g, m in rows if c == cell and g == "t"]
        mc, mt = sum(cs) / len(cs), sum(ts) / len(ts)
        vc = sum((v - mc) ** 2 for v in cs) / (len(cs) - 1)
        vt = sum((v - mt) ** 2 for v in ts) / (len(ts) - 1)
        sec, set_ = vc / len(cs), vt / len(ts)
        t_stat = (mt - mc) / math.sqrt(sec + set_)
        dof = (sec + set_) ** 2 / (
            sec**2 / (len(cs) - 1) + set_**2 / (len(ts) - 1)
        )
        r = got[cell]
        assert r.n_control == len(cs) and r.n_treatment == len(ts)
        assert abs(r.mean_control - mc) < 1e-5
        assert abs(r.t_stat - t_stat) < 1e-4
        assert abs(r.df - dof) < 1e-3
        # erf_approx is ~1e-3-accurate in the decision region
        assert abs(r.p_value_normal - _normal_sf2(t_stat)) < 2e-3


# ---------------------------------------------------------- z / srm


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_proportion_ztest_random_rates(spark, seed):
    from distributedqueryengine_spark.operators.abtest import proportion_ztest

    rng = random.Random(seed)
    pc, pt = rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)
    nc, nt = rng.randint(50, 300), rng.randint(50, 300)
    rows = [("c", int(rng.random() < pc)) for _ in range(nc)] + [
        ("t", int(rng.random() < pt)) for _ in range(nt)
    ]
    df = spark.createDataFrame(rows, "grp string, s int")
    r = proportion_ztest(df, "grp", "s", "c", "t").collect()[0]
    xc = sum(s for g, s in rows if g == "c")
    xt = sum(s for g, s in rows if g == "t")
    p_pool = (xc + xt) / (nc + nt)
    se = math.sqrt(p_pool * (1 - p_pool) * (1 / nc + 1 / nt))
    z = (xt / nt - xc / nc) / se if se else 0.0
    assert r.n_control == nc and r.n_treatment == nt
    assert abs(r.rate_control - xc / nc) < 1e-6
    assert abs(r.rate_treatment - xt / nt) < 1e-6
    assert abs(r.z_stat - z) < 1e-4
    assert abs(r.p_value - _normal_sf2(z)) < 2e-3


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_srm_check_random_ratios(spark, seed):
    from distributedqueryengine_spark.operators.abtest import srm_check

    rng = random.Random(seed)
    n_arms = rng.randint(2, 4)
    raw = [rng.uniform(0.5, 2.0) for _ in range(n_arms)]
    ratios = {f"v{i}": w / sum(raw) for i, w in enumerate(raw)}
    planted = rng.choice([True, False])
    counts = {}
    for i, (arm, share) in enumerate(sorted(ratios.items())):
        base = int(3000 * share)
        # planted SRM: starve the first arm by 25%
        counts[arm] = int(base * 0.75) if (planted and i == 0) else base
    rows = [(arm,) for arm, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "grp string")
    r = srm_check(df, "grp", ratios, alpha=0.001).collect()[0]
    n_total = sum(counts.values())
    chi2 = sum(
        (counts[a] - n_total * ratios[a]) ** 2 / (n_total * ratios[a])
        for a in ratios
    )
    assert r.n_total == n_total
    assert abs(r.chi2 - chi2) < 1e-3
    assert r.df == len(ratios) - 1
    if planted:
        assert r.srm, f"planted 25% starvation must flag (chi2={chi2:.1f})"
    else:
        assert not r.srm


# -------------------------------------------------------------- cuped


@pytest.mark.parametrize("seed", [10, 11])
def test_cuped_random_covariate(spark, seed):
    from distributedqueryengine_spark.operators.abtest import cuped_adjust

    rng = random.Random(seed)
    rows = []
    for i in range(300):
        x = rng.gauss(50, 10)
        grp = "t" if i % 2 else "c"
        y = 0.8 * x + rng.gauss(5 if grp == "t" else 4, 3)
        # ~10% of users have no pre-period
        rows.append((grp, y, None if rng.random() < 0.1 else x))
    df = spark.createDataFrame(rows, "grp string, y double, x double")
    out = cuped_adjust(df, "y", "x").collect()

    xs = [x for _, _, x in rows if x is not None]
    pairs = [(x, y) for _, y, x in rows if x is not None]
    mx = sum(xs) / len(xs)
    my_p = sum(y for _, y in pairs) / len(pairs)
    cxy = sum((x - mx) * (y - my_p) for x, y in pairs) / (len(pairs) - 1)
    vx = sum((x - mx) ** 2 for x in xs) / (len(xs) - 1)
    theta = cxy / vx
    for r in out:
        if r.x is None:
            assert r.y_cuped == round(r.y, 6)  # NULL covariate: unadjusted
        else:
            assert abs(r.y_cuped - (r.y - theta * (r.x - mx))) < 1e-4
    # variance reduction on the correlated covariate (the point of CUPED)
    def _var(vals):
        m = sum(vals) / len(vals)
        return sum((v - m) ** 2 for v in vals) / (len(vals) - 1)

    adj = [r.y_cuped for r in out]
    raw_var = _var([r.y for r in out])
    assert _var(adj) < 0.6 * raw_var


# -------------------------------------------------------- attribution


@pytest.mark.parametrize(
    "seed,model",
    [(20, "last_touch"), (21, "first_touch"), (22, "linear"), (23, "position")],
)
def test_attribution_random_lookback_cap(spark, seed, model):
    """Random event streams + random lookback + random touch cap vs a
    brute-force python reference for every credit model."""
    from distributedqueryengine_spark.operators.attribution import (
        conversion_attribution,
    )

    rng = random.Random(seed)
    lookback = rng.randint(50, 400)
    cap = rng.randint(2, 5)
    rows = []
    for k in range(8):
        ts = rng.sample(range(0, 2000), rng.randint(4, 20))
        for t in ts:
            ev = rng.choice(["ad", "email", "ad", "buy"])
            rows.append((f"u{k}", t, ev))
    df = spark.createDataFrame(rows, "k string, sec long, e string").withColumn(
        "ts", F.to_timestamp(F.from_unixtime(F.col("sec")))
    )
    got = sorted(
        (r.k, r.conversion_ts % 10**9, r.touch_ts % 10**9 if r.touch_ts is not None else None,
         r.touch_event, r.credit, r.n_touches)
        for r in conversion_attribution(
            df, "k", "ts", "e", "buy", ["ad", "email"],
            model=model, lookback_seconds=lookback,
            max_touches_per_conversion=cap,
        ).collect()
    )
    # unix_timestamp(to_timestamp(from_unixtime(sec))) == sec in a
    # fixed-offset session tz, so python's sec values compare directly
    expect = []
    by_key = defaultdict(list)
    for k, t, e in rows:
        by_key[k].append((t, e))
    # reproduce the engine's epoch shift: unix_timestamp(to_timestamp(
    # from_unixtime(sec))) == sec in any fixed-offset tz, so deltas are 0
    for k, evs in by_key.items():
        convs = sorted(t for t, e in evs if e == "buy")
        touches = sorted((t, e) for t, e in evs if e in ("ad", "email"))
        for ct in convs:
            win = [(t, e) for t, e in touches if ct - lookback < t <= ct]
            win = sorted(win)[-cap:]  # cap keeps the MOST RECENT touches
            n = len(win)
            if not n:
                expect.append((k, ct % 10**9, None, None, 1.0, 0))
                continue
            for pos, (t, e) in enumerate(win, start=1):
                if model == "first_touch":
                    credit = 1.0 if pos == 1 else 0.0
                elif model == "last_touch":
                    credit = 1.0 if pos == n else 0.0
                elif model == "linear":
                    credit = 1.0 / n
                else:
                    if n == 1:
                        credit = 1.0
                    elif n == 2:
                        credit = 0.5
                    elif pos in (1, n):
                        credit = 0.4
                    else:
                        credit = 0.2 / (n - 2)
                if credit > 0:
                    expect.append(
                        (k, ct % 10**9, t % 10**9, e, round(credit, 6), n)
                    )
    assert got == sorted(expect)


# ---------------------------------------------------------- survival


def _km_ref(rows):
    per = defaultdict(lambda: [0, 0])
    for t, e in rows:
        per[t][0 if e else 1] += 1
    out, n_risk, surv = {}, len(rows), 1.0
    for t in sorted(per):
        d, c = per[t]
        if d > 0:
            surv *= 1 - d / n_risk
        out[t] = (n_risk, d, c, surv)
        n_risk -= d + c
    return out


@pytest.mark.parametrize("seed", [30, 31, 32])
def test_kaplan_meier_random_censoring(spark, seed):
    from distributedqueryengine_spark.operators.survival import kaplan_meier

    rng = random.Random(seed)
    cens_rate = rng.uniform(0.1, 0.6)
    rows = [
        (float(rng.randint(1, 40)), int(rng.random() > cens_rate))
        for _ in range(rng.randint(40, 200))
    ]
    df = spark.createDataFrame(rows, "t double, e int")
    got = {r.t: r for r in kaplan_meier(df, "t", "e").collect()}
    ref = _km_ref(rows)
    assert set(got) == set(ref)
    for t, (n_risk, d, c, surv) in ref.items():
        r = got[t]
        assert (r.n_risk, r.n_events, r.n_censored) == (n_risk, d, c), t
        assert abs(r.survival - surv) < 1e-5, t


def _logrank_ref(rows, bucket=None):
    """rows: (t, e, is_a). Standard two-sample log-rank with the
    hypergeometric variance; optional time flooring first."""
    if bucket:
        rows = [(math.floor(t / bucket) * bucket, e, a) for t, e, a in rows]
    per = defaultdict(lambda: [0, 0, 0, 0])  # d1 d2 m1 m2
    for t, e, a in rows:
        s = per[t]
        if a:
            s[0] += e
            s[2] += 1
        else:
            s[1] += e
            s[3] += 1
    n1 = sum(1 for _, _, a in rows if a)
    n2 = len(rows) - n1
    o = x = v = 0.0
    for t in sorted(per):
        d1, d2, m1, m2 = per[t]
        dt, nt = d1 + d2, n1 + n2
        if dt > 0 and nt > 0:
            o += d1
            x += dt * n1 / nt
            if nt > 1:
                v += dt * (n1 / nt) * (n2 / nt) * (nt - dt) / (nt - 1)
        n1 -= m1
        n2 -= m2
    chi2 = (o - x) ** 2 / v if v > 0 else 0.0
    return chi2, o, x


@pytest.mark.parametrize("seed,bucket", [(40, None), (41, 2.0), (42, 0.5), (43, 5.0)])
def test_logrank_random_censoring_and_bucket(spark, seed, bucket):
    """Random censoring + random time_bucket through the r9-rewritten
    logrank_test_df (the at-risk computation changed — pin it under
    randomization, continuous durations included)."""
    from distributedqueryengine_spark.operators.survival import logrank_test_df

    rng = random.Random(seed)
    hazard_b = rng.choice([1.0, 2.5])  # sometimes a real effect
    rows = []
    for _ in range(rng.randint(60, 160)):
        rows.append((rng.expovariate(1 / 20.0), int(rng.random() > 0.3), True))
    for _ in range(rng.randint(60, 160)):
        rows.append(
            (rng.expovariate(hazard_b / 20.0), int(rng.random() > 0.3), False)
        )
    df = spark.createDataFrame(
        [(t, e, "A" if a else "B") for t, e, a in rows],
        "t double, e int, grp string",
    )
    r = logrank_test_df(
        df, "t", "e", "grp", "A", "B", time_bucket=bucket
    ).collect()[0]
    chi2, o, x = _logrank_ref(rows, bucket)
    assert abs(r.chi2 - chi2) < 1e-3, (r.chi2, chi2)
    assert abs(r.observed_a - o) < 1e-6
    assert abs(r.expected_a - x) < 1e-4
    assert r.n_a == sum(1 for *_, a in rows if a)
    assert r.n_b == sum(1 for *_, a in rows if not a)
    if hazard_b == 2.5:
        assert r.p_value < 0.05, "planted 2.5x hazard must reject"


# ---------------------------------------------- dense ids (r10 splitter)


@pytest.mark.parametrize("seed", [50, 51, 52, 53])
def test_assign_dense_ids_random_distributions(spark, seed):
    """Random mixtures of heavy atoms + continuous mass + NULL/NaN
    through the r10 boundary-atom splitter at tiny rows_per_bucket:
    ids must equal the brute-force sort, stats must report honestly."""
    from distributedqueryengine_spark.operators.relational import (
        assign_dense_ids,
    )

    rng = random.Random(seed)
    n = rng.randint(2000, 6000)
    atoms = [rng.uniform(-100, 100) for _ in range(rng.randint(1, 3))]
    atom_share = rng.uniform(0.3, 0.9)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < atom_share:
            v = rng.choice(atoms)
        elif r < atom_share + 0.05:
            v = None if rng.random() < 0.5 else float("nan")
        else:
            v = rng.uniform(-100, 100)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)
    stats: dict = {}
    got = {
        r.id: r.dense_id
        for r in assign_dense_ids(
            df, "v", tiebreak=["id"], rows_per_bucket=rng.choice([200, 500]),
            on_null="last", stats_out=stats,
        ).collect()
    }

    def key(item):
        i, v = item
        if v is None:
            return (1, 0, i)       # NULLs after all numbers
        if math.isnan(v):
            return (2, 0, i)       # NaNs after NULLs
        return (0, v, i)

    expect = {i: rank for rank, (i, _v) in enumerate(sorted(rows, key=key))}
    assert got == expect, f"seed={seed} stats={stats}"
    assert stats["residual_saturated"] == 0, stats


# -------------------------------------- bottom-k quantile sketch (r10)


def test_quantile_sketch_matches_duckdb(spark):
    """The portable bottom-k quantile sketch is deterministic end to
    end: DuckDB computing the documented md5 spec reproduces the exact
    sample membership, counts, AND the estimates."""
    import duckdb

    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
        quantile_state_estimate,
    )
    from distributedqueryengine_spark.session import get_spark, load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").withColumn(
        "__rid", F.concat_ws("_", "l_orderkey", "l_linenumber")
    )
    R = 64
    st = quantile_state_build(
        li, ["l_returnflag"], "l_extendedprice", "__rid", r=R, portable=True
    )
    est = quantile_state_estimate(st, ["l_returnflag"], [0.5, 0.9])
    got_states = {
        r.l_returnflag: (r.n, sorted(s.v for s in r.sample))
        for r in st.collect()
    }
    got_est = {
        r.l_returnflag: (r.n, r.q_0_5, r.q_0_9) for r in est.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    rows = con.execute(f"""
        WITH ranked AS (
          SELECT l_returnflag AS key, l_extendedprice AS v,
                 CAST('0x' || substr(md5(
                     CAST(l_orderkey AS VARCHAR) || '_' ||
                     CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) AS rank,
                 CAST(l_orderkey AS VARCHAR) || '_' ||
                     CAST(l_linenumber AS VARCHAR) AS rid
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
        rn AS (
          SELECT key, v,
                 row_number() OVER (PARTITION BY key
                     ORDER BY rank, v, rid) AS rn,
                 count(*) OVER (PARTITION BY key) AS n
          FROM ranked),
        samp AS (SELECT key, n, v FROM rn WHERE rn <= {R}),
        sv AS (
          SELECT key, any_value(n) AS n, list_sort(list(v)) AS vals
          FROM samp GROUP BY key)
        SELECT key, n, vals,
               vals[CAST(floor(0.5 * (len(vals) - 1)) AS INTEGER) + 1] AS q50,
               vals[CAST(floor(0.9 * (len(vals) - 1)) AS INTEGER) + 1] AS q90
        FROM sv
    """).fetchall()
    expect_states = {r[0]: (r[1], sorted(r[2])) for r in rows}
    expect_est = {r[0]: (r[1], r[3], r[4]) for r in rows}
    assert got_states == expect_states
    assert got_est == expect_est


@pytest.mark.parametrize("seed", [60, 61, 62])
def test_quantile_sketch_random_params_match_duckdb(spark, seed):
    """Random r / probs / grouping through the portable sketch vs the
    DuckDB mirror — estimates equal exactly for every shape."""
    import duckdb

    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
        quantile_state_estimate,
    )
    from distributedqueryengine_spark.session import load_table

    rng = random.Random(seed)
    R = rng.choice([16, 50, 200])
    probs = sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.95, 0.99], 2))
    key = rng.choice(["o_orderstatus", "o_orderpriority"])
    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").withColumn(
        "__rid", F.col("o_orderkey").cast("string")
    )
    st = quantile_state_build(
        orders, [key], "o_totalprice", "__rid", r=R, portable=True
    )
    est = quantile_state_estimate(st, [key], probs)
    cols = [f"q_{str(p).replace('.', '_')}" for p in probs]
    got = {
        r_[key]: (r_["n"], *(r_[c] for c in cols)) for r_ in est.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    sel = ", ".join(
        f"vals[CAST(floor({p} * (len(vals) - 1)) AS INTEGER) + 1] AS e{i}"
        for i, p in enumerate(probs)
    )
    rows = con.execute(f"""
        WITH ranked AS (
          SELECT {key} AS k, o_totalprice AS v,
                 CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                      1, 15) AS BIGINT) AS rank,
                 CAST(o_orderkey AS VARCHAR) AS rid
          FROM orders WHERE o_totalprice IS NOT NULL),
        rn AS (SELECT k, v,
                      row_number() OVER (PARTITION BY k
                          ORDER BY rank, v, rid) AS rn,
                      count(*) OVER (PARTITION BY k) AS n
               FROM ranked),
        sv AS (SELECT k, any_value(n) AS n, list_sort(list(v)) AS vals
               FROM rn WHERE rn <= {R} GROUP BY k)
        SELECT k, n, {sel} FROM sv
    """).fetchall()
    expect = {r_[0]: tuple(r_[1:]) for r_ in rows}
    assert got == expect, (R, probs, key)


@pytest.mark.parametrize("seed", [70, 71, 72])
def test_rrf_fuse_random_weights_match_duckdb(spark, seed):
    """Random weights / c / k through rrf_fuse over two deterministic
    rankings derived from orders vs the identical SQL in DuckDB."""
    import duckdb

    from distributedqueryengine_spark.functions.retrieval_eval import rrf_fuse
    from distributedqueryengine_spark.session import load_table

    rng = random.Random(seed)
    w1, w2 = round(rng.uniform(0.5, 2), 3), round(rng.uniform(0.5, 2), 3)
    c = round(rng.uniform(10, 90), 1)
    k = rng.randint(3, 12)
    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    # two rankings of customers: by total spend, by order count
    a = (
        orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("s").desc(), F.col("o_custkey").asc())
            ),
        )
        .filter(F.col("rnk") <= 20)
        .select(F.col("o_custkey").alias("doc_id"), "rnk")
    )
    b = (
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cn"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("cn").desc(), F.col("o_custkey").asc())
            ),
        )
        .filter(F.col("rnk") <= 20)
        .select(F.col("o_custkey").alias("doc_id"), "rnk")
    )
    got = sorted(
        (r.doc_id, r.rrf_score, r.n_lists, r.rnk)
        for r in rrf_fuse([a, b], k=k, c=c, weights=[w1, w2]).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    rows = con.execute(f"""
        WITH a AS (
          SELECT o_custkey AS id,
                 row_number() OVER (ORDER BY sum(o_totalprice) DESC,
                                    o_custkey ASC) AS rnk
          FROM orders GROUP BY o_custkey QUALIFY rnk <= 20),
        b AS (
          SELECT o_custkey AS id,
                 row_number() OVER (ORDER BY count(*) DESC,
                                    o_custkey ASC) AS rnk
          FROM orders GROUP BY o_custkey QUALIFY rnk <= 20),
        u AS (SELECT id, {w1} / ({c} + rnk) AS contrib FROM a
              UNION ALL SELECT id, {w2} / ({c} + rnk) FROM b),
        f AS (SELECT id, round(sum(contrib), 9) AS score,
                     CAST(count(*) AS INTEGER) AS n_lists
              FROM u GROUP BY id)
        SELECT id, score, n_lists,
               CAST(row_number() OVER (ORDER BY score DESC, id ASC)
                    AS INTEGER) AS rnk
        FROM f QUALIFY rnk <= {k}
    """).fetchall()
    expect = sorted(tuple(r_) for r_ in rows)
    assert got == expect, (w1, w2, c, k)
