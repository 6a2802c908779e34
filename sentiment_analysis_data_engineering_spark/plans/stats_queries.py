"""Statistical-analytics and pattern-mining queries (round 4).

Families the reference's analyst users reach for next once the
warehouse/behavioral surface exists: regression diagnostics, robust
outlier detection (median/MAD), seasonality indices, Markov transition
matrices, market-basket association mining, Zipf-law fits, chi-square
independence tests, RFM segmentation, session path mining, and
inter-event gap statistics.

Cross-engine determinism rules (registry docstring) apply throughout:
every double aggregate is rounded in BOTH engines, every rank/top-k has
a tie-free total order, and threshold comparisons happen on values
rounded identically on both sides so last-ulp summation-order noise
cannot flip a boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load_tables, query

# --------------------------------------------------------------------------
# Regression diagnostics (built-in regr_* aggregates — JVM-side, one pass)
# --------------------------------------------------------------------------


@query(
    "regr_price_quantity",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of extended price on quantity per return flag,
    via the SQL-standard ``regr_*`` aggregates — ONE hash aggregate,
    map-side partials, no window, no UDF. At 100 TB this is the model
    query for "fit a line per group": the sufficient statistics
    (Σx, Σy, Σxy, Σx², n) combine associatively, so the shuffle moves
    five doubles per group regardless of row count."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return lineitem.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Robust outliers: median / MAD (exact percentile, two bounded passes)
# --------------------------------------------------------------------------


@query(
    "mad_outlier_prices",
    oracle="""
    WITH oc AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    m AS (SELECT seg, round(median(price), 6) AS med FROM oc GROUP BY seg),
    d AS (
      SELECT oc.seg, oc.price, m.med, abs(oc.price - m.med) AS adev
      FROM oc JOIN m ON oc.seg = m.seg
    ),
    md AS (SELECT seg, round(median(adev), 6) AS mad FROM d GROUP BY seg)
    SELECT d.seg AS c_mktsegment,
           round(any_value(d.med), 4) AS med_price,
           round(any_value(md.mad), 4) AS mad_price,
           CAST(sum(CASE WHEN d.adev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM d JOIN md ON d.seg = md.seg
    GROUP BY d.seg
    """,
)
def mad_outlier_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per market segment: orders whose total
    price deviates from the segment median by more than 3x the median
    absolute deviation. Median/MAD resist the heavy tail that wrecks
    mean/stddev z-scores (rolling_zscore_anomalies is the parametric
    twin).

    Shape: two grouped exact-percentile aggregates with a broadcast
    stats join between them — the per-segment stats frames are
    O(segments) rows, so both joins broadcast at any corpus size, and
    the fact table is scanned twice (at 100 TB, persist it or fall back
    to ``approx_percentile`` for a one-pass approximate variant).
    Cross-engine: med/MAD are rounded to 6dp on BOTH sides before the
    3xMAD threshold comparison, so interpolation ulp noise cannot flip
    a boundary order."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    oc = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("price"))
    m = oc.groupBy("seg").agg(
        F.round(F.percentile("price", F.lit(0.5)), 6).alias("med")
    )
    d = oc.join(F.broadcast(m), "seg").withColumn(
        "adev", F.abs(F.col("price") - F.col("med"))
    )
    md = d.groupBy("seg").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        d.join(F.broadcast(md), "seg")
        .groupBy("seg")
        .agg(
            # 4dp, not 2: med/mad are midpoints of 2-decimal prices, so
            # they sit EXACTLY on .005/.0025 — a 2dp round is a
            # half-way boundary where Spark (BigDecimal shortest-repr,
            # HALF_UP) and DuckDB (binary-double scaling) disagree; at
            # 4dp every midpoint is exactly representable, no boundary.
            F.round(F.any_value("med"), 4).alias("med_price"),
            F.round(F.any_value("mad"), 4).alias("mad_price"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count("*").alias("n_orders"),
        )
        .withColumnRenamed("seg", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Day-of-week seasonality index
# --------------------------------------------------------------------------


@query(
    "dow_seasonality_index",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    by_dow AS (
      SELECT CAST(isodow(d) AS INTEGER) AS iso_weekday,
             CAST(count(*) AS BIGINT) AS n_days,
             avg(rev) AS avg_rev
      FROM daily GROUP BY 1
    ),
    overall AS (SELECT avg(rev) AS g FROM daily)
    SELECT iso_weekday, n_days,
           round(avg_rev, 2) AS avg_rev,
           round(avg_rev / g, 6) AS seasonality_idx
    FROM by_dow CROSS JOIN overall
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: average daily revenue per ISO weekday
    divided by the overall average daily revenue — the multiplicative
    seasonal index a forecasting pipeline divides out before trend
    fitting (forecast_revenue_change is the consumer).

    Shape: one grouped aggregate to daily totals (the only fact-sized
    shuffle), then everything downstream is O(distinct days) — the
    weekday regroup and the 1-row global average cross-join are
    broadcast-trivial at any scale."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    by_dow = daily.groupBy(
        (F.weekday("d") + 1).cast("int").alias("iso_weekday")
    ).agg(F.count("*").alias("n_days"), F.avg("rev").alias("avg_rev"))
    overall = daily.agg(F.avg("rev").alias("g"))
    return by_dow.crossJoin(F.broadcast(overall)).select(
        "iso_weekday",
        "n_days",
        F.round("avg_rev", 2).alias("avg_rev"),
        F.round(F.col("avg_rev") / F.col("g"), 6).alias("seasonality_idx"),
    )


@query(
    "seasonal_adjusted_anomalies",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    by_dow AS (
      SELECT CAST(isodow(d) AS INTEGER) AS dow, avg(rev) AS dow_avg
      FROM daily GROUP BY 1
    ),
    adj AS (
      SELECT daily.d, daily.rev,
             round(daily.rev / by_dow.dow_avg, 6) AS idx_adj
      FROM daily JOIN by_dow ON CAST(isodow(daily.d) AS INTEGER) = by_dow.dow
    ),
    stats AS (
      SELECT avg(idx_adj) AS mu, stddev_samp(idx_adj) AS sigma,
             count(*) AS n_days
      FROM adj
    )
    SELECT strftime(adj.d, '%Y-%m-%d') AS day,
           round(adj.rev, 2) AS revenue,
           adj.idx_adj,
           round((adj.idx_adj - stats.mu) / stats.sigma, 4) AS z
    FROM adj CROSS JOIN stats
    WHERE abs(round((adj.idx_adj - stats.mu) / stats.sigma, 4)) > 2.0
    """,
)
def seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted revenue anomalies: divide each day's revenue
    by its weekday's average (removing the day-of-week cycle that
    dow_seasonality_index measures), then flag days whose adjusted
    ratio z-scores beyond ±2 — the compose-the-operators pattern a
    monitoring pipeline runs so Saturdays aren't perpetual "anomalies".

    Shape: one fact-sized aggregate to daily totals; the weekday
    profile (≤7 rows) and the global mean/σ (1 row) broadcast back, so
    detection is a map-side filter over the O(days) frame. The z is
    ROUNDED 4dp in both engines before the |z| > 2 threshold, the
    registry's boundary-determinism rule. Note stddev here is fine
    cross-engine (unlike daily_returns_volatility's explicit-sum form)
    because the O(days) frame is small enough that both engines sum in
    one partition-independent pass over identical rounded inputs."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    dow = (F.weekday("d") + 1).cast("int")
    by_dow = daily.groupBy(dow.alias("dow")).agg(F.avg("rev").alias("dow_avg"))
    adj = daily.join(
        F.broadcast(by_dow), dow == F.col("dow")
    ).select(
        "d", "rev", F.round(F.col("rev") / F.col("dow_avg"), 6).alias("idx_adj")
    )
    stats = adj.agg(
        F.avg("idx_adj").alias("mu"),
        F.stddev_samp("idx_adj").alias("sigma"),
    )
    z = F.round((F.col("idx_adj") - F.col("mu")) / F.col("sigma"), 4)
    return (
        adj.crossJoin(F.broadcast(stats))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.0)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("rev", 2).alias("revenue"),
            "idx_adj",
            "z",
        )
    )


# --------------------------------------------------------------------------
# Markov transition matrix over event streams
# --------------------------------------------------------------------------


@query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS prob
    FROM t
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    (previous, next) pair within a user's stream, the transition count
    and the row-normalized probability P(next | previous). The
    behavioral counterpart of bigram_pmi_collocations, and the model a
    next-event predictor or anomaly scorer starts from.

    Shape: one user-keyed window (lag) — the same shuffle axis every
    behavioral query here uses — then a hash aggregate down to
    |types|² rows; the normalizing window runs over that tiny
    post-aggregation frame, never the event stream."""
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    # |types|^2 rows post-agg: the normalizing window is broadcast-tiny.
    wn = W.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 6).alias(
            "prob"
        ),
    )


# --------------------------------------------------------------------------
# Market-basket association mining (frequent pairs + lift)
# --------------------------------------------------------------------------

_MB_MIN_ITEM = 25  # min orders containing an item before it can pair
_MB_MIN_PAIR = 3  # min co-occurrence support for an output pair
_MB_MAX_BASKET = 64  # pathological-basket guard: skip mega-orders


@query(
    "market_basket_part_pairs",
    oracle=f"""
    WITH b0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    sized AS (
      SELECT l_orderkey FROM b0 GROUP BY l_orderkey
      HAVING count(*) <= {_MB_MAX_BASKET}
    ),
    b AS (SELECT b0.* FROM b0 JOIN sized USING (l_orderkey)),
    ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY l_partkey),
    fi AS (SELECT l_partkey, c FROM ic WHERE c >= {_MB_MIN_ITEM}),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM b),
    p AS (
      SELECT a.l_partkey AS part_a, bb.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM b a
      JOIN b bb ON a.l_orderkey = bb.l_orderkey
               AND a.l_partkey < bb.l_partkey
      WHERE a.l_partkey IN (SELECT l_partkey FROM fi)
        AND bb.l_partkey IN (SELECT l_partkey FROM fi)
      GROUP BY 1, 2
      HAVING count(*) >= {_MB_MIN_PAIR}
    )
    SELECT p.part_a, p.part_b, p.support,
           round(p.support * n.n_orders /
                 CAST(fa.c * fb.c AS DOUBLE), 4) AS lift
    FROM p
    JOIN fi fa ON p.part_a = fa.l_partkey
    JOIN fi fb ON p.part_b = fb.l_partkey
    CROSS JOIN n
    """,
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs bought together (orders as baskets) with
    their lift — the A-priori first stage every recommender/affinity
    pipeline runs.

    Scale plan (the reason this is safe at 100 TB):
    - **frequent-item pruning first** (support >= {_MB_MIN_ITEM}): the
      A-priori property says no pair can beat a threshold its items
      miss, so the pair join only ever sees the frequent-item
      sub-basket stream;
    - **mega-basket guard** (<= {_MB_MAX_BASKET} items): pair count is
      quadratic in basket size, so one pathological crawl-everything
      order must not dominate a stage — the cap is applied identically
      in the oracle, keeping semantics exact;
    - the pair generator is an **orderkey equi-join** (co-partitioned
      self-join, never a cross join), and per-order output is bounded
      by the basket cap.
    """
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    b0 = lineitem.select("l_orderkey", "l_partkey").distinct()
    sized = (
        b0.groupBy("l_orderkey")
        .agg(F.count("*").alias("_bs"))
        .filter(F.col("_bs") <= _MB_MAX_BASKET)
        .select("l_orderkey")
    )
    # Pin ONE materialization of the capped basket frame: five
    # consumers read it (item counts, the two pair-join sides, the
    # order total, the frequent-item semi join), and without the pin
    # each recomputes the distinct from a fresh lineitem scan — the
    # executed plan showed 14 fact scans and zero exchange reuse. Same
    # localCheckpoint pattern as customer_balance_deciles. At bench
    # scale the eager materialization costs ~2 s of FIXED overhead and
    # the 14 re-scans of a 176 MB file would actually be cheaper;
    # at 100 TB that inverts brutally (14 fact scans vs one
    # basket-sized write), and the pinned plan is the only one that
    # survives the scale-up, so the pin stays.
    from ..operators.dedup import register_pinned

    b = register_pinned(  # freed by the harness's release_pinned()
        b0.join(sized, "l_orderkey").localCheckpoint()
    )
    ic = b.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    fi = ic.filter(F.col("c") >= _MB_MIN_ITEM)
    # keep only frequent items in the basket stream (semi join — the
    # frequent-item set is vocabulary-sized, shuffle-joinable if huge)
    bf = b.join(fi.select("l_partkey"), "l_partkey", "left_semi")
    n = b.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    left = bf.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    right = bf.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        left.join(right, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= _MB_MIN_PAIR)
    )
    fa = fi.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    fb = fi.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                F.col("support")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")).cast("double"),
                4,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Zipf-law fit over the token frequency distribution
# --------------------------------------------------------------------------

_ZIPF_TOP = 200


@query(
    "zipf_token_rank_slope",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
             AS term
      FROM documents
    ),
    freq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS f
      FROM toks WHERE term <> '' GROUP BY term
    ),
    top AS (
      SELECT term, f,
             CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT)
               AS rank
      FROM freq ORDER BY f DESC, term LIMIT {_ZIPF_TOP}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(f), ln(rank)), 6) AS slope,
           round(regr_intercept(ln(f), ln(rank)), 6) AS intercept,
           round(regr_r2(ln(f), ln(rank)), 6) AS r2
    FROM top
    """,
)
def zipf_token_rank_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: regress ln(freq)
    on ln(rank) over the top-{_ZIPF_TOP} terms — slope near -1 is the
    classic natural-language signature, and deviation from it is a
    corpus-quality signal (template/boilerplate corpora flatten the
    curve; OCR noise steepens the tail).

    Shape: explode -> term hash-aggregate (the one corpus-sized
    shuffle, map-side combined), then a DISTRIBUTED top-k
    (``orderBy().limit()`` = TakeOrdered, no single-partition global
    sort); ranks are assigned by a window over the {_ZIPF_TOP}-row
    result only, and the regression is one tiny aggregate. Tokenizer
    matches the registry-wide convention (lower, collapse whitespace,
    split on spaces) so the oracle tokenizes identically."""
    from ..operators import text as tx

    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = documents.select(
        F.explode(tx.tokens(tx.normalize_text("text"))).alias("term")
    ).filter(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count("*").cast("long").alias("f"))
    top = freq.orderBy(F.col("f").desc(), "term").limit(_ZIPF_TOP)
    # rank window runs over the top-N frame only (bounded rows)
    wr = W.orderBy(F.col("f").desc(), "term")
    ranked = top.select(
        "f", F.row_number().over(wr).cast("long").alias("rank")
    )
    lf, lr = F.log(F.col("f")), F.log(F.col("rank"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Chi-square independence test (segment x order priority)
# --------------------------------------------------------------------------


@query(
    "chi_square_segment_priority",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rt AS (SELECT seg, sum(n) AS row_t FROM cells GROUP BY seg),
    ct AS (SELECT pri, sum(n) AS col_t FROM cells GROUP BY pri),
    tot AS (SELECT sum(n) AS big_n,
                   count(DISTINCT seg) AS n_seg,
                   count(DISTINCT pri) AS n_pri
            FROM cells)
    SELECT round(sum(pow(cells.n - rt.row_t * ct.col_t / CAST(tot.big_n AS DOUBLE), 2)
                     / (rt.row_t * ct.col_t / CAST(tot.big_n AS DOUBLE))), 6)
             AS chi2,
           CAST(any_value((tot.n_seg - 1) * (tot.n_pri - 1)) AS BIGINT) AS dof,
           CAST(any_value(tot.big_n) AS BIGINT) AS n
    FROM cells
    JOIN rt ON cells.seg = rt.seg
    JOIN ct ON cells.pri = ct.pri
    CROSS JOIN tot
    """,
)
def chi_square_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between customer market
    segment and order priority: the contingency-table statistic
    sum((obs-exp)^2/exp) with degrees of freedom — the first question
    an analyst asks of two categoricals ("does segment drive
    priority?").

    Shape: the only fact-sized work is the (segment, priority) count
    aggregate; the table is |seg|x|pri| rows after that, so the
    marginal joins and the final statistic are all broadcast-tiny.
    Expected counts are ratios of exact integer marginals in both
    engines, so the statistic matches to well past the 6dp rounding."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    cells = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    rt = cells.groupBy("seg").agg(F.sum("n").alias("row_t"))
    ct = cells.groupBy("pri").agg(F.sum("n").alias("col_t"))
    tot = cells.agg(
        F.sum("n").alias("big_n"),
        F.countDistinct("seg").alias("n_seg"),
        F.countDistinct("pri").alias("n_pri"),
    )
    j = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("row_t") * F.col("col_t") / F.col("big_n").cast("double")
    return j.agg(
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 6).alias("chi2"),
        F.any_value((F.col("n_seg") - 1) * (F.col("n_pri") - 1))
        .cast("long")
        .alias("dof"),
        F.any_value("big_n").cast("long").alias("n"),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation
# --------------------------------------------------------------------------


@query(
    "rfm_customer_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_d,
             CAST(count(*) AS BIGINT) AS freq,
             round(sum(o_totalprice), 2) AS mon
      FROM orders GROUP BY o_custkey
    ),
    as_of AS (SELECT max(o_orderdate) AS asof_d FROM orders),
    r AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_d, asof_d) AS BIGINT) AS rec,
             freq, mon
      FROM cust CROSS JOIN as_of
    ),
    q AS (
      SELECT quantile_cont(rec, 0.25) AS r1, quantile_cont(rec, 0.5) AS r2,
             quantile_cont(rec, 0.75) AS r3,
             quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
             quantile_cont(freq, 0.75) AS f3,
             round(quantile_cont(mon, 0.25), 4) AS m1,
             round(quantile_cont(mon, 0.5), 4) AS m2,
             round(quantile_cont(mon, 0.75), 4) AS m3
      FROM r
    )
    SELECT CAST(1 + CAST(rec > r1 AS INTEGER) + CAST(rec > r2 AS INTEGER)
                  + CAST(rec > r3 AS INTEGER) AS INTEGER) AS r_q,
           CAST(1 + CAST(freq > f1 AS INTEGER) + CAST(freq > f2 AS INTEGER)
                  + CAST(freq > f3 AS INTEGER) AS INTEGER) AS f_q,
           CAST(1 + CAST(mon > m1 AS INTEGER) + CAST(mon > m2 AS INTEGER)
                  + CAST(mon > m3 AS INTEGER) AS INTEGER) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(mon), 2) AS total_monetary
    FROM r CROSS JOIN q
    GROUP BY 1, 2, 3
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each ordering customer scored 1-4 on Recency
    (days since last order, as of the latest order date in the data),
    Frequency (order count) and Monetary (total spend) by global
    quartile thresholds, then counted per (r,f,m) cell — the classic
    marketing segmentation cube.

    Shape: one customer-keyed aggregate over orders (the only
    fact-sized shuffle); the as-of date and the nine quartile
    thresholds are 1-row frames cross-join-broadcast back, so scoring
    is a map-side projection. Scores use strict ``value > threshold``
    comparisons: recency/frequency are integers against dyadic-exact
    interpolated quartiles, and monetary is rounded to cents in BOTH
    engines before the thresholds are computed and compared, so
    summation-order ulps cannot move a customer across a bucket."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("mon"),
    )
    asof = orders.agg(F.max("o_orderdate").alias("asof_d"))
    r = cust.crossJoin(F.broadcast(asof)).select(
        F.datediff("asof_d", "last_d").cast("long").alias("rec"),
        "freq",
        "mon",
    )
    q = r.agg(
        F.percentile("rec", F.lit(0.25)).alias("r1"),
        F.percentile("rec", F.lit(0.5)).alias("r2"),
        F.percentile("rec", F.lit(0.75)).alias("r3"),
        F.percentile("freq", F.lit(0.25)).alias("f1"),
        F.percentile("freq", F.lit(0.5)).alias("f2"),
        F.percentile("freq", F.lit(0.75)).alias("f3"),
        # 4dp threshold rounding: quartile interpolation over cent-
        # valued monetary lands on .0025/.005 midpoints — exact at 4dp,
        # half-way boundaries at 2dp (see mad_outlier_prices)
        F.round(F.percentile("mon", F.lit(0.25)), 4).alias("m1"),
        F.round(F.percentile("mon", F.lit(0.5)), 4).alias("m2"),
        F.round(F.percentile("mon", F.lit(0.75)), 4).alias("m3"),
    )
    scored = r.crossJoin(F.broadcast(q))

    def _score(v: str, q1: str, q2: str, q3: str):
        return (
            1
            + (F.col(v) > F.col(q1)).cast("int")
            + (F.col(v) > F.col(q2)).cast("int")
            + (F.col(v) > F.col(q3)).cast("int")
        )

    return (
        scored.select(
            _score("rec", "r1", "r2", "r3").alias("r_q"),
            _score("freq", "f1", "f2", "f3").alias("f_q"),
            _score("mon", "m1", "m2", "m3").alias("m_q"),
            "mon",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("mon"), 2).alias("total_monetary"),
        )
    )


# --------------------------------------------------------------------------
# Session path mining (top opening paths)
# --------------------------------------------------------------------------

_PATH_LEN = 3
_PATH_TOP = 20
_SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "top_session_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       > {_SESSION_GAP_US}
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(is_new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS BIGINT)
               AS session_id
      FROM flagged
    ),
    numbered AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM sessions
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM numbered WHERE rn <= {_PATH_LEN}
      GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {_PATH_TOP}
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session-opening paths: the first {_PATH_LEN} event
    types of every session (30-minute-gap sessionization, identical to
    sessionize_events), concatenated into a path string and ranked by
    session count — the path-mining view behind every "where do users
    go first" product question.

    Shape: the user-keyed session windows are the same shuffle axis as
    sessionize_events; path assembly sorts a <= {_PATH_LEN}-element
    array per session (``sort_array`` of (rn, type) structs — no
    order-dependent ``collect_list`` assumption); the final top-k is
    ``orderBy().limit()`` = distributed TakeOrdered with a tie-free
    (count desc, path) total order."""
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    flagged = events.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    ws = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    numbered = sessions.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= _PATH_LEN
    )
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOP)
    )


# --------------------------------------------------------------------------
# Inter-order gap statistics
# --------------------------------------------------------------------------


@query(
    "customer_order_gap_stats",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(date_diff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS BIGINT) AS gap_days
      FROM orders
    ),
    gaps AS (SELECT * FROM seq WHERE gap_days IS NOT NULL),
    j AS (
      SELECT c.c_mktsegment, g.gap_days
      FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap_days), 4) AS avg_gap_days,
           round(median(gap_days), 1) AS med_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM j GROUP BY c_mktsegment
    """,
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap distribution per market segment: days between a
    customer's consecutive orders (lag over the customer's order
    history), aggregated to count/mean/median/max — the
    re-purchase-cadence profile behind churn models and the input
    LOCF/interp fills assume (daily_user_value_locf documents the fill
    side; this measures the gaps themselves).

    Shape: one customer-keyed window (lag), a dimension join, one hash
    aggregate. Median is an exact percentile over integer day gaps —
    dyadic-exact interpolation, so both engines agree bit-for-bit."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    j = seq.join(
        customer, seq["o_custkey"] == customer["c_custkey"]
    ).select("c_mktsegment", "gap_days")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.5)), 1).alias(
            "med_gap_days"
        ),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


# --------------------------------------------------------------------------
# Distribution drift: binned two-sample Kolmogorov-Smirnov
# --------------------------------------------------------------------------

_KS_BINS = 256
_KS_A = "purchase"
_KS_B = "view"


@query(
    "ks_drift_purchase_view",
    oracle=f"""
    WITH pool AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    rng AS (SELECT min(value) AS lo, max(value) AS hi FROM pool),
    binned AS (
      SELECT event_type,
             CAST(least({_KS_BINS} - 1,
                  floor((value - rng.lo) / (rng.hi - rng.lo) * {_KS_BINS}))
               AS BIGINT) AS bin
      FROM pool, rng
    ),
    cells AS (
      SELECT bin,
             CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
    cdf AS (
      SELECT bin,
             sum(ca) OVER (ORDER BY bin) / CAST(tot.na AS DOUBLE) AS fa,
             sum(cb) OVER (ORDER BY bin) / CAST(tot.nb AS DOUBLE) AS fb
      FROM cells, tot
    )
    SELECT CAST(any_value(tot.na) AS BIGINT) AS n_a,
           CAST(any_value(tot.nb) AS BIGINT) AS n_b,
           round(max(abs(cdf.fa - cdf.fb)), 6) AS ks_stat,
           round(max(abs(cdf.fa - cdf.fb)), 6) > 0.1 AS drifted
    FROM cdf CROSS JOIN tot
    """,
)
def ks_drift_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample distribution-drift check between the purchase and
    view value distributions: the binned Kolmogorov-Smirnov statistic
    max |CDF_a − CDF_b| over {_KS_BINS} equi-width bins, with a
    drift verdict at the 0.1 threshold — the data-quality monitor a
    pipeline runs when "same schema, different distribution" is the
    failure mode schema checks can't see.

    Scale plan: the textbook KS sorts the pooled DISTINCT values —
    at warehouse scale that is an unbounded single-axis sort, so this
    is the standard BINNED variant: one fact-sized aggregate to
    {_KS_BINS} cells, then CDFs and the max-gap run on the fixed-size
    bin frame (the unpartitioned window spans ≤ {_KS_BINS} rows —
    bounded by construction, the post-agg-frame exemption). Bin edges
    derive from broadcast min/max; CDF values are ratios of exact
    integer counts, so both engines agree to well past the 6dp
    rounding, and the drift verdict compares the ROUNDED statistic."""
    (events,) = load_tables(spark, sf_dir, "events")
    pool = events.filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    ).select("event_type", "value")
    rng = pool.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = pool.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.least(
            F.lit(_KS_BINS - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _KS_BINS
            ),
        )
        .cast("long")
        .alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    tot = cells.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    # ≤ _KS_BINS rows: the unpartitioned CDF window is bounded by design
    wb = W.orderBy("bin")
    cdf = cells.crossJoin(F.broadcast(tot)).select(
        (F.sum("ca").over(wb) / F.col("na").cast("double")).alias("fa"),
        (F.sum("cb").over(wb) / F.col("nb").cast("double")).alias("fb"),
        "na",
        "nb",
    )
    ks = F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6)
    return cdf.agg(
        F.any_value("na").cast("long").alias("n_a"),
        F.any_value("nb").cast("long").alias("n_b"),
        ks.alias("ks_stat"),
        (ks > 0.1).alias("drifted"),
    )


# --------------------------------------------------------------------------
# Revenue concentration: Gini coefficient
# --------------------------------------------------------------------------


@query(
    "gini_revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents, o_custkey)
                  AS BIGINT) AS rk
      FROM cust
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev_cents) AS BIGINT) AS total_cents,
           round((2.0 * sum(rk * CAST(rev_cents AS DOUBLE)))
                 / (count(*) * CAST(sum(rev_cents) AS DOUBLE))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the single
    number behind the Pareto curve (pareto_revenue_by_segment shows the
    prefix; this scores the whole distribution): 0 = every customer
    spends alike, →1 = revenue concentrated in a few whales. Uses the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues sorted
    ascending with a customer-key tiebreak.

    Determinism: revenue is exact integer cents BEFORE ranking, so the
    (rev, custkey) sort order — and therefore every rank — is
    bit-identical cross-engine; Σ(i·xᵢ) runs in double (the long
    product overflows at corpus scale) and only the final ratio
    rounds. Shape: one customer-keyed aggregate (the only fact-sized
    shuffle); the ranking runs over the customer dimension — at a
    scale where that is itself huge, the range-partition exact-rank
    machinery of customer_balance_deciles is the drop-in replacement
    for the single-axis window."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_cents")
    )
    w = W.orderBy("rev_cents", "o_custkey")
    ranked = cust.select(
        "rev_cents", F.row_number().over(w).cast("long").alias("rk")
    )
    n = F.count("*")
    tot = F.sum("rev_cents")
    return ranked.agg(
        n.cast("long").alias("n_customers"),
        tot.cast("long").alias("total_cents"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("rk") * F.col("rev_cents").cast("double")))
            / (n * tot.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )
