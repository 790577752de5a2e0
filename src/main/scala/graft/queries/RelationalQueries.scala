package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Histogram, ScalerPipeline, Split, SurvivalCurve}

/** Scan / filter / aggregate / join / window / set-op queries over the star
  * schema — the relational core of SURVEY §2 (rows 9-21, 38-49) expressed on
  * the driver fixtures.
  *
  * Exactness conventions (SURVEY §7.4.3): money sums are compared as exact
  * integer cents (`sum(cast(round(x*100, 0) as long))`) — associative, so safe
  * under any partitioning; averages/stddevs are rounded to 6 decimals (well
  * above the ~1e-8 float-summation noise floor at sf0.1); pure per-row IEEE
  * arithmetic (e.g. `price*(1-disc)`) is emitted raw, since both engines
  * compute the identical double.
  */
object RelationalQueries {

  /** Exact integer-cents sum of a money-valued double column. */
  private def cents(c: org.apache.spark.sql.Column) =
    sum(round(c * 100, 0).cast("long"))
  private def centsSql(e: String) =
    s"CAST(sum(CAST(round(($e) * 100, 0) AS BIGINT)) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // SURVEY §2 rows 9,10,12: column-pruned, predicate-pushed scan with a
    // computed projection (reference feature-subset projection,
    // train_classification.py:209).
    QueryDef("q01_pruned_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // SURVEY §2 row 13: conjunctive range predicate (θ/E band analog,
    // train_classification.py:288-291) feeding a grouped aggregate.
    QueryDef("q02_band_filter_agg",
      s"""SELECT l_returnflag, count(*) AS n,
         |       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_cents,
         |       ${centsSql("l_extendedprice")} AS price_cents
         |FROM lineitem
         |WHERE l_quantity >= 10 AND l_quantity < 40
         |  AND l_discount >= 0.02 AND l_discount < 0.08
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_quantity") >= 10 && col("l_quantity") < 40 &&
               col("l_discount") >= 0.02 && col("l_discount") < 0.08)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_cents"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy("l_returnflag")
    },

    // SURVEY §2 row 38: group-count (np.unique(return_counts=True),
    // train_classification.py:234).
    QueryDef("q03_group_count",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // SURVEY §2 rows 26-27,39: scaler-fit moment statistics
    // (train_classification.py:184-191; stddev is population, ddof=0).
    QueryDef("q04_moment_stats",
      """SELECT l_returnflag,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(stddev_pop(l_quantity), 6) AS std_qty,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(avg("l_quantity"), 6).as("avg_qty"),
          round(stddev_pop("l_quantity"), 6).as("std_qty"),
          min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"))
        .orderBy("l_returnflag")
    },

    // SURVEY §2 row 40: conditional counts (class totals,
    // train_classification.py:302-303).
    QueryDef("q05_conditional_count",
      """SELECT count(*) FILTER (WHERE l_returnflag = 'A') AS n_a,
        |       count(*) FILTER (WHERE l_returnflag = 'N') AS n_n,
        |       count(*) FILTER (WHERE l_returnflag = 'R') AS n_r,
        |       count(*) FILTER (WHERE l_quantity < 5) AS n_small
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(when(col("l_returnflag") === "A", 1)).as("n_a"),
        count(when(col("l_returnflag") === "N", 1)).as("n_n"),
        count(when(col("l_returnflag") === "R", 1)).as("n_r"),
        count(when(col("l_quantity") < 5, 1)).as("n_small"))
    },

    // SURVEY §2 row 41: fixed-width dense histogram
    // (np.histogram(bins, range=(0,1)), train_classification.py:295-299).
    QueryDef("q06_histogram",
      """WITH binned AS (
        |  SELECT LEAST(GREATEST(CAST(floor((l_discount * 10) * 100) AS BIGINT), 0), 99) AS bin,
        |         count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |bins AS (SELECT unnest(range(0, 100)) AS bin)
        |SELECT b.bin, CAST(coalesce(n, 0) AS BIGINT) AS n
        |FROM bins b LEFT JOIN binned USING (bin) ORDER BY bin""".stripMargin) { (s, d) =>
      Histogram.conditionalHistogram(
        Tables.lineitem(s, d), col("l_discount") * 10, 100, Seq("n" -> lit(true)))
        .orderBy("bin")
    },

    // SURVEY §2 row 46 — THE FLAGSHIP: cumulative-threshold survival curves
    // (train_classification.py:284-312). Score is rational arithmetic so the
    // bin assignment is bit-identical across engines.
    QueryDef("q07_survival_curve", SurvivalSql.sql) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .where(col("l_quantity") >= 5 && col("l_quantity") < 45)
      val p = (col("l_discount") * 10 + col("l_quantity") / 50.0 + col("l_tax") * 12.5) / 3
      SurvivalCurve.curve(li, p, col("l_linestatus") === "F", 1000)
    },

    // SURVEY §2 row 43: confusion-matrix pivot (train_classification.py:118,131).
    QueryDef("q08_confusion_pivot",
      """WITH t AS (
        |  SELECT l_returnflag AS y_true,
        |         CASE WHEN l_discount >= 0.05 THEN 'R'
        |              WHEN l_quantity > 25 THEN 'N' ELSE 'A' END AS y_pred
        |  FROM lineitem)
        |SELECT y_true,
        |       count(*) FILTER (WHERE y_pred = 'A') AS a,
        |       count(*) FILTER (WHERE y_pred = 'N') AS n,
        |       count(*) FILTER (WHERE y_pred = 'R') AS r
        |FROM t GROUP BY y_true ORDER BY y_true""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("y_true"),
          when(col("l_discount") >= 0.05, "R")
            .when(col("l_quantity") > 25, "N")
            .otherwise("A").as("y_pred"))
        .groupBy("y_true").pivot("y_pred", Seq("A", "N", "R")).count()
        .select(col("y_true"),
          coalesce(col("A"), lit(0L)).as("a"),
          coalesce(col("N"), lit(0L)).as("n"),
          coalesce(col("R"), lit(0L)).as("r"))
        .orderBy("y_true")
    },

    // SURVEY §2 row 47: running minimum (best-so-far valid loss,
    // train_classification.py:63-66,139-144).
    QueryDef("q09_running_min",
      """SELECT o_orderkey, o_orderpriority,
        |       min(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best_so_far
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          min("o_totalprice").over(w).as("best_so_far"))
        .orderBy("o_orderkey")
    },

    // SURVEY §2 rows 44,49: deterministic top-1-by-metric per group
    // (min-valid-loss epoch, train_classification.py:139-144).
    QueryDef("q10_top1_by_metric",
      """SELECT o_orderpriority, o_orderkey AS best_key, o_totalprice AS best_price
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_orderpriority"), col("o_orderkey").as("best_key"),
          col("o_totalprice").as("best_price"))
        .orderBy("o_orderpriority")
    },

    // Star-schema join chain with broadcast dimensions (SURVEY §2.3 note):
    // revenue per region/nation. Dimension tables are broadcast — no shuffle
    // on the fact side for them; only the lineitem⋈orders equi-join shuffles.
    QueryDef("q11_star_join",
      s"""SELECT r_name, n_name, count(*) AS n,
         |       ${centsSql("l_extendedprice * (1 - l_discount)")} AS revenue_cents
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
        .orderBy("r_name", "n_name")
    },

    // Anti join (NOT EXISTS): customers with no orders, per segment.
    QueryDef("q12_anti_join",
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // SURVEY §2 rows 20,22,18: the augmentation pipeline — rotation rewrite +
    // deterministic sample + union-all (create_train_valid_test_datasets.py:72-93).
    QueryDef("q13_rotation_union", RotationSql.sql) { (s, d) =>
      import graft.functions.Physics
      val base = Tables.lineitem(s, d).select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("key"),
        col("l_extendedprice").as("x"), col("l_quantity").as("y"),
        (col("l_discount") * 3600).as("az"))
      val rotated = (1 to 3).map { k =>
        Split.sample(base, col("key"), 21 + k, 30).select(
          lit(k).as("n90"),
          Physics.rotateX(col("x"), k).as("x"),
          Physics.rotateY(col("y"), k).as("y"),
          Physics.rotateAz(col("az"), k).as("az"))
      }
      val all = rotated.foldLeft(base.select(lit(0).as("n90"), col("x"), col("y"), col("az")))(_ unionAll _)
      all.groupBy("n90").agg(
        count(lit(1)).as("n"),
        cents(col("x")).as("x_cents"),
        cents(col("az")).as("az_cents"))
        .orderBy("n90")
    },

    // Set ops: EXCEPT (distinct) — customers that never ordered.
    QueryDef("q14_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .except(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    QueryDef("q15_intersect",
      """SELECT count(*) AS n FROM (
        |  SELECT c_custkey FROM customer
        |  INTERSECT SELECT o_custkey FROM orders)""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .agg(count(lit(1)).as("n"))
    },

    // SURVEY §2 row 17: salted-hash stratified split (train_test_split
    // stratify analog, create_train_valid_test_datasets.py:119-127).
    QueryDef("q16_hash_split",
      s"""SELECT o_orderstatus, ${Split.assignSplitSql("o_orderkey", 21)} AS split,
         |       count(*) AS n
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), Split.assignSplit(col("o_orderkey"), 21).as("split"))
        .groupBy("o_orderstatus", "split").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus", "split")
    },

    // SURVEY §2 row 18: deterministic sample.
    QueryDef("q17_sample",
      s"""SELECT count(*) AS n,
         |       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_cents
         |FROM lineitem
         |WHERE ${Split.sampleSql("l_orderkey * 10 + l_linenumber", 7, 30)}""".stripMargin) { (s, d) =>
      Split.sample(Tables.lineitem(s, d),
          col("l_orderkey") * 10 + col("l_linenumber"), 7, 30)
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_cents"))
    },

    // SURVEY §2 rows 5,16,26,25 + §7.4.4: the fit/apply split — stats fitted
    // on the train split, literal-folded, applied to the unseen test split
    // (train_classification.py:184-207 / evaluate_classification.py:54-66).
    QueryDef("q18_scaler_fit_apply",
      s"""WITH train AS (SELECT o_totalprice FROM orders
         |               WHERE ${Split.assignSplitSql("o_orderkey", 21)} = 'train'),
         |stats AS (${graft.operators.ScalerPipeline.fitStatsSql("ln(o_totalprice + 1)", "train")}),
         |test AS (SELECT o_totalprice FROM orders
         |         WHERE ${Split.assignSplitSql("o_orderkey", 21)} = 'test'),
         |q AS (SELECT CAST(round(((ln(o_totalprice + 1) - mu) / sigma) * 1000000, 0)
         |             AS BIGINT) AS qv,
         |             (ln(o_totalprice + 1) - mu) / sigma AS v
         |      FROM test, stats)
         |SELECT round(CAST(sum(qv) AS DOUBLE) / count(*) / CAST(1000000 AS DOUBLE), 6) AS avg_s,
         |       round(sqrt(CASE WHEN CAST(sum(qv * qv) AS DOUBLE) / count(*)
         |                    - (CAST(sum(qv) AS DOUBLE) / count(*))
         |                      * (CAST(sum(qv) AS DOUBLE) / count(*)) < 0 THEN 0
         |                  ELSE CAST(sum(qv * qv) AS DOUBLE) / count(*)
         |                    - (CAST(sum(qv) AS DOUBLE) / count(*))
         |                      * (CAST(sum(qv) AS DOUBLE) / count(*)) END)
         |             / CAST(1000000 AS DOUBLE), 6) AS std_s,
         |       round(min(v), 6) AS min_s,
         |       round(max(v), 6) AS max_s,
         |       count(*) AS n
         |FROM q""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val orders = Tables.orders(s, d)
        .withColumn("split", Split.assignSplit(col("o_orderkey"), 21))
      val stats = ScalerPipeline.fit(
        orders.where(col("split") === "train"),
        Seq("o_totalprice" -> ScalerPipeline.Log1pStandard))
      val scaled = ScalerPipeline.apply(orders.where(col("split") === "test"), stats)
        .select(col("o_totalprice_scaled").as("v"))
      // The apply-side avg/stddev are cross-row float reductions → quantize to
      // integer 1e-6 units and derive both moments from exact sums (playbook
      // rule 4); min/max are order-independent selections and stay raw.
      val qv = round(col("v") * lit(1e6), 0).cast("long").cast(DecimalType(38, 0))
      val byN = (x: org.apache.spark.sql.Column) => x.cast("double") / count(lit(1))
      val mu6 = byN(sum(qv))
      val var6 = {
        val v = byN(sum(qv * qv)) - mu6 * mu6
        when(v < 0.0, 0.0).otherwise(v)
      }
      scaled.agg(
        round(mu6 / lit(1e6).cast("double"), 6).as("avg_s"),
        round(sqrt(var6) / lit(1e6).cast("double"), 6).as("std_s"),
        round(min("v"), 6).as("min_s"),
        round(max("v"), 6).as("max_s"),
        count(lit(1)).as("n"))
    },

    // Robust (median/IQR) scaling — the outlier-resistant sibling of q18's
    // μ/σ standardization: a single corrupted price shifts a mean scaler
    // arbitrarily but moves the median not at all. Same fit/apply posture:
    // stats fitted on the TRAIN split only (one exact-percentile aggregate
    // over integer cents — the q58-proven quantile_cont ≡ percentile
    // parity), collected and folded into the apply projection as literals
    // (the ScalerPipeline "stats are data" discipline — no broadcast join,
    // apply stays a narrow map), then the scaled test relation summarized
    // through the playbook's integer-unit quantization. At 100 TB the exact
    // percentile is the one sort-shaped cost and runs on the train split
    // once; percentile_approx (q96) is the stated fallback when even that
    // pass must be one-shot mergeable.
    // Benford first-digit audit — the forensic data-quality screen
    // (fabricated or unit-mangled monetary columns fail it): the observed
    // first-significant-digit distribution of order totals vs Benford's
    // log10(1 + 1/d) expectation, graded by a chi-square-style statistic
    // kept ENTIRELY in integer ppm units — obs_ppm from exact counts,
    // exp_ppm from the one scalar log10 per digit (the q19 scalar-parity
    // posture: a single libm call on identical literals, rounded to ppm
    // before any arithmetic), and chi2_e6 = Σ (obs−exp)²//exp over the
    // nine digit rows — so no float ever crosses a row boundary. Scale:
    // one 9-group census over a derived column.
    QueryDef("q274_benford",
      """WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |             AS cents FROM orders),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |        AS digit FROM c WHERE cents > 0),
        |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
        |      GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o),
        |g AS (SELECT unnest(range(1, 10)) AS digit),
        |r AS (SELECT g.digit, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
        |        CAST(coalesce(o.n, 0) * 1000000 // t.total AS BIGINT)
        |          AS obs_ppm,
        |        CAST(round(log10(1 + 1 / CAST(g.digit AS DOUBLE)) * 1000000,
        |          0) AS BIGINT) AS exp_ppm
        |      FROM g LEFT JOIN o ON o.digit = g.digit, t),
        |x AS (SELECT CAST(sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
        |               // exp_ppm) AS BIGINT) AS chi2_e6 FROM r)
        |SELECT r.digit, r.n, r.obs_ppm, r.exp_ppm, x.chi2_e6
        |FROM r, x ORDER BY r.digit""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .where(col("cents") > 0)
        .select(expr("cast(substr(cast(cents as string), 1, 1) as bigint)")
          .as("digit"))
      val o = c.groupBy("digit").agg(count(lit(1)).as("n"))
      val t = o.agg(sum("n").as("total"))
      val g = s.range(1, 10).select(col("id").as("digit"))
      val r = g.join(o, Seq("digit"), "left")
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
        .crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div total").as("obs_ppm"),
          round(log10(lit(1) + lit(1) / col("digit").cast("double")) * 1000000,
            0).cast("long").as("exp_ppm"))
      val x = r.agg(sum(expr(
        "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm"))
        .as("chi2_e6"))
      r.crossJoin(broadcast(x))
        .select("digit", "n", "obs_ppm", "exp_ppm", "chi2_e6")
        .orderBy("digit")
    },

    // Gini coefficient + Lorenz deciles — the inequality census every
    // marketplace/spend dashboard carries: per-customer order totals in
    // exact cents, ranked ascending with id tie-break, Gini from the
    // closed form (2·Σ rank·xᵢ − (n+1)·Σx) / (n·Σx) in pure BIGINT
    // arithmetic (numerator non-negative by the ascending sort, so
    // truncating division is unambiguous), and the Lorenz curve sampled
    // at the decile boundaries — cumulative spend share of the bottom
    // 10%..100% in ppm. Scale: one keyed aggregate + one global sort of
    // the k-row per-customer relation (the sorted-rank shape GlobalRank
    // exists for when the relation is corpus-sized).
    QueryDef("q275_gini",
      """WITH u AS (SELECT o_custkey AS c,
        |             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |               AS BIGINT) AS cents
        |           FROM orders GROUP BY o_custkey),
        |r AS (SELECT c, cents,
        |        row_number() OVER (ORDER BY cents, c) AS rk FROM u),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(cents) AS BIGINT) AS tot,
        |             CAST(sum(rk * cents) AS BIGINT) AS rs FROM r),
        |gini AS (SELECT n, tot,
        |           CAST(CAST(2 * rs - (n + 1) * tot AS HUGEINT) * 1000000
        |             // (n * tot) AS BIGINT) AS gini_ppm FROM t),
        |cumall AS (SELECT rk,
        |             CAST(sum(cents) OVER (ORDER BY rk) AS BIGINT) AS cum
        |           FROM r),
        |bnd AS (SELECT k, (k * t.n) // 10 AS brk
        |        FROM (SELECT unnest(range(1, 11)) AS k) ks, t)
        |SELECT CAST(b.k AS BIGINT) AS decile,
        |       CAST(CAST(c.cum AS HUGEINT) * 1000000 // g.tot AS BIGINT)
        |         AS cum_share_ppm,
        |       g.n, g.tot AS total_cents, g.gini_ppm
        |FROM bnd b JOIN cumall c ON c.rk = b.brk, gini g
        |ORDER BY decile""".stripMargin) { (s, d) =>
      val u = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("c"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      // customers are row-scale, so BOTH the rank and the Lorenz cumsum run
      // as ONE two-pass PrefixSum zip (round 13) — the oracle keeps the
      // plain row_number/sum windows: total order + associative integer
      // sum make the strategies bit-identical
      val r = graft.operators.PrefixSum.cumsum(u,
          Seq(col("cents"), col("c")), "cents",
          inclusive = true, sumName = "cum", rnName = Some("rk"))
        .persist() // totals + the decile probe share it
      val t = r.agg(count(lit(1)).as("n"), sum("cents").as("tot"),
        sum(col("rk") * col("cents")).as("rs"))
      // the ×1e6 products exceed BIGINT at sf0.1 scale — widened to
      // DECIMAL(38,0) on this side, HUGEINT in the oracle
      val gini = t.select(col("n"), col("tot"),
        expr("cast(cast(2 * rs - (n + 1) * tot as decimal(38,0)) * 1000000" +
          " div (n * tot) as bigint)").as("gini_ppm"))
      val cumall = r.select(col("rk"), col("cum"))
      val bnd = s.range(1, 11).select(col("id").as("k"))
        .crossJoin(broadcast(t.select(col("n").as("tn"))))
        .select(col("k"), expr("(k * tn) div 10").as("brk"))
      bnd.join(cumall, col("rk") === col("brk"))
        .crossJoin(broadcast(gini))
        .select(col("k").as("decile"),
          expr("cast(cast(cum as decimal(38,0)) * 1000000 div tot as bigint)")
            .as("cum_share_ppm"),
          col("n"), col("tot").as("total_cents"), col("gini_ppm"))
        .orderBy("decile")
    },

    // Recursive CTE — the SQL surface Spark only grew in 4.x (WITH
    // RECURSIVE, SPARK-24497): hierarchy traversal that no fixed-depth
    // join chain expresses, run through spark.sql against the SAME
    // recursive formulation DuckDB executes. The hierarchy is derived and
    // deterministic — parent(custkey) = custkey div 10, a 10-ary tree
    // rooted at the single-digit keys — so both engines walk identical
    // chains (every div-10 ancestor ≥ 1 is a real customer: keys are
    // dense from 1). Per customer the recursion yields its depth, root,
    // and the exact-cents account-balance sum along its ancestor chain;
    // the output is the (root, depth) rollup. Dialect note: the ONLY
    // difference between the two texts is integer division (`div` vs
    // `//`) — both truncate. Scale: Spark executes the recursion as
    // iterative UnionLoop steps, each an equi-join against the dense key
    // range — depth is log₁₀(maxkey), so 6 rounds at 1e6 customers.
    QueryDef("q272_recursive_cte",
      """WITH RECURSIVE rec(k, node, depth) AS (
        |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT k, node // 10, depth + 1 FROM rec WHERE node // 10 >= 1),
        |per AS (
        |  SELECT r.k, CAST(max(r.depth) AS BIGINT) AS depth,
        |         CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT))
        |           AS BIGINT) AS chain_cents,
        |         CAST(min(CASE WHEN r.node < 10 THEN r.node END) AS BIGINT)
        |           AS root
        |  FROM rec r JOIN customer c ON c.c_custkey = r.node
        |  GROUP BY r.k)
        |SELECT root, depth, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(chain_cents) AS BIGINT) AS chain_cents
        |FROM per GROUP BY root, depth ORDER BY root, depth""".stripMargin) {
      (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q272_customer")
      s.sql(
        """WITH RECURSIVE rec(k, node, depth) AS (
          |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
          |  FROM q272_customer
          |  UNION ALL
          |  SELECT k, node div 10, depth + 1 FROM rec WHERE node div 10 >= 1),
          |per AS (
          |  SELECT r.k, CAST(max(r.depth) AS BIGINT) AS depth,
          |         CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT))
          |           AS BIGINT) AS chain_cents,
          |         CAST(min(CASE WHEN r.node < 10 THEN r.node END) AS BIGINT)
          |           AS root
          |  FROM rec r JOIN q272_customer c ON c.c_custkey = r.node
          |  GROUP BY r.k)
          |SELECT root, depth, CAST(count(*) AS BIGINT) AS n_customers,
          |       CAST(sum(chain_cents) AS BIGINT) AS chain_cents
          |FROM per GROUP BY root, depth ORDER BY root, depth""".stripMargin)
    },

    QueryDef("q193_robust_scaler",
      s"""WITH train AS (
         |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
         |  FROM orders WHERE ${Split.assignSplitSql("o_orderkey", 21)} = 'train'),
         |stats AS (
         |  SELECT quantile_cont(c, 0.5) AS med,
         |         quantile_cont(c, 0.75) - quantile_cont(c, 0.25) AS iqr
         |  FROM train),
         |test AS (
         |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
         |  FROM orders WHERE ${Split.assignSplitSql("o_orderkey", 21)} = 'test'),
         |q AS (SELECT CAST(round((c - med) / iqr * 1000000, 0) AS BIGINT) AS qv,
         |             (c - med) / iqr AS v
         |      FROM test, stats)
         |SELECT count(*) AS n, round(med, 6) AS med, round(iqr, 6) AS iqr,
         |       round(CAST(sum(qv) AS DOUBLE) / count(*)
         |             / CAST(1000000 AS DOUBLE), 6) AS avg_s,
         |       round(min(v), 6) AS min_s, round(max(v), 6) AS max_s
         |FROM q, stats GROUP BY med, iqr""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
        .withColumn("split", Split.assignSplit(col("o_orderkey"), 21))
        .withColumn("c", round(col("o_totalprice") * 100, 0).cast("long"))
      val st = orders.where(col("split") === "train")
        .agg(expr("percentile(c, 0.5)").as("med"),
          (expr("percentile(c, 0.75)") - expr("percentile(c, 0.25)")).as("iqr"))
        .head()
      val (med, iqr) = (st.getDouble(0), st.getDouble(1))
      val v = (col("c") - lit(med)) / lit(iqr)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      orders.where(col("split") === "test")
        .select(v.as("v"),
          round(v * 1000000d, 0).cast("long").cast(dec).as("qv"))
        .agg(count(lit(1)).as("n"),
          round(lit(med), 6).as("med"), round(lit(iqr), 6).as("iqr"),
          round(sum("qv").cast("double") / count(lit(1))
            / lit(1000000).cast("double"), 6).as("avg_s"),
          round(min("v"), 6).as("min_s"), round(max("v"), 6).as("max_s"))
    }
  )
}

/** Oracle SQL bodies too long to inline comfortably. */
private object SurvivalSql {
  val sql: String =
    """WITH scored AS (
      |  SELECT CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS c0f,
      |         (l_discount * 10 + l_quantity / 50.0 + l_tax * 12.5) / 3 AS p
      |  FROM lineitem WHERE l_quantity >= 5 AND l_quantity < 45),
      |binned AS (
      |  SELECT LEAST(GREATEST(CAST(floor(p * 1000) AS BIGINT), 0), 999) AS bin,
      |         count(*) FILTER (WHERE c0f = 1) AS c0,
      |         count(*) FILTER (WHERE c0f = 0) AS c1
      |  FROM scored GROUP BY 1),
      |bins AS (SELECT unnest(range(0, 1000)) AS bin),
      |dense AS (
      |  SELECT b.bin, CAST(coalesce(c0, 0) AS BIGINT) AS c0,
      |         CAST(coalesce(c1, 0) AS BIGINT) AS c1
      |  FROM bins b LEFT JOIN binned USING (bin)),
      |cum AS (
      |  SELECT bin,
      |         sum(c0) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
      |         sum(c1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |         sum(c0) OVER () AS tot0, sum(c1) OVER () AS tot1
      |  FROM dense)
      |SELECT bin,
      |       round(CAST(bin + 1 AS DOUBLE) / 1000, 9) AS right_edge,
      |       round(CAST(cum0 AS DOUBLE) / tot0, 9) AS survived_0_frac,
      |       round(CAST(cum1 AS DOUBLE) / tot1, 9) AS survived_1_frac
      |FROM cum ORDER BY bin""".stripMargin
}

private object RotationSql {
  import graft.operators.Split
  private def branch(k: Int): String = {
    val sign = (a: String, neg: Boolean) => if (neg) s"-$a" else a
    val x  = sign("l_extendedprice", k == 1 || k == 2)
    val y  = sign("l_quantity", k == 2 || k == 3)
    val az = s"((l_discount * 3600 + ${90.0 * k}) % 360)"
    s"""SELECT $k AS n90, $x AS x, $y AS y, $az AS az FROM lineitem
       |WHERE ${Split.sampleSql("l_orderkey * 10 + l_linenumber", 21 + k, 30)}""".stripMargin
  }
  val sql: String =
    s"""WITH all_rows AS (
       |  SELECT 0 AS n90, l_extendedprice AS x, l_quantity AS y,
       |         l_discount * 3600 AS az FROM lineitem
       |  UNION ALL ${branch(1)}
       |  UNION ALL ${branch(2)}
       |  UNION ALL ${branch(3)})
       |SELECT n90, count(*) AS n,
       |       CAST(sum(CAST(round(x * 100, 0) AS BIGINT)) AS BIGINT) AS x_cents,
       |       CAST(sum(CAST(round(az * 100, 0) AS BIGINT)) AS BIGINT) AS az_cents
       |FROM all_rows GROUP BY n90 ORDER BY n90""".stripMargin
}
