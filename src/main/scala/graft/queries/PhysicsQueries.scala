package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Physics, Tensors}

/** The reference's scalar math surface (SURVEY §2 rows 22-31) and array/tensor
  * surface (rows 32-37), exercised on fixture columns. Transcendental outputs
  * are rounded to 6 decimals — libm implementations differ in the last ulp
  * between the JVM and DuckDB, and 1e-6 sits ~9 orders of magnitude above that
  * noise while still proving the math.
  */
object PhysicsQueries {

  val defs: Seq[QueryDef] = Seq(

    // SURVEY §2 rows 23-24: spherical→cartesian and the inverse round-trip
    // (to_XY_astropy / to_R_astropy, create_train_valid_test_datasets.py:96-110).
    // Bench note (r6 verdict #6, CLOSED as "accept and document"): the
    // global ORDER BY here costs ~2.5 s of every sf0.1 bench — it is
    // CONTRACT-IMPOSED, not algorithmic. The driver's hash gate is only
    // provably order-insensitive for 1-row results (every multi-row query
    // that has ever passed carries a total ORDER BY; the 20 ORDER-BY-free
    // oracles in the catalog all return one row), so dropping the sort
    // would bet the correctness gate on unobservable driver internals to
    // save bench seconds. The math itself costs ~1 s; the sort's only
    // consumer is the row-order-deterministic hash contract.
    QueryDef("q19_spherical",
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_quantity AS zen, l_discount * 3600 AS az
        |  FROM lineitem),
        |c AS (
        |  SELECT l_orderkey, l_linenumber, zen,
        |         cos(radians(90 - zen)) * cos(radians(az)) AS dx,
        |         cos(radians(90 - zen)) * sin(radians(az)) AS dy,
        |         sin(radians(90 - zen)) AS dz
        |  FROM t)
        |SELECT l_orderkey, l_linenumber,
        |       round(dx, 6) + 0.0 AS dir_x, round(dy, 6) + 0.0 AS dir_y,
        |       round(dz, 6) + 0.0 AS dir_z,
        |       round(90 - degrees(atan2(sqrt(1 - dx*dx - dy*dy), sqrt(dx*dx + dy*dy))) - zen, 6) + 0.0 AS zen_roundtrip_err
        |FROM c ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val zen = col("l_quantity")
      val az  = col("l_discount") * 3600
      // The contract-imposed global sort (see bench note above) runs FIRST,
      // over the 4 raw input columns, and the trig projection computes
      // AFTER the range exchange — the exchange then carries ~28 B/row of
      // inputs instead of ~44 B/row of derived doubles (guide §2.3 "project
      // before the exchange", applied in reverse: defer the widening
      // projection past it). Sort keys are raw columns, the projection is
      // deterministic per row, row order and values are identical.
      val base = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey"), col("l_linenumber"), zen.as("zen"),
          Physics.dirX(zen, az).as("dx"), Physics.dirY(zen, az).as("dy"),
          Physics.dirZ(zen).as("dz"))
      // `round(x, 6) + 0.0` on BOTH engines: the fixture azimuths are exact
      // multiples of 36°, so cos/sin land at ±1e-16-scale values whose round(·,6)
      // yields −0.0 on one libm and +0.0 on the other. IEEE −0.0 + 0.0 = +0.0
      // normalizes the sign while leaving every other value untouched.
      base.select(
        col("l_orderkey"), col("l_linenumber"),
        (round(col("dx"), 6) + lit(0.0)).as("dir_x"),
        (round(col("dy"), 6) + lit(0.0)).as("dir_y"),
        (round(col("dz"), 6) + lit(0.0)).as("dir_z"),
        (round(Physics.zenithOf(col("dx"), col("dy")) - col("zen"), 6) + lit(0.0))
          .as("zen_roundtrip_err"))
    },

    // SURVEY §2 rows 28,45: logistic head as a pure expression —
    // sigmoid over a literal-folded linear score (train_classification.py:282).
    // ULP-HARDENED (round 12): the linear score z is pure IEEE float
    // arithmetic (bit-identical on both engines), quantized ONCE to e12,
    // and the sigmoid runs as IntExp's integer step chain — no libm exp in
    // the comparison path; p is the e6 grid value as a double.
    QueryDef("q20_sigmoid_score", {
      val zSql = "CAST(round((-2.0 + l_discount * 10 * 4.0" +
        " + l_quantity / 50.0 * 1.0) * 1000000000000) AS BIGINT)"
      val inner = graft.functions.IntExp.duckSigmoidE6(
        s"SELECT l_orderkey, l_linenumber, $zSql AS z FROM lineitem", "z")
      s"""SELECT l_orderkey, l_linenumber,
         |       CAST(p_e6 AS DOUBLE) / 1000000 AS p
         |FROM ($inner) ORDER BY l_orderkey, l_linenumber""".stripMargin
    }) { (s, d) =>
      val z = Physics.linearScore(-2.0,
        Seq(col("l_discount") * 10 -> 4.0, col("l_quantity") / 50.0 -> 1.0))
      val base = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(z * 1000000000000L, 0).cast("long").as("z"))
      base
        .withColumn("p_e6", graft.functions.IntExp.sigmoidE6Col(col("z")))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("p_e6").cast("double") / 1000000).as("p"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // SURVEY §2 row 29: class-weight derivation (1/count, ×80 boost on one
    // class — train_classification.py:234-236).
    QueryDef("q21_class_weights",
      """SELECT l_returnflag, count(*) AS n, 1.0 / count(*) AS w,
        |       CASE WHEN l_returnflag = 'R' THEN (1.0 / count(*)) * 80
        |            ELSE 1.0 / count(*) END AS w_boosted
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          (lit(1.0) / col("n")).as("w"),
          when(col("l_returnflag") === "R", (lit(1.0) / col("n")) * 80)
            .otherwise(lit(1.0) / col("n")).as("w_boosted"))
        .orderBy("l_returnflag")
    },

    // SURVEY §2 row 30: timestamp formatting (time.strftime('%Y%m%d-%H%M%S'),
    // train_classification.py:241).
    QueryDef("q22_date_format",
      """SELECT strftime(o_orderdate, '%Y%m%d-%H%M%S') AS stamp, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyyMMdd-HHmmss").as("stamp"))
        .agg(count(lit(1)).as("n"))
        .orderBy("stamp")
    },

    // SURVEY §2 rows 8,31: scientific-notation metric formatting
    // (print_metrics, tools.py:7-12).
    QueryDef("q23_format_sci",
      """SELECT l_returnflag, printf('%.2e', avg(l_extendedprice)) AS avg_fmt,
        |       printf('%.2e', sum(l_quantity)) AS sum_fmt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(format_string("%.2e", avg(col("l_extendedprice"))).as("avg_fmt"),
          format_string("%.2e", sum(col("l_quantity"))).as("sum_fmt"))
        .orderBy("l_returnflag")
    },

    // SURVEY §2 rows 32,34,37 + the Generator surface (§2.11): 8×8 grid built
    // from a 64-dim embedding, rotated 90° (np.rot90,
    // create_train_valid_test_datasets.py:72-74), re-flattened and exploded to
    // (vec_id, pos, val) rows. Pure permutation — float values compare exactly.
    QueryDef("q24_rot90",
      """SELECT vec_id, CAST(p AS INT) AS pos,
        |       embedding[(p % 8) * 8 + 8 - (p // 8)] AS val
        |FROM embeddings, (SELECT unnest(range(0, 64)) AS p)
        |WHERE vec_id < 64
        |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
      // fused codegen permutation (rot90Flat); bit-equal to the nested
      // reshape→rot90→flatten HOF form it replaced (equivalence unit-tested)
      Tables.embeddings(s, d)
        .where(col("vec_id") < 64)
        .select(col("vec_id"),
          posexplode(Tensors.rot90Flat(col("embedding"), 8, 1)).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
    },

    // SURVEY §2 rows 35-36: one-hot encode + argmax recovery
    // (dataset.py:12, torch.argmax tools.py:26).
    QueryDef("q25_onehot_argmax",
      """SELECT vec_id, label,
        |       CAST(list_position(oh, list_max(oh)) - 1 AS INT) AS argmax_label,
        |       list_aggregate(oh, 'sum') AS oh_sum
        |FROM (SELECT vec_id, label,
        |             list_transform(range(0, 10),
        |               c -> CASE WHEN label = c THEN 1.0 ELSE 0.0 END) AS oh
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          Tensors.oneHot(col("label"), 10).as("oh"))
        .select(col("vec_id"), col("label"),
          Tensors.argmax(col("oh")).as("argmax_label"),
          aggregate(col("oh"), lit(0.0), (a, v) => a + v).as("oh_sum"))
        .orderBy("vec_id")
    }
  )
}
