package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin
import graft.plans.NativeAsof

/** The custom LogicalPlan → Strategy → SparkPlan as-of join: literal-frame
  * semantics, payload attachment, null handling, partition-boundary safety
  * (keys scattered across many shuffle partitions), and full parity with
  * the compositional operators/AsofJoin on the events fixture.
  */
class NativeAsofSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("literal semantics: at-or-before match, payload attached, nulls kept") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"),
      (2L, 10L, "other"), (3L, 10L, "nokey"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 7L, 70L), (1L, 10L, 100L), (1L, 15L, 150L),
      (2L, 11L, 110L))
      .toDF("rk", "rt", "pay")
    val out = NativeAsof.join(l, r, "k", "rk", "t", "rt")
      .select("k", "t", "tag", "rt", "pay").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4))).toSet
    assert(out == Set(
      (1L, 10L, "a", 10L, 100L),     // tie at 10 matches (at-or-before)
      (1L, 20L, "b", 15L, 150L),     // latest ≤ 20
      (1L, 5L, "early", -1L, -1L),   // nothing precedes
      (2L, 10L, "other", -1L, -1L),  // right row is later
      (3L, 10L, "nokey", -1L, -1L))) // key absent on right
  }

  test("null keys and times never match; left rows survive") {
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), 1L), (None.asInstanceOf[Option[Long]], Some(1L), 2L))
      .toDF("rk", "rt", "pay")
    val out = NativeAsof.join(l, r, "k", "rk", "t", "rt").collect()
    assert(out.length == 3)
    val matched = out.filter(!_.isNullAt(4))
    assert(matched.length == 1 && matched.head.getLong(4) == 1L)
  }

  test("partition boundaries: many keys across many shuffle partitions") {
    val n = 2000
    val l = (0 until n).map(i => (i.toLong % 97, i.toLong * 3 + 1)).toDF("k", "t")
    val r = (0 until n).map(i => (i.toLong % 97, i.toLong * 3)).toDF("rk", "rt")
      .withColumn("pay", col("rt") * 10)
    val out = NativeAsof.join(l, r, "k", "rk", "t", "rt")
    // brute-force truth via SQL join
    val truth = l.as("l").join(r.as("r"),
        col("l.k") === col("r.rk") && col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"))
      .agg(max("r.rt").as("want_rt"))
    val cmp = out.join(truth, Seq("k", "t"))
      .where(!(col("rt") <=> col("want_rt")))
    assert(cmp.count() == 0)
    assert(out.count() == n)
  }

  test("parity with the compositional AsofJoin on the events fixture") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "us")
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id").as("v_uid"), col("us").as("v_us"))
      .agg(count(lit(1)).as("nv")) // unique (key, time) rows
    val native = NativeAsof.join(purchases, views,
        "user_id", "v_uid", "us", "v_us")
      .select(col("event_id"), col("v_us"))
    val composed = AsofJoin.asof(purchases,
        views.select(col("v_uid").as("user_id"), col("v_us")),
        Seq("user_id"), col("us"), col("v_us"), "asof_us")
      .select(col("event_id"), col("asof_us"))
    val diff = native.join(composed, "event_id")
      .where(!(col("v_us") <=> col("asof_us")))
    assert(diff.count() == 0)
    assert(native.count() == purchases.count())
  }

  test("custom rule pushes left-only filters below the as-of join") {
    val l = Seq((1L, 10L, 5L)).toDF("k", "t", "extra")
    val r = Seq((1L, 5L, 7L)).toDF("rk", "rt", "pay")
    val q = NativeAsof.join(l, r, "k", "rk", "t", "rt")
      .where(col("extra") > 1 && col("pay") > 0) // left-only + right-ref
    val opt = q.queryExecution.optimizedPlan
    // the left-only predicate must sit BELOW the join...
    val aj = opt.collectFirst {
      case p: graft.plans.AsofJoinPlan => p
    }.getOrElse(fail(s"no AsofJoinPlan in:\n$opt"))
    assert(aj.left.toString.contains("extra"),
      s"left-only filter not pushed below the join:\n$opt")
    // ...and the right-referencing one must stay above (pushing it would
    // change which right row is latest-at-or-before)
    assert(!aj.right.toString.contains("pay > "),
      s"right filter must not push:\n$opt")
    assert(q.collect().length == 1)
  }

  test("the physical plan is the native exec with two exchanges") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val plan = NativeAsof.join(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
  }

  test("composite key: key-boundary and null-component semantics") {
    // (k1, k2) tuples where single-key-on-k1 would cross-match
    val l = Seq((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b"), (2L, 1L, 10L, "c"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((1L, 1L, 5L, 100L), (1L, 2L, 7L, 200L), (2L, 2L, 1L, 300L))
      .toDF("rk1", "rk2", "rt", "pay")
    val out = NativeAsof.joinMulti(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"),
        "t", "rt").select("tag", "pay").collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(out == Set(("a", 100L), ("b", 200L), ("c", -1L)))

    // null in ANY key component never matches, left row survives
    val ln = Seq((Some(1L), Some(1L), Some(10L)), (Some(1L), None, Some(10L)))
      .toDF("k1", "k2", "t")
    val outN = NativeAsof.joinMulti(ln, r, Seq("k1", "k2"), Seq("rk1", "rk2"),
      "t", "rt").collect()
    assert(outN.length == 2)
    assert(outN.count(!_.isNullAt(6)) == 1)
  }

  test("composite key agrees with a brute-force window across partitions") {
    val n = 2000
    val l = (0 until n).map(i => (i.toLong % 13, i.toLong % 7, i.toLong * 3 + 1))
      .toDF("k1", "k2", "t")
    val r = (0 until n).map(i => (i.toLong % 13, i.toLong % 7, i.toLong * 3))
      .toDF("rk1", "rk2", "rt").withColumn("pay", col("rt") * 10)
      .distinct()
    val out = NativeAsof.joinMulti(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"),
      "t", "rt")
    val truth = l.as("l").join(r.as("r"),
        col("l.k1") === col("r.rk1") && col("l.k2") === col("r.rk2") &&
          col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.k1").as("k1"), col("l.k2").as("k2"), col("l.t").as("t"))
      .agg(max("r.rt").as("want_rt"))
    val cmp = out.join(truth, Seq("k1", "k2", "t"))
      .where(!(col("rt") <=> col("want_rt")))
    assert(cmp.count() == 0)
    assert(out.count() == n)
  }

  test("tolerance inside the exec nulls stale matches, keeps fresh ones") {
    val l = Seq((1L, 100L, "fresh"), (1L, 200L, "stale"), (1L, 50L, "none"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, 900L)).toDF("rk", "rt", "pay")
    val out = NativeAsof.joinMulti(l, r, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(20L))
      .select("tag", "pay").collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    // t=100: 100-90=10 ≤ 20 → match; t=200: 110 > 20 → nulled in-cursor;
    // t=50: no at-or-before row at all
    assert(out == Set(("fresh", 900L), ("stale", -1L), ("none", -1L)))
    // and the tolerance path must equal the compose-then-filter formulation
    val post = NativeAsof.join(l, r, "k", "rk", "t", "rt")
      .select(col("tag"),
        when(col("t") - col("rt") <= 20L, col("pay")).as("pay")).collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(out == post)
  }

  test("assertUniqueRight raises on duplicate (keys, time) right rows") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val dup = Seq((1L, 5L, 100L), (1L, 5L, 200L)).toDF("rk", "rt", "pay")
      .coalesce(1) // both duplicates in one partition so the cursor sees them
    val ex = intercept[org.apache.spark.SparkException] {
      NativeAsof.joinMulti(l, dup, Seq("k"), Seq("rk"), "t", "rt",
        assertUniqueRight = true).collect()
    }
    assert(ex.getMessage.contains("duplicate") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate")))
    // unique right side passes with the assertion on
    val ok = Seq((1L, 5L, 100L), (1L, 6L, 200L)).toDF("rk", "rt", "pay")
    val out = NativeAsof.joinMulti(l, ok, Seq("k"), Seq("rk"), "t", "rt",
      assertUniqueRight = true).collect()
    assert(out.length == 1 && out.head.getLong(4) == 200L)
  }

  test("string keys: dictionary encode, unseen-right symbol, null symbol") {
    val l = Seq((Option("AAPL"), 10L, "a"), (Option("AAPL"), 3L, "early"),
      (Option("MSFT"), 10L, "m"), (Option("NVDA"), 10L, "unseen"),
      (Option.empty[String], 10L, "nullsym"))
      .toDF("sym", "t", "tag")
    val r = Seq(("AAPL", 5L, 50L), ("AAPL", 9L, 90L), ("MSFT", 10L, 100L),
      ("TSLA", 1L, 10L)) // TSLA never probed; NVDA never quoted
      .toDF("rsym", "rt", "pay")
    val out = NativeAsof.joinMulti(l, r, Seq("sym"), Seq("rsym"), "t", "rt")
    // output schema: encode temp columns must NOT leak
    assert(out.columns.toSeq == Seq("sym", "t", "tag", "rsym", "rt", "pay"))
    val got = out.collect().map(x => (x.getString(2),
      if (x.isNullAt(5)) -1L else x.getLong(5))).toSet
    assert(got == Set(("a", 90L), ("early", -1L), ("m", 100L),
      ("unseen", -1L), ("nullsym", -1L)))
  }

  test("string keys compose with composite keys, tolerance and uniqueness") {
    // (symbol, venue) both VARCHAR — two encoded positions; tolerance 4
    val l = Seq(("A", "X", 10L), ("A", "Y", 10L), ("B", "X", 10L))
      .toDF("sym", "ven", "t")
    val r = Seq(("A", "X", 8L, 80L), ("A", "Y", 2L, 20L), ("B", "X", 10L, 100L))
      .toDF("rsym", "rven", "rt", "pay")
    val out = NativeAsof.joinMulti(l, r, Seq("sym", "ven"),
        Seq("rsym", "rven"), "t", "rt",
        tolerance = Some(4L), assertUniqueRight = true)
      .collect().map(x => (x.getString(0), x.getString(1),
        if (x.isNullAt(6)) -1L else x.getLong(6))).toSet
    // (A,Y)'s only quote is 8 ticks stale → tolerance nulls it
    assert(out == Set(("A", "X", 80L), ("A", "Y", -1L), ("B", "X", 100L)))
  }

  test("string keys agree with a brute-force window across partitions") {
    val n = 1500
    val l = (0 until n).map(i => (s"S${i % 53}", i.toLong * 3 + 1)).toDF("sym", "t")
    val r = (0 until n).map(i => (s"S${i % 53}", i.toLong * 3)).toDF("rsym", "rt")
      .withColumn("pay", col("rt") * 7)
    val out = NativeAsof.joinMulti(l, r, Seq("sym"), Seq("rsym"), "t", "rt")
    val truth = l.as("l").join(r.as("r"),
        col("l.sym") === col("r.rsym") && col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.sym").as("sym"), col("l.t").as("t"))
      .agg(max("r.rt").as("want_rt"))
    val bad = out.join(truth, Seq("sym", "t"))
      .where(!(col("rt") <=> col("want_rt"))).count()
    assert(bad == 0)
    assert(out.count() == n)
  }
}
