package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memory-pressure witness (SCALE.md "Spill" posture, r7 verdict #8): the
  * 100 TB claim assumes operators degrade to spill, not to OOM, when
  * execution memory runs short. This main runs the heaviest headline
  * queries plus a deliberately oversized global sort/aggregate under
  * whatever heap the caller constrains the JVM to (e.g.
  * `set run/javaOptions += "-Xmx2g"`), records per-query
  * memory/disk spill from task metrics, and prints one JSON line per
  * query plus a summary. The witness passes when every query completes
  * (no OOM) and the oversized shapes show `spill_disk > 0` — proof the
  * spill paths engage rather than being dead code under the test heap.
  */
object SpillWitness {

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The m×-unioned lineitem (the ScaleProbe construction) — a global
    * sort and a wide aggregation sized to overflow a small heap's
    * execution memory, guaranteeing the spill paths are exercised.
    */
  private def li10(spark: SparkSession, sfDir: String,
                   mult: Int = 10): DataFrame = {
    val base = Tables.lineitem(spark, sfDir)
    (0 until mult).map(k =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 10_000_000L)))
      .reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-spill-witness")
    spark.sparkContext.setLogLevel("ERROR")
    val mem = new AtomicLong
    val disk = new AtomicLong
    val peak = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            mem.addAndGet(m.memoryBytesSpilled): Unit
            disk.addAndGet(m.diskBytesSpilled): Unit
            peak.getAndAccumulate(m.peakExecutionMemory, math.max): Unit
          }
        }
      })
    def snapshot(): (Long, Long) = {
      var prev = (mem.get, disk.get)
      var i = 0
      while (i < 12) {
        Thread.sleep(25)
        val cur = (mem.get, disk.get)
        if (cur == prev) return cur
        prev = cur; i += 1
      }
      prev
    }
    val qs = SparkEntry.queries
    val heavies = Seq("q266_nsw_scalable", "q230_hits", "q254_timer_sessions",
      "q81_pagerank", "q61_dedup_components")
    // the oversized shapes run at few-and-fat shuffle partitions — spill
    // pressure is per-PARTITION memory, so 2 partitions of a 30x union is
    // what guarantees the sorter/aggregator overflows a 2 GiB heap
    def fat(name: String, mk: () => DataFrame): (String, () => DataFrame) =
      name -> (() => {
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try mk() finally () // restored after materialize by the caller loop
      })
    val synthetic: Seq[(String, () => DataFrame)] = Seq(
      fat("sort30x", () => li10(spark, sfDir, 30).orderBy("l_extendedprice",
        "l_orderkey", "l_linenumber")),
      fat("agg30x", () => li10(spark, sfDir, 30)
        .groupBy("l_orderkey", "l_partkey", "l_suppkey")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          collect_list("l_shipdate").as("dates"))))
    val runs: Seq[(String, () => DataFrame)] =
      heavies.map(n => n -> (() => qs(n)(spark, sfDir))) ++ synthetic
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    println(f"""{"witness":"spill","heap_gb":$heapGb%.2f}""")
    var anySpill = false
    var allOk = true
    runs.foreach { case (name, mk) =>
      val s0 = snapshot()
      val t0 = System.nanoTime()
      val ok =
        try { materialize(mk()); true }
        catch { case e: Throwable =>
          System.err.println(s"[spill] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val s1 = snapshot()
      spark.catalog.clearCache()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val (dm, dd) = (s1._1 - s0._1, s1._2 - s0._2)
      if (dd > 0) anySpill = true
      if (!ok) allOk = false
      println(f"""{"query":"$name","ok":$ok,"sec":${math.rint(dt * 100) / 100},"spill_mem_mb":${dm / 1048576},"spill_disk_mb":${dd / 1048576}}""")
    }
    println(s"""{"summary":"spill_witness","all_completed":$allOk,"any_disk_spill":$anySpill}""")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
