package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Pq
import graft.functions.Tensors
object TmpPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         iters <- Seq(1, 2)) {
      val emb = Tables.embeddings(spark, sf)
      val cb = Pq.fit(emb, "vec_id", "embedding", 64, 8, 16, iters)
      val codes = Pq.encode(emb, "vec_id", "embedding", cb).persist()
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      val tables = Pq.adcTables(spark, queries, cb)
      val qdf = queries.toDF("qid", "qv")
      val exact = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
        .crossJoin(broadcast(qdf)).where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), round(Tensors.distSq(col("x"), col("qv")), 6).as("d2"))
        .withColumn("rank", row_number().over(Window.partitionBy("qid").orderBy(col("d2"), col("vec_id"))))
        .where(col("rank") <= 10).persist()
      for (sl <- Seq(10, 50, 100)) {
        val pq = Pq.adcTopK(codes, tables, sl, excludeSelf = true)
        val hits = pq.join(exact.select(col("qid").as("query_id"), col("vec_id").as("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
          .orderBy("query_id").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        println(s"PROBE sf=$sf iters=$iters shortlist=$sl hits10=[$hits]")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
