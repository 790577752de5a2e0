package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ChannelStats
import graft.operators.{LinearSigmoidScorer, Multimodal, Scorer}

/** The ML-adjacent operator surface: the custom no-explode channel-stats
  * aggregate (SURVEY §4 #1), batched mapPartitions scoring (row 50), the
  * iterative LR fit (row 45), and multimodal binary decode plumbing.
  */
object MlQueries {

  val defs: Seq[QueryDef] = Seq(

    // SURVEY §2 rows 34,39 + §4 custom #1: single-pass per-dimension Welford
    // stats over the embedding array — no explode; the oracle *does* explode
    // (768× blowup is fine for DuckDB at sf0.01, not for Spark at 100 TB).
    QueryDef("q45_channel_stats",
      """SELECT CAST(i AS INT) AS dim,
        |       round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS mean,
        |       round(stddev_pop(CAST(embedding[i + 1] AS DOUBLE)), 6) AS stddev,
        |       round(min(CAST(embedding[i + 1] AS DOUBLE)), 6) AS min,
        |       round(max(CAST(embedding[i + 1] AS DOUBLE)), 6) AS max
        |FROM embeddings, (SELECT unnest(range(0, 64)) AS i)
        |GROUP BY i ORDER BY dim""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .agg(ChannelStats.channelStats(col("embedding"), 64).as("stats"))
        .select(posexplode(col("stats")).as(Seq("dim", "st")))
        .select(col("dim"),
          round(col("st.mean"), 6).as("mean"),
          round(col("st.stddev"), 6).as("stddev"),
          round(col("st.min"), 6).as("min"),
          round(col("st.max"), 6).as("max"))
        .orderBy("dim")
    },

    // SURVEY §2 row 50: batched mapPartitions scoring behind the BatchScorer
    // trait — the CNN-inference stand-in with a linear kernel, so the oracle
    // can replay it in SQL exactly.
    QueryDef("q46_mappartitions_score",
      """SELECT l_orderkey AS key1, l_linenumber AS key2,
        |       round(1 / (1 + exp(-(-2.0 + 4.0 * (l_discount * 10) + 1.0 * (l_quantity / 50.0)))), 6) AS score
        |FROM lineitem ORDER BY key1, key2""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          array(col("l_discount") * 10, col("l_quantity") / 50.0).as("features"))
        .as[(Long, Int, Array[Double])]
      Scorer.scoreKeyed(ds, LinearSigmoidScorer(-2.0, Array(4.0, 1.0)))
        .select(col("key1"), col("key2"), round(col("score"), 6).as("score"))
        .orderBy("key1", "key2")
    },

    // Multimodal plumbing: binary media column + metadata → batched decode
    // via mapPartitions (decode kernel stubbed; plumbing real).
    QueryDef("q47_multimodal_decode",
      """SELECT doc_id AS media_id, CAST(length(text) AS INT) AS n_bytes,
        |       ascii(substr(text, 1, 1)) AS first_byte,
        |       CAST(list_aggregate(list_transform(range(1, LEAST(16, length(text)) + 1),
        |         i -> ascii(substr(text, i, 1))), 'sum') AS BIGINT) AS byte_sum16
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.asMediaTable(Tables.documents(s, d))
      Multimodal.decodeFeatures(media, Multimodal.FakeByteDecoder)
        .orderBy("media_id")
    },

    // SURVEY §2 rows 4-5: partitioned parquet sink + re-scan, and the
    // fitted-statistics relation persisted and reloaded (stats are *data* —
    // SURVEY §7.4.4). The oracle computes the same result without the
    // roundtrip, so the check proves write→read fidelity.
    QueryDef("q49_sink_roundtrip",
      s"""WITH o AS (SELECT o_totalprice,
         |             ${graft.operators.Split.assignSplitSql("o_orderkey", 21)} AS split
         |           FROM orders),
         |stats AS (SELECT avg(ln(o_totalprice + 1)) AS mu,
         |                 stddev_pop(ln(o_totalprice + 1)) AS sigma
         |          FROM o WHERE split = 'train')
         |SELECT split, count(*) AS n,
         |       round(avg((ln(o_totalprice + 1) - mu) / sigma), 6) AS avg_s
         |FROM o, stats GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      import graft.operators.{ScalerPipeline, Split}
      val out = "/tmp/graft_roundtrip_" + new java.io.File(d).getName
      Tables.orders(s, d)
        .withColumn("split", Split.assignSplit(col("o_orderkey"), 21))
        .write.mode("overwrite").partitionBy("split").parquet(s"$out/orders")
      val reread = s.read.parquet(s"$out/orders")
      val stats = ScalerPipeline.fit(
        reread.where(col("split") === "train"),
        Seq("o_totalprice" -> ScalerPipeline.Log1pStandard))
      ScalerPipeline.save(s, stats, s"$out/stats")
      val loaded = ScalerPipeline.load(s, s"$out/stats")
      ScalerPipeline.apply(reread, loaded)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          round(avg("o_totalprice_scaled"), 6).as("avg_s"))
        .orderBy("split")
    },

    // SURVEY §2 row 45: iterative logistic-regression fit (spark.ml,
    // driver-coordinated treeAggregate loop). Weights become data; training
    // itself is not SQL-expressible → rows-only check.
    QueryDef.rowsOnly("q48_lr_fit") { (s, d) =>
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.feature.VectorAssembler
      val data = Tables.lineitem(s, d).select(
        (col("l_discount") * 10).as("f0"),
        (col("l_quantity") / 50.0).as("f1"),
        when(col("l_linestatus") === "O", 1.0).otherwise(0.0).as("label"))
      val assembled = new VectorAssembler()
        .setInputCols(Array("f0", "f1")).setOutputCol("features")
        .transform(data)
      val model = new LogisticRegression()
        .setMaxIter(10).setRegParam(0.1).setStandardization(false)
        .fit(assembled)
      import s.implicits._
      // weights exported as a stats relation (SURVEY §7.4.5) — inference can
      // then run as the pure expression of q20/q46
      (model.coefficients.toArray.zipWithIndex.map { case (w, i) => (s"w_$i", w) }
        :+ ("bias", model.intercept)).toSeq.toDF("param", "value")
    }
  )
}
