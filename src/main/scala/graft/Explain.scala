package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of named queries.
  * Usage: runMain graft.Explain <query name substrings> [--sf <dir>]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.sliding(2).collectFirst { case Array("--sf", d) => d }
      .getOrElse("/root/testdata/sf0.001")
    val names = args.filterNot(_.startsWith("--")).filterNot(_ == sfDir)
    val spark = GraftSession.local(8, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.contains) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
