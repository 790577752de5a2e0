package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Driver-contract invariants: the queries map is lossless (duplicate names
  * would silently vanish in the Map), every oracle is paired with a live
  * query, and names follow the qNN_ convention the round artifacts key on.
  */
class ContractSpec extends AnyFunSuite {

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ PhysicsQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MlQueries.defs ++ ScaleQueries.defs ++ AdvancedQueries.defs ++
      SourceQueries.defs ++ NpzQueries.defs ++ CurationQueries.defs

  test("query names are unique — nothing silently dropped by the Map") {
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a query; oracle SQL is non-blank") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(SparkEntry.queries.contains(name), name)
      assert(sql.trim.nonEmpty, name)
    }
  }

  test("names follow the qNN_ convention") {
    all.foreach(q => assert(q.name.matches("q\\d{2,3}_[a-z][a-z0-9_]+"), q.name))
  }

  test("bench headline names all resolve") {
    Bench.headline.foreach(n => assert(SparkEntry.queries.contains(n), n))
  }

  test("entry() flagship smoke returns rows (the driver's t1 gate)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("runner cache lifecycle: no persisted plans survive a query round") {
    val spark = TestSpark.spark
    // q50 persists its shared token relation; the runner pattern is
    // materialize → clearCache — afterwards the cache manager must be empty
    val df = SparkEntry.queries("q50_tfidf")(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    assert(!spark.sharedState.cacheManager.isEmpty, "expected q50 to persist")
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached plans leaked after clearCache")
  }
}
