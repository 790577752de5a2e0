package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query over
  * the fixture tables, paired (where SQL-expressible) with equivalent DuckDB
  * SQL for the driver's correctness gate. Query groups:
  *   - RelationalQueries: scans/filters/aggs/joins/windows/set-ops/splits
  *   - PhysicsQueries:    scalar math + array/tensor ops
  *   - EventQueries:      event-time windows, sessionization, JSON
  *   - TextQueries:       dedup/token/quality/langid/fingerprint
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ PhysicsQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MlQueries.defs ++ ScaleQueries.defs ++ AdvancedQueries.defs ++
      SourceQueries.defs ++ NpzQueries.defs ++ CurationQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The survival
    * curve (SURVEY §7.2) — the reference's actual scientific output.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_survival_curve")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver records
    * a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
