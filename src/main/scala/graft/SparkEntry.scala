package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is declared as `QueryDef`s (implementation + DuckDB
  * oracle side by side) in:
  *   - [[operators.Serving]]    — SURVEY.md §2.D dashboard surface (D1-D9)
  *   - [[operators.Ingest]]     — §2.A/§2.C ingest transforms + latest-per-key
  *   - [[operators.Relational]] — joins/set-ops/windows/rollups (§2.E surface)
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    operators.Serving.defs ++ operators.Ingest.defs ++
      operators.Relational.defs ++ operators.Dedup.defs ++
      operators.Similarity.defs ++ operators.TextAnalysis.defs ++
      multimodal.Media.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's dashboard join (console.py:45-51) — D3. */
  def entry(spark: SparkSession): DataFrame =
    operators.Serving.d3.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
