package graft

/** The SQL front door: views + custom functions through spark.sql. */
class GraftFacadeSpec extends SparkSpec {

  test("registered views + rolling_hash SQL function answer a query") {
    Graft.init(spark)
    Graft.registerTables(spark, sf("sf0.001"))
    val out = spark.sql(
      """SELECT doc_id, rolling_hash(trim(text)) AS fp
         FROM documents WHERE doc_id < 3 ORDER BY doc_id""").collect()
    assert(out.length == 3)
    // same values as the Column API (one implementation, two surfaces)
    val viaColumn = graft.operators.TextAnalysis.fingerprint
      .run(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("doc_id") < 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq ==
      viaColumn.map(_.getAs[Long]("roll_fp")).toSeq)
  }

  test("dashboard query surface is reachable as pure SQL") {
    Graft.registerTables(spark, sf("sf0.001"))
    val n = spark.sql(
      "SELECT count(DISTINCT user_id) AS ships FROM events").head().getLong(0)
    assert(n == 15)
  }
}
