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

  test("the query catalog is reachable as SQL views, composable with SQL") {
    Graft.init(spark)
    Graft.registerQueries(spark, sf("sf0.001"))
    val top = spark.sql(
      """SELECT count(*) AS n FROM q1_pricing_summary""").head().getLong(0)
    assert(top == 6)
    // views compose: join two catalog results in plain SQL
    val joined = spark.sql(
      """SELECT count(*) FROM dedup_exact e
         JOIN split_train_val s ON e.keeper_id = s.doc_id""").head().getLong(0)
    assert(joined > 0)
  }

  test("registering the catalog runs ZERO Spark jobs; deferred views still answer") {
    // incremented on the listener-bus dispatch thread, read on the test
    // thread — needs an atomic, not a plain var
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      Graft.init(spark)
      Graft.registerTables(spark, sf("sf0.001"))
      Graft.registerQueries(spark, sf("sf0.001"))
      org.apache.spark.GraftListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      assert(jobs.get() == 0,
        s"view registration must be lazy but submitted ${jobs.get()} Spark jobs")
      // the deferred-builder views (fixpoint clusters, synthesized pipeline)
      // execute correctly on first use — and only then
      val clusters = spark.sql(
        "SELECT count(*) FROM dedup_clusters WHERE is_keeper").head().getLong(0)
      assert(clusters > 0)
      org.apache.spark.GraftListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      assert(jobs.get() > 0)
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("ANSI SQL over registered tables matches the DataFrame catalog result") {
    Graft.init(spark)
    Graft.registerTables(spark, sf("sf0.001"))
    // Q5's join tree written as plain SQL against the registered views must
    // produce exactly the catalog DataFrame implementation's rows
    val viaSql = spark.sql(
      """SELECT n.n_name,
                floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 1e2 + 0.5) / 1e2
                  AS revenue
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n.n_name""").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaDf = graft.SparkEntry.queries("q5_region_revenue")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaDf, s"sql=$viaSql df=$viaDf")
  }

  test("dot_product, haversine_km, rolling_hash2 and zvalue SQL functions evaluate") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dp,
                haversine_km(60.39d, 5.32d, 59.91d, 10.75d) AS bergen_oslo_km,
                rolling_hash2('abc') AS h2,
                zvalue(2L, 3L) AS z""").head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 305.0) < 5.0) // Bergen->Oslo great circle
    assert(r.getLong(2) == (('a'.toInt * 131 + 'b') % 998244353L * 131 + 'c') % 998244353L)
    assert(r.getLong(3) == 14L) // interleave(0b10, 0b11) = 0b1110
  }

  test("shingle_hashes SQL function matches the fnv64 window reference") {
    Graft.init(spark)
    val got = spark.sql("SELECT shingle_hashes('a b c d', 3) AS hs").head()
      .getSeq[Long](0).toSet
    def fnv64(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.foreach { c => h ^= c; h *= 0x100000001b3L }
      h
    }
    assert(got == Set(fnv64("a b c"), fnv64("b c d")))
  }

  test("shingle_hashes rejects non-literal, non-integer, and non-positive n") {
    Graft.init(spark)
    def msgOf(sql: String): String =
      intercept[Exception](spark.sql(sql).head()).getMessage
    // n = 0 / negative: silently yielding one fnv64("") per doc was the
    // ADVICE r9 bug — must be an error naming the constraint
    assert(msgOf("SELECT shingle_hashes('a b', 0)").contains("positive integer"))
    assert(msgOf("SELECT shingle_hashes('a b', -3)").contains("positive integer"))
    // a string literal: used to surface as a raw ClassCastException
    assert(msgOf("SELECT shingle_hashes('a b', 'x')").contains("positive integer"))
    // non-foldable n: the window width is a codegen-time constant
    spark.range(1).createOrReplaceTempView("shn_t")
    assert(msgOf("SELECT shingle_hashes('a b', CAST(id AS INT)) FROM shn_t")
      .contains("positive integer"))
    // valid n still works through the same path
    assert(spark.sql("SELECT size(shingle_hashes('a b c', 2)) AS n")
      .head().getInt(0) == 2)
  }
}
