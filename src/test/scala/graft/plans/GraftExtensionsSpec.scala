package graft.plans

import org.apache.spark.sql.{GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The build-time integration path: a session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` must expose the custom
  * SQL functions and plan the custom logical nodes WITHOUT any runtime
  * [[graft.Graft.init]] / register call — the zero-code spark-submit story.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** Build an isolated session with the extensions installed via the
    * builder (getOrCreate would otherwise hand back the suite-shared
    * session). `withExtensions(new GraftExtensions)` rather than the
    * `spark.sql.extensions` config string: that config is STATIC — read from
    * the SparkContext's conf at context creation — so on the suite-shared
    * context it would be silently ignored; the builder hook runs the exact
    * same class through the same injection API. The underlying SparkContext
    * IS shared — only the SessionState is new — and the previous default
    * session is restored afterwards, so other suites are unaffected. */
  private def withExtensionsSession[A](f: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-test")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("injected SQL functions evaluate without Graft.init") {
    withExtensionsSession { s =>
      val r = s.sql(
        """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                  rolling_hash('abc') AS h,
                  haversine_km(0.0d, 0.0d, 0.0d, 1.0d) AS km""").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == (('a' * 31 + 'b') * 31 + 'c') % 1000000007L)
      assert(math.abs(r.getDouble(2) - 111.19) < 0.5) // 1 deg of longitude at equator
    }
  }

  test("injected planner strategy executes a deferred plan without register") {
    withExtensionsSession { s =>
      import s.implicits._
      // built directly (not via Deferred.dataFrame, which would self-register)
      // so execution succeeds ONLY if the extension injected the strategy
      val attrs = Seq(AttributeReference("x", LongType, nullable = false)())
      val df = GraftExpressionBridge.ofRows(s,
        DeferredResultPlan(attrs, () => Seq(1L, 2L, 3L).toDF("x")))
      assert(df.count() == 3)
    }
  }

  test("injected as-of strategy plans the custom node without register") {
    withExtensionsSession { s =>
      import s.implicits._
      val trades = Seq((1L, 10L), (1L, 20L)).toDF("key", "t")
      val quotes = Seq((1L, 5L, "a"), (1L, 15L, "b")).toDF("key", "t", "v")
      // bypass AsOf.join's self-registration: build the logical node by hand
      val lPlan = GraftExpressionBridge.logicalPlan(trades)
      val rq = quotes.select($"key".as("key_r"), $"t".as("t_r"), $"v".as("v_r"))
      val rPlan = GraftExpressionBridge.logicalPlan(rq)
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          n: String) = p.output.find(_.name == n).get
      val joined = GraftExpressionBridge.ofRows(s, AsOfJoinPlan(
        lPlan, rPlan, attr(lPlan, "key"), attr(rPlan, "key_r"),
        attr(lPlan, "t"), attr(rPlan, "t_r")))
      val got = joined.orderBy("t").collect().map(r => (r.getLong(1), r.getString(4)))
      assert(got.toSeq == Seq((10L, "a"), (20L, "b")))
    }
  }
}
