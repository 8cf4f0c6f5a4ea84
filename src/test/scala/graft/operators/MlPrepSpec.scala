package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MlPrepSpec extends SparkSpec {

  test("negative samples never collide with the positive set and are deterministic") {
    val dir = sf("sf0.001")
    val neg = MlPrep.negativeSamplesQ.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    val pos = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg.nonEmpty)
    neg.foreach { case (c, _, p) =>
      assert(!pos.contains((c, p)), s"negative ($c, $p) is a positive")
    }
    // per-customer: ranks are 1..n with n <= 3, ids within the part key space
    val nParts = Tables.part(spark, dir).count()
    neg.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq, s"$c")
      assert(rows.length <= 3)
      rows.foreach { case (_, _, p) => assert(p >= 0 && p < nParts) }
    }
    // every customer is served (5 draws always leave >= 1 non-positive here)
    assert(neg.map(_._1).distinct.length ==
      Tables.customer(spark, dir).count())
    // deterministic: a second run returns the identical set
    val again = MlPrep.negativeSamplesQ.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(neg.toSet == again.toSet)
  }

  test("gradient step decreases the squared training loss") {
    import graft.functions.Text
    val r = MlPrep.gdStepQ.run(spark, sf("sf0.001")).head()
    val w1 = (0 until 4).map(r.getDouble)
    val w0 = Seq(0.1, 0.001, 0.01, -0.5)
    val feats = Tables.documents(spark, sf("sf0.001"))
      .select(when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        Text.tokens(col("text")).as("toks"),
        Text.denseLength(col("text")).as("dense_len"))
      .select(col("y"), (size(col("toks")).cast("double") / 200.0).as("x1"),
        ((col("dense_len").cast("double") / size(col("toks"))) / 8.0).as("x2"),
        (Text.hitCount(col("toks"), Text.stopwords("en")).cast("double") /
          size(col("toks"))).as("x3"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2), x.getDouble(3)))
    def loss(w: Seq[Double]) = feats.map { case (y, x1, x2, x3) =>
      val p = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
      (p - y) * (p - y)
    }.sum / feats.length
    assert(loss(w1) < loss(w0),
      s"step did not descend: ${loss(w1)} !< ${loss(w0)}")
  }

  test("hash cross buckets are stable, bounded, and functionally determined") {
    val rows = MlPrep.hashCrossQ.run(spark, sf("sf0.001"))
      .join(Tables.customer(spark, sf("sf0.001")), "c_custkey")
      .select(col("c_nationkey"), col("c_mktsegment"), col("cross_bucket"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    rows.foreach { case (_, b) => assert(b >= 0 && b < 64) }
    // same (nation, segment) always lands in the same bucket
    rows.groupBy(_._1).foreach { case (k, vs) =>
      assert(vs.map(_._2).distinct.length == 1, s"$k maps to multiple buckets")
    }
  }

  test("token_lang_mi matches an exact local MI computation and ranks " +
      "language function words at the top") {
    val out = MlPrep.tokenMiQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = docs.length
    val langTotals = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val pres = docs.flatMap { case (id, lang, text) =>
      text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").distinct
        .map(t => (t, lang, id))
    }
    val tl = pres.groupBy(p => (p._1, p._2)).view.mapValues(_.length).toMap
    val nt = pres.groupBy(_._1).view
      .mapValues(_.map(_._3).distinct.length).toMap
    val miLocal = nt.map { case (tok, ntok) =>
      val cells = langTotals.toSeq.map { case (lang, ns) =>
        val nts = tl.getOrElse((tok, lang), 0)
        val p = if (nts > 0)
          (nts.toDouble / n) * math.log(nts.toDouble * n / (ntok.toDouble * ns))
        else 0.0
        val a = if (ns - nts > 0)
          ((ns - nts).toDouble / n) *
            math.log((ns - nts).toDouble * n / ((n - ntok).toDouble * ns))
        else 0.0
        math.floor((p + a) * 1e6 + 0.5).toLong
      }
      (tok, ntok.toLong, cells.sum)
    }.toSeq.sortBy(t => (-t._3, t._1)).take(50)
    assert(out.toSeq == miLocal)
  }

  test("token_lang_mi ranks language function words at the top of a planted " +
      "bilingual corpus") {
    // the semantic property (stopwords separate languages) is asserted on a
    // PLANTED fixture, not the driver's regenerable corpus — the arithmetic
    // is pinned by the exact-match test above plus the DuckDB oracle row,
    // and this fixture makes the heuristic deterministic under any testdata
    // regeneration
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mi_fixture").toString
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "en", s"the and of topic$i shared")
      else (i.toLong, "fr", s"le les et topic$i shared")
    }
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val out = MlPrep.tokenMiQ.run(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val stop = graft.functions.Text.stopwords.values.flatten.toSet
    // the 6 planted function words carry maximal MI; 'shared' (present in
    // every doc) and the per-doc topic tokens cannot outrank them
    assert(out.take(6).forall(t => stop(t._1)), out.take(8).mkString(", "))
  }
}
