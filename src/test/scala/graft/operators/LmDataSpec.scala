package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LmData operators: the two-level global row-number against the
  * single-window reference, plus the semantic contracts of the n-gram table,
  * curriculum ordering and contamination report. */
class LmDataSpec extends SparkSpec {

  test("globalRowNumber equals the single-window global row_number") {
    val dir = sf("sf0.001")
    val keyed = Tables.documents(spark, dir).select(col("doc_id"),
      ((col("doc_id") * 2654435761L) % 4294967296L).as("k"))
    val got = LmData.globalRowNumber(keyed, "k", "doc_id", 1L << 24)
      .select(col("doc_id"), col("pos"))
    val want = keyed.select(col("doc_id"),
      row_number().over(Window.orderBy(col("k"), col("doc_id")))
        .cast("long").as("pos"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // chunk boundaries: also prove it on a tiny chunkDiv that forces many
    // chunks with uneven populations
    val got2 = LmData.globalRowNumber(keyed, "k", "doc_id", 1L << 28)
      .select(col("doc_id"), col("pos"))
    assert(got2.except(want).isEmpty && want.except(got2).isEmpty)
  }

  test("shuffle_positions is a permutation of 1..n") {
    val df = LmData.shuffleQ.run(spark, sf("sf0.001")).cache()
    try {
      val n = df.count()
      val agg = df.agg(min("pos"), max("pos"),
        countDistinct("pos")).head()
      assert(agg.getLong(0) == 1L && agg.getLong(1) == n &&
        agg.getLong(2) == n)
      // and it is not the identity order
      assert(df.filter(col("pos") =!= col("doc_id") + 1).count() > 0)
    } finally df.unpersist()
  }

  test("curriculum_rank orders by non-increasing quality") {
    val df = LmData.curriculumQ.run(spark, sf("sf0.001"))
    val bad = df.select(col("qmilli"), col("curriculum_rank"))
      .withColumn("next_q",
        lead(col("qmilli"), 1).over(Window.orderBy(col("curriculum_rank"))))
      .filter(col("next_q") > col("qmilli"))
    assert(bad.isEmpty)
  }

  test("trigram_next_token picks the max-count (tie: lexicographic) w3") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c a b c a b d a b d a b c", "en", "s", 1L),
      (1L, "a b d x y z x y z x y z x y z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("lm_docs")
    val t = graft.functions.Text.tokens(col("text"))
    val tg = docs.select(t.as("t"))
      .select(col("t"), explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"),
        element_at(col("t"), col("i") + 2).as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
    val prefix = Window.partitionBy(col("w1"), col("w2"))
    val top = tg
      .withColumn("rn", row_number().over(
        prefix.orderBy(col("cnt").desc, col("w3"))))
      .withColumn("prefix_cnt", sum(col("cnt")).over(prefix))
      .filter(col("rn") === 1)
      .select(col("w1"), col("w2"), col("w3"), col("cnt"), col("prefix_cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // "a b" -> c x3 (doc 0) vs d x3 (x2 doc 0 + x1 doc 1): tie at 3,
    // broken lexicographically toward c
    assert(top(("a", "b")) == ("c", 3L, 6L))
    // "x y" -> z x4 unique
    assert(top(("x", "y")) == ("z", 4L, 4L))
    // "b c" -> a x2 / "b d" -> a x2 over doc 0 and x in doc 1 (tie a vs x
    // at 2 broken lexicographically toward a)
    assert(top(("b", "d"))._1 == "a")
  }

  test("contamination_report counts match doc-level decontamination flags") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val report = LmData.contamReportQ.run(spark, dir)
    val flaggedTotal = Curation
      .decontaminate(docs, Curation.BenchmarkSource, 8).count()
    val reportTotal = report.agg(sum("n_contaminated")).head().getLong(0)
    assert(reportTotal == flaggedTotal && flaggedTotal > 0)
    // no benchmark row, every source covered
    val srcs = report.select("source").collect().map(_.getString(0)).toSet
    assert(!srcs.contains(Curation.BenchmarkSource))
    val allSrcs = docs.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(srcs == allSrcs - Curation.BenchmarkSource)
  }

  test("doc_token_rarity mass is consistent: sum over docs = sum of cnt^2") {
    // each token with corpus count c contributes c to the mass of each of
    // its c occurrences' documents: total mass == sum over vocab of c^2
    val dir = sf("sf0.001")
    val tok = Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
    val want = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    val got = LmData.rarityQ.run(spark, dir)
      .agg(sum("mass")).head().getLong(0)
    assert(got == want)
  }

  test("vocab encoding: ids are dense ranks, OOV is exercised, decode round-trips") {
    val dir = sf("sf0.001")
    val rows = LmData.vocabEncodeQ.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, pos, id) => pos >= 1 && pos <= 20 && id >= 0 && id <= 24 })
    assert(rows.exists(_._3 == 0L), "OOV id never used — vocab not smaller than corpus")
    // positions are contiguous per doc: 1..min(len, 20)
    rows.groupBy(_._1).foreach { case (d, ps) =>
      val sorted = ps.map(_._2).sorted
      assert(sorted.toSeq == (1L to sorted.length).toSeq, s"doc $d")
    }
    // round-trip: decoding in-vocab ids reproduces the original tokens
    val vocab = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }.take(24).map(_._1).zipWithIndex
      .map { case (t, i) => (i + 1).toLong -> t }.toMap
    val texts = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+")).toMap
    rows.foreach { case (d, pos, id) =>
      val tok = texts(d)(pos.toInt - 1)
      if (id > 0) assert(vocab(id) == tok, s"doc $d pos $pos")
      else assert(!vocab.values.toSet.contains(tok), s"doc $d pos $pos not OOV")
    }
  }

  test("lm predictability: repetitive text outscores unique text; probs are sane") {
    val rows = LmData.predictabilityQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // a mean of probabilities stays in (0, 1]
    rows.values.foreach { case (n, p) =>
      assert(n > 0 && p > 0.0 && p <= 1.0)
    }
    // near-duplicate docs share most trigrams (each shared trigram's c3
    // doubles against the same prefixes), so pair members sit above the
    // corpus median predictability
    val dups = Dedup.jaccardQ.run(spark, sf("sf0.001"))
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    assert(dups.nonEmpty, "fixtures contain near-duplicate pairs")
    val scores = rows.values.map(_._2).toSeq.sorted
    val median = scores(scores.length / 2)
    val dupAbove = dups.count(d => rows(d)._2 > median)
    assert(dupAbove * 2 >= dups.length,
      s"only $dupAbove/${dups.length} duplicate docs above median predictability")
  }

  test("ccnet_perplexity_buckets: ranks are a permutation, bucket sizes are " +
      "exact thirds, and buckets are score-ordered") {
    val rows = LmData.ccnetQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n.toLong))
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes("head") == n / 3)
    assert(sizes("middle") == 2 * n / 3 - n / 3)
    assert(sizes("tail") == n - 2 * n / 3)
    def scores(b: String) = rows.filter(_._4 == b).map(_._2)
    assert(scores("head").min >= scores("middle").max)
    assert(scores("head").min >= scores("tail").max)
    assert(scores("middle").min >= scores("tail").max)
    // rank order and score order agree (desc)
    val byRank = rows.sortBy(_._3).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }
}
