package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class EvalSpec extends SparkSpec {

  test("auc matches a direct Mann-Whitney computation and its invariants") {
    val r = Eval.aucQ.run(spark, sf("sf0.001")).head()
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0.0 && auc <= 1.0)
    assert(nPos + nNeg == Tables.documents(spark, sf("sf0.001")).count())
    // independent reference: collect (q, label), count concordant pairs
    val rows = LmData.curriculumQ.run(spark, sf("sf0.001")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap // doc_id -> qmilli
    val langs = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "lang").collect()
      .map(x => x.getLong(0) -> (x.getString(1) == "en")).toMap
    val pos = rows.filter { case (id, _) => langs(id) }.values.toSeq
    val neg = rows.filter { case (id, _) => !langs(id) }.values.toSeq
    val pairs = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val want = math.floor(pairs.sum / (pos.size * neg.size) * 1e6 + 0.5) / 1e6
    assert(math.abs(auc - want) <= 1e-6, s"auc $auc vs reference $want")
    assert(nPos == pos.size && nNeg == neg.size)
  }

  test("langid confusion matrix: totals partition the corpus, diagonal dominates 'en'") {
    val rows = Eval.langidConfusionQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.values.sum == Tables.documents(spark, sf("sf0.001")).count())
    // per-actual totals match the corpus lang distribution
    val langDist = Tables.documents(spark, sf("sf0.001"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1._1).foreach { case (actual, m) =>
      assert(m.values.sum == langDist(actual), actual)
    }
    // the heuristic must at least recognize most English documents
    val enRow = rows.collect { case ((a, p), n) if a == "en" => (p, n) }.toMap
    assert(enRow.getOrElse("en", 0L) * 2 > langDist("en"),
      s"en recall too low: $enRow")
  }

  test("ndcg/mrr metrics match an independent driver-side reference") {
    val rows = Eval.rankMetricsQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // independent reference: collect the corpus, rank and score locally
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
      }
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val disc = (1 to 10).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)
    for (qId <- 0L to 4L) {
      val (_, qv, qLabel) = e.find(_._1 == qId).get
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val top = e.filter(_._1 != qId).map { case (id, v, l) =>
        val cos = rnd6(v.zip(qv).map(p => p._1 * p._2).sum /
          (qn * math.sqrt(v.map(x => x * x).sum)))
        (id, cos, l == qLabel)
      }.sortBy { case (id, cos, _) => (-cos, id) }.take(10)
      val nRel10 = top.count(_._3).toLong
      val dcgU = top.zipWithIndex.collect {
        case ((_, _, true), i) => disc(i) }.sum
      val first = top.zipWithIndex.collectFirst {
        case ((_, _, true), i) => i + 1L }.getOrElse(0L)
      val nRelTotal = e.count(x => x._1 != qId && x._3 == qLabel).toLong
      val idcgU = disc.take(math.min(10L, nRelTotal).toInt).sum
      val got = rows(qId)
      assert(got.getLong(1) == nRel10, s"q$qId n_rel_10")
      assert(got.getLong(2) == nRelTotal, s"q$qId n_rel_total")
      assert(got.getLong(3) == first, s"q$qId first_rel_rank")
      assert(got.getDouble(4) ==
        (if (first > 0) rnd6(1.0 / first) else 0.0), s"q$qId rr_10")
      assert(got.getDouble(5) ==
        rnd6(dcgU.toDouble / math.max(idcgU, 1L)), s"q$qId ndcg_10")
    }
  }

  test("confusion matrix cells partition the corpus; precision/recall agree") {
    val r = Eval.confusionQ.run(spark, sf("sf0.001")).head()
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn == Tables.documents(spark, sf("sf0.001")).count())
    def rnd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == rnd(tp.toDouble / math.max(tp + fp, 1L)))
    assert(r.getDouble(5) == rnd(tp.toDouble / math.max(tp + fn, 1L)))
  }

  test("bootstrap CI brackets the point accuracy, matches the confusion " +
      "matrix, and is rerun-deterministic") {
    val r = Eval.bootstrapQ.run(spark, sf("sf0.001")).head()
    val (pt, lo, hi, b) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
    assert(b == 32L)
    // the replicate distribution centers on the point estimate: with 32
    // replicates the rank-2/rank-31 interval excludes it with prob ~1e-8,
    // and the inputs are fixed, so this is a stable structural assertion
    assert(lo < hi && lo <= pt && pt <= hi, s"($lo, $pt, $hi)")
    // the unweighted point accuracy is exactly the confusion matrix's
    val c = Eval.confusionQ.run(spark, sf("sf0.001")).head()
    val n = c.getLong(0) + c.getLong(1) + c.getLong(2) + c.getLong(3)
    val want = math.floor(
      (c.getLong(0) + c.getLong(3)).toDouble / n * 1e6 + 0.5) / 1e6
    assert(pt == want)
    // no RNG anywhere: a second run reproduces the interval bit-for-bit
    val again = Eval.bootstrapQ.run(spark, sf("sf0.001")).head()
    assert(again.getDouble(1) == lo && again.getDouble(2) == hi)
  }
}
