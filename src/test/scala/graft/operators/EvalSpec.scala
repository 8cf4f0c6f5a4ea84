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

  test("confusion matrix cells partition the corpus; precision/recall agree") {
    val r = Eval.confusionQ.run(spark, sf("sf0.001")).head()
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn == Tables.documents(spark, sf("sf0.001")).count())
    def rnd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == rnd(tp.toDouble / math.max(tp + fp, 1L)))
    assert(r.getDouble(5) == rnd(tp.toDouble / math.max(tp + fn, 1L)))
  }
}
