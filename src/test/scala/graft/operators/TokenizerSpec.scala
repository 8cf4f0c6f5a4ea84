package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Pins the distributed BPE merge trainer: hand-computed merges on a
  * fixture, then full agreement with an independent in-memory reference
  * implementation on the real corpus. */
class TokenizerSpec extends SparkSpec {

  test("bpeTrain: hand-computed greedy merges, left-to-right non-overlap, " +
      "lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq(1L -> "a b a b c", 2L -> "a b c d").toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", 3)
    assert(merges == Seq(
      (1, "a", "b", 3L),       // (a,b) wins outright
      (2, "a b", "c", 2L),     // merged symbol participates next round
      (3, "a b", "a b c", 1L)) // all-ties round: smallest (l, r) adopted
    )
  }

  test("bpeTrain agrees with an independent in-memory reference on the " +
      "real corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = TextAnalysis.bpeTrain(docs, "doc_id", "text", 4)

    // reference: same algorithm, plain Scala over the collected corpus
    var seqs = docs.select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+"))
    val want = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to 4) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach(a => if (a.length >= 2) a.sliding(2).foreach(p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1))
      val ((l, r), f) = counts.toSeq
        .minBy { case ((l, r), f) => (-f, l, r) }
      want += ((step, l, r, f))
      seqs = seqs.map { a =>
        val out = Array.newBuilder[String]
        var i = 0
        while (i < a.length) {
          if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
            out += (l + " " + r); i += 2
          } else { out += a(i); i += 1 }
        }
        out.result()
      }
    }
    assert(got == want.result())
    assert(got.map(_._4).nonEmpty && got.head._4 >= got.last._4)
  }
}
