package graft.streaming

import graft.SparkSpec
import graft.streaming.CorpusDedup.StreamDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CorpusDedupSpec extends SparkSpec {

  private def mkDoc(id: Long, seed: String): StreamDoc =
    StreamDoc(id, (1 to 40).map(i => s"$seed$i").mkString(" "))

  /** `base` with a few tokens perturbed — above the 0.8 Jaccard bar. */
  private def nearCopy(id: Long, seed: String): StreamDoc =
    StreamDoc(id, (1 to 40).map(i => if (i == 39) "x" else s"$seed$i").mkString(" "))

  test("signature/band geometry: near-dups collide, distinct docs do not") {
    val a = CorpusDedup.signature(mkDoc(1, "tok").text)
    val b = CorpusDedup.signature(nearCopy(2, "tok").text)
    val c = CorpusDedup.signature(mkDoc(3, "other").text)
    assert(CorpusDedup.estJaccard(a, b) >= CorpusDedup.Threshold)
    assert(CorpusDedup.estJaccard(a, c) < 0.2)
    assert(CorpusDedup.bandKeys(a).intersect(CorpusDedup.bandKeys(b)).nonEmpty)
    assert(CorpusDedup.bandKeys(a).intersect(CorpusDedup.bandKeys(c)).isEmpty)
  }

  test("incremental dedup flags near-dups against PRIOR batches via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusDedup.incrementalDedup(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_dedup_t1").start()
    try {
      input.addData(mkDoc(10, "alpha"), mkDoc(20, "beta"))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 10, an exact copy of doc 20, a fresh doc
      input.addData(nearCopy(11, "alpha"), mkDoc(21, "beta"), mkDoc(30, "gamma"))
      q.processAllAvailable()
      val out = spark.table("corpus_dedup_t1").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(10L) == -1L && out(20L) == -1L && out(30L) == -1L)
      assert(out(11L) == 10L, s"near-copy must point at its keeper: $out")
      assert(out(21L) == 20L, s"exact copy must point at its keeper: $out")
    } finally q.stop()
  }

  test("intra-batch duplicates resolve deterministically to the lowest id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusDedup.incrementalDedup(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_dedup_t2").start()
    try {
      input.addData(mkDoc(7, "delta"), nearCopy(5, "delta"), mkDoc(9, "delta"))
      q.processAllAvailable()
      val out = spark.table("corpus_dedup_t2").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(5L) == -1L, s"lowest id is the keeper: $out")
      assert(out(7L) == 5L && out(9L) == 5L, out.toString)
    } finally q.stop()
  }

  test("band-bucket state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdedup").toString
    val input = MemoryStream[StreamDoc]
    // memory sinks can't recover a checkpoint; foreachBatch can
    val out = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def start() = CorpusDedup.incrementalDedup(input.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.put(r.getLong(0), r.getLong(1)))
      }.start()
    val q1 = start()
    input.addData(mkDoc(100, "epsilon"))
    q1.processAllAvailable()
    q1.stop()
    // a new query from the SAME checkpoint must still know doc 100
    val q2 = start()
    try {
      input.addData(nearCopy(101, "epsilon"))
      q2.processAllAvailable()
      assert(out.get(101L) == 100L,
        s"restarted query lost pre-restart dedup state: $out")
    } finally q2.stop()
  }

  test("differential: streaming dedup agrees with the batch MinHash pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth: exact-verified near-dup pairs over the real corpus
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val pairs = graft.operators.Dedup.minHashDedup(
      docs, "doc_id", "text", n = 3, numHashes = 32, bands = 8, threshold = 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs")
    val input = MemoryStream[StreamDoc]
    val q = CorpusDedup.incrementalDedup(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_dedup_diff").start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => StreamDoc(r.getLong(0), r.getString(1)))
        .sortBy(_.doc_id)
      input.addData(all.toIndexedSeq)
      q.processAllAvailable()
      val flags = spark.table("corpus_dedup_diff").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dupDocs = flags.filter(_._2 >= 0).keySet
      // completeness: the later doc of every true pair is flagged
      pairs.foreach { case (i, j) =>
        assert(dupDocs(math.max(i, j)),
          s"pair ($i,$j): later doc not flagged by the stream") }
      // soundness: every flagged doc appears in some true pair
      val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      dupDocs.foreach { d =>
        assert(inPairs(d), s"stream flagged $d which is in no exact pair") }
    } finally q.stop()
  }

  test("composed ingest: junk never reaches dedup state, clean near-dups dedupe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusIngest.ingest(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_ingest_t1").start()
    try {
      // junk: under the token floor; clean: a real doc
      input.addData(StreamDoc(1, "too short"), mkDoc(2, "zeta"))
      q.processAllAvailable()
      // junk near-copy (still junk), clean near-copy, fresh clean doc
      input.addData(StreamDoc(3, "too short"), nearCopy(4, "zeta"), mkDoc(5, "eta"))
      q.processAllAvailable()
      val out = spark.table("corpus_ingest_t1").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // junk docs produce no verdicts at all — filtered before any state
      assert(!out.contains(1L) && !out.contains(3L), out.toString)
      assert(out(2L) == -1L && out(5L) == -1L, out.toString)
      assert(out(4L) == 2L, s"clean near-dup must point at its keeper: $out")
    } finally q.stop()
  }

  test("decontamination gate: docs sharing a benchmark span are dropped " +
    "before any state; clean docs still dedupe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // benchmark corpus: one doc whose 8-token spans must not leak through
    val benchText = (1 to 20).map(i => s"bench$i").mkString(" ")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    // contaminated: embeds benchmark tokens 5..12 (an 8-token span) in a
    // longer clean carrier
    val contaminated = StreamDoc(7,
      (1 to 10).map(i => s"pre$i").mkString(" ") + " " +
        (5 to 12).map(i => s"bench$i").mkString(" ") + " " +
        (1 to 10).map(i => s"post$i").mkString(" "))
    val input = MemoryStream[StreamDoc]
    val q = CorpusIngest.ingestDecontaminated(input.toDS(), benchmark)
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_ingest_decon").start()
    try {
      input.addData(contaminated, mkDoc(8, "iota"))
      q.processAllAvailable()
      input.addData(nearCopy(9, "iota"))
      q.processAllAvailable()
      val out = spark.table("corpus_ingest_decon").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!out.contains(7L), s"contaminated doc leaked through: $out")
      assert(out(8L) == -1L, out.toString)
      assert(out(9L) == 8L, s"clean near-dup must still dedupe: $out")
    } finally q.stop()
  }

  test("maxBucket caps state growth; over-cap docs pass through as keepers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    // cap of 0: the store branch can never fire, so every doc passes as a
    // keeper across batches — bounded state trades RECALL (missed dups),
    // never soundness (false dup flags) and never a crash
    val q = CorpusDedup.incrementalDedup(input.toDS(), maxBucket = 0)
      .writeStream.outputMode("update")
      .format("memory").queryName("corpus_dedup_cap").start()
    try {
      input.addData(mkDoc(1, "theta"))
      q.processAllAvailable()
      input.addData(nearCopy(3, "theta")) // real near-dup, but nothing stored
      q.processAllAvailable()
      val out = spark.table("corpus_dedup_cap").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(1L) == -1L)
      assert(out(3L) == -1L,
        s"with zero stored state nothing may be flagged: $out")
    } finally q.stop()
  }

  test("exact streaming dedup keeps first writer per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusDedup.exactDedupStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("corpus_dedup_t3").start()
    try {
      input.addData(StreamDoc(1, "same text"), StreamDoc(2, "same text"))
      q.processAllAvailable()
      input.addData(StreamDoc(3, "same text"), StreamDoc(4, "new text"))
      q.processAllAvailable()
      val ids = spark.table("corpus_dedup_t3").collect().map(_.getLong(0)).sorted
      assert(ids.length == 2 && ids.contains(4L), ids.mkString(","))
    } finally q.stop()
  }

  test("lm quality gate: in-domain text passes, gibberish is dropped, " +
      "batch scorer agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: a repetitive domain where trigram probs are high
    val domain = (1 to 20).map(i => s"the ship sails the sea route $i")
    val reference = domain.toDF("text")
    val input = MemoryStream[StreamDoc]
    val gated = CorpusIngest.lmQualityGate(input.toDS(), reference,
      minScore = 0.3)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("lm_gate_t").start()
    try {
      input.addData(
        StreamDoc(1, "the ship sails the sea route 3"),     // in-domain
        StreamDoc(2, "zz qq ww ee rr tt yy uu"),            // unseen trigrams
        StreamDoc(3, "the ship sails the sea route 7"))     // in-domain
      q.processAllAvailable()
      val kept = spark.table("lm_gate_t").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 3L), kept.mkString(","))
    } finally q.stop()
  }
}
