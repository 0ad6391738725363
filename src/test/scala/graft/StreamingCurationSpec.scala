package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps
import graft.streaming.StreamingCuration
import graft.streaming.StreamingCuration.CurationDoc

class StreamingCurationSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val fluent = "the cat and the dog are in the house with the mouse"

  test("streaming funnel: gates drop junk, dedup suppresses across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurationDoc]
    val out = StreamingCuration.curateStream(input.toDS(), ttl = None)
    val q = out.writeStream
      .format("memory").queryName("curated_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      // batch 1: two copies of the fluent doc (min id must win), one
      // gibberish doc (language gate drops it), one PII-bearing doc
      input.addData(
        CurationDoc(7L, fluent),
        CurationDoc(3L, fluent),
        CurationDoc(4L, "zqx!#@%&*()[]{}~^|"),
        CurationDoc(5L, s"$fluent mail bob@corp.example now"))
      q.processAllAvailable()
      // batch 2: the fluent doc AGAIN (later micro-batch → suppressed by
      // state) plus a genuinely new doc
      input.addData(
        CurationDoc(9L, fluent),
        CurationDoc(10L, s"$fluent again today"))
      q.processAllAvailable()
      val rows = spark.table("curated_out").as[CurationDoc].collect()
        .sortBy(_.doc_id)
      assert(rows.map(_.doc_id).toSeq == Seq(3L, 5L, 10L),
        s"got ${rows.toSeq}")
      // PII scrubbed in the emitted text
      assert(rows.find(_.doc_id == 5L).get.text.contains("<EMAIL>"))
      assert(!rows.exists(_.text.contains("bob@corp.example")))
    } finally q.stop()
  }

  test("batch execution of dedupStream equals DedupOps.dedupedCorpus") {
    val docs = Seq(
      CurationDoc(11L, "alpha beta gamma"),
      CurationDoc(2L, "alpha beta gamma"),      // same fp, smaller id
      CurationDoc(5L, "  ALPHA   beta GAMMA "), // same fp after normalize
      CurationDoc(8L, "something else entirely"))
    val ds = spark.createDataset(docs)
    val streamed = StreamingCuration.dedupStream(ds, ttl = None)
      .collect().map(_.doc_id).sorted.toSeq
    val batch = DedupOps.dedupedCorpus(ds.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch && streamed == Seq(2L, 8L))
  }

  test("dedup within one micro-batch keeps the min id, not iterator order") {
    val ds = spark.createDataset(Seq(
      CurationDoc(42L, "x y z"), CurationDoc(41L, "x y z"),
      CurationDoc(43L, "x y z")))
    val kept = StreamingCuration.dedupStream(ds, ttl = None).collect()
    assert(kept.map(_.doc_id).toSeq == Seq(41L))
  }

  test("ttl bounds dedup state: an expired fingerprint is re-admitted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurationDoc]
    val out = StreamingCuration.dedupStream(input.toDS(),
      ttl = Some("100 milliseconds"))
    val q = out.writeStream
      .format("memory").queryName("ttl_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // NOTE: with ProcessingTimeTimeout every micro-batch schedules another
    // batch (timeouts must keep firing), so `noNewData` is never reached
    // and processAllAvailable() would BLOCK FOREVER. Poll the sink with a
    // deadline instead — batches run continuously on the 50 ms trigger.
    def waitForIds(want: Seq[Long], deadlineMs: Long = 60000L): Seq[Long] = {
      val t0 = System.nanoTime()
      var got = Seq.empty[Long]
      while ({
        got = spark.table("ttl_out").as[CurationDoc].collect()
          .map(_.doc_id).sorted.toSeq
        got != want && (System.nanoTime() - t0) < deadlineMs * 1000000L
      }) Thread.sleep(100L)
      got
    }
    try {
      input.addData(CurationDoc(1L, "ttl probe doc"))
      assert(waitForIds(Seq(1L)) == Seq(1L))
      // well past the ttl: a subsequent batch fires the timeout and evicts
      Thread.sleep(1000L)
      input.addData(CurationDoc(2L, "unrelated batch to advance time"))
      assert(waitForIds(Seq(1L, 2L)) == Seq(1L, 2L))
      Thread.sleep(500L)
      // the SAME fingerprint arrives after eviction → re-admitted
      input.addData(CurationDoc(3L, "ttl probe doc"))
      val ids = waitForIds(Seq(1L, 2L, 3L))
      assert(ids == Seq(1L, 2L, 3L),
        s"expected re-admission of the expired fingerprint, got $ids")
    } finally q.stop()
  }

  test("batch compaction of the streamed-accepted table ≡ the batch curationFunnel") {
    import graft.ops.CurationOps
    import graft.tables.SnapTable
    implicit val sqlCtx = spark.sqlContext
    // a corpus exercising every corpus-wide stage the compaction owns
    // (benchMod = 5 so the holdout/decontamination slices are non-trivial):
    //   5, 10 → benchmark slice (id % 5 == 0): stream accepts, compaction holds out
    //   1     → clean survivor;  2 → BYTE-IDENTICAL dup of 1 (stream drops
    //           it; batch collapses it to rep 1 — same outcome)
    //   3     → second clean survivor (distinct content)
    //   4     → gibberish (language gate, both paths)
    //   6     → PII doc (scrubbed in-stream; raw text feeds batch facets)
    //   7     → contaminated: shares a 3-shingle with bench doc 5
    val fluent2 = "we can see that the sun and the moon are out there over the hill"
    val benchText = "unique trigram marker sequence appears here in the held out benchmark"
    val raw = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent2),
      (4L, "zqx!#@%&*()[]{}~^|"),
      (5L, benchText),
      (6L, s"$fluent mail bob@corp.example now please respond"),
      (7L, s"$fluent2 but unique trigram marker appended"),
      // second bench doc: shares NO 3-shingle with any corpus doc (a bench
      // doc with corpus overlap would contaminate the overlapped doc)
      (10L, "a quiet festival of lanterns was held beside a frozen lake"))
      .toDF("doc_id", "text")
    val docs = raw.select(col("doc_id"), col("text")).as[CurationDoc]

    val acceptedTable = new SnapTable(spark,
      graft.TmpDirs.create("compact-accepted").toString, Seq("doc_id"))
    val input = MemoryStream[CurationDoc]
    val q = StreamingCuration.curateStream(input.toDS(), ttl = None)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CurationDoc], _: Long) =>
        if (!batch.isEmpty) { acceptedTable.mergeCommit(batch.toDF()); () }
      }
      .start()
    try {
      val all = docs.collect()
      input.addData(all.take(4).toIndexedSeq)     // micro-batch 1
      q.processAllAvailable()
      input.addData(all.drop(4).toIndexedSeq)     // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()

    val outTable = new SnapTable(spark,
      graft.TmpDirs.create("compact-out").toString, Seq("doc_id"))
    val v = StreamingCuration.compactToTable(acceptedTable, raw, outTable,
      "doc_id", "text", benchMod = 5)
    assert(v.contains(1))
    val compacted = outTable.read().get
      .select("doc_id", "stop_mill").as[(Long, Long)].collect().toSet
    val batchFunnel = CurationOps.curationFunnel(raw, "doc_id", "text",
      benchMod = 5).as[(Long, Long)].collect().toSet
    assert(compacted == batchFunnel,
      s"compaction ${compacted.toSeq.sorted} != funnel ${batchFunnel.toSeq.sorted}")
    // and the stages did real work: dup 2 collapsed, bench 5/10 held out,
    // contaminated 7 dropped, gibberish 4 gated
    val ids = compacted.map(_._1)
    assert(ids.contains(1L) && ids.contains(3L))
    assert(!ids.exists(Set(2L, 4L, 5L, 7L, 10L)))
    // re-running the compaction is idempotent (MERGE keyed by id)
    StreamingCuration.compactToTable(acceptedTable, raw, outTable,
      "doc_id", "text", benchMod = 5)
    assert(outTable.read().get.select("doc_id", "stop_mill")
      .as[(Long, Long)].collect().toSet == compacted)
  }

  test("streaming vocab ledger: micro-batch merges ≡ one-pass vocabulary; replays skipped") {
    import graft.ops.{TextOps, TrainPrepOps}
    import graft.tables.SnapTable
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a d")).toDF("doc_id", "text")
    val ledger = new SnapTable(spark,
      graft.TmpDirs.create("vocab-ledger").toString, Seq("token"))
    val input = MemoryStream[CurationDoc]
    val q = input.toDS().writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CurationDoc], id: Long) =>
        if (!batch.isEmpty) {
          StreamingCuration.vocabLedgerCommit(ledger, batch.toDF(), "text", id); ()
        }
      }
      .start()
    try {
      input.addData(CurationDoc(1L, "a b a"), CurationDoc(2L, "b c"))
      q.processAllAvailable()
      input.addData(CurationDoc(3L, "a d"))
      q.processAllAvailable()
    } finally q.stop()
    // the cut ledger is bit-identical to one-pass vocabulary over the corpus
    val cut = TrainPrepOps.cutVocab(
      ledger.read().get.select(col("token"), col("cnt")), minCount = 1L, topN = 10)
      .as[(String, Long)].collect().toSet
    val oneShot = TextOps.vocabulary(docs, "text", minCount = 1L, topN = 10)
      .as[(String, Long)].collect().toSet
    assert(cut == oneShot &&
      cut == Set(("a", 3L), ("b", 2L), ("c", 1L), ("d", 1L)), s"cut: $cut")
    // replay guard: an already-committed batch id is skipped atomically —
    // counts are additive, so re-applying would double-count without it
    val before = ledger.currentVersion
    assert(StreamingCuration.vocabLedgerCommit(ledger, docs, "text", batchId = 0L).isEmpty)
    assert(ledger.currentVersion == before)
  }

  test("streaming band ledger: screen-then-commit per micro-batch ≡ one-shot bandLedger; replays skipped") {
    import graft.tables.SnapTable
    val ledger = new SnapTable(spark,
      graft.TmpDirs.create("band-ledger").toString, Seq("band", "bucket"))
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val b0 = Seq((10L, base), (11L, "an entirely different first document body here"))
      .toDF("doc_id", "text")
    // batch 0 seeds the ledger
    assert(StreamingCuration.bandLedgerCommit(ledger, b0, "doc_id", "text",
      batchId = 0L).isDefined)
    // batch 1 screens BEFORE committing: the exact copy of doc 10 hits all
    // 4 band buckets; the novel doc hits none
    val b1 = Seq((20L, base), (21L, "novel prose sharing no shingles with anything prior"))
      .toDF("doc_id", "text")
    val flags = DedupOps.incrementalNearDup(b1, ledger.read().get,
      "doc_id", "text").as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flags(20L) == ((4L, None)), s"copy not flagged: $flags")
    assert(flags(21L) == ((0L, None)), s"novel doc flagged: $flags")
    assert(StreamingCuration.bandLedgerCommit(ledger, b1, "doc_id", "text",
      batchId = 1L).isDefined)
    // the accumulated ledger is SET-equal to one-shot bandLedger over all
    // docs (delta-only commits + key resolution = the distinct union)
    val streamed = ledger.read().get.select(col("band"), col("bucket"))
      .as[(Int, String)].collect().toSet
    val oneShot = DedupOps.bandLedger(b0.unionByName(b1), "doc_id", "text")
      .as[(Int, String)].collect().toSet
    assert(streamed == oneShot)
    // replay guard: a re-delivered batch id is a no-op (sets are
    // idempotent, but skipping keeps commit counts honest)
    val before = ledger.currentVersion
    assert(StreamingCuration.bandLedgerCommit(ledger, b0, "doc_id", "text",
      batchId = 1L).isEmpty)
    assert(ledger.currentVersion == before)
  }
}
