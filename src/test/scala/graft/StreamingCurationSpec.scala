package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
    val out = StreamingCuration.curateStream(input.toDS())
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
    val streamed = StreamingCuration.dedupStream(ds)
      .collect().map(_.doc_id).sorted.toSeq
    val batch = DedupOps.dedupedCorpus(ds.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch && streamed == Seq(2L, 8L))
  }

  test("dedup within one micro-batch keeps the min id, not iterator order") {
    val ds = spark.createDataset(Seq(
      CurationDoc(42L, "x y z"), CurationDoc(41L, "x y z"),
      CurationDoc(43L, "x y z")))
    val kept = StreamingCuration.dedupStream(ds).collect()
    assert(kept.map(_.doc_id).toSeq == Seq(41L))
  }
}
