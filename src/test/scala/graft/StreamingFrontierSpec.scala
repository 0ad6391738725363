package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Model.FrontierEntry
import graft.streaming.StreamingFrontier

class StreamingFrontierSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def e(d: String, seq: Long) =
    FrontierEntry(d, d, graft.ops.TextOps.hashToken(d), 0, 100, seq)

  test("streaming admission dedups across micro-batches via GroupState cuckoo filter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FrontierEntry]
    val admitted = StreamingFrontier.admitStream(input.toDS(), partitions = 4)
    val q = admitted.writeStream
      .format("memory").queryName("admitted_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData(e("a.cz", 1), e("b.cz", 2), e("a.cz", 3))
      q.processAllAvailable()
      // batch 2 re-sends a.cz/b.cz + new c.cz → only c.cz admitted
      input.addData(e("b.cz", 4), e("c.cz", 5), e("a.cz", 6))
      q.processAllAvailable()
      val out = spark.table("admitted_out").as[FrontierEntry].collect()
      assert(out.map(_.domain).sorted.toSeq == Seq("a.cz", "b.cz", "c.cz"))
      // first-enqueue wins: a.cz admitted with its first seq
      assert(out.find(_.domain == "a.cz").get.seq == 1)
    } finally q.stop()
  }

  test("batch mode shares the same admission semantics") {
    val ds = spark.createDataset(Seq(e("x.cz", 1), e("x.cz", 2), e("y.cz", 3)))
    val out = StreamingFrontier.admitStream(ds, partitions = 2).collect()
    assert(out.map(_.domain).sorted.toSeq == Seq("x.cz", "y.cz"))
  }
}
