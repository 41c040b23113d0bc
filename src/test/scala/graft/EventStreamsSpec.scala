package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** The streaming event operators emit the same answers as their gated
  * batch twins once the watermark seals a window / times out a session.
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val T0 = 1700000000L // fixed epoch anchor
  def ev(id: Long, user: Long, offSec: Long, typ: String = "click",
         value: Double = 1.0): Event =
    Event(id, new java.sql.Timestamp((T0 + offSec) * 1000), user, typ, value)

  // 2 users × 2 sessions each (gap > 1800 splits), interleaved arrival
  val batch1 = Seq(
    ev(1, 1, 0), ev(2, 1, 600), ev(3, 2, 100),
    ev(4, 2, 900), ev(5, 1, 1200))
  val batch2 = Seq(
    ev(6, 1, 4000), ev(7, 1, 4600),   // user 1, session 2
    ev(8, 2, 5000),                   // user 2, session 2
    ev(9, 3, 5200))                   // user 3, single-event session
  // sentinel far in the future: advances the global watermark so every
  // real session times out and every real window seals
  val sentinel = Seq(ev(99, 999, 100000))

  def expectedSessions: Set[(Long, Long, Long, Long)] = {
    val all = (batch1 ++ batch2).groupBy(_.user_id)
    all.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sess = scala.collection.mutable.ArrayBuffer.empty[Seq[Event]]
      sorted.foreach { e =>
        if (sess.nonEmpty &&
            (e.ts.getTime - sess.last.last.ts.getTime) / 1000 <= 1800)
          sess(sess.length - 1) = sess.last :+ e
        else sess += Seq(e)
      }
      sess.map(s => (u, s.head.ts.getTime / 1000, s.length.toLong,
        (s.last.ts.getTime - s.head.ts.getTime) / 1000))
    }.toSet
  }

  test("streaming sessionization == batch gap sessions after timeout flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams.sessionize(source.toDS(), 1800, "1 minute")
      .writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    try {
      source.addData(batch1)
      q.processAllAvailable()
      source.addData(batch2)
      q.processAllAvailable()
      source.addData(sentinel) // advance watermark
      q.processAllAvailable()
      source.addData(Seq(ev(100, 999, 100001))) // extra trigger fires timeouts
      q.processAllAvailable()
      val got = spark.table("sessout")
        .filter(col("user_id") =!= 999)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expectedSessions)
    } finally q.stop()
  }

  test("streaming first-seen dedup == batch exact dedup keeps (cross-batch suppression)") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(Doc(1, "aaa"), Doc(2, "bbb"), Doc(3, "aaa"),
      Doc(4, "ccc"), Doc(5, "bbb"))
    val b2 = Seq(Doc(6, "aaa"), Doc(7, "ddd"), Doc(8, "ccc"))
    val source = MemoryStream[Doc]
    val q = StreamingDedup.firstSeen(source.toDS())
      .writeStream.format("memory").queryName("dedupout")
      .outputMode("append").start()
    try {
      source.addData(b1)
      q.processAllAvailable()
      val afterB1 = spark.table("dedupout").count()
      assert(afterB1 == 3, s"batch1 distinct contents: $afterB1") // aaa bbb ccc
      source.addData(b2)
      q.processAllAvailable()
      val got = spark.table("dedupout").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // arrival order follows doc_id, so the streaming keeps must equal
      // the batch operator's min-doc_id keeps on the full corpus
      val batch = graft.ops.Dedup.exact((b1 ++ b2).toDF("doc_id", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == batch, s"streaming $got vs batch $batch")
      // and the hex hashing matches Spark's md5() bit-for-bit
      assert(got.map(_._1) == batch.map(_._1))
    } finally q.stop()
  }

  test("streaming windowed agg == batch tumbling windows once sealed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams.windowedAgg(source.toDS().toDF(), "1 minute")
      .writeStream.format("memory").queryName("winout")
      .outputMode("append").start()
    try {
      source.addData(batch1)
      q.processAllAvailable()
      source.addData(batch2 ++ sentinel)
      q.processAllAvailable()
      source.addData(Seq(ev(100, 999, 100002))) // flush sealed windows
      q.processAllAvailable()
      val got = spark.table("winout")
        .filter(col("window_start") < to_timestamp(lit((T0 + 50000))))
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      val exp = (batch1 ++ batch2).toDS().toDF()
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sv"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000,
          r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == exp)
    } finally q.stop()
  }
}
