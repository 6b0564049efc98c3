package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch form of the same transform") {
    // stage a directory containing only events.parquet (file-stream source)
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventsStream.startToMemory(spark, dir.toString, "stream_out")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventsStream.windowedAggBatch(spark, TestSpark.sfDir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
