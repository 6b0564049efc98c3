package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rendezvousAssign: growing N moves only the new shard's winners") {
    val base = (0L until 2000L).toDF("id")
    val a8 = Pipeline.rendezvousAssign(base, "id", 8, "s8")
    val a9 = Pipeline.rendezvousAssign(base, "id", 9, "s9")
    val j = a8.join(a9, "id").cache()

    // every moved row moved TO the new shard — the HRW invariant: adding
    // a shard never changes the relative order of the existing ones
    assert(j.filter(col("s8") =!= col("s9") && col("s9") =!= 8).count() === 0)
    // moved fraction ~ 1/9 (binomial around 222/2000)
    val moved = j.filter(col("s8") =!= col("s9")).count()
    assert(moved > 120 && moved < 330, s"moved $moved of 2000")
    // assignment is balanced-ish across the 8 shards (Chernoff-loose)
    val sizes = a8.groupBy("s8").count().collect().map(_.getLong(1))
    assert(sizes.length === 8 && sizes.min > 150 && sizes.max < 350,
      sizes.mkString(","))
    j.unpersist()
    ()
  }

  test("paretoFront window form == brute-force strict dominance") {
    // deterministic scatter incl. cost ties and equal values
    val rows = (0 until 120).map { i =>
      (i.toLong, s"g${i % 2}", (i * 37 % 25).toLong, ((i * 53 % 11) / 10.0))
    }
    val df = rows.toDF("id", "g", "cost", "value")
    val got = graft.ops.Pipeline.paretoFront(df, Seq("g"), "cost", "value")
      .select("id").as[Long].collect().toSet
    val expected = rows.filter { case (_, g, c, v) =>
      !rows.exists { case (_, g2, c2, v2) => g2 == g && c2 < c && v2 > v }
    }.map(_._1).toSet
    assert(got == expected)
  }
}
