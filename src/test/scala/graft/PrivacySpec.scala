package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Privacy

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pseudonym preserves joinability under one salt and unlinks across salts") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("uid", "pa")
    val b = Seq((1L, "z"), (3L, "w")).toDF("uid", "pb")
    val joined = Privacy.pseudonymizeColumn(a, "uid", "s1")
      .join(Privacy.pseudonymizeColumn(b, "uid", "s1"), "uid")
    // the pseudonymized tables still join exactly where the originals did
    assert(joined.select("pa", "pb").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("x", "z")))
    // a rotated salt unlinks: same id, disjoint pseudonyms
    val p1 = Privacy.pseudonymizeColumn(a, "uid", "s1").select("uid").as[String].collect().toSet
    val p2 = Privacy.pseudonymizeColumn(a, "uid", "s2").select("uid").as[String].collect().toSet
    assert((p1 intersect p2).isEmpty)
    // and the pseudonym never leaks the raw id digits
    assert(p1.forall(p => p.length == 16 && p != "1" && p != "2"))
  }

  test("kAnonSuppress keeps exactly the rows in >= k combos") {
    val df = (1 to 10).map(i => (i.toLong, "a")) ++ Seq((11L, "rare"))
    val out = Privacy.kAnonSuppress(df.toDF("id", "quasi"), Seq("quasi"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(out == (1 to 10).map(_.toLong).toSet, "rare combo must be suppressed")
    // k=1 keeps everything
    assert(Privacy.kAnonSuppress(df.toDF("id", "quasi"), Seq("quasi"), 1).count() == 11)
  }
}
