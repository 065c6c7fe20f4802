package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableDiff

class TableDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def table(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "payload")
  }

  private val base = (0L until 200L).map(i => (i, s"payload-$i"))

  test("identical snapshots diff to an empty result") {
    assert(TableDiff.diff(table(base), table(base), "id",
      Seq("payload"), 16).count() === 0)
  }

  test("a changed row is localized to exactly its key's bucket") {
    val changed = base.map { case (i, p) =>
      (i, if (i == 42L) p + "!" else p)
    }
    val got = TableDiff.diff(table(base), table(changed), "id",
      Seq("payload"), 16).collect()
    assert(got.length === 1)
    // counts agree (content change, not cardinality change)
    assert(got.head.getAs[Long]("n_a") === got.head.getAs[Long]("n_b"))
    // the flagged bucket is where id 42 hashes
    val bucket42 = table(Seq((42L, ""))).select(
      expr("""cast(conv(substring(md5(cast(id as string)), 1, 15),
             |  16, 10) as bigint) % 16""".stripMargin))
      .head().getLong(0)
    assert(got.head.getAs[Long]("bucket") === bucket42)
  }

  test("an inserted and a deleted row both surface, with counts") {
    val b = base.filterNot(_._1 == 7L) :+ (1000L, "new")
    val got = TableDiff.diff(table(base), table(b), "id",
      Seq("payload"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length >= 1 && got.length <= 2) // 7 and 1000 may share a bucket
    val dn = got.map(t => t._3 - t._2).sum
    assert(dn === 0L) // one out, one in
  }

  test("order independence: shuffled input produces the same summary") {
    val a = TableDiff.summary(table(base), "id", Seq("payload"), 16)
    val b = TableDiff.summary(
      table(base).repartition(7).sortWithinPartitions(desc("payload")),
      "id", Seq("payload"), 16)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }
}
