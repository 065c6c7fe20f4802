package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface ≡ DataFrame surface (SURVEY §7.2.6): the same logical
  * query through `spark.sql` over temp views and through the DataFrame
  * API must produce identical results — they are two frontends over one
  * plan representation.
  */
class SqlDataFrameParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  test("grouped aggregation: spark.sql ≡ DataFrame API") {
    val df = Tables(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .orderBy("o_orderstatus")
    Tables(spark, dir, "orders").createOrReplaceTempView("v_par_orders")
    val sql = spark.sql("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM v_par_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    assert(df.collect().toSeq === sql.collect().toSeq)
  }

  test("composite-key join: spark.sql ≡ DataFrame API") {
    val li = Tables(spark, dir, "lineitem")
    val df = li.join(li.select("l_partkey", "l_suppkey").distinct(),
        Seq("l_partkey", "l_suppkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy("l_partkey")
    li.createOrReplaceTempView("v_par_li")
    val sql = spark.sql("""
      SELECT l.l_partkey, COUNT(*) AS n
      FROM v_par_li l
      JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM v_par_li) c
        ON l.l_partkey = c.l_partkey AND l.l_suppkey = c.l_suppkey
      GROUP BY l.l_partkey ORDER BY l.l_partkey""")
    assert(df.collect().toSeq === sql.collect().toSeq)
  }
}
