package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Source robustness at fleet scale: among millions of ingested files
  * some WILL be truncated or garbage; `ignoreCorruptFiles` is the
  * switch between "the 100 TB job dies at hour 9" and "the bad file is
  * skipped and logged". Both behaviors are contract: fail-fast by
  * default (silent data loss must be opt-in), skip when asked.
  */
class CorruptFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mixedDir(): String = {
    import spark.implicits._
    val dir = Scratch.register(
      Files.createTempDirectory("graft_corrupt_spec").toString)
    Seq(1L, 2L, 3L).toDF("id").coalesce(1).write
      .mode("overwrite").parquet(dir)
    // a file with a parquet footer magic but garbage content
    Files.write(new java.io.File(dir, "part-junk.parquet").toPath,
      "not a parquet file at allPAR1".getBytes("UTF-8"))
    dir
  }

  test("default read fails fast on a corrupt file") {
    // the DEFAULT is the contract under test: the session must not have
    // opted into silent skipping...
    assert(!spark.conf.get("spark.sql.files.ignoreCorruptFiles").toBoolean)
    val dir = mixedDir()
    // ...and the unconfigured read must die on the corrupt file
    // specifically (not some unrelated analysis error)
    val e = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("part-junk.parquet")),
      s"expected a corrupt-file failure, got: ${chain(e).mkString(" | ")}")
  }

  test("ignoreCorruptFiles skips the bad file and keeps the good rows") {
    val dir = mixedDir()
    val got = spark.read.option("ignoreCorruptFiles", "true")
      .parquet(dir).collect().map(_.getLong(0)).sorted
    assert(got === Array(1L, 2L, 3L))
  }
}
