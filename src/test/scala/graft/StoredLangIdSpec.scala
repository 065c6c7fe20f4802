package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.ops.ModelStore

/** The stored-model lang-ID contract (q278): profile store roundtrip,
  * scoring against caller-supplied (trained) profiles, and the
  * fallback rule — a document in a language the model was never
  * trained on must come back 'und', never a confident wrong guess.
  */
class StoredLangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("an UNSEEN language falls back to 'und'; trained languages " +
      "score; argmax ties break by language order") {
    import spark.implicits._
    val profiles = Seq(
      "de" -> Seq("der", "die"),
      "en" -> Seq("the", "a"))
    val df = Seq(
      (1L, "the cat sat on a mat"),       // en: 3 hits
      (2L, "der hund und die katze"),     // de: 2 hits
      (3L, "tata kumi rahe volu nata"),   // unseen language: 0 hits
      (4L, "the der"))                    // 1–1 tie → first language (de)
      .toDF("id", "text")
      .withColumn("__toks", expr("filter(split(text, ' '), t -> t <> '')"))
    val out = TextFns.withLanguageIdFrom(df, profiles, "__toks", "pred")
      .select("id", "pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und",
      "a language outside every trained profile must fall back to 'und'")
    assert(out(4L) === "de", "ties must break by profile order")
  }

  test("profile store roundtrip: save then load returns the same " +
      "(lang -> tokens) map, languages and tokens sorted") {
    val path = Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_langprof_spec")
        .toString) + "/model"
    val prof = Seq(("en", "the"), ("de", "der"), ("en", "a"))
    ModelStore.saveTokenProfiles(spark, path, prof)
    val back = ModelStore.loadTokenProfiles(spark, path)
    assert(back === Seq("de" -> Seq("der"), "en" -> Seq("a", "the")))
  }

  test("q278 end-to-end at sf0.001: the trained model separates the " +
      "planted statistics — every held-out document correct") {
    val rows = SparkEntry.queries("q278_stored_lang_id")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // the planted 67%-df markers survive discovery, the 14%-df noise
    // markers are rejected, and the shared high-df vocabulary (in
    // every profile) cannot flip an argmax — so prediction is exact
    val wrong = rows.filterNot(_.getAs[Boolean]("correct"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("pred_lang")))
    assert(wrong.isEmpty, s"mispredicted: ${wrong.take(5)}")
  }
}
