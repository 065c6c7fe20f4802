package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeStub computes deterministic byte features") {
    val payload = "hello".getBytes("UTF-8")
    val md = MessageDigest.getInstance("MD5")
    val f = Multimodal.decodeStub(
      Multimodal.MediaRecord(7L, payload, "txt"), md)
    assert(f.doc_id === 7L)
    assert(f.n_bytes === 5L)
    assert(f.head_sum === payload.map(_ & 0xff).sum.toLong)
    assert(f.checksum === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
  }

  test("mapPartitions plumbing preserves every record") {
    implicit val s = spark
    import s.implicits._
    val docs = Seq((1L, "abc"), (2L, "defg"), (3L, ""))
      .toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f.n_bytes).toMap
    assert(feats === Map(1L -> 3L, 2L -> 4L, 3L -> 0L))
  }
}
