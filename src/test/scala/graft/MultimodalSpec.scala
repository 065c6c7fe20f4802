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

  test("sampleFrames slices byte windows with exact sums and checksums") {
    implicit val s = spark
    import s.implicits._
    val text = "ab" * 40 // 80 bytes -> frames of 64 + 16
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(docs), 64)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 2)
    assert(frames.map(_.frame_len).toSeq === Seq(64L, 16L))
    val bytes = text.getBytes("UTF-8")
    assert(frames(0).frame_sum === bytes.take(64).map(_ & 0xff).sum.toLong)
    assert(frames(1).frame_sum === bytes.drop(64).map(_ & 0xff).sum.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(bytes.take(64))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(frames(0).frame_checksum === expected)
  }

  test("resizeStub keeps every stride-th byte, checksums the reduced payload") {
    implicit val s = spark
    import s.implicits._
    val text = "abcdefghij" // stride 4 keeps a, e, i
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = Multimodal.resizeStub(Multimodal.asMedia(docs), 4)
      .collect().head
    assert(r.orig_bytes === 10L)
    assert(r.resized_bytes === 3L)
    assert(r.resized_sum === ("aei".getBytes("UTF-8").map(_ & 0xff).sum).toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("aei".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(r.resized_checksum === expected)
  }

  test("sniffFormat detects every real container by magic, never guesses") {
    import graft.ops.{Audio, Video}
    assert(Multimodal.sniffFormat(Multimodal.encodePpm(1L, 2, 2)) === "ppm")
    assert(Multimodal.sniffFormat(
      Multimodal.encodeGradientPng(1L, 4, 3)) === "png")
    assert(Multimodal.sniffFormat(Multimodal.encodeJpeg(1L, 8, 6)) === "jpeg")
    assert(Multimodal.sniffFormat(Audio.encodeWav(1L, 10, 8000)) === "wav")
    assert(Multimodal.sniffFormat(
      Video.encodeY4m(1L, 2, 2, 1, -1)) === "y4m")
    // near-misses must NOT match: truncated magic, RIFF without WAVE,
    // P5 (grayscale pnm), empty
    assert(Multimodal.sniffFormat("P5\n1 1\n255\n".getBytes("US-ASCII"))
      === "unknown")
    assert(Multimodal.sniffFormat("RIFF0000AVI ".getBytes("US-ASCII"))
      === "unknown")
    assert(Multimodal.sniffFormat(Array[Byte](0x89.toByte, 'P', 'N'))
      === "unknown")
    assert(Multimodal.sniffFormat(Array.emptyByteArray) === "unknown")
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
