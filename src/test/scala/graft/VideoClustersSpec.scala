package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Video

/** Cross-video near-dup (q300): the scene-keyframe blockhash
  * fingerprint ([[Video.sceneKeyframeHashes]]) — election + blockhash
  * in one decode pass, the planted-bit closed form, invariance under
  * the two production dup forms (2x pixel-duplication re-encode and
  * first-scene trim), control separation, and the end-to-end cluster
  * structure.
  */
class VideoClustersSpec extends AnyFunSuite {

  private def plantedHash(seedKey: Long, scene: Long): Long = {
    val bits = (0 until 64).map(b => Video.sceneBlockBit(seedKey, scene, b))
    if (bits.forall(identity)) 0L // all-ones degenerates under strict >
    else bits.zipWithIndex.collect { case (true, b) => 1L << b }.sum
  }

  test("keyframe hashes: one per scene, last frame elected, hash " +
      "equals the planted block bits") {
    val (sk, w, h, ns, sl) = (14L, 16, 8, 4, 4)
    val clip = Video.encodeY4mBlockScenes(sk, w, h, ns, sl, 0L)
    val kfs = Video.sceneKeyframeHashes(1L, clip, 48)
    assert(kfs.length === ns)
    kfs.zipWithIndex.foreach { case (k, s) =>
      assert(k.scene === s.toLong)
      assert(k.keyframe === (s * sl + sl - 1).toLong) // ramp: last frame
      assert(k.kf_hash === plantedHash(sk, s.toLong))
    }
  }

  test("a 2x pixel-duplication re-encode keeps every keyframe hash; " +
      "a first-scene trim keeps every surviving one; a control " +
      "shares none") {
    val (sk, ns) = (20L, 5)
    val master = Video.sceneKeyframeHashes(1L,
      Video.encodeY4mBlockScenes(sk, 16, 8, ns, 4, 0L), 48)
    val upscale = Video.sceneKeyframeHashes(2L,
      Video.encodeY4mBlockScenes(sk, 32, 16, ns, 4, 0L), 48)
    assert(master.map(_.kf_hash) === upscale.map(_.kf_hash))
    val trimmed = Video.sceneKeyframeHashes(3L,
      Video.encodeY4mBlockScenes(sk, 16, 8, ns - 1, 4, 1L), 48)
    assert(trimmed.map(_.kf_hash) === master.tail.map(_.kf_hash))
    val control = Video.sceneKeyframeHashes(4L,
      Video.encodeY4mBlockScenes(sk + 1, 16, 8, ns, 4, 0L), 48)
    assert(control.map(_.kf_hash)
      .intersect(master.map(_.kf_hash)).isEmpty)
  }

  test("the upscale twin really is the pixel-duplication of the " +
      "master frame-for-frame") {
    val sk = 7L
    val m = Video.encodeY4mBlockScenes(sk, 16, 8, 2, 2, 0L)
    val u = Video.encodeY4mBlockScenes(sk, 32, 16, 2, 2, 0L)
    // compare frame 0's Y planes: u(y, x) == m(y/2, x/2)
    def yPlane(bytes: Array[Byte], w: Int, h: Int, frame: Int) = {
      val hdr = bytes.indexOf('\n'.toByte) + 1
      val frameLen = 6 + 3 * w * h // "FRAME\n" + planes
      val off = hdr + frame * frameLen + 6
      Array.tabulate(h, w)((y, x) => bytes(off + y * w + x) & 0xff)
    }
    val mp = yPlane(m, 16, 8, 0)
    val up = yPlane(u, 32, 16, 0)
    for (y <- 0 until 16; x <- 0 until 32)
      assert(up(y)(x) === mp(y / 2)(x / 2), s"pixel ($x,$y)")
  }

  test("blockhash needs dims divisible by 8 — fails loudly otherwise") {
    intercept[IllegalArgumentException] {
      Video.sceneKeyframeHashes(1L,
        Video.encodeY4m(1L, 4, 4, 4, 2), 48)
    }
  }

  test("end-to-end clusters at sf0.001: each id/4 group resolves to " +
      "one {master, re-encode, trim} cluster plus a control " +
      "singleton, quality-max keep") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q300_video_clusters")(
      s, "/root/testdata/sf0.001").collect()
    val byRep = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // 500 docs: 125 groups of 4 — a trio cluster + a control singleton
    assert(rows.map(_.getLong(1)).sum === 500L)
    assert(rows.length === 250)
    for (g <- 0 until 125) {
      val (nDocs, nKf) = byRep(4L * g)
      assert(nDocs === 3L, s"group $g trio")
      val ns = 3 + g % 3
      assert(nKf === ns.toLong, s"group $g distinct hashes")
      assert(byRep(4L * g + 3) === ((1L, ns.toLong)), s"group $g control")
    }
    // the kept doc is a member (>= the min-id rep by construction)
    rows.foreach(r => assert(r.getLong(3) >= r.getLong(0)))
  }
}
