package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Audio

/** Scratch measurement main (not part of the shipped surface):
  * in-data document-frequency distributions of the q302/q306 join
  * keys — landmark hashes and envelope band keys — at a given SF dir,
  * to pick a df cap that provably never fires on gated fixtures.
  */
object DfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    import s.implicits._
    if (dir == "sample") {
      val hs = graft.ops.LandmarkTuning.sampleHashes(s)
        .filter(col("q") === 0)
      val d = hs.groupBy("h").agg(count(lit(1)).as("df"))
        .groupBy("df").agg(count(lit(1)).as("n_hashes"))
        .orderBy(desc("df")).limit(12).collect()
      println("SAMPLE_LM_DF_TOP " + d.mkString(" "))
      s.stop()
      return
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]

    // q302 fixture: clickRendition landmark hashes at deltaQ=0
    val lm302 = docs.flatMap { id =>
      val g = id / 4
      val r = id % 4
      val n = (4000 + (g % 7) * 500 + g % 53).toInt
      val sk = if (r == 3) 2 * g + 1 else 2 * g
      val samples = Audio.clickRendition(sk, n, if (r == 3) 0L else r)
      Audio.landmarkHashes(id, Audio.encodeWavSamples(samples, 16000),
          256, 0).distinct.map(h => (id, h))
    }.toDF("doc_id", "h")
    val df302 = lm302.groupBy("h").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_hashes"))
      .orderBy(desc("df")).limit(12).collect()
    println("Q302_LM_DF_TOP " + df302.mkString(" "))

    // q306 fixture: hybridTrain; envelope band keys + landmark hashes
    val feats = docs.map { id =>
      val g = id / 4
      val r = id % 4
      val n = (4000 + (g % 7) * 500 + g % 53).toInt
      val master = Audio.hybridTrain(if (r == 3) 2 * g + 1 else 2 * g, n)
      val samples = r match {
        case 1L => Array.tabulate(n / 2)(k => master(2 * k))
        case 2L =>
          val mw = Audio.encodeWavSamples(master, 16000)
          master.drop(Audio.onsets(id, mw, 256).head.pos.toInt + 3)
        case _ => master
      }
      val wav = Audio.encodeWavSamples(samples,
        if (r == 1L) 8000 else 16000)
      (id, Audio.envelopeHash(id, wav),
        Audio.landmarkHashes(id, wav, 256, 0).distinct)
    }.toDF("doc_id", "fp", "lm_hashes")
    feats.cache()
    val bandsOf = "transform(sequence(0, 4), " +
      "b -> (shiftright(fp, b * 12) & 4095) * 5 + b)"
    val bkDf = feats.select(col("doc_id"), explode(expr(bandsOf)).as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_keys"))
      .orderBy(desc("df")).limit(12).collect()
    println("Q306_BK_DF_TOP " + bkDf.mkString(" "))
    val lmDf = feats.select(col("doc_id"), explode(col("lm_hashes")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_hashes"))
      .orderBy(desc("df")).limit(12).collect()
    println("Q306_LM_DF_TOP " + lmDf.mkString(" "))
    s.stop()
  }
}
