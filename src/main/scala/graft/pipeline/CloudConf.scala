package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Cloud-storage connector configuration (SURVEY §2 C1): the reference
  * reads an ini-style `dl.cfg` and exports AWS credentials to the
  * environment for the S3A connector (`/root/reference/etl.py:12–16`,
  * `dl.cfg`). The Spark-native equivalent sets the Hadoop configuration
  * on the live session — per-session, no process-global env mutation,
  * and effective for every `s3a://` path the session touches.
  *
  * Locally there is no object store, so the effect is only asserted on
  * the Hadoop conf (spec); on a real cluster these are exactly the keys
  * the S3A connector reads. Credential VALUES never appear in code or
  * logs — they come from the caller's config text.
  */
object CloudConf {

  /** Parse the reference's `dl.cfg` ini shape: a `[AWS]` section with
    * `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY` entries, values
    * optionally single-quoted (the reference ships `''`). Unknown lines
    * and other sections are ignored.
    */
  def parseDlCfg(cfgText: String): Map[String, String] = {
    var section = ""
    val kv = Map.newBuilder[String, String]
    cfgText.linesIterator.map(_.trim).foreach {
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1)
      case l if l.contains("=") && section == "AWS" =>
        val Array(k, v) = l.split("=", 2)
        kv += k.trim -> v.trim.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
      case _ => ()
    }
    kv.result()
  }

  /** Apply credentials for S3A as RAW Hadoop keys on the SESSION conf:
    * `SessionState.newHadoopConf()` overlays every session-conf entry
    * verbatim onto the Hadoop conf each data source resolves against,
    * so the keys are per-session — NOT `sparkContext
    * .hadoopConfiguration`, one object shared by every session on the
    * context (two sessions with different credentials would clobber
    * each other), and NOT a runtime `spark.hadoop.*` prefix (only
    * stripped from the static SparkConf at context startup; at runtime
    * it is copied verbatim and S3A never sees it — measured on 4.1.2).
    * Empty values (the reference's committed placeholder) fall through
    * to the provider chain (instance profile / env), which is the
    * production posture anyway — static keys in a cfg file are the
    * pattern the reference uses, not a recommendation.
    */
  def applyS3a(spark: SparkSession, cfg: Map[String, String]): Unit = {
    cfg.get("AWS_ACCESS_KEY_ID").filter(_.nonEmpty)
      .foreach(spark.conf.set("fs.s3a.access.key", _))
    cfg.get("AWS_SECRET_ACCESS_KEY").filter(_.nonEmpty)
      .foreach(spark.conf.set("fs.s3a.secret.key", _))
  }
}
