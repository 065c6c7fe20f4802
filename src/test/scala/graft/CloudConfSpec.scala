package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CloudConf

class CloudConfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg =
    """[AWS]
      |AWS_ACCESS_KEY_ID='TESTKEYID000000000000'
      |AWS_SECRET_ACCESS_KEY="testsecret/NotReal+Value"
      |[OTHER]
      |AWS_ACCESS_KEY_ID=ignored
      |""".stripMargin

  test("parses the reference dl.cfg shape, quotes stripped, sections scoped") {
    val m = CloudConf.parseDlCfg(cfg)
    assert(m("AWS_ACCESS_KEY_ID") === "TESTKEYID000000000000")
    assert(m("AWS_SECRET_ACCESS_KEY") === "testsecret/NotReal+Value")
    assert(m.size === 2) // [OTHER] section ignored
  }

  test("empty placeholder values (the committed dl.cfg) set nothing") {
    val m = CloudConf.parseDlCfg("[AWS]\nAWS_ACCESS_KEY_ID=''\nAWS_SECRET_ACCESS_KEY=''")
    val s = spark.newSession()
    CloudConf.applyS3a(s, m)
    assert(s.sessionState.newHadoopConf().get("fs.s3a.access.key") === null)
  }

  test("credentials are per-session: set on one, invisible to another") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    CloudConf.applyS3a(s1, CloudConf.parseDlCfg(cfg))
    val hc1 = s1.sessionState.newHadoopConf()
    assert(hc1.get("fs.s3a.access.key") === "TESTKEYID000000000000")
    assert(hc1.get("fs.s3a.secret.key") === "testsecret/NotReal+Value")
    // the sibling session's effective Hadoop conf is untouched — the
    // reason applyS3a goes through the session conf, not the shared
    // sparkContext.hadoopConfiguration
    assert(s2.sessionState.newHadoopConf().get("fs.s3a.access.key") === null)
  }
}
