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
    val hc = s.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") === null)
  }

  test("non-empty credentials land on the session Hadoop conf") {
    val s = spark.newSession()
    CloudConf.applyS3a(s, CloudConf.parseDlCfg(cfg))
    val hc = s.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") === "TESTKEYID000000000000")
    assert(hc.get("fs.s3a.secret.key") === "testsecret/NotReal+Value")
    // scrub: the SparkContext (hence hadoopConf) is shared across
    // newSession()s — unset so other specs see a clean conf
    hc.unset("fs.s3a.access.key")
    hc.unset("fs.s3a.secret.key")
  }
}
