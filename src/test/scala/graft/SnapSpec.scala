package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snap

/** The [[graft.ops.Snap]] contract, asserted against the session's
  * persistent-RDD registry: pin registers exactly the returned handle,
  * release actually deregisters it — and the pattern it replaces
  * (`Dataset.localCheckpoint()` then `.rdd.unpersist()`) is shown to
  * be the no-op the scaladocs claim, so iterative loops that held only
  * the Dataset were accumulating superseded round state.
  */
class SnapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pin registers the exact handle; release deregisters it") {
    import spark.implicits._
    val sc = spark.sparkContext
    val (df, rdd) = Snap.pin(Seq(1, 2, 3).toDF("x"))
    assert(df.count() === 3L) // materializes the checkpoint
    assert(sc.getPersistentRDDs.contains(rdd.id),
      "pin must persist the returned handle itself")
    Snap.release(rdd)
    assert(!sc.getPersistentRDDs.contains(rdd.id),
      "release must deregister the handle's blocks")
    Snap.release(null) // null-safe
  }

  test("pinEager materializes without a caller-side action") {
    val sc = spark.sparkContext
    import spark.implicits._
    val (df, rdd) = Snap.pinEager(Seq(4, 5).toDF("x"))
    assert(sc.getPersistentRDDs.contains(rdd.id))
    assert(df.count() === 2L)
    Snap.release(rdd)
    assert(!sc.getPersistentRDDs.contains(rdd.id))
  }

  test("tracked checkpoints release on drain: the persistent-RDD " +
      "registry does not grow across two invocations of one query") {
    val sc = spark.sparkContext
    val dir = "/root/testdata/sf0.001"
    // the tracked queue is session-global: other suites invoke query
    // bodies without draining (legal — weak refs pin nothing), so
    // clear their leftovers before counting this test's own
    Snap.drainTracked()
    // a q25-chain query: two tracked one-shot checkpoints per
    // invocation (shingles, signatures)
    val fn = SparkEntry.queries("q259_bbit_minhash")
    def invokeAndDrain(): (Int, Int) = {
      fn(spark, dir).count()
      val released = Snap.drainTracked()
      (released, sc.getPersistentRDDs.size)
    }
    val (rel1, after1) = invokeAndDrain()
    assert(rel1 >= 2, s"expected >= 2 tracked checkpoints, got $rel1")
    assert(Snap.trackedCount === 0)
    val (rel2, after2) = invokeAndDrain()
    assert(rel2 === rel1,
      "second invocation must track the same checkpoint count")
    assert(after2 <= after1,
      s"persistent-RDD registry grew across invocations: $after1 -> $after2")
  }

  test("Dataset-level checkpoint + .rdd.unpersist is the no-op Snap fixes") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val snapped = Seq(7, 8).toDF("x").localCheckpoint()
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "Dataset.localCheckpoint persists an internal RDD")
    snapped.rdd.unpersist(blocking = false)
    assert((sc.getPersistentRDDs.keySet -- before) === added,
      ".rdd.unpersist on a checkpointed frame releases nothing")
    // clean up the leaked internal RDD directly
    added.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
