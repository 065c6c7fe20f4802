package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** The symmetric-delete candidate theorem on purpose-built typo cases:
  * the fixture corpus (supplier names) only exercises substitutions, so
  * insert/delete edits and the distance-2 rejection are pinned here.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def pairs(names: String*): Set[(String, String, Int)] = {
    import spark.implicits._
    FuzzyJoin.selfPairs(names.toDF("name"), "name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  test("substitution, insertion, and deletion edits are all caught") {
    assert(pairs("graft", "croft", "graft") === Set.empty) // dist 2
    assert(pairs("graft", "grift") === Set(("graft", "grift", 1)))
    assert(pairs("graft", "grafts") === Set(("graft", "grafts", 1)))
    assert(pairs("graft", "raft", "rift") ===
      Set(("graft", "raft", 1), ("raft", "rift", 1)))
  }

  test("distance-2 candidates survive the variant join but die at " +
      "the levenshtein verify; exact duplicates produce no self-pair") {
    // "ab" vs "cd": no shared deletion variant, never a candidate;
    // "abc" vs "adc" share variant "ac" → candidate → dist 1 kept;
    // "abcd" vs "acbd" (transposition) is lev 2 → rejected
    assert(pairs("abcd", "acbd") === Set.empty)
    assert(pairs("same", "same", "same") === Set.empty)
  }

  test("deletionVariants emits the string plus each single deletion, " +
      "distinct") {
    import spark.implicits._
    val vs = Seq("aab").toDF("s")
      .select(FuzzyJoin.deletionVariants("s").as("v"))
      .collect()(0).getSeq[String](0)
    // deletions of "aab": "ab" (×2 collapsed), "aa", plus itself
    assert(vs.toSet === Set("aab", "ab", "aa"))
    assert(vs.length === 3)
  }

  test("empty and single-char strings don't blow up") {
    assert(pairs("", "a") === Set(("", "a", 1)))
    assert(pairs("a", "b") === Set(("a", "b", 1)))
  }

  test("q152 plan: candidates come from the variant equi-join — no " +
      "cartesian product anywhere") {
    val df = SparkEntry.queries("q152_fuzzy_names")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the pair join must be an equi-join on the variant key")
  }
}
