package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.ops.{Dedup, NearDup}

/** Property tests (SURVEY §5.3): invariants on generated inputs, not
  * fixtures. ScalaCheck generators are driven directly (fixed seed per
  * test — reproducible) with 20 cases each.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
  private val rows = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(1L, 5L), Gen.choose(1L, 100L), text))

  private def cases[A](g: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(body)
    }

  test("dedup is idempotent and keeps exactly one row per key") {
    cases(rows, 10) { rs =>
      import spark.implicits._
      val df = rs.toDF("k", "ord", "text")
      val once = Dedup.firstBy(df, Seq("k"),
        Seq(col("ord").asc, col("text").asc))
      val twice = Dedup.firstBy(once, Seq("k"),
        Seq(col("ord").asc, col("text").asc))
      assert(once.collect().toSet === twice.collect().toSet)
      assert(once.select("k").distinct().count() === once.count())
    }
  }

  test("jaccard is 1 for identical docs and within [0,1] for any pair") {
    cases(Gen.zip(text, text), 10) { case (t1, t2) =>
      import spark.implicits._
      val docs = Seq((1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
        .withColumn("shingles", TextFns.shingles("text", 3))
        .select("doc_id", "shingles")
      val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
      val jac = NearDup.jaccard(pairs, docs, "doc_id", "shingles")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(jac((1L, 3L)) === 1.0)
      assert(jac((1L, 2L)) >= 0.0 && jac((1L, 2L)) <= 1.0)
    }
  }

  test("minhash signature entries are bounded by the hash modulus") {
    cases(text, 10) { t =>
      import spark.implicits._
      val docs = Seq((1L, t)).toDF("doc_id", "text")
        .withColumn("shingles", TextFns.shingles("text", 3))
        .select("doc_id", "shingles")
      val sig = NearDup.minHashSigs(docs, "doc_id", "shingles", 8, "sig")
        .head().getSeq[Long](1)
      assert(sig.size === 8)
      assert(sig.forall(v => v >= 0L && v < NearDup.HashP))
    }
  }

  test("simhash is invariant under token order (bag-of-words property)") {
    cases(Gen.nonEmptyListOf(word), 10) { ws =>
      import spark.implicits._
      val docs = Seq((1L, ws.mkString(" ")), (2L, ws.reverse.mkString(" ")))
        .toDF("doc_id", "text")
        .withColumn("toks", TextFns.tokens("text"))
      val sigs = NearDup.withSimHash(docs, "toks", "sh")
        .select("doc_id", "sh")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(sigs(1L) === sigs(2L))
    }
  }

  test("calendar-field decomposition is consistent with the timestamp") {
    cases(Gen.choose(0L, 4102444800000L), 20) { ms => // 1970..2100
      import spark.implicits._
      val r = graft.ops.TimeOps.withCalendarFields(
        Seq(ms).toDF("ms")
          .withColumn("t", graft.ops.TimeOps.fromEpochMillis(col("ms"))), "t")
        .withColumn("recomposed",
          unix_millis(to_timestamp(format_string("%04d-%02d-%02d",
            col("year"), col("month"), col("day")))))
        .head()
      val dayStart = r.getAs[Long]("recomposed")
      assert(ms >= dayStart && ms - dayStart < 86400000L)
    }
  }

  test("distributed running sum equals the window form on random data") {
    cases(Gen.nonEmptyListOf(Gen.choose(0L, 1000L)), 5) { vs =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "v").repartition(7)
      val got = graft.ops.Packing.withRunningSum(df, "cum", "v", col("k"))
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vs.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (c, i) => i.toLong -> c }.toMap
      assert(got === want)
      // the window control agrees too (three-way: op ≡ spec ≡ engine)
      val win = df.withColumn("cum", sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === win)
    }
  }

  test("bin-bucketed interval join equals the naive range join on random events") {
    cases(Gen.nonEmptyListOf(
        Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 5000L))), 5) { evs =>
      import spark.implicits._
      val rows = evs.zipWithIndex
        .map { case ((u, t), i) => (u, i.toLong, t) }
      val l = rows.toDF("user_id", "lid", "lt")
      val r = rows.map { case (u, i, t) => (u, i + 100000L, t + 13L) }
        .toDF("user_id", "rid", "rt")
      val got = graft.ops.IntervalJoin.within(l, r, "user_id", "lt", "rt", 250L)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val want = l.join(r, Seq("user_id"))
        .filter(col("rt") >= col("lt") && col("rt") <= col("lt") + 250L)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got === want)
    }
  }

  test("SCD2 intervals tile each key's timeline and replay to the final state") {
    // keys 1-3, unique (ts, tie) per row, attrs from a 3-letter alphabet
    val updates = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(1L, 50L), Gen.oneOf("A", "B", "C")))
    cases(updates, 10) { rs =>
      import spark.implicits._
      // dedupe (k, ts) collisions deterministically; tie = ts
      val uniq = rs.groupBy(r => (r._1, r._2)).map(_._2.max).toSeq
      val df = uniq.map { case (k, ts, a) => (k, a, ts, ts) }
        .toDF("k", "attr", "ts", "tie")
      val iv = graft.ops.Scd.type2(df, "k", "attr", "ts", "tie").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      iv.groupBy(_._1).foreach { case (k, rows0) =>
        val rows = rows0.sortBy(_._3)
        // contiguous: each valid_to == next valid_from; last open
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a._4.contains(b._3), s"gap at $k")
          case _ =>
        }
        assert(rows.last._4.isEmpty && rows.last._5)
        assert(rows.count(_._5) === 1)
        // replay: the open run's attr is the attr of the key's max-ts update
        val fin = uniq.filter(_._1 == k).maxBy(_._2)._3
        assert(rows.last._2 === fin, s"key $k final state")
        // runs alternate: no two adjacent runs share an attr
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a._2 !== b._2, s"uncollapsed run at $k")
          case _ =>
        }
      }
    }
  }

  test("table diff flags a random single-row mutation, and only then") {
    val mut = Gen.zip(Gen.choose(0L, 99L), Gen.oneOf("edit", "delete"))
    cases(mut, 10) { case (victim, kind) =>
      import spark.implicits._
      val base = (0L until 100L).map(i => (i, s"p$i"))
      val changed = kind match {
        case "edit" => base.map { case (i, p) =>
          (i, if (i == victim) p + "!" else p) }
        case _ => base.filterNot(_._1 == victim)
      }
      val d = graft.ops.TableDiff.diff(
        base.toDF("id", "p"), changed.toDF("id", "p"), "id", Seq("p"), 8)
        .collect()
      assert(d.length === 1, s"$kind of $victim -> ${d.length} buckets")
      // and no false positives on the identity diff
      assert(graft.ops.TableDiff.diff(base.toDF("id", "p"),
        base.toDF("id", "p"), "id", Seq("p"), 8).count() === 0)
    }
  }

  test("connected components match a driver-side union-find on random graphs") {
    // the large-star/small-star rewrite vs an independent reference
    // implementation — random shapes catch what the fixed path/clique
    // fixtures in DedupClustersSpec cannot
    val graph = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    cases(graph, 10) { edges =>
      import spark.implicits._
      val got = graft.ops.DedupClusters
        .connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      // union-find roots are already the component minimum because
      // unions always point the larger root at the smaller
      assert(got === want, s"edges: $edges")
    }
  }

  test("paragraph dedup keeps each distinct paragraph exactly once, corpus-wide") {
    val doc = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    val corpus = Gen.nonEmptyListOf(doc).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    cases(corpus, 10) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val dec = graft.ops.ParagraphDedup
        .decisions(df, "doc_id", "text", 2)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(2)))
      // re-derive the paragraph text per (doc, idx) to group by content
      val paras = docs.flatMap { case (id, t) =>
        t.split(" ").grouped(2).zipWithIndex
          .map { case (seg, i) => (id, i) -> seg.mkString(" ") }
      }.toMap
      dec.groupBy { case (key, _) => paras(key) }.foreach {
        case (para, occurrences) =>
          val kept = occurrences.filter(_._2).map(_._1)
          assert(kept.length === 1,
            s"paragraph '$para' kept ${kept.length} times")
          // first occurrence wins: the kept one is the minimum (doc, idx)
          assert(kept.head === occurrences.map(_._1).min,
            s"paragraph '$para' kept $kept, not the first occurrence")
      }
    }
  }

  test("systematic PPS sampling matches a driver-side replay on random " +
      "weights, and picks per stratum always sum to k") {
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 50L), Gen.oneOf("a", "b", "c")))
      .map(_.zipWithIndex.map { case ((w, s), i) => (i.toLong, s, w) })
    cases(Gen.zip(rowsGen, Gen.choose(1, 6)), 10) { case (rs, k) =>
      import spark.implicits._
      val df = rs.toDF("id", "src", "w")
      val got = graft.ops.Sampling.systematicPps(df, "id", "src", "w", k, "pp")
        .select("src", "id", "n_picks").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

      // driver-side replay of the contract: per stratum, rows ordered by
      // (md5Long("pp|id"), id), k evenly-spaced points on the exact
      // cumulative-weight axis
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long): Long = java.lang.Long.parseLong(
        md.digest(s"pp|$id".getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString.take(15), 16)
      val want = rs.groupBy(_._2).flatMap { case (src, rows) =>
        val tot = rows.map(_._3).sum
        var cum = 0L
        rows.sortBy(r => (h(r._1), r._1)).flatMap { case (id, _, w) =>
          cum += w
          val picks = (cum * k + tot - 1) / tot -
            ((cum - w) * k + tot - 1) / tot
          if (picks > 0) Some((src, id) -> picks) else None
        }
      }
      assert(got === want)
      got.groupBy(_._1._1).foreach { case (src, m) =>
        assert(m.values.sum === k.toLong,
          s"stratum $src picks sum to ${m.values.sum}, not $k")
      }
    }
  }
}
