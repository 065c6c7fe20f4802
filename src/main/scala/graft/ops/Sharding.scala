package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the consistent
  * document-to-shard router a 100 TB corpus store needs when the
  * shard count CHANGES (SURVEY §2.11 E220).
  *
  * `shard(k, n) = argmax_{s<n} h(k, s)`: each (key, shard) pair gets
  * an independent deterministic weight and the key lives on its
  * heaviest shard. Growing n → n+1 only moves the keys whose NEW
  * shard's weight beats all previous ones — an expected 1/(n+1) of
  * the corpus — while the naive `key mod n` router remaps ~n/(n+1)
  * of all keys (every key whose id changes residue), i.e. a full
  * corpus rewrite on every resize. Thomas–Valduriez/HRW is the
  * standard answer (same family as consistent hashing, but exact
  * balance and no virtual-node ring state).
  *
  * Implementation is ONE scan-local expression, no joins, no state:
  * the n weights are an in-expression `transform(sequence(0, n−1))`
  * over the repo's portable md5 hash, and the argmax is
  * `array_max` over `weight·n + s` encoded longs (weight < 2^32 and
  * s < n keep the encoding collision-free in int64 up to n ≤ ~4·10⁵
  * shards; ties — probability ~2⁻³² per pair — break toward the
  * larger shard id, identically in any engine). Decoding is `% n`.
  *
  * COST: O(n_shards) md5 evaluations PER ROW — that is HRW's
  * intrinsic price for statelessness, not an implementation slip.
  * At realistic shard counts (n ≤ a few thousand: one md5 is ~100 ns,
  * so n = 1024 costs ~0.1 ms/row, amortized trivially against the
  * I/O of writing the row) this is the right trade; the `n ≤ 4·10⁵`
  * require is an encoding bound, not a performance endorsement. For
  * very large n, the standard fix is HIERARCHICAL two-level HRW:
  * route over √n super-shards with one hrwShard, then over the √n
  * shards inside the winner with a second (key, super-shard)-salted
  * hrwShard — 2·√n hashes per row (n = 10⁵ → ~640 vs 10⁵) while
  * keeping the minimal-movement property at each level (a resize of
  * the inner fan-out only moves keys within one super-shard).
  */
object Sharding {

  /** HRW shard of column `keyCol` over `n` shards, as the argmax of
    * the portable per-(key, shard) md5 weight. Deterministic across
    * engines, runs, and partitionings; null key → null shard.
    */
  def hrwShard(keyCol: String, n: Int): Column = {
    require(n > 0 && n <= 400000, s"shard count out of range: $n")
    val w = s"cast(conv(substring(md5(concat(cast(s as string), '#', " +
      s"cast($keyCol as string))), 1, 8), 16, 10) as bigint)"
    expr(
      s"""array_max(transform(sequence(0, ${n - 1}),
         |  s -> $w * ${n}L + s)) % ${n}L""".stripMargin)
  }

  /** Inner level of the hierarchical (two-level) HRW router described
    * above: the HRW shard of `keyCol` over `n` shards WITHIN the
    * super-shard held in column `outerCol` — the weight hash is
    * salted with the super-shard, so each super-shard routes its keys
    * with an independent weight family. Composition:
    * `sup = hrwShard(key, nSup)`, `inner = hrwShardWithin(key, sup,
    * nInner)`, global shard = `sup · nInner + inner` — `nSup + nInner`
    * hashes per row instead of `nSup · nInner`, and a resize of the
    * INNER fan-out moves keys only within their own super-shard
    * (spec-asserted), preserving HRW's minimal-movement property per
    * level.
    */
  def hrwShardWithin(keyCol: String, outerCol: String, n: Int): Column = {
    require(n > 0 && n <= 400000, s"shard count out of range: $n")
    val w = s"cast(conv(substring(md5(concat(cast(s as string), '#', " +
      s"cast($outerCol as string), '|', cast($keyCol as string))), " +
      "1, 8), 16, 10) as bigint)"
    expr(
      s"""array_max(transform(sequence(0, ${n - 1}),
         |  s -> $w * ${n}L + s)) % ${n}L""".stripMargin)
  }
}
