package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership dedup — the linear-scan exact-dedup the big
  * crawl pipelines run BETWEEN dumps (Dolma's Bloom-filter dedup;
  * Bloom 1970): instead of joining every new dump against the full
  * accumulated corpus, the corpus is summarized ONCE into an m-bit
  * filter and each incoming document probes k bits map-side.
  *
  * Reference anchor: the reference engine dedups at the cell/row grain
  * by exact grouping (`utils/…` hash-group passes); this module is the
  * corpus-scale completion of that family alongside [[Dedup]]'s d1
  * hash-groupBy — the shape changes because at 100 TB the accumulated
  * corpus no longer wants to be one side of an equi-join every dump.
  *
  * Portability: positions are derived from the document's md5 content
  * hash re-hashed per probe index with [[Dedup.md5Long]]
  * (`pos_j = md5(j ⌣ ':' ⌣ h) mod m`), so the whole filter — build,
  * probe, false positives included — replays bit-exact in any engine
  * with md5 (the d20 DuckDB oracle replays it as two CTEs). False
  * positives are therefore DETERMINISTIC, not a flake source: the
  * probe reports `bloom_hit`, callers that need certainty join the
  * hit slice (only) back against the corpus — the standard
  * "Bloom prefilter + exact confirm on hits" two-phase shape.
  *
  * Scale shape (100 TB): the build is one explode + partially
  * aggregated distinct over positions — O(k·n) rows collapsing to ≤ m;
  * the probe is pure per-row columns against a broadcast bitmap (no
  * shuffle, no state, append-mode stream legal — StreamingSpec pins
  * the MemoryStream run). Set bits are ADDITIVE (set union = bitwise
  * OR), so incremental maintenance is EXACT: [[foldBits]](bits(old),
  * bits(new)) ≡ bits(old ∪ new), spec-pinned — the d13/d17/s10/p11
  * incremental pattern. Sizing: m = 2³³ bits is a 1 GiB bitmap — at
  * that scale swap the collected boolean array for a broadcast
  * long-packed bitset probed by a native kernel; the join-form probe
  * ([[probeJoin]], pinned ≡ the column form) is the no-broadcast
  * fallback when even that is too big.
  */
object BloomDedup {

  /** The k probe positions of a content hash `h` (a hex md5 string
    * column): `pos_j = md5Long(j ':' h) mod m`, j = 0…k−1. */
  def positions(h: Column, m: Int, k: Int): Seq[Column] = {
    require(m > 0 && k > 0, s"need m > 0 and k > 0, got ($m, $k)")
    (0 until k).map(j => pmod(Dedup.md5Long(concat(lit(s"$j:"), h)), lit(m.toLong)))
  }

  /** Build the filter over a corpus: the DISTINCT set-bit positions
    * (`pos`), the engine-portable JOIN form. O(k·n) exploded rows
    * partially aggregated down to ≤ m distinct positions. */
  def setBits(corpus: DataFrame, textCol: String, m: Int, k: Int): DataFrame =
    corpus.select(explode(array(
        positions(md5(col(s"`$textCol`")), m, k): _*)).as("pos"))
      .distinct()

  /** Exact incremental maintenance: set union of stored and new-dump
    * bits ≡ a full rebuild over the concatenated corpus (bit-set OR is
    * associative and idempotent; BloomSpec pins it). */
  def foldBits(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.unionByName(batch).distinct()

  /** Collect the set bits into a dense boolean bitmap — the deployed,
    * broadcastable form. Control-plane sized BY CONSTRUCTION (≤ m
    * entries); the `require` documents the envelope. */
  def bitmap(bits: DataFrame, m: Int): Array[Boolean] = {
    val a = new Array[Boolean](m)
    bits.collect().foreach { r =>
      val p = r.getLong(0)
      require(p >= 0L && p < m, s"set bit $p outside the $m-bit filter")
      a(p.toInt) = true
    }
    a
  }

  /** The deployed probe as a PURE COLUMN over a text column: true iff
    * all k probe bits are set. No shuffle, no state — append-mode
    * stream legal; the k md5 terms share the inner md5(text) via
    * codegen subexpression elimination. */
  def probeColumn(text: Column, bm: Array[Boolean], m: Int, k: Int): Column = {
    require(bm.length == m, s"bitmap length ${bm.length} != m $m")
    val bmLit = typedlit(bm.toSeq)
    positions(md5(text), m, k)
      .map(p => element_at(bmLit, (p + 1L).cast("int")))
      .reduce(_ && _)
  }

  /** Expected false-positive probability of an (m, k) filter holding n
    * distinct keys — the standard (1 − e^(−kn/m))^k estimate (Bloom
    * 1970), the sizing certificate of the [[graft.profile
    * .SketchBounds]] family: size m/k so this stays below the
    * pipeline's tolerance for wrongly-flagged documents (at 100 TB,
    * n = 10¹⁰ hashes into m = 2³⁶ bits with k = 5 gives ~2·10⁻³ —
    * the hit slice a confirm-join then settles exactly). BloomSpec
    * pins the measured deterministic FP rate to this estimate's
    * decade. */
  def expectedFpRate(n: Long, m: Int, k: Int): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / m), k)

  /** The no-broadcast probe: explode the batch's k positions and count
    * matches against the set-bits frame — `bloom_hit` iff all k hit.
    * Same semantics as [[probeColumn]] (BloomSpec pins them equal);
    * use when m outgrows what a broadcast bitmap should hold. */
  def probeJoin(batch: DataFrame, bits: DataFrame, textCol: String,
      idCol: String, m: Int, k: Int): DataFrame = {
    val id = col(s"`$idCol`")
    batch.select(id.as("id"),
        explode(array(positions(md5(col(s"`$textCol`")), m, k): _*)).as("pos"))
      .join(bits.withColumn("__set", lit(1)), Seq("pos"), "left_outer")
      .groupBy("id")
      .agg((sum(coalesce(col("__set"), lit(0))) === k.toLong).as("bloom_hit"))
  }
}
