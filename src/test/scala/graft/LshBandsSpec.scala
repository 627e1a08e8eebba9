package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.LshBands]] bit-identical to the Column
  * formulation it fused (the w9 oracle then pins the same semantics
  * cross-engine against DuckDB). */
class LshBandsSpec extends SparkSpec {
  import spark.implicits._

  private val P = graft.dedup.Dedup.P

  /** The original Column-expression reference form of
    * inlineLshBuckets' per-row chain (pre-fusion). */
  private def referenceBuckets(df: org.apache.spark.sql.DataFrame,
      shingleSize: Int, numPerms: Int, rowsPerBand: Int) = {
    val ws = col("__ws")
    val grams = when(size(ws) >= shingleSize,
      transform(sequence(lit(0), size(ws) - shingleSize),
        i => array_join(slice(ws, i + lit(1), lit(shingleSize)), " ")))
      .otherwise(array().cast("array<string>"))
    val perms = (1 to numPerms).map(i => ((2 * i + 1).toLong, (7919L * i) % P))
    val mins = perms.map { case (a, b) =>
      array_min(transform(col("__hs"), h => pmod(lit(a) * h + lit(b), lit(P))))
    }
    val bands = (0 until numPerms / rowsPerBand).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => mins(i).cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", hs: _*)).as("bucket"))
    }
    df.select(col("id"),
        array_distinct(filter(grams, g => length(g) > 0)).as("__gs"))
      .filter(size(col("__gs")) > 0)
      .withColumn("__hs",
        transform(col("__gs"), g => pmod(graft.dedup.Dedup.md5Long(g),
          lit(1073741824L))))
      .select(col("id"), explode(array(bands: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  test("fused band buckets equal the Column reference form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "the quick brown fox leaps over the lazy dog"), // near dup
      (4L, "completely different content with other words entirely"),
      (5L, "short doc"),                                   // < 3 words → no rows
      (6L, "repeat repeat repeat repeat repeat repeat"),   // distinct grams = 1
      (7L, "accented déjà vu façade naïve über tokens here")
    ).toDF("doc_id", "text")
    val withWs = docs.select(col("doc_id").as("id"),
      expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')").as("__ws"))
    val fused = graft.dedup.Dedup.inlineLshBuckets(docs, "text", "doc_id",
        shingleSize = 3, numPerms = 16, rowsPerBand = 4)
      .as[(Long, Int, String)].collect().toSet
    val reference = referenceBuckets(withWs, 3, 16, 4)
      .as[(Long, Int, String)].collect().toSet
    assert(fused == reference)
    // sanity: exact dups share all 4 buckets; short doc absent
    val byId = fused.groupBy(_._1)
    assert(byId(1L).map(t => (t._2, t._3)) == byId(2L).map(t => (t._2, t._3)))
    assert(!byId.contains(5L))
    assert(byId(1L).size == 4)
  }

  test("interpreted eval matches codegen") {
    val words = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("alpha", "beta", "gamma", "delta").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val direct = graft.functions.LshBands.bandsOf(words, 3, 16, 4)
    val viaPlan = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .select(graft.functions.LshBands(
        expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')"),
        3, 16, 4).as("b"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(direct.numElements() == viaPlan.size)
    viaPlan.zipWithIndex.foreach { case (row, i) =>
      val ir = direct.getStruct(i, 2)
      assert(row.getInt(0) == ir.getInt(0))
      assert(row.getString(1) == ir.getUTF8String(1).toString)
    }
  }
}
