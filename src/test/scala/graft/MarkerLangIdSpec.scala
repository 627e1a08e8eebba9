package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.MarkerLangId]] bit-identical to the Column
  * formulation it fused (the t1 oracle then pins the same semantics
  * cross-engine against DuckDB). */
class MarkerLangIdSpec extends SparkSpec {
  import spark.implicits._

  /** The original Column-expression reference form. */
  private def referenceLangId(c: String) = {
    val markers = graft.text.TextAnalysis.markers
    def toks = filter(split(lower(col(s"`$c`")), "[^a-zà-ÿ0-9]+"), w => w =!= "")
    val scored = markers.keys.toSeq.sorted.map { lang =>
      val set = array(markers(lang).map(lit): _*)
      struct((-size(filter(toks, w => array_contains(set, w)))).as("neg"),
        lit(lang).as("lang"))
    }
    when(array_min(array(scored: _*)).getField("neg") < 0,
      array_min(array(scored: _*)).getField("lang"))
      .otherwise("unknown")
  }

  test("fused language ID equals the Column reference form") {
    val docs = Seq(
      "the cat and the dog is in that house for now",
      "der hund ist nicht mit der katze auf dem sofa",
      "le chat est dans la maison pour le moment",
      "el perro es una mascota para la casa como siempre",
      "il gatto che dorme della casa per sono una bella",
      "zzz qqq xxx nothing matches here",
      "",
      "the der le el il",       // one hit each → tie → smallest code wins
      "the the der",            // en 2 vs de 1
      "DER HUND IST the",       // case-folded: de 3 vs en 1
      "punct!the,and.of",       // separators split correctly
      "déjà the und der does-it naïve"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.text.TextAnalysis.langId("text").as("fused"),
        referenceLangId("text").as("rx"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: fused=${r.getString(1)} rx=${r.getString(2)}")
    }
    // spot-check the deterministic tie-break
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(7L) == "de")       // tie of 1 each → smallest code
    assert(byId(5L) == "unknown")
    assert(byId(6L) == "unknown")
  }

  test("null stays null; interpreted eval matches codegen") {
    val out = Seq((1L, Some("the and of")), (2L, None))
      .toDF("id", "text")
      .select(graft.text.TextAnalysis.langId("text").as("l"))
      .collect()
    assert(out(0).getString(0) == "en")
    assert(out(1).isNullAt(0))
    val direct = graft.functions.MarkerLangId.langIdOf(
      org.apache.spark.unsafe.types.UTF8String.fromString("the and of"))
    assert(direct.toString == "en")
  }

  test("malformed UTF-8 (dangling lead byte) does not crash") {
    import org.apache.spark.unsafe.types.UTF8String
    // truncated multi-byte tail = token break, not a crash
    val got = graft.functions.MarkerLangId.langIdOf(
      UTF8String.fromBytes(Array[Byte]('t', 'h', 'e', ' ', 0xc3.toByte)))
    assert(got.toString == "en")
  }
}
