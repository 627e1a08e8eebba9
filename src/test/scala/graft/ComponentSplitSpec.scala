package graft

import graft.dedup.Components
import graft.text.Sampling
import org.apache.spark.sql.functions._

/** Pins [[Sampling.componentSplit]] — the leakage-free split: the
  * no-straddle law (a near-dup component never spans two splits), the
  * singleton identity (unlabelled docs get exactly the t16 doc-grain
  * split), and that the operator actually BITES (a component whose
  * members' own-id hashes disagree is forced into one split). */
class ComponentSplitSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  // a 40-member chain component (ids 0..39), a 2-member component
  // (ids 100, 101), singletons 200..259
  private def fixture() = {
    val pairs = (0L until 39L).map(i => (i, i + 1)) :+ ((100L, 101L))
    val labels = Components.connectedComponents(
      pairs.toDF("a", "b"), "a", "b")._1
    val docs = ((0L to 39L) ++ Seq(100L, 101L) ++ (200L until 260L))
      .map(Tuple1(_)).toDF("doc_id")
    (docs, labels)
  }

  test("no component straddles splits; singletons match the t16 split") {
    val (docs, labels) = fixture()
    val out = Sampling.componentSplit(docs, labels, "doc_id", fractions)
      .select("doc_id", "group_key", "split")
      .as[(Long, Long, String)].collect()
    val byGroup = out.groupBy(_._2)
    byGroup.foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"component straddles splits: ${members.toSeq}")
    }
    // members 0..39 share root 0; 100/101 share root 100
    assert(out.filter(_._1 <= 39L).map(_._2).distinct.toSeq == Seq(0L))
    assert(out.filter(r => r._1 == 100L || r._1 == 101L)
      .map(_._2).distinct.toSeq == Seq(100L))
    // singletons: group_key = own id and split == splitAssign(doc grain)
    val t16 = Sampling.splitAssign(docs, "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.filter(_._1 >= 200L).foreach { case (id, gk, sp) =>
      assert(gk == id && sp == t16(id))
    }
  }

  test("the operator bites: doc-grain hashing WOULD have straddled") {
    val (docs, labels) = fixture()
    val t16 = Sampling.splitAssign(docs, "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // deterministic fact about md5: the 40-member chain's own-id splits
    // are not all equal — the leakage the component split removes
    val chainOwn = (0L to 39L).map(t16).distinct
    assert(chainOwn.length >= 2,
      s"fixture no longer exercises a straddle: $chainOwn")
    val out = Sampling.componentSplit(docs, labels, "doc_id", fractions)
      .filter(col("doc_id") <= 39L)
      .select("split").as[String].collect().distinct
    assert(out.length == 1)
  }

  test("empty label set degrades to exactly splitAssign") {
    val docs = (0L until 50L).map(Tuple1(_)).toDF("doc_id")
    val labels = Seq.empty[(Long, Long)].toDF("id", "component_id")
    val got = Sampling.componentSplit(docs, labels, "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val want = Sampling.splitAssign(docs, "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got == want)
  }
}
