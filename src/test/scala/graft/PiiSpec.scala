package graft

import graft.text.Pii
import org.apache.spark.sql.functions._

/** Pins [[Pii.validatedRedact]] — validated PII detection: the Luhn
  * arithmetic on known-valid/invalid cards, octet-range IP
  * validation, candidate-vs-valid separation, and the over-redaction
  * contract (candidates scrub whether or not they validate). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Pii.validatedRedact(rows.toSeq.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_card_candidates"), r.getAs[Int]("n_card_valid"),
          r.getAs[Int]("n_ip_candidates"), r.getAs[Int]("n_ip_valid"),
          r.getAs[String]("redacted")))).toMap

  test("Luhn: 4111111111111111 validates, off-by-one check digit fails") {
    val got = run(
      (1L, "pay 4111111111111111 now"),
      (2L, "pay 4111111111111112 now"),
      (3L, "ref 1234567812345670 ok"), // Luhn-valid (check 0)
      (4L, "short 411111111111111 and long 41111111111111112"))
    assert(got(1L)._1 == 1 && got(1L)._2 == 1)
    assert(got(2L)._1 == 1 && got(2L)._2 == 0)
    assert(got(3L)._1 == 1 && got(3L)._2 == 1)
    // 15 and 17 digit runs are not candidates at all
    assert(got(4L)._1 == 0 && got(4L)._2 == 0)
  }

  test("IPv4: octet range separates candidates from valid") {
    val got = run(
      (1L, "from 10.255.0.1 ok"),
      (2L, "from 999.300.1.2 bad"),
      (3L, "from 256.1.1.1 bad octet"),
      (4L, "v 1.2.3.4.5 chain"))
    assert(got(1L)._3 == 1 && got(1L)._4 == 1)
    assert(got(2L)._3 == 1 && got(2L)._4 == 0)
    assert(got(3L)._3 == 1 && got(3L)._4 == 0)
    // the 5-part chain: the first dotted quad matches as a candidate
    assert(got(4L)._3 >= 1)
  }

  test("over-redaction: candidates scrub whether or not they validate") {
    val got = run(
      (1L, "a 4111111111111112 b 999.300.1.2 c"))
    assert(got(1L)._5 == "a <CARD> b <IP> c")
    assert(got(1L)._2 == 0 && got(1L)._4 == 0)
  }
}
