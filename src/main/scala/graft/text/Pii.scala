package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validated PII detection — the step beyond t12's pattern redaction:
  * a 16-digit run might be a card number or a log line's request id,
  * and the difference matters for both the redaction audit (how much
  * TRUE PII did this corpus carry?) and the false-positive budget.
  * Two detectors with per-document candidate AND validated counts:
  *
  *  - card numbers: `\b\d{16}\b` candidates, Luhn-validated with
  *    integer higher-order-function arithmetic (doubling alternate
  *    digits from the right, mod-10 check) — pure codegen'd column
  *    functions, no UDF;
  *  - IPv4: dotted-quad candidates, octet-range-validated by a strict
  *    alternation pattern (25[0-5]|2[0-4]\d|1?\d?\d — RE2-safe, no
  *    lookarounds, so the same pattern runs in any engine).
  *
  * Redaction deliberately scrubs ALL candidates (over-redaction is
  * the safe failure mode for PII); the validated counts are the
  * audit trail that says how many redactions were real. Stateless
  * per-row columns — stream-legal, no shuffle. */
object Pii {

  private[graft] val CardCand = "\\b\\d{16}\\b"
  private[graft] val IpCand =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val Octet = "(25[0-5]|2[0-4]\\d|1?\\d?\\d)"
  private[graft] val IpValid = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"

  /** Luhn check over a 16-digit string column: left index i doubles
    * when odd (length 16), dd(x) = 2x or 2x−9, valid ⇔ sum ≡ 0
    * (mod 10). Pure integer HOF arithmetic. */
  private[graft] def luhnOk(c: Column): Column = {
    val terms = transform(sequence(lit(1), lit(16)), i => {
      val x = c.substr(i, lit(1)).cast("int")
      when(i % 2 === 1,
        when(x * 2 < 10, x * 2).otherwise(x * 2 - 9)).otherwise(x)
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** (n_card_candidates, n_card_valid, n_ip_candidates, n_ip_valid,
    * redacted) keyed by `idCol` as `id`. Group 0 is passed explicitly
    * to regexp_extract_all (Spark defaults to capture group 1, which
    * errors on group-free patterns and would return bare octets on
    * the strict IP pattern). */
  def validatedRedact(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val t = col(s"`$textCol`")
    val cards = regexp_extract_all(t, lit(CardCand), lit(0))
    df.select(col(s"`$idCol`").as("id"),
      size(cards).as("n_card_candidates"),
      size(filter(cards, c => luhnOk(c))).as("n_card_valid"),
      size(regexp_extract_all(t, lit(IpCand), lit(0)))
        .as("n_ip_candidates"),
      size(regexp_extract_all(t, lit(IpValid), lit(0)))
        .as("n_ip_valid"),
      regexp_replace(regexp_replace(t, lit(CardCand), lit("<CARD>")),
        lit(IpCand), lit("<IP>")).as("redacted"))
  }
}
