package graft.profile

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pluggable semantic typing (SURVEY.md §2.9 M8/M9; reference: Doduo
  * viznet annotation at profiling/profiler.py:129-131 and BERT
  * column-name classification at
  * column_features/column_name_features.py:57-137).
  *
  * The reference depends on downloaded transformer weights; the engine
  * must stay deterministic and network-free (SURVEY.md §7.3), so the
  * model boundary is this trait with a name+profile heuristic default.
  * Typing runs driver-side over DISTINCT column names/profiles
  * (#columns rows) and the result broadcast-joins onto anything.
  */
trait SemanticTyper extends Serializable {
  /** Semantic label for a column given its name and profile row. */
  def typeOf(columnName: String, profile: Row): String
}

/** Deterministic heuristic default: column-name keywords first (the
  * BERT-prototype analogue), profile shape as fallback (the Doduo
  * analogue). Labels follow the reference's viznet vocabulary subset
  * used by rules (city/state/region/rank/status/duration/...). */
object HeuristicTyper extends SemanticTyper {
  private val nameRules: Seq[(String, String)] = Seq(
    "zip|postal" -> "zip", "city" -> "city", "state" -> "state",
    "region" -> "region", "country|nation" -> "country",
    "phone|mobile|fax" -> "phone", "mail" -> "email",
    "date|time|_ts|^ts$" -> "date", "name" -> "name",
    "status|flag" -> "status", "rank|priority" -> "rank",
    "price|cost|bal|amount|total" -> "amount",
    "id$|key$|^id|number" -> "identifier")

  def typeOf(columnName: String, profile: Row): String = {
    val lower = columnName.toLowerCase
    nameRules.collectFirst {
      case (re, label) if re.r.findFirstIn(lower).isDefined => label
    }.getOrElse {
      val t = profile.getAs[String]("inferred_type")
      val unique = profile.getAs[Double]("unique_ratio")
      t match {
        case "integer" | "float" if unique >= 0.95 => "identifier"
        case "integer" | "float" => "measure"
        case "date" => "date"
        case "boolean" => "status"
        case "categorical" => "category"
        case _ => "text"
      }
    }
  }
}

object SemanticTyping {
  /** Annotate a profile frame with semantic types (driver-side over
    * #columns rows, like the reference's per-column model pass). */
  def annotate(profiles: DataFrame, typer: SemanticTyper = HeuristicTyper): DataFrame = {
    val spark = profiles.sparkSession
    import spark.implicits._
    val rows = profiles.collect()
    val typed = rows.map { r =>
      (r.getAs[String]("table"), r.getAs[String]("column"),
        typer.typeOf(r.getAs[String]("column"), r))
    }.toSeq
    profiles.join(
      broadcast(typed.toDF("table", "column", "semantic_type")),
      Seq("table", "column"), "left_outer")
  }
}
