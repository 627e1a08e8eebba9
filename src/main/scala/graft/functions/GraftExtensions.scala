package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2 "registered via
  * SparkSessionExtensions"): makes graft's native expressions available
  * to pure SQL. Deploy with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`, or
  * call [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val descriptors: Seq[Descriptor] = Seq(
    (new FunctionIdentifier("char_class_census"),
      new ExpressionInfo(classOf[CharClassCensus].getName, "char_class_census"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "char_class_census(str) takes one argument")
        CharClassCensus(args.head)
      }),
    (new FunctionIdentifier("cell_type_vote"),
      new ExpressionInfo(classOf[CellTypeVote].getName, "cell_type_vote"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "cell_type_vote(str) takes one argument")
        CellTypeVote(args.head)
      }),
    (new FunctionIdentifier("pattern_generalize"),
      new ExpressionInfo(classOf[PatternGeneralize].getName, "pattern_generalize"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "pattern_generalize(str) takes one argument")
        PatternGeneralize(args.head)
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, ident, info, builder)
    }
}
