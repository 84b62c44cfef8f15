package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or inject into a live session via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage, "", "", "", "", "", "", "built-in")

  import org.apache.spark.sql.graftbridge.CatalystBridge.{column, eagerExpression}

  /** A 1-arg SQL function from a composed Column transform: the
    * builder re-expresses the library's Column-level operator as the
    * Catalyst expression tree SQL analysis expects — pure SQL users
    * (`spark.sql("SELECT graft_quality(text) ...")`) get the exact
    * codegen'd plan the DataFrame API builds, no UDF involved.
    */
  private def unary(name: String, usage: String)
                   (f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, info(getClass.getName, name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes exactly 1 argument")
        eagerExpression(f(column(args.head)))
      })

  val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info(classOf[DotProduct].getName, "dot_product",
        "_FUNC_(a, b) - dot product of two array<double> columns"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }),
    ("graft_decay",
      info(getClass.getName, "graft_decay",
        "_FUNC_(x, halflife) - 2^(-x/halflife) decay kernel"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_decay takes exactly 2 arguments")
        eagerExpression(org.apache.spark.sql.functions.pow(
          org.apache.spark.sql.functions.lit(2.0),
          -(column(args.head) / column(args(1)))))
      }),
    unary("graft_quality",
      "_FUNC_(text) - heuristic [0,1] document quality score")(
      graft.text.TextOps.qualityScore),
    unary("graft_lang",
      "_FUNC_(text) - stopword-marker language prediction")(
      graft.text.TextOps.langId),
    unary("graft_fingerprint",
      "_FUNC_(text) - md5 fingerprint of the normalised text")(
      graft.text.TextOps.fingerprint),
    unary("graft_tokens",
      "_FUNC_(text) - whitespace token count")(
      graft.text.TextOps.tokenCount),
    ("nfc_normalize",
      info(classOf[NfcNormalize].getName, "nfc_normalize",
        "_FUNC_(text) - canonical-composition (NFC) unicode normalization"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(args.head)
      }),
  )

  /** Register on an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
