package graft

import graft.ops.{MissingOps, PointwiseOps, TemporalOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named-transform registry and pipeline spec — the engine's "query
  * language" (SURVEY §3): the reference's remote invocation form is a
  * name + positional args dispatched to a function
  * (`{"type":"tlag","args":[10]}`, reference README.md:28-30), composed
  * left-to-right. Here the same spec builds a single lazy Catalyst plan
  * over the panel's `value` column: composing transforms never
  * materialises intermediates, and Catalyst collapses the stacked
  * windows (all share the unit partitioning) into a plan with one
  * shuffle for the whole chain.
  */
object Registry {

  /** A transform: (panel, positional args) → panel with `value`
    * replaced by the transformed series.
    */
  type Transform = (DataFrame, Seq[Double]) => DataFrame

  private def colT(f: (Column, Seq[Double]) => Column): Transform =
    (df, args) => df.withColumn("value", f(col("value"), args))

  val transforms: Map[String, Transform] = Map(
    // names follow the reference registry (views_2.py function names)
    "identity" -> ((df, _) => df),
    "ge" -> colT((c, a) => PointwiseOps.greaterOrEqual(c, a.head).cast("double")),
    "le" -> colT((c, a) => PointwiseOps.smallerOrEqual(c, a.head).cast("double")),
    "in_range" -> colT((c, a) => PointwiseOps.inRange(c, a(0), a(1)).cast("double")),
    "ln" -> colT((c, _) => PointwiseOps.ln(c)),
    "decay" -> colT((c, a) => PointwiseOps.decay(c, a.head)),
    "tlag" -> colT((c, a) => TemporalOps.tlag(c, a.head.toInt)),
    "tlead" -> colT((c, a) => TemporalOps.tlead(c, a.head.toInt)),
    "delta" -> colT((c, a) => TemporalOps.delta(c, a.head.toInt)),
    "moving_average" -> colT((c, a) => TemporalOps.movingAverage(c, a.head.toInt)),
    "moving_sum" -> colT((c, a) => TemporalOps.movingSum(c, a.head.toInt)),
    "rollmax" -> colT((c, a) => TemporalOps.rollmax(c, a.head.toInt)),
    "mean" -> colT((c, _) => TemporalOps.meanOverTime(c)),
    "demean" -> colT((c, _) => TemporalOps.demean(c)),
    "onset_possible" -> colT((c, a) => TemporalOps.onsetPossible(c, a.head.toInt).cast("double")),
    "onset" -> colT((c, a) => TemporalOps.onset(c, a.head.toInt).cast("double")),
    "temporal_entropy" -> colT((c, a) => TemporalOps.temporalEntropy(c, a(0).toInt, a(1))),
    "cweq" -> ((df, a) => {
      val seed = if (a.length > 1) Some(a(1).toInt) else None
      TemporalOps.cweq(df, "value", a.head, seed, out = "__cw")
        .withColumn("value", col("__cw").cast("double")).drop("__cw")
    }),
    "time_since" -> ((df, a) => {
      val v = if (a.nonEmpty) a.head else 0.0
      val seed = if (a.length > 1) Some(a(1).toInt) else None
      TemporalOps.timeSince(df, "value", v, seed, out = "__ts")
        .withColumn("value", col("__ts").cast("double")).drop("__ts")
    }),
    "replace_na" -> ((df, a) =>
      MissingOps.replaceNa(df, Seq("value"), if (a.nonEmpty) a.head else 0.0)),
  )

  /** One step of a pipeline spec. */
  final case class Step(name: String, args: Seq[Double])

  /** Apply a named transform. */
  def apply(df: DataFrame, step: Step): DataFrame =
    transforms.getOrElse(step.name,
      throw new IllegalArgumentException(
        s"unknown transform '${step.name}'; known: ${transforms.keys.toSeq.sorted.mkString(", ")}"))
      .apply(df, step.args)

  /** Compose a whole pipeline left-to-right into one lazy plan. */
  def pipeline(df: DataFrame, steps: Seq[Step]): DataFrame =
    steps.foldLeft(df)(apply)

  /** Parse a JSON spec like
    * `[{"type":"tlag","args":[2]},{"type":"decay","args":[12]}]`
    * (the reference's remote-transform wire format).
    */
  def parse(json: String): Seq[Step] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(json) match {
      case JArray(items) => items.map {
        case obj: JObject =>
          val name = (obj \ "type") match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException(s"missing 'type' in $obj")
          }
          val args = (obj \ "args") match {
            case JArray(vs) => vs.map {
              case JInt(i) => i.toDouble
              case JDouble(d) => d
              case JLong(l) => l.toDouble
              case other => throw new IllegalArgumentException(s"non-numeric arg $other")
            }
            case JNothing => Seq.empty[Double]
            case other => throw new IllegalArgumentException(s"bad args $other")
          }
          Step(name, args)
        case other => throw new IllegalArgumentException(s"bad step $other")
      }
      case other => throw new IllegalArgumentException(s"spec must be a JSON array, got $other")
    }
  }

  def run(df: DataFrame, json: String): DataFrame = pipeline(df, parse(json))
}
