package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native matrix·vector projection whose matrix rides a BROADCAST
  * variable instead of plan literals.
  *
  * The Column-API formulation — one `dot(v, array(lit, lit, …))` per
  * output component — inlines outDim × inDim literal nodes into the
  * plan: at JL-projection sizes that is thousands of boxed `Literal`s
  * serialized into EVERY task binary (the "Broadcasting large task
  * binary" warnings in the bench tail), and the plan size grows with
  * `outDim` — a cliff for anyone raising the projection width. Here
  * the expression carries only a broadcast HANDLE (bytes, not the
  * matrix); each executor fetches the matrix once from the block
  * manager, and generated code loops over primitive arrays.
  *
  * Arithmetic is BIT-IDENTICAL to the literal formulation (pinned by
  * SimilaritySpec): per output row j, the same left-to-right fold
  * Σ_i v_i·m_{j,i} over min(|v|, inDim) terms, multiplied by `scale`,
  * then Spark's `round(x, roundScale)` (BigDecimal.valueOf, HALF_UP) —
  * so oracle SQL built from the same matrix stays engine-exact.
  */
case class MatVecProject(child: Expression,
                         matrix: Broadcast[Array[Array[Double]]],
                         scale: Double,
                         roundScale: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "matvec_project"

  /** Projection entry point shared by interpreted eval and codegen. */
  def project(v: ArrayData): ArrayData = {
    val m = matrix.value
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      val n = math.min(v.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
      // Spark Round(DoubleType) semantics: BigDecimal.valueOf + HALF_UP
      out(j) = java.math.BigDecimal.valueOf(s * scale)
        .setScale(roundScale, java.math.RoundingMode.HALF_UP).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = project(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression instance: it serializes as the broadcast
    // HANDLE plus two scalars — the matrix itself never enters the plan
    // or the task binary
    val ref = ctx.addReferenceObj("matVec", this, classOf[MatVecProject].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.project($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
}

object MatVecProject {

  // broadcast memo, keyed by (session, matrix VALUE): repeated
  // randomProject calls in a long-lived session (Bench warm+retime
  // loops, serving sessions) would otherwise register a fresh
  // block-manager broadcast per CALL and never free it — an unbounded
  // leak OpCache.release cannot see. One broadcast per distinct matrix
  // per session is the steady state a serving session expects; the
  // memo is the owner, so [[clearBroadcasts]] can destroy them.
  private val bcMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, Seq[Seq[Double]]),
           Broadcast[Array[Array[Double]]]]

  /** Column wrapper: `v` must be array<double>; `rows` is the matrix
    * (one row per output component), broadcast once per (session,
    * matrix) — repeated calls reuse the memoized broadcast.
    */
  def project(session: org.apache.spark.sql.SparkSession, v: Column,
              rows: Seq[Seq[Double]], scale: Double,
              roundScale: Int): Column = {
    // putIfAbsent, not getOrElseUpdate: TrieMap.getOrElseUpdate may
    // evaluate the thunk in TWO racing first-callers, and the loser's
    // broadcast would be an untracked block-manager leak no registry
    // owns — create eagerly, install atomically, destroy the loser
    val key = (session, rows)
    val bc = bcMemo.get(key).getOrElse {
      val fresh = session.sparkContext.broadcast(rows.map(_.toArray).toArray)
      bcMemo.putIfAbsent(key, fresh) match {
        case Some(winner) => fresh.destroy(); winner
        case None         => fresh
      }
    }
    CatalystBridge.column(MatVecProject(
      CatalystBridge.expression(v), bc, scale, roundScale))
  }

  /** Destroy every memoized broadcast owned by `session` (other
    * sessions' entries untouched). Plans built before the clear must
    * not run after it — the broadcast handle they carry is gone.
    */
  def clearBroadcasts(session: org.apache.spark.sql.SparkSession): Unit =
    bcMemo.keys.filter(_._1 == session).foreach { k =>
      bcMemo.remove(k).foreach(_.destroy())
    }
}
