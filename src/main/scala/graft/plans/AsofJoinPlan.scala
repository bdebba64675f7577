package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BaseOrdering, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/**
 * ASOF join as a first-class Catalyst operator — the top tier of the
 * extension ladder (custom LogicalPlan + Strategy + SparkPlan), used
 * where composition genuinely costs more: the window formulation in
 * `q_join_asof` unions both inputs into ONE shuffle+sort whose state
 * carries every left row through the window machinery; this operator
 * shuffles each side once on its own keys and then streams a
 * per-partition merge with O(1) state (the single current candidate).
 *
 * Semantics (ClickHouse `ASOF JOIN`, reachable through the reference's
 * SQL passthrough — reference src/clickhouse_scan.rs:78): for every
 * left row, the right row with equal keys and the greatest right-time
 * <= left-time. `outer=false` drops unmatched left rows (CH default
 * ASOF); `outer=true` keeps them null-extended (CH ASOF LEFT JOIN).
 *
 * Scale shape: requiredChildDistribution clusters BOTH sides on the
 * join keys (storage-partitioned native tables satisfy it with zero
 * exchanges), requiredChildOrdering asks for (keys, time) sort within
 * partitions, and execution is a single forward pass over co-located
 * sorted partitions — no pair explosion, no per-key buffering of the
 * right side, spill handled by the sorter not the join.
 */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, outer: Boolean)
    extends BinaryNode {
  // USING-style output: the right key columns are equal to the left's
  // by definition, so they are dropped — no ambiguous key names when
  // both sides share them (the common case).
  override def output: Seq[Attribute] = {
    val rOut = right.output.filterNot(rightKeys.contains)
    left.output ++ (if (outer) rOut.map(_.withNullability(true)) else rOut)
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoin logical → AsofJoinExec physical. */
object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, outer) =>
      AsofJoinExec(lk, rk, lt, rt, outer,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, outer: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = {
    val rOut = right.output.filterNot(rightKeys.contains)
    left.output ++ (if (outer) rOut.map(_.withNullability(true)) else rOut)
  }

  // Both sides hash-cluster on their join keys; EnsureRequirements
  // inserts exchanges only where an input isn't already co-partitioned
  // (a key-grouped bucketed scan or a reused shuffle passes through).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (keys, time) sort within partitions — the merge is one forward pass.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val isOuter = outer
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      // bind against NULLABLE right attrs: outer rows feed an all-null
      // right side, and a non-nullable BoundReference would read junk
      // (0.0/0) instead of null
      val rBind = if (isOuter) rOut.map(_.withNullability(true)) else rOut
      val resultProj = UnsafeProjection.create(allOut, lOut ++ rBind)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // current right cursor (row + its projected key/time, all copied
        // because the underlying reader reuses row buffers)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: InternalRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rRow = r.copy()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).copy()
          } else { rRow = null; rKey = null; rTime = null }
        advanceRight()

        // latest right row with key == candidateKey and time <= the
        // left time that admitted it — O(1) state per partition
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        // next (left, right-or-nullRow) pair to emit. The projection to
        // an output row happens in next(), AFTER the consumer is done
        // with the previous one — resultProj reuses a single buffer, so
        // projecting eagerly here would overwrite a row already handed
        // out (observed as every result repeating the last pair).
        private var nl: InternalRow = _
        private var nr: InternalRow = _

        private def findNext(): Unit = {
          nl = null; nr = null
          while (nl == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            val lTimeNull = lTime.isNullAt(0)
            // advance the right cursor to the last row at-or-before
            // (lKey, lTime); rows that pass become the candidate
            var advancing = true
            while (advancing && rRow != null) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight()
              else if (c == 0 && !rTime.isNullAt(0) && !lTimeNull &&
                  timeOrd.compare(rTime, lTime) <= 0) {
                candidate = rRow; candidateKey = rKey
                advanceRight()
              } else if (c == 0 && rTime.isNullAt(0)) {
                advanceRight() // null right time never matches
              } else advancing = false
            }
            val matched = !lTimeNull && candidate != null &&
              keyOrd.compare(candidateKey, lKey) == 0
            if (matched) { nl = l; nr = candidate }
            else if (isOuter) { nl = l; nr = nullRight }
            // else: inner semantics — skip this left row
          }
        }
        findNext()

        override def hasNext: Boolean = nl != null
        override def next(): InternalRow = {
          val out = resultProj(joined(nl, nr))
          findNext()
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/**
 * Public entry: `Asof.join(trades, quotes, Seq("sym"), "t_ts", "q_ts")`.
 * Resolves the key/time columns against each side's analyzed plan and
 * hands Catalyst the [[AsofJoin]] node ([[AsofJoinStrategy]] plans it;
 * registered by `GraftExtensions`).
 */
object Asof {
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTimeCol: String, rightTimeCol: String, outer: Boolean = false): DataFrame = {
    require(on.nonEmpty, "asof join requires at least one equi-key")
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Self-join shape: when both sides descend from the same relation
    // their attributes share exprIds, and a key reference would be
    // ambiguous (the analyzer's DeduplicateRelations rewrites the right
    // SUBTREE but cannot know our node's rightKeys meant the right
    // side). Re-alias every right output with a fresh exprId so the
    // node's right references are unambiguous; dedup then rewrites the
    // subtree beneath the aliases consistently.
    val rp = if (lp.outputSet.intersect(rp0.outputSet).nonEmpty) {
      import org.apache.spark.sql.catalyst.expressions.Alias
      org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a => Alias(a, a.name)()), rp0)
    } else rp0
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asof join: column '$name' not found on $side side " +
          s"(available: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = on.map(resolve(lp, _, "left"))
    val rk = on.map(resolve(rp, _, "right"))
    val lt = resolve(lp, leftTimeCol, "left")
    val rt = resolve(rp, rightTimeCol, "right")
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"asof join: key type mismatch ${a.name}: ${a.dataType} vs ${b.name}: ${b.dataType}")
    }
    require(lt.dataType == rt.dataType,
      s"asof join: time type mismatch $leftTimeCol: ${lt.dataType} vs $rightTimeCol: ${rt.dataType}")
    require(RowOrdering.isOrderable(lt.dataType),
      s"asof join: time type ${lt.dataType} is not orderable")
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession,
      AsofJoin(lp, rp, lk, rk, lt, rt, outer))
  }
}
