package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension for greedy sequence packing — the full
  * custom-operator stack (logical node → planner strategy → physical
  * operator), registered through `GraftExtensions`.
  *
  * Where `operators.Packing.packSequences` *hand-places* the shuffle
  * and sort with `repartition` + `sortWithinPartitions`, this operator
  * does it the way Spark's own stateful operators do: the PHYSICAL
  * node *declares* `requiredChildDistribution` (clustered by shard)
  * and `requiredChildOrdering` (shard, doc_id) and lets
  * EnsureRequirements decide whether an exchange/sort is actually
  * needed — so a child that is already hash-partitioned by shard (a
  * bucketed table, an upstream aggregate) is packed WITHOUT any new
  * shuffle, which the DataFrame-level `repartition` can never skip.
  * Same greedy scan, same output, composable planning.
  *
  * The child must expose exactly the prepared layout
  * (`shard int, doc_id long, n_tokens int`); `Packing.packSequencesPlan`
  * builds it.
  */
case class PackSequencesNode(budget: Int, shards: Int,
    packAttrs: Seq[Attribute], child: LogicalPlan) extends UnaryNode {

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"PackSequencesNode child must produce '$name': ${child.output}"))

  override def output: Seq[Attribute] = Seq(
    childAttr("doc_id"), childAttr("shard"),
    packAttrs(0), // seq_id
    childAttr("n_tokens"),
    packAttrs(1)) // token_offset

  override def producedAttributes: AttributeSet = AttributeSet(packAttrs)
  // consumes the whole prepared child row — nothing above may prune it
  override def references: AttributeSet = child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

object PackSequencesNode {
  /** Fresh output attributes for the generated columns. Created ONCE
    * per node (constructor arg, not a lazy val) so plan copies during
    * analysis/optimization keep stable expression ids. */
  def freshPackAttrs(): Seq[Attribute] = Seq(
    AttributeReference("seq_id", IntegerType, nullable = false)(),
    AttributeReference("token_offset", IntegerType, nullable = false)())
}

/** Physical operator: one streaming greedy scan per partition, O(1)
  * state, no materialization. Requirements (not manual exchanges)
  * express the clustering: several shards may share a partition — the
  * scan resets its accumulator on every shard change, so ANY
  * hash-clustering by shard is acceptable, at any partition count. */
case class PackSequencesExec(budget: Int, output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).get

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(childAttr("shard"))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(childAttr("shard"), Ascending),
      SortOrder(childAttr("doc_id"), Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def producedAttributes: AttributeSet =
    AttributeSet(output.filterNot(child.outputSet.contains))

  override protected def doExecute(): RDD[InternalRow] = {
    val shardIdx = child.output.indexWhere(_.name == "shard")
    val docIdx = child.output.indexWhere(_.name == "doc_id")
    val tokIdx = child.output.indexWhere(_.name == "n_tokens")
    val b = budget
    child.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      var curShard = Int.MinValue
      var seq = 0
      var used = 0
      val out = new GenericInternalRow(5)
      it.map { row =>
        val shard = row.getInt(shardIdx)
        val doc = row.getLong(docIdx)
        val n = row.getInt(tokIdx)
        var off = 0
        if (shard != curShard) {
          curShard = shard; seq = 0; used = n
        } else if (used + n <= b) {
          off = used; used += n
        } else {
          seq += 1; used = n
        }
        out.update(0, doc)
        out.update(1, shard)
        out.update(2, seq)
        out.update(3, n)
        out.update(4, off)
        proj(out)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical form. */
object PackSequencesStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: PackSequencesNode =>
      PackSequencesExec(n.budget, n.output, planLater(n.child)) :: Nil
    case _ => Nil
  }
}
