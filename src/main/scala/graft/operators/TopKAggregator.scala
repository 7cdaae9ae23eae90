package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` show-piece (SURVEY §2.9): exact per-group top-k
  * smallest values through a bounded buffer — the map-side-combining
  * alternative to a window `row_number` filter when only the VALUES are
  * needed (no other columns carried). Each partition keeps at most k
  * values per group and partials merge associatively, so the shuffle
  * moves k longs per (group, partition) instead of the whole group —
  * the reduction a 100 TB top-k wants. For whole-row top-k use
  * [[Relational.topKPerGroup]] (WindowGroupLimit gives the same
  * bounded-heap property, plan-audited in PlanAuditSpec).
  *
  * The buffer is a sorted ascending vector capped at k: reduce is an
  * O(k) binary-search insertion (the per-row hot path — no re-sort),
  * merge sorts the ≤2k combined values. Deterministic: values are
  * compared as longs, ties keep duplicates (a top-k multiset, not
  * distinct).
  */
class TopKSmallest(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  private def insert(buf: Seq[Long], v: Long): Seq[Long] = {
    if (buf.size >= k && v >= buf.last) return buf
    val i = buf.search(v)(Ordering.Long).insertionPoint
    val grown = (buf.take(i) :+ v) ++ buf.drop(i)
    if (grown.size > k) grown.init else grown
  }

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
