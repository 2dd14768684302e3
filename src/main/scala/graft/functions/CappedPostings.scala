package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Df-capped posting-list aggregation — the ONE-PASS form of the
  * stop-shingle guard (r19 optimization round; guide §2.3/§2.4).
  *
  * == What it replaces ==
  * The r1–r18 shape ran the cap as two passes over the tokenized
  * posting stream: (1) a `groupBy(shingle).count` to find the over-cap
  * head, (2) a broadcast LEFT ANTI join dropping that head, then a
  * hash repartition by shingle and a `collect_list` aggregation. Sound
  * and skew-safe — but it derives the (CPU-heavy: tokenize + n-gram
  * hash + explode) posting stream TWICE and pays two full exchanges of
  * it. This aggregate collects each shingle's posting list and its
  * EXACT document frequency in one aggregation, so the whole kept-list
  * derivation is one pass and one exchange.
  *
  * == Why the skew argument still holds ==
  * The two-pass anti-join existed so a hot shingle ("click here to" at
  * df ≈ n_docs in a 100 TB crawl) never co-locates its full posting
  * list on one reduce task. This buffer preserves that bound: it
  * accumulates at most `cap` elements, and the moment the EXACT running
  * count exceeds the cap the element array is dropped and the buffer
  * degenerates to a pure counter (16 bytes). Map-side partials for a
  * truly hot key therefore ship count-only buffers — the same bytes the
  * old df-count pass shipped — and keys near the cap ship at most
  * ~cap elements total across all partials. Reduce-side state is
  * likewise ≤ cap+ε elements per group. The count stays exact under
  * any merge order, so `df > cap → dropped` is bit-identical to the
  * two-pass cap (DuckDB twins unchanged).
  *
  * == Determinism ==
  * Partial-merge order is nondeterministic, so `finish` SORTS the
  * surviving list — same ascending order `sort_array(collect_list(..))`
  * produced, which the downstream ordered-combination enumeration
  * (doc_a < doc_b) relies on. For stride=2 (the tf-weighted index) the
  * sort compares block-leading doc_ids, equal to
  * `sort_array(collect_list(struct(doc_id, tf)))` because doc_ids are
  * unique within a shingle group.
  *
  * `stride` = longs per posting: 1 for plain doc_id lists, 2 for
  * (doc_id, tf) pairs packed flat. `n` counts POSTINGS (docs), not
  * longs; `ds` is null iff n > cap.
  */
final case class CappedBuf(var n: Long, var ds: Array[Long])

class CappedPostingsAgg(cap: Long, stride: Int)
    extends Aggregator[Array[Long], CappedBuf, CappedBuf] {
  require(cap >= 1L && stride >= 1)

  override def zero: CappedBuf = CappedBuf(0L, Array.emptyLongArray)

  override def reduce(b: CappedBuf, in: Array[Long]): CappedBuf = {
    b.n += 1L
    if (b.ds != null) {
      if (b.n > cap) b.ds = null
      else {
        val old = b.ds
        val out = new Array[Long](old.length + stride)
        System.arraycopy(old, 0, out, 0, old.length)
        var j = 0
        while (j < stride) { out(old.length + j) = in(j); j += 1 }
        b.ds = out
      }
    }
    b
  }

  override def merge(a: CappedBuf, b: CappedBuf): CappedBuf = {
    a.n += b.n
    if (a.ds == null || b.ds == null || a.n > cap) a.ds = null
    else a.ds = a.ds ++ b.ds
    a
  }

  override def finish(r: CappedBuf): CappedBuf = {
    if (r.ds != null) {
      if (stride == 1) java.util.Arrays.sort(r.ds)
      else {
        // block sort by leading long (doc_id) — doc_ids unique per group
        val blocks = r.ds.grouped(stride).toArray
        java.util.Arrays.sort(blocks,
          (x: Array[Long], y: Array[Long]) => java.lang.Long.compare(x(0), y(0)))
        r.ds = blocks.flatten
      }
    }
    r
  }

  override def bufferEncoder: Encoder[CappedBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CappedBuf]()
  override def outputEncoder: Encoder[CappedBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CappedBuf]()
}

object CappedPostings {
  /** `struct(n, ds)` aggregate column: capped posting list of `of`
    * (one long per posting).
    */
  def list(of: Column, cap: Long): Column = {
    val f = udaf(new CappedPostingsAgg(cap, 1))
    f(org.apache.spark.sql.functions.array(of))
  }

  /** Capped (doc_id, weight) posting list packed flat:
    * `ds = [id0, w0, id1, w1, ...]`, block-sorted by id.
    */
  def weighted(id: Column, w: Column, cap: Long): Column = {
    val f = udaf(new CappedPostingsAgg(cap, 2))
    f(org.apache.spark.sql.functions.array(id, w))
  }
}
