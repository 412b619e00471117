package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical grouped top-k: hash-cluster on `keys` (EnsureRequirements
  * inserts the exchange), then one linear pass per partition maintaining
  * a size-`k` bounded heap per key — no sort of the input, task memory
  * capped at keysInPartition×k row copies regardless of group fan-in.
  * Rows emit per key in rank order (rank 1 = lowest under `ordering`,
  * exactly row_number semantics including ties broken by the ordering's
  * tie-break columns).
  *
  * MEMORY CONTRACT: per-task state is (distinct keys in the partition) ×
  * k retained rows on the JVM heap — bounded × k for the operator's home
  * shape (ANN rerank: thousands of candidates per query, k ≈ 10). The
  * pathological shape is key cardinality ~ row count (every key holds
  * ≤ k rows), where the retained state approaches a copy of the
  * partition; the operator SPILLS there instead of OOMing: when retained
  * bytes exceed `spark.graft.topk.spill.threshold.bytes` (default 64 MB
  * per task), the current heaps are flushed to a key-sorted temp file
  * and the pass continues; at the end the spill runs merge key-by-key
  * (each segment holds that key's top-k of its own rows, so re-capping
  * the union at k is exact). The no-spill fast path is byte-identical to
  * the pre-spill operator; spilling only changes WHERE the retained rows
  * live, never the output. TopKSpec pins both paths against the window
  * form.
  */
final case class GroupedTopKExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numSpills" -> SQLMetrics.createMetric(sparkContext, "spill file count"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext, "rows written to spill"))

  /** Per-task retained-bytes bound before heap state spills to disk. */
  private def spillThresholdBytes: Long =
    conf.getConfString("spark.graft.topk.spill.threshold.bytes",
      (64L * 1024 * 1024).toString).toLong

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrders = ordering
    val limit = k
    val outAttrs = output
    val threshold = spillThresholdBytes
    val numSpillsMetric = longMetric("numSpills")
    val spilledRowsMetric = longMetric("spilledRows")
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrders, childOutput)
      // max-heap under `ord`: head = worst of the kept k, evicted when a
      // better row arrives. Rows are stored as UnsafeRow copies so the
      // spill path can write raw bytes.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var retainedBytes = 0L
      val spills = mutable.ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spills.foreach { f => f.delete(); () }
      })
      def unsafeCopy(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u.copy()
        case other        => toUnsafe(other).copy()
      }
      // byte-lexicographic total order on key rows: equal bytes ⇔ equal
      // UnsafeRow (same schema), so sorted-run merge groups keys exactly
      val keyOrd: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
        override def compare(a: Array[Byte], b: Array[Byte]): Int = {
          val n = math.min(a.length, b.length)
          var i = 0
          var c = 0
          while (i < n && c == 0) { c = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
          if (c != 0) c else a.length - b.length
        }
      }
      def spill(): Unit = {
        val file = File.createTempFile("graft-topk-spill", ".bin")
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
        try {
          val sorted = heaps.toArray.sortBy { case (key, _) => key.getBytes }(keyOrd)
          sorted.foreach { case (key, h) =>
            val kb = key.getBytes
            out.writeInt(kb.length); out.write(kb)
            out.writeInt(h.size)
            h.foreach { r0 =>
              val r = r0.asInstanceOf[UnsafeRow]
              out.writeInt(r.getSizeInBytes); out.write(r.getBytes)
              spilledRowsMetric += 1
            }
          }
          out.writeInt(-1) // end marker
        } finally out.close()
        spills += file
        numSpillsMetric += 1
        heaps.clear()
        retainedBytes = 0L
      }
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            val u = unsafeCopy(row)
            h += u
            val kc = key.copy()
            heaps.put(kc, h)
            retainedBytes += u.getSizeInBytes + kc.getSizeInBytes
          case Some(h) =>
            if (h.size < limit) {
              val u = unsafeCopy(row); h += u
              retainedBytes += u.getSizeInBytes
            } else if (ord.compare(row, h.head) < 0) {
              retainedBytes -= h.dequeue().asInstanceOf[UnsafeRow].getSizeInBytes
              val u = unsafeCopy(row); h += u
              retainedBytes += u.getSizeInBytes
            }
        }
        if (retainedBytes > threshold) spill()
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      // the rank is written in the ATTRIBUTE's type: LongType from the
      // TopK.perKey entry, IntegerType when WindowTopKRewrite reuses a
      // row_number alias attribute
      val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
      def emit(rows: Iterator[InternalRow]): Iterator[UnsafeRow] =
        rows.zipWithIndex.map { case (row, i) =>
          if (rankIsInt) rankRow.setInt(0, i + 1) else rankRow.setLong(0, i + 1L)
          project(joined(row, rankRow))
        }
      if (spills.isEmpty) {
        // no-spill fast path: identical to the pre-spill operator
        heaps.iterator.flatMap { case (_, h) =>
          // dequeueAll drains worst-first; reverse => rank-ascending
          emit(h.dequeueAll.reverseIterator)
        }
      } else {
        // flush the in-memory remainder, then merge the key-sorted runs:
        // each run holds ≤ k rows per key (that segment's own top-k), so
        // re-capping the union of a key's segments at k is exactly the
        // key's global top-k
        if (heaps.nonEmpty) spill()
        val nFields = childOutput.size
        final class Run(file: File) {
          private val in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(file), 1 << 16))
          var key: Array[Byte] = _
          var rows: Array[UnsafeRow] = _
          advance()
          def advance(): Unit = {
            val kl = in.readInt()
            if (kl < 0) { key = null; rows = null; in.close(); file.delete(); () }
            else {
              key = new Array[Byte](kl); in.readFully(key)
              val n = in.readInt()
              rows = Array.fill(n) {
                val rl = in.readInt()
                val rb = new Array[Byte](rl); in.readFully(rb)
                val r = new UnsafeRow(nFields)
                r.pointTo(rb, rl)
                r
              }
            }
          }
          def exhausted: Boolean = key == null
        }
        val runs = spills.map(new Run(_)).filterNot(_.exhausted)
        val pq = mutable.PriorityQueue.empty[Run](
          // min-heap on key bytes (PriorityQueue is a max-heap: reverse)
          keyOrd.on[Run](_.key).reverse)
        runs.foreach(pq += _)
        new Iterator[UnsafeRow] {
          private var pending: Iterator[UnsafeRow] = Iterator.empty
          private def refill(): Unit = {
            while (!pending.hasNext && pq.nonEmpty) {
              val minKey = pq.head.key
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              while (pq.nonEmpty && keyOrd.compare(pq.head.key, minKey) == 0) {
                val run = pq.dequeue()
                run.rows.foreach { r =>
                  if (h.size < limit) h += r
                  else if (ord.compare(r, h.head) < 0) { h.dequeue(); h += r }
                }
                run.advance()
                if (!run.exhausted) pq += run
              }
              pending = emit(h.dequeueAll.reverseIterator)
            }
          }
          override def hasNext: Boolean = { refill(); pending.hasNext }
          override def next(): UnsafeRow = { refill(); pending.next() }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
