package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability (SURVEY §2.9 extension): the reference logs
  * per-batch insert counts from inside its consumer loop
  * (reference consumer.py:144–149, logs/pipeline.log); Structured
  * Streaming surfaces the same facts — and far more — through
  * `StreamingQueryProgress` events. [[ProgressRecorder]] captures them
  * off the query thread, so pipelines get throughput/latency accounting
  * with zero instrumentation in the query itself.
  *
  * Listener callbacks run on the driver's listener bus — at any cluster
  * size this records O(1) per micro-batch (batch metadata, never rows).
  */
final class ProgressRecorder(maxRetained: Int = 10000)
    extends StreamingQueryListener {

  /** (queryId, batchId, numInputRows, batchDurationMs) per completed batch. */
  final case class BatchProgress(queryId: String, batchId: Long,
      numInputRows: Long, durationMs: Long)

  // bounded ring: a live ProcessingTime deployment emits one entry per
  // trigger forever — unbounded retention is a slow driver leak; rows
  // fall off the OLD end, totalInputRows stays exact via a counter
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchProgress]()
  private val totalRows = new java.util.concurrent.atomic.AtomicLong(0L)
  // own size counter: ConcurrentLinkedQueue.size is an O(n) traversal
  private val retained = new java.util.concurrent.atomic.AtomicInteger(0)

  def batches: Seq[BatchProgress] = buf.iterator().asScala.toSeq
  def totalInputRows: Long = totalRows.get()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    // triggerExecution CONTAINS the other phases (addBatch, getBatch,
    // queryPlanning, walCommit) — summing all of durationMs would
    // roughly double the real batch latency
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue)
      .getOrElse(p.durationMs.asScala.values.map(_.longValue).sum)
    buf.add(BatchProgress(p.id.toString, p.batchId, p.numInputRows, dur))
    totalRows.addAndGet(p.numInputRows)
    if (retained.incrementAndGet() > maxRetained) {
      buf.poll(); retained.decrementAndGet()
    }
    ()
  }
}

object Observability {
  /** Attach a recorder to the session; caller removes it when done. */
  def record(s: SparkSession): ProgressRecorder = {
    val r = new ProgressRecorder
    s.streams.addListener(r)
    r
  }
}
