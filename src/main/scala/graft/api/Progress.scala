package graft.api

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Listener-based run progress with ETA (reference `WorkerSimple`
  * progress infra; DbImport.java:965 sets a 2 s display delay). Spark's
  * unit of progress is the task, so the ETA extrapolates from completed
  * vs submitted tasks — coarse but honest, and it needs no hooks in the
  * operators themselves.
  */
final class ProgressListener(label: String, intervalMs: Long = 2000,
                             log: String => Unit = s => Console.err.println(s))
    extends SparkListener {
  private val total = new AtomicInteger(0)
  private val done = new AtomicInteger(0)
  private val startedAt = System.nanoTime()
  private val lastShown = new AtomicLong(0L)

  def tasksDone: Int = done.get()
  def tasksTotal: Int = total.get()

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
    total.addAndGet(s.stageInfo.numTasks)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val d = done.incrementAndGet()
    val now = System.nanoTime()
    val last = lastShown.get()
    if ((now - last) / 1000000L >= intervalMs && lastShown.compareAndSet(last, now)) {
      val tot = math.max(total.get(), d)
      val elapsedMs = (now - startedAt) / 1000000L
      val etaMs = if (d > 0) elapsedMs * (tot - d) / d else 0L
      log(f"$label: $d/$tot tasks (${d * 100.0 / tot}%.0f%%), " +
        f"elapsed ${elapsedMs / 1000.0}%.1f s, ETA ${etaMs / 1000.0}%.1f s")
    }
  }
}

object Progress {

  /** Run `body` with a [[ProgressListener]] attached for its duration. */
  def withProgress[T](spark: SparkSession, label: String,
                      intervalMs: Long = 2000,
                      log: String => Unit = s => Console.err.println(s))(body: => T): T = {
    val listener = new ProgressListener(label, intervalMs, log)
    spark.sparkContext.addSparkListener(listener)
    try body
    finally spark.sparkContext.removeSparkListener(listener)
  }
}
