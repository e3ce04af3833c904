package graft.operators

import java.text.DecimalFormat
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress metering — the reference's debug-mode row counter (F12,
  * Query.java:157-164, 318-320: rows read + elapsed ms per ~1000-row
  * batch, `###,###` formatting). Spark-native: a SparkListener
  * aggregating input rows across all tasks, logging every `every`
  * rows. Works for any job on the session, not just one loop.
  */
class ProgressMeter(every: Long = 100000L,
    log: String => Unit = s => System.err.println(s)) extends SparkListener {
  private val fmt = new DecimalFormat("###,###")
  private val rows = new AtomicLong(0L)
  private val lastLogged = new AtomicLong(0L)
  private val t0 = System.nanoTime()

  def totalRows: Long = rows.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val total = rows.addAndGet(m.inputMetrics.recordsRead)
      val last = lastLogged.get()
      if (total - last >= every && lastLogged.compareAndSet(last, total)) {
        val ms = (System.nanoTime() - t0) / 1000000L
        log(s"Read records: ${fmt.format(total)} processing time: ${fmt.format(ms)} msec")
      }
    }
  }
}

object ProgressMeter {
  /** Attach a meter to the session; returns it for inspection/detach. */
  def attach(spark: SparkSession, every: Long = 100000L,
      log: String => Unit = s => System.err.println(s)): ProgressMeter = {
    val m = new ProgressMeter(every, log)
    spark.sparkContext.addSparkListener(m)
    m
  }

  def detach(spark: SparkSession, m: ProgressMeter): Unit =
    spark.sparkContext.removeSparkListener(m)
}
