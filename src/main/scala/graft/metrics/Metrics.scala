package graft.metrics

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One finished pipeline stage — the engine's analogue of the reference's
  * per-task Prometheus gauges `etl_job_duration_seconds` and
  * `etl_job_records_processed_total` labeled (job_name, task_id, status)
  * (reference: airflow/config/metrics_utils.py:58-106). */
final case class JobMetric(jobName: String, taskId: String, durationSec: Double,
                           success: Boolean, recordsWritten: Long,
                           recordsRead: Long) {
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    s"""{"job_name":"${esc(jobName)}","task_id":"${esc(taskId)}",""" +
      s""""duration_seconds":$durationSec,"status":"${if (success) "success" else "failure"}",""" +
      s""""records_written":$recordsWritten,"records_read":$recordsRead}"""
  }
}

/** Per-stage metrics emission, Spark-native.
  *
  * The reference wraps every Airflow-launched Spark job in a timing
  * decorator and pushes duration/record gauges to a Prometheus gateway
  * (airflow/config/metrics_utils.py:23-106, monitoring/prometheus.yml:22-27).
  * This registry is the in-engine counterpart: `timed(job, task) { body }`
  * scopes the enclosed Spark actions under a job group, and a
  * [[SparkListener]] attributes executor task output/input metrics back to
  * that scope. Record counts therefore come from the scheduler for free —
  * no extra `count()` jobs on the data path — and the mechanism is
  * identical on a 1000-executor cluster, where per-task
  * `TaskMetrics.outputMetrics` are already shipped to the driver with every
  * task completion event.
  *
  * Thread safety: scopes are keyed by a unique job-group id, so concurrent
  * `timed` blocks on different threads attribute correctly as long as each
  * runs its Spark actions on the thread that opened the scope (job groups
  * are thread-local, same rule as `SparkContext.setJobGroup`).
  */
final class MetricsRegistry(spark: SparkSession) extends SparkListener {
  import MetricsRegistry._

  private val seq = new AtomicLong(0)
  private val stageToScope = new ConcurrentHashMap[Int, String]()
  private val writtenByScope = new ConcurrentHashMap[String, LongAdder]()
  private val readByScope = new ConcurrentHashMap[String, LongAdder]()
  private val done = new ConcurrentLinkedQueue[JobMetric]()

  spark.sparkContext.addSparkListener(this)

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val group = Option(jobStart.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (group != null && group.startsWith(Prefix))
      jobStart.stageIds.foreach(sid => stageToScope.put(sid, group))
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val scope = stageToScope.get(taskEnd.stageId)
    if (scope != null && taskEnd.taskMetrics != null) {
      writtenByScope.computeIfAbsent(scope, _ => new LongAdder)
        .add(taskEnd.taskMetrics.outputMetrics.recordsWritten)
      readByScope.computeIfAbsent(scope, _ => new LongAdder)
        .add(taskEnd.taskMetrics.inputMetrics.recordsRead)
    }
  }

  /** Run `body` as a metered stage: wall-clock duration, success flag, and
    * the records written/read by every Spark action it triggers. The
    * caller's own job group (if any) is restored afterwards — clearing it
    * would strip the application's cancellation/UI scoping; a nested
    * timed() therefore attributes its span to itself, then hands the
    * thread back to the outer scope. */
  def timed[T](jobName: String, taskId: String)(body: => T): T = {
    val scope = s"$Prefix${seq.incrementAndGet()}:$jobName/$taskId"
    val sc = spark.sparkContext
    // restore ALL the thread-locals setJobGroup touches — going back
    // through setJobGroup would silently reset the caller's
    // interruptOnCancel flag to its default
    val saved = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel").map(k => k -> sc.getLocalProperty(k))
    sc.setJobGroup(scope, s"graft metered stage $jobName/$taskId")
    val t0 = System.nanoTime()
    var ok = false
    try { val r = body; ok = true; r }
    finally {
      saved.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      val duration = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async — drain before reading counters
      org.apache.spark.graft.SparkInternals.flushListenerBus(sc)
      def sum(m: ConcurrentHashMap[String, LongAdder]) =
        Option(m.remove(scope)).map(_.sum()).getOrElse(0L)
      // drop this scope's stage mappings too — in a 24/7 streaming driver
      // the map would otherwise grow by one entry per stage forever
      stageToScope.entrySet().removeIf(e => e.getValue == scope)
      done.add(JobMetric(jobName, taskId, duration, ok, sum(writtenByScope),
        sum(readByScope)))
    }
  }

  /** Finished stages, in completion order. */
  def report(): Seq[JobMetric] = {
    import scala.jdk.CollectionConverters._
    done.iterator().asScala.toSeq
  }

  /** The push-to-gateway analogue: one JSON object per line, appendable and
    * greppable (a deployment without a gateway can ship this file). */
  def dump(path: String): Unit = {
    val lines = report().map(_.toJson).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), lines)
  }

  /** Prometheus text-exposition (v0.0.4) rendering of the finished stages —
    * the reference's gauges `etl_job_duration_seconds` and
    * `etl_job_records_processed_total` (metrics_utils.py:66-80), labeled
    * (job_name, task_id, status, host), plus a records-read gauge the
    * listener gets for free. Gauge semantics: the LAST metric per label set
    * wins (re-runs overwrite, as with the reference's per-push registry). */
  def exposition(): String = {
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"; case '"' => "\\\""; case '\n' => "\\n"
      case c => c.toString
    }
    val host = java.net.InetAddress.getLocalHost.getHostName
    def labels(m: JobMetric) =
      s"""{job_name="${esc(m.jobName)}",task_id="${esc(m.taskId)}",""" +
        s"""status="${if (m.success) "success" else "failure"}",host="${esc(host)}"}"""
    // last-wins dedup per label set, insertion-ordered for readability
    val byLabels = scala.collection.mutable.LinkedHashMap[String, JobMetric]()
    report().foreach(m => byLabels.put(labels(m), m))
    val sb = new StringBuilder
    def gauge(name: String, help: String)(value: JobMetric => String): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      byLabels.foreach { case (ls, m) => sb.append(s"$name$ls ${value(m)}\n") }
    }
    gauge("etl_job_duration_seconds", "Duration of ETL job in seconds")(
      _.durationSec.toString)
    gauge("etl_job_records_processed_total", "Total records processed by ETL job")(
      _.recordsWritten.toString)
    gauge("etl_job_records_read_total", "Total records read by ETL job")(
      _.recordsRead.toString)
    sb.toString
  }

  /** Push the finished stages to a Prometheus Pushgateway: the standard
    * `PUT {gateway}/metrics/job/{job}` carrying [[exposition]] — the same
    * wire call `prometheus_client.push_to_gateway` makes for the reference
    * (metrics_utils.py:103-107). Throws on any non-2xx so a broken
    * monitoring path is loud, not silent. */
  def push(gatewayUrl: String, job: String): Unit = {
    // Pushgateway grouping-key syntax: a plain label value is a
    // percent-encoded path segment (URLEncoder alone is FORM encoding —
    // its '+' for space would register job "graft etl" as "graft+etl");
    // a value containing '/' cannot be a path segment at all and uses the
    // gateway's base64 form `job@base64/<URL-safe unpadded base64>`.
    val segment =
      if (job.contains("/"))
        "job@base64/" + java.util.Base64.getUrlEncoder.withoutPadding()
          .encodeToString(job.getBytes("UTF-8"))
      else
        "job/" + java.net.URLEncoder.encode(job, "UTF-8").replace("+", "%20")
    val url = gatewayUrl.stripSuffix("/") + "/metrics/" + segment
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "text/plain; version=0.0.4")
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(exposition()))
      .build()
    val resp = java.net.http.HttpClient.newHttpClient()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"pushgateway PUT $url returned ${resp.statusCode()}: ${resp.body().take(200)}")
  }

  def close(): Unit = spark.sparkContext.removeSparkListener(this)
}

object MetricsRegistry {
  private val Prefix = "graft.metrics:"

  /** Meter `body` iff a registry is present — pipelines accept
    * `Option[MetricsRegistry]` so metering is zero-cost when off. */
  def timed[T](m: Option[MetricsRegistry], jobName: String, taskId: String)
              (body: => T): T =
    m.fold(body)(_.timed(jobName, taskId)(body))
}
