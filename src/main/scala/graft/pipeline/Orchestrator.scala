package graft.pipeline

import java.util.concurrent.{Executors, TimeoutException, TimeUnit}

import scala.concurrent.duration._
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Stage orchestration with the reference DAG's semantics — retries with a
  * fixed delay, an SLA timeout per stage, fail-fast chaining — as a library,
  * not a scheduler (reference:
  * orchestration/dags/processing/tripclick_spark_archive_raw_dag.py:28
  * `retries=1, retry_delay=5min`, :93 `cmd_timeout=1800`;
  * tripclick_streaming_curated_dag.py:28 `retries=0` for streaming, :93
  * `cmd_timeout=4200`).
  *
  * The Spark-native part is the timeout KILL: each attempt runs under a
  * dedicated job group, and an SLA breach calls
  * `SparkContext.cancelJobGroup`, which interrupts the stage's running tasks
  * cluster-wide — an orchestrator that only abandons the driver thread would
  * leave executors burning through a 100 TB scan. Retries re-enter the stage
  * body from scratch, so stage bodies must be idempotent (they are: every
  * sink in this pipeline is overwrite-partition or replay-safe upsert,
  * SURVEY.md §2.2).
  */
object Orchestrator {

  /** Per-stage policy. `retries` = additional attempts after the first.
    * `cancelDrain` bounds how long a timed-out attempt is given to actually
    * terminate after the job-group cancel — a retry must never overlap a
    * still-running previous attempt (two concurrent executions of the same
    * stage body race on the same sink). */
  final case class Policy(
      retries: Int = 1,
      retryDelay: FiniteDuration = 5.minutes,
      slaTimeout: FiniteDuration = 30.minutes,
      cancelDrain: FiniteDuration = 30.seconds)

  /** The reference's batch policy (1 retry / 5 min / 30 min SLA). */
  val batchPolicy: Policy = Policy()
  /** The reference's streaming policy: never retry a streaming job
    * (checkpoint recovery owns restart semantics), 70 min SLA. */
  val streamingPolicy: Policy = Policy(retries = 0, slaTimeout = 70.minutes)

  final case class Stage(name: String, policy: Policy = batchPolicy)(
      val body: () => Unit)

  final case class StageReport(
      name: String,
      attempts: Int,
      succeeded: Boolean,
      durationMs: Long,
      error: Option[String])

  /** Run stages in order, fail-fast: a stage that exhausts its retries stops
    * the chain (downstream stages are reported as not attempted, mirroring
    * Airflow's upstream_failed). `sleep` is injectable for tests. */
  def run(
      spark: SparkSession,
      stages: Seq[Stage],
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): Seq[StageReport] = {
    val reports = Vector.newBuilder[StageReport]
    var failed = false
    stages.foreach { stage =>
      if (failed) {
        reports += StageReport(stage.name, 0, succeeded = false, 0L,
          Some("upstream_failed"))
      } else {
        val r = runStage(spark, stage, sleep)
        reports += r
        failed = !r.succeeded
      }
    }
    reports.result()
  }

  private def runStage(
      spark: SparkSession,
      stage: Stage,
      sleep: FiniteDuration => Unit): StageReport = {
    val t0 = System.nanoTime()
    var attempt = 0
    var lastError: Option[String] = None
    while (attempt <= stage.policy.retries) {
      if (attempt > 0) sleep(stage.policy.retryDelay)
      attempt += 1
      attemptOnce(spark, stage, attempt) match {
        case None =>
          return StageReport(stage.name, attempt, succeeded = true,
            (System.nanoTime() - t0) / 1000000L, None)
        case Some(f) =>
          lastError = Some(f.msg)
          if (!f.retryable)
            return StageReport(stage.name, attempt, succeeded = false,
              (System.nanoTime() - t0) / 1000000L, lastError)
      }
    }
    StageReport(stage.name, attempt, succeeded = false,
      (System.nanoTime() - t0) / 1000000L, lastError)
  }

  private final case class Failure(msg: String, retryable: Boolean)

  /** One attempt under its own job group; SLA breach cancels the group
    * (interrupting running tasks) and then WAITS (bounded by `cancelDrain`)
    * for the stage thread to actually die — retrying while the timed-out
    * attempt still runs would put two executions of the stage body on the
    * same sink. A thread that survives the drain makes the failure
    * non-retryable. Fatal throwables (OOM etc.) propagate instead of being
    * retried in a JVM that just proved itself degraded. */
  private def attemptOnce(
      spark: SparkSession, stage: Stage, attempt: Int): Option[Failure] = {
    val group = s"graft-stage-${stage.name}-$attempt"
    val exec = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, group); t.setDaemon(true); t
    })
    val fut = exec.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        spark.sparkContext.setJobGroup(group, s"stage ${stage.name}", true)
        try stage.body()
        finally spark.sparkContext.clearJobGroup()
      }
    })
    try { fut.get(stage.policy.slaTimeout.toMillis, TimeUnit.MILLISECONDS); None }
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        fut.cancel(true)
        exec.shutdownNow()
        val deadline = System.nanoTime() + stage.policy.cancelDrain.toNanos
        // the body thread dying is necessary but NOT sufficient — cancel is
        // async on the executors, so also wait for the group's Spark jobs
        // to leave RUNNING before declaring the attempt dead
        val threadDead = exec.awaitTermination(
          stage.policy.cancelDrain.toMillis, TimeUnit.MILLISECONDS)
        def jobsLive(): Boolean = {
          val st = spark.sparkContext.statusTracker
          st.getJobIdsForGroup(group).exists(id =>
            st.getJobInfo(id).exists(_.status() == org.apache.spark.JobExecutionStatus.RUNNING))
        }
        var live = jobsLive()
        while (live && System.nanoTime() < deadline) {
          Thread.sleep(50)
          live = jobsLive()
        }
        if (threadDead && !live)
          Some(Failure(s"sla_timeout after ${stage.policy.slaTimeout}", retryable = true))
        else
          Some(Failure(
            s"sla_timeout after ${stage.policy.slaTimeout}; attempt still running " +
              s"after ${stage.policy.cancelDrain} drain (thread dead=$threadDead, " +
              s"jobs live=$live) — retries skipped to avoid concurrent execution",
            retryable = false))
      case e: java.util.concurrent.ExecutionException =>
        Option(e.getCause).getOrElse(e) match {
          case c if NonFatal(c) => Some(Failure(c.toString, retryable = true))
          // interrupts are a cancellation signal, not a JVM health problem —
          // report them as an ordinary stage failure (NonFatal excludes them)
          case c: InterruptedException => Some(Failure(c.toString, retryable = true))
          case c => throw c // VM errors etc: never retry in a degraded JVM
        }
      case NonFatal(e) =>
        Some(Failure(Option(e.getCause).getOrElse(e).toString, retryable = true))
    } finally exec.shutdownNow()
  }
}
