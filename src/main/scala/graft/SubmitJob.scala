package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Try}

/** Fleet orchestrator (SURVEY §3.3): the reference's `submit_job.py` parses
  * a layer catalog and submits one batch job per (layer, attribute, grid),
  * sequencing dependents after the jobs they resample from
  * (`gfw_pixetl/submit_job.py:6-76`) with a per-grid resource table
  * (`submit_job.py:87-90`). Here the same catalog drives in-process Spark
  * jobs: independent jobs run concurrently on one SparkSession (Spark's
  * scheduler interleaves their stages), dependents start only when their
  * upstream succeeds.
  *
  * Deliberate differences from the reference, both documented here:
  *  - a dependent whose upstream FAILED is marked failed, not retried
  *    forever — the reference's `while dependent:` loop spins on a missing
  *    key (`submit_job.py:66-76`); we fail loudly on unresolvable or
  *    cyclic dependencies instead.
  *  - the catalog is the same three-level structure re-expressed as JSON
  *    (layer → attribute → {version, data_type, no_data, grids}), parsed
  *    with json4s; YAML is a config-format choice, not semantics.
  */
object SubmitJob {

  final case class JobDef(
      layer: String,          // "dataset/attribute/grid" — the dependency key
      jobName: String,        // batch-safe name, '/' → '-'
      specJson: String,       // LayerSpec JSON runnable by graft.Pixetl
      grid: String,
      dependsOn: Option[String],
      vcpus: Int,
      memoryMb: Int,
      attempts: Int = 2,
      timeoutSec: Int = 7200)

  /** Parse the catalog into (runnable, dependent) job lists — the
    * reference's `define_jobs()`. Grids in `excludeGrids` are skipped
    * (the reference hardcodes `grid != "1/4000"`). */
  def defineJobs(catalogJson: String,
                 excludeGrids: Set[String] = Set("1/4000")): (Seq[JobDef], Seq[JobDef]) = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(catalogJson)
    val runnable = Vector.newBuilder[JobDef]
    val dependent = Vector.newBuilder[JobDef]
    for {
      JObject(layers) <- Seq(root)
      (layer, attrs) <- layers
      JObject(attrFields) <- Seq(attrs)
      (attribute, body) <- attrFields
      grids = (body \ "grids").asInstanceOf[JObject].obj
      (grid, gridBody) <- grids if !excludeGrids.contains(grid)
    } {
      val name = s"$layer/$attribute/$grid"
      val version = (body \ "version").extract[String]
      val spec = JObject(List(
        "dataset" -> JString(layer),
        "version" -> JString(version),
        "pixel_meaning" -> JString(attribute),
        "data_type" -> (body \ "data_type"),
        "no_data" -> (body \ "no_data"),
        "grid" -> JString(grid),
        "source_type" -> (gridBody \ "type"),
        "resampling" -> (gridBody \ "resampling"),
        "source_uri" -> (((gridBody \ "uri"), (gridBody \ "depends_on")) match {
          case (JNothing, JString(dep)) =>
            // a resampled grid reads the upstream grid's published manifest
            // (the reference's data-lake naming convention); the executor
            // resolves the pixetl:// scheme against its dest prefix
            JArray(List(JString(s"pixetl://$dep/tiles.geojson")))
          case (JNothing, _) => JNothing
          case (u, _)        => JArray(List(u))
        })).filterNot(_._2 == JNothing))
      // per-grid resource table (submit_job.py:87-90)
      val big = grid == "10/40000"
      val job = JobDef(
        layer = name,
        jobName = name.replace('/', '-'),
        specJson = JsonMethods.compact(JsonMethods.render(spec)),
        grid = grid,
        dependsOn = (gridBody \ "depends_on").extractOpt[String],
        vcpus = if (big) 48 else 8,
        memoryMb = if (big) 380000 else 63000)
      if (job.dependsOn.isEmpty) runnable += job else dependent += job
    }
    (runnable.result(), dependent.result())
  }

  /** Topological run: all runnable jobs first (up to `parallelism` at
    * once), then waves of dependents whose upstream succeeded. Each job
    * retries up to `attempts` times (the reference's retryStrategy).
    * Returns the outcome per layer key; unresolvable dependencies (missing
    * upstream or cycle) and dependents of failed upstreams come back as
    * `Failure` rather than hanging. */
  def run(runnable: Seq[JobDef], dependent: Seq[JobDef], parallelism: Int = 4)
         (exec: JobDef => Unit): Map[String, Try[Unit]] = {
    val results = new ConcurrentHashMap[String, Try[Unit]]()
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))

    // a timed-out job is cancelled via thread interrupt; Spark typically
    // wraps the InterruptedException in a SparkException, so a plain
    // NonFatal retry would re-run the abandoned job and occupy the pool
    // slot for up to another full run — check both the thread flag and the
    // failure's cause chain, and stop retrying once interrupted
    def interrupted(t: Try[Unit]): Boolean = t match {
      case Failure(e) =>
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(16)
          .exists(c => c.isInstanceOf[InterruptedException] ||
            c.isInstanceOf[java.nio.channels.ClosedByInterruptException])
      case _ => false
    }
    def attempt(job: JobDef): Try[Unit] = {
      var last: Try[Unit] = Failure(new IllegalStateException("not run"))
      var i = 0
      while (i < job.attempts && last.isFailure && !Thread.currentThread().isInterrupted) {
        last = Try(exec(job))
        if (interrupted(last)) {
          Thread.currentThread().interrupt() // restore the cleared flag
          i = job.attempts
        }
        i += 1
      }
      last
    }
    def runWave(jobs: Seq[JobDef]): Unit = {
      val futures = jobs.map(j => j -> pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
        def call(): Try[Unit] = attempt(j)
      }))
      // bounded join — the reference's Batch attempt timeout: one hung job
      // must not stall its wave and every dependent forever. Cancel
      // interrupts the worker thread; a Spark action responds to interrupt.
      futures.foreach { case (j, f) =>
        val outcome =
          try f.get(j.timeoutSec, TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              f.cancel(true)
              Failure(new java.util.concurrent.TimeoutException(
                s"job ${j.layer} exceeded timeout ${j.timeoutSec}s"))
            case e: java.util.concurrent.ExecutionException => Failure(e.getCause)
          }
        results.put(j.layer, outcome)
      }
    }

    try {
      runWave(runnable)
      var pending = dependent
      var progressed = true
      while (pending.nonEmpty && progressed) {
        val (ready, notReady) = pending.partition(j => results.containsKey(j.dependsOn.get))
        val (depOk, depFailed) = ready.partition(j => results.get(j.dependsOn.get).isSuccess)
        depFailed.foreach(j => results.put(j.layer, Failure(new IllegalStateException(
          s"upstream ${j.dependsOn.get} failed"))))
        runWave(depOk)
        progressed = ready.nonEmpty
        pending = notReady
      }
      pending.foreach(j => results.put(j.layer, Failure(new IllegalStateException(
        s"unresolvable dependency ${j.dependsOn.get} (missing job or cycle)"))))
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
    }
    results.asScala.toMap
  }

  /** Parse + run in one step against a real executor. */
  def runCatalog(catalogJson: String, parallelism: Int = 4)
                (exec: JobDef => Unit): Map[String, Try[Unit]] = {
    val (r, d) = defineJobs(catalogJson)
    run(r, d, parallelism)(exec)
  }

  /** Executor running each job in-process through [[Pixetl.run]] on ONE
    * shared SparkSession — the Spark-native replacement for the reference's
    * per-job AWS Batch containers: independent layers interleave their
    * stages on the same cluster, dependents read upstream manifests via the
    * pixetl:// convention. */
  def pixetlExecutor(spark: org.apache.spark.sql.SparkSession, dest: String,
                     overwrite: Boolean = true): JobDef => Unit =
    j => {
      Pixetl.run(spark, graft.core.LayerSpec.fromJson(j.specJson), dest,
        overwrite, None)
      ()
    }
}
