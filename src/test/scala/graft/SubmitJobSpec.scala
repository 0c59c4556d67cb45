package graft

import graft.core.LayerSpec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog parsing + topological scheduling semantics of the fleet
  * orchestrator (reference: gfw_pixetl/submit_job.py). Pure JVM — the
  * executor is stubbed; Pixetl itself is covered by its own specs. */
class SubmitJobSpec extends AnyFunSuite {

  private val catalog =
    """{
      |  "biomass": {
      |    "Mg_ha-1": {
      |      "version": "v4",
      |      "data_type": "uint16",
      |      "no_data": 0,
      |      "grids": {
      |        "10/40000": {"type": "raster", "uri": "s3://bucket/biomass/tiles.geojson"},
      |        "90/27008": {"type": "raster", "depends_on": "biomass/Mg_ha-1/10/40000",
      |                     "resampling": "average"},
      |        "1/4000":   {"type": "raster", "uri": "s3://bucket/biomass/small.geojson"}
      |      }
      |    }
      |  },
      |  "carbon": {
      |    "Mg": {
      |      "version": "v2",
      |      "data_type": "float32",
      |      "no_data": 0,
      |      "grids": {
      |        "10/40000": {"type": "raster", "uri": "s3://bucket/carbon/tiles.geojson"},
      |        "90/27008": {"type": "raster", "depends_on": "carbon/Mg/10/40000",
      |                     "resampling": "average"},
      |        "90/1008":  {"type": "raster", "depends_on": "carbon/Mg/90/27008",
      |                     "resampling": "average"}
      |      }
      |    }
      |  }
      |}""".stripMargin

  test("defineJobs splits runnable vs dependent, skips excluded grids, sizes resources") {
    val (runnable, dependent) = SubmitJob.defineJobs(catalog)
    assert(runnable.map(_.layer).toSet ==
      Set("biomass/Mg_ha-1/10/40000", "carbon/Mg/10/40000"))
    assert(dependent.map(_.layer).toSet ==
      Set("biomass/Mg_ha-1/90/27008", "carbon/Mg/90/27008", "carbon/Mg/90/1008"))
    val big = runnable.find(_.grid == "10/40000").get
    assert(big.vcpus == 48 && big.memoryMb == 380000) // submit_job.py:87-90
    val small = dependent.head
    assert(small.vcpus == 8 && small.memoryMb == 63000)
    assert(runnable.forall(_.jobName.forall(c => c != '/')))
  }

  test("generated spec JSON is runnable by the LayerSpec parser") {
    val (runnable, dependent) = SubmitJob.defineJobs(catalog)
    val spec = LayerSpec.fromJson(runnable.find(_.layer.startsWith("biomass")).get.specJson)
    assert(spec.dataset == "biomass" && spec.version == "v4")
    assert(spec.pixelMeaning == "Mg_ha-1" && spec.grid == "10/40000")
    assert(spec.dataType == "uint16")
    assert(spec.sourceUri.contains(Seq("s3://bucket/biomass/tiles.geojson")))
    val dep = LayerSpec.fromJson(dependent.find(_.layer == "carbon/Mg/90/27008").get.specJson)
    assert(dep.resampling == "average")
    assert(dep.sourceUri.contains(Seq("pixetl://carbon/Mg/10/40000/tiles.geojson")))
  }

  test("topological run: upstream before dependent, chains in waves, all succeed") {
    val (runnable, dependent) = SubmitJob.defineJobs(catalog)
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val results = SubmitJob.run(runnable, dependent, parallelism = 4) { j =>
      order.add(j.layer); ()
    }
    assert(results.size == 5 && results.values.forall(_.isSuccess))
    val idx = order.toArray.zipWithIndex.map { case (l, i) => l.toString -> i }.toMap
    assert(idx("biomass/Mg_ha-1/10/40000") < idx("biomass/Mg_ha-1/90/27008"))
    assert(idx("carbon/Mg/10/40000") < idx("carbon/Mg/90/27008"))
    assert(idx("carbon/Mg/90/27008") < idx("carbon/Mg/90/1008"))
  }

  test("retry succeeds on second attempt; failed upstream fails its dependents") {
    val (runnable, dependent) = SubmitJob.defineJobs(catalog)
    val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = SubmitJob.run(runnable, dependent, parallelism = 2) { j =>
      j.layer match {
        case "biomass/Mg_ha-1/10/40000" => // flaky: first attempt throws
          if (flaky.getAndIncrement() == 0) sys.error("transient")
        case "carbon/Mg/10/40000" => sys.error("hard failure") // both attempts
        case _ => ()
      }
    }
    assert(results("biomass/Mg_ha-1/10/40000").isSuccess) // attempts=2 recovered
    assert(results("biomass/Mg_ha-1/90/27008").isSuccess)
    assert(results("carbon/Mg/10/40000").isFailure)
    // transitive: both downstream carbon grids fail without running
    assert(results("carbon/Mg/90/27008").isFailure)
    assert(results("carbon/Mg/90/1008").isFailure)
  }

  test("hung job times out, fails its dependents, and does not stall the wave") {
    val hung = SubmitJob.JobDef("a/b/10/40000", "a-b", "{}", "10/40000",
      dependsOn = None, vcpus = 8, memoryMb = 63000, attempts = 1, timeoutSec = 1)
    val ok = SubmitJob.JobDef("c/d/10/40000", "c-d", "{}", "10/40000",
      dependsOn = None, vcpus = 8, memoryMb = 63000)
    val dep = SubmitJob.JobDef("a/b/90/27008", "a-b-90", "{}", "90/27008",
      dependsOn = Some("a/b/10/40000"), vcpus = 8, memoryMb = 63000)
    val depRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    val results = SubmitJob.run(Seq(hung, ok), Seq(dep), parallelism = 2) { j =>
      j.layer match {
        case "a/b/10/40000"  => Thread.sleep(30000) // hang well past timeoutSec
        case "a/b/90/27008"  => depRan.set(true)
        case _               => ()
      }
    }
    assert(results("a/b/10/40000").isFailure)
    assert(results("a/b/10/40000").failed.get.isInstanceOf[java.util.concurrent.TimeoutException])
    assert(results("c/d/10/40000").isSuccess) // the wave completed
    assert(results("a/b/90/27008").isFailure && !depRan.get()) // dependent fenced
  }

  test("unresolvable dependency fails loudly instead of spinning") {
    val orphan = SubmitJob.JobDef("x/y/90/1008", "x-y", "{}", "90/1008",
      dependsOn = Some("never/exists/10/40000"), vcpus = 8, memoryMb = 63000)
    val results = SubmitJob.run(Nil, Seq(orphan), parallelism = 1)(_ => ())
    assert(results("x/y/90/1008").isFailure)
    assert(results("x/y/90/1008").failed.get.getMessage.contains("unresolvable"))
  }
}
