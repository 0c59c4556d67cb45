package graft.sources

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Driver→executor Hadoop-conf propagation. The r13 ADVICE defect: install()
  * was first-wins per JVM, so a later job's rotated credentials (different
  * packed bytes) were silently ignored by a long-lived executor. The r14
  * ADVICE defect: the last-wins fix used ONE global slot, so two concurrent
  * jobs with different confs on a shared executor could thrash it and a
  * task could read the OTHER job's credentials mid-task. Now configurations
  * are cached keyed by the packed bytes and install() binds the calling
  * thread to its own configuration.
  */
class HadoopConfsSpec extends AnyFunSuite {

  private def pack(kv: (String, String)*): Array[Byte] = {
    val c = new Configuration(false)
    kv.foreach { case (k, v) => c.set(k, v) }
    HadoopConfs.capture(c)
  }

  test("install + get round-trips a setting; same bytes keep the cached instance") {
    HadoopConfs.install(pack("graft.test.key" -> "v1"))
    val c1 = HadoopConfs.get
    assert(c1.get("graft.test.key") == "v1")
    // identical content (fresh array, so reference-equality alone can't
    // short-circuit): keyed cache hit, Configuration instance is reused
    HadoopConfs.install(pack("graft.test.key" -> "v1"))
    assert(HadoopConfs.get eq c1)
  }

  test("changed bytes reinstall (rotated credentials)") {
    HadoopConfs.install(pack("graft.test.key" -> "v1"))
    val before = HadoopConfs.get
    HadoopConfs.install(pack("graft.test.key" -> "v2", "graft.test.extra" -> "e"))
    val after = HadoopConfs.get
    assert(after ne before)
    assert(after.get("graft.test.key") == "v2")
    assert(after.get("graft.test.extra") == "e")
  }

  test("a concurrent install on another thread does not hijack this task's conf") {
    HadoopConfs.install(pack("graft.test.job" -> "A"))
    // job B installs a different conf from another executor thread,
    // mid-task relative to job A's install/get window
    var bSees: String = null
    val t = new Thread(() => {
      HadoopConfs.install(pack("graft.test.job" -> "B"))
      bSees = HadoopConfs.get.get("graft.test.job")
    })
    t.start(); t.join()
    assert(bSees == "B")
    // this thread still reads its OWN binding, not B's
    assert(HadoopConfs.get.get("graft.test.job") == "A")
  }

  test("first-task stampede on ONE payload counts exactly one distinct conf (ADVICE r16)") {
    // the r16 ADVICE defect (a): many tasks of one job installing identical
    // bytes concurrently could each see a cache miss and over-count
    // distinctSeen past 1, permanently disabling the lastInstalled fallback
    // for a single-session JVM
    val bytes = pack("graft.test.stampede" -> ("s-" + System.nanoTime()))
    val before = HadoopConfs.distinctCount
    val n = 16
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val threads = (1 to n).map(_ => new Thread(() => {
      barrier.await(); HadoopConfs.install(bytes)
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(HadoopConfs.distinctCount == before + 1)
  }

  test("two DIFFERENT payloads racing count two distinct confs (ADVICE r16)") {
    // the r16 ADVICE defect (b): two different confs racing the
    // unsynchronized read-increment could both read k and write k+1,
    // under-counting and silently re-enabling the ambiguous
    // credential-borrowing fallback the counter exists to close
    val b1 = pack("graft.test.race" -> ("p1-" + System.nanoTime()))
    val b2 = pack("graft.test.race" -> ("p2-" + System.nanoTime()))
    val before = HadoopConfs.distinctCount
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val threads = (0 until n).map(i => new Thread(() => {
      barrier.await(); HadoopConfs.install(if (i % 2 == 0) b1 else b2)
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(HadoopConfs.distinctCount == before + 2)
  }

  test("helper threads that never installed fall back to the latest install") {
    HadoopConfs.install(pack("graft.test.job" -> "solo"))
    var seen: String = null
    val t = new Thread(() => { seen = HadoopConfs.get.get("graft.test.job") })
    t.start(); t.join()
    assert(seen == "solo")
  }

  test("helper threads INHERIT their spawner's binding, immune to later installs") {
    // the r15 ADVICE defect: a helper/IO thread spawned by job A's task
    // fell back to the JVM-wide last install, so job B installing later
    // flipped A's helper onto B's credentials. InheritableThreadLocal
    // copies A's binding at thread creation.
    HadoopConfs.install(pack("graft.test.job" -> "A2"))
    var seen: String = null
    val helper = new Thread(() => {
      val b = new Thread(() =>
        HadoopConfs.install(pack("graft.test.job" -> "B2")))
      b.start(); b.join() // B's install lands BEFORE the helper reads
      seen = HadoopConfs.get.get("graft.test.job")
    })
    helper.start(); helper.join()
    assert(seen == "A2")
  }

  test("an unbound thread refuses to guess between multiple jobs' confs") {
    // once two distinct confs have installed in this JVM, a thread with no
    // binding anywhere in its lineage gets the classpath default (missing
    // credentials fail loudly) instead of whichever job installed last
    HadoopConfs.install(pack("graft.test.job" -> "X"))
    HadoopConfs.install(pack("graft.test.job" -> "Y"))
    var seen: String = "unset"
    val parent = new Thread(() => {
      HadoopConfs.unbind() // sever the lineage before spawning
      val child = new Thread(() => {
        seen = HadoopConfs.get.get("graft.test.job")
      })
      child.start(); child.join()
    })
    parent.start(); parent.join()
    assert(seen == null)
  }
}
