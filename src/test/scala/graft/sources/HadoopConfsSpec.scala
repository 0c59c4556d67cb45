package graft.sources

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Driver→executor Hadoop-conf propagation. The r13 ADVICE defect: install()
  * was first-wins per JVM, so a later job's rotated credentials (different
  * packed bytes) were silently ignored by a long-lived executor. Now changed
  * bytes reinstall and invalidate the cached Configuration; identical bytes
  * stay a cheap no-op that does NOT rebuild the cache.
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
    // short-circuit): no reinstall, cached Configuration is reused
    HadoopConfs.install(pack("graft.test.key" -> "v1"))
    assert(HadoopConfs.get eq c1)
  }

  test("changed bytes reinstall and invalidate the cache (rotated credentials)") {
    HadoopConfs.install(pack("graft.test.key" -> "v1"))
    val before = HadoopConfs.get
    HadoopConfs.install(pack("graft.test.key" -> "v2", "graft.test.extra" -> "e"))
    val after = HadoopConfs.get
    assert(after ne before)
    assert(after.get("graft.test.key") == "v2")
    assert(after.get("graft.test.extra") == "e")
  }
}
