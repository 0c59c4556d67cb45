package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.hadoop.conf.Configuration

/** Driver→executor propagation of the job's Hadoop configuration.
  *
  * `new Configuration()` on an executor loads only the classpath XML — it
  * NEVER sees `spark.hadoop.*` runtime settings (the standard way
  * object-store credentials/endpoints reach a job), so a task-side tile
  * read or upload would authenticate differently from the driver that
  * planned it. Spark's own `SerializableConfiguration` is private[spark];
  * this is the same mechanism in public API: the driver packs its
  * `sparkContext.hadoopConfiguration` (Configuration is a Writable) into
  * bytes the closure captures, and each executor JVM rebuilds + caches it
  * per distinct byte payload. `get` falls back to a plain Configuration
  * when nothing was installed (driver-side use, unit tests), so every call
  * site stays a drop-in replacement for `new Configuration()`.
  *
  * Concurrency contract (ADVICE r14): configurations are cached KEYED BY
  * the packed bytes — not one global slot — and `install` binds the
  * calling task's THREAD to its own configuration. Two SparkSessions with
  * different hadoop confs sharing one executor no longer thrash a single
  * slot, and a task of job A that calls install-then-get around job B's
  * install still reads A's endpoint/credentials. Helper threads inherit
  * their spawning task thread's binding (InheritableThreadLocal, ADVICE
  * r15); a thread with no inherited binding falls back to the JVM-wide
  * last install only while it is unambiguous (one distinct conf seen).
  */
object HadoopConfs {
  private final class Key(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  /** Small LRU keyed by packed bytes: one entry per distinct driver conf
    * this JVM has seen; bounded so sessions churning credentials over a
    * long-lived executor can't grow it unboundedly. */
  private val MaxCached = 8
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Key, Configuration](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, Configuration]): Boolean =
        size > MaxCached
    })

  /** The configuration the CURRENT task thread installed — the authoritative
    * binding (task closures call install() at their top, and the read path
    * runs on the same thread). INHERITABLE (ADVICE r15): a helper/IO thread
    * spawned by a bound task thread gets its PARENT's binding at creation,
    * so job A's helpers keep reading A's endpoint/credentials even after a
    * concurrent job B installs — the last-wins slot is no longer their
    * fallback. */
  private val current = new InheritableThreadLocal[Configuration]
  /** JVM-wide most-recent install: fallback ONLY while this JVM has seen a
    * single distinct configuration (single-session executors — the common
    * case — where it is unambiguous). Once a second distinct conf installs,
    * an unbound thread gets the classpath default instead: failing loudly
    * (missing credentials) beats silently borrowing another job's. */
  @volatile private var lastInstalled: Configuration = _
  @volatile private var distinctSeen: Int = 0
  /** Lazily-built classpath default for driver-side / test use. */
  @volatile private var classpathDefault: Configuration = _

  /** Clear the calling thread's binding (test hook: lets a spec construct
    * a thread lineage with no inherited configuration). */
  private[sources] def unbind(): Unit = current.remove()

  /** Test hook: distinct conf payloads ever installed in this JVM — lets a
    * spec assert the stampede/race accounting without resetting the
    * JVM-global state other suites share. */
  private[sources] def distinctCount: Int = distinctSeen

  /** Serialize the driver's configuration for closure capture. */
  def capture(conf: Configuration): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8192)
    conf.write(new DataOutputStream(bos))
    bos.toByteArray
  }

  /** Install the driver's packed configuration for this task: parse-once
    * per distinct payload (keyed cache), then bind to the calling thread.
    * Cheap in the hot path: a hash + array-equality lookup on a few-KB
    * buffer, no XML parse after the first task of a job. */
  def install(bytes: Array[Byte]): Unit = if (bytes != null) {
    val k = new Key(bytes)
    var c = cache.get(k)
    if (c == null) {
      // Distinct-conf accounting must be ATOMIC with the cache insert
      // (ADVICE r16): a first-stage stampede of one job's tasks racing the
      // unsynchronized path could each see a miss and over-count
      // distinctSeen past 1 (permanently disabling the lastInstalled
      // fallback for a single-session JVM), while two genuinely different
      // confs racing could both read 0 and land on 1 (silently re-enabling
      // the ambiguous credential-borrowing the counter exists to close).
      // Collections.synchronizedMap guards on the wrapper itself, so this
      // block shares the map's own mutex; double-checked get means only
      // the true first task of a payload parses (no double-parse either).
      cache.synchronized {
        c = cache.get(k)
        if (c == null) {
          val conf = new Configuration(false)
          conf.readFields(new DataInputStream(new ByteArrayInputStream(bytes)))
          cache.put(k, conf)
          c = conf
          // monotone "ever seen" count: re-install after LRU eviction can
          // double-count, but eviction needs >MaxCached distinct confs, so
          // the only bit read (1-vs-many) is already settled by then
          distinctSeen += 1
        }
      }
    }
    current.set(c)
    lastInstalled = c
  }

  /** The effective configuration: the one THIS thread installed, else the
    * JVM's most recent install, else a classpath Configuration built once
    * (the per-call `new Configuration()` XML parse was itself a per-block
    * cost on object-store reads). */
  def get: Configuration = {
    val mine = current.get()
    if (mine != null) mine
    else {
      // unambiguous only while ONE distinct conf has ever installed here;
      // under concurrent multi-session executors an unbound thread must
      // not guess between jobs' credentials (ADVICE r15)
      val last = if (distinctSeen <= 1) lastInstalled else null
      if (last != null) last
      else {
        var d = classpathDefault
        if (d == null) synchronized {
          d = classpathDefault
          if (d == null) { d = new Configuration(); classpathDefault = d }
        }
        d
      }
    }
  }
}
