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
  * once. `get` falls back to a plain Configuration when nothing was
  * installed (driver-side use, unit tests), so every call site stays a
  * drop-in replacement for `new Configuration()`.
  */
object HadoopConfs {
  @volatile private var packed: Array[Byte] = _
  @volatile private var cached: Configuration = _

  /** Serialize the driver's configuration for closure capture. */
  def capture(conf: Configuration): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8192)
    conf.write(new DataOutputStream(bos))
    bos.toByteArray
  }

  /** Install the driver's packed configuration in this JVM (idempotent for
    * identical bytes; call at the top of every task closure that touches a
    * FileSystem). NOT first-wins: a long-lived executor serving a LATER job
    * with different driver settings — rotated credentials, a second
    * SparkSession with other `spark.hadoop.*` values — must not keep the
    * stale configuration (ADVICE r13), so changed bytes reinstall and
    * invalidate the cached Configuration. Cheap in the hot path: the
    * common per-task call compares a reference then array equality on a
    * few-KB buffer, no parsing. */
  def install(bytes: Array[Byte]): Unit =
    if (bytes != null && (packed ne bytes) && !java.util.Arrays.equals(packed, bytes))
      synchronized {
        if (!java.util.Arrays.equals(packed, bytes)) { packed = bytes; cached = null }
      }

  /** The effective configuration: the installed driver conf if present,
    * else a plain classpath Configuration — built ONCE per JVM either way
    * (the per-call `new Configuration()` XML parse was itself a per-block
    * cost on object-store reads). */
  def get: Configuration = {
    var c = cached
    if (c == null) synchronized {
      c = cached
      if (c == null) {
        c = if (packed != null) {
          val conf = new Configuration(false)
          conf.readFields(new DataInputStream(new ByteArrayInputStream(packed)))
          conf
        } else new Configuration()
        cached = c
      }
    }
    c
  }
}
