package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing built on MD5.
  *
  * Dedup/minhash operators need a token hash that the DuckDB oracle can
  * reproduce exactly. Spark's `xxhash64`/`hash` and DuckDB's `hash` are
  * different algorithms, but both engines expose MD5 over strings — so the
  * engine's portable token hash is the first 8 hex chars of `md5(s)` read as
  * an unsigned 32-bit integer:
  *
  *   Spark:  conv(substr(md5(s), 1, 8), 16, 10)::long
  *   DuckDB: ('0x' || substr(md5(s), 1, 8))::bigint
  *
  * MD5 is not on the per-pixel hot path: it runs once per token/document in
  * dedup jobs where the shuffle, not the hash, dominates. At 100 TB the
  * band-join/minhash shuffles are the cost; hash choice is free.
  */
object PortableHash {

  /** 32-bit-valued token hash in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[hash32]] over SQL text `expr`. */
  def hash32Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT)"

  /** Large prime for affine minhash permutations; products stay < 2^63:
    * a,b < 2^20, h < 2^32 → a*h+b < 2^52. */
  val prime: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** k deterministic affine permutation parameters (a, b) — small odd
    * multipliers derived from the permutation index, no RNG (workflows must
    * be replayable). */
  def perm(i: Int): (Long, Long) = ((2 * i + 1).toLong * 12289L % 1048573L,
    (i + 1).toLong * 786433L % 1048573L)

  /** MinHash value under permutation i: (a*h + b) mod prime. */
  def minhashTerm(h: Column, i: Int): Column = {
    val (a, b) = perm(i)
    (h * lit(a) + lit(b)) % lit(prime)
  }

  def minhashTermSql(hExpr: String, i: Int): String = {
    val (a, b) = perm(i)
    s"(($hExpr) * $a + $b) % $prime"
  }
}
