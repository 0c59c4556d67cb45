package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass every
  * large parquet lake runs (a 100 TB corpus written by thousands of tasks
  * accretes millions of KB-scale files; scans then pay per-file open cost
  * and the driver pays per-file planning cost). The planner assigns files
  * to target-size rewrite groups; executing a group is an ordinary
  * read→coalesce→write job.
  *
  * Packing is SEQUENTIAL GREEDY in a deterministic file order (the
  * streaming form compaction services actually use — first-fit-decreasing
  * needs global sorted state; sequential packing is one window cumsum and
  * append-stable): within each partition directory, bin k = the running
  * byte count BEFORE the file, integer-divided by the target. A file that
  * straddles a boundary joins the earlier bin, so bins can run one file
  * over target — the standard tolerance. Everything is integer arithmetic
  * on (dir, name, bytes), so the whole plan replays in SQL (x22).
  *
  * Scale shape: one hash exchange on the partition directory + one window
  * sort per directory (file lists are per-directory thousands, not
  * corpus-sized), then an ordinary aggregate over the bin key. No
  * driver-side file list ever materializes. */
object Compaction {

  /** Assign each file to a rewrite bin. Input: (dir, file, bytes).
    * Output: input + (bin, cum_before). */
  def assignBins(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy("dir").orderBy("file")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
      // integer div, not float /: bins must replay exactly at any magnitude
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
  }

  /** The compaction work list: one row per (dir, bin) rewrite group with
    * file count and total bytes; `needs_rewrite` marks groups that would
    * actually change the layout (more than one file — a single file at
    * target size is already compact). */
  def plan(files: DataFrame, targetBytes: Long): DataFrame =
    assignBins(files, targetBytes)
      .groupBy("dir", "bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"))
      .withColumn("needs_rewrite", (col("n_files") > 1).cast("int"))
}
