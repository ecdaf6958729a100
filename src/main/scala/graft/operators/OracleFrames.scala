package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialized-frame bridge between self-generated/Scala-computed inputs
  * and the DuckDB oracle.
  *
  * Queries whose inputs don't exist as driver parquet (the self-generated kg
  * corpus) or whose per-row kernels aren't SQL (trie matching, embedding,
  * stub decoding) still have genuinely relational halves — joins, windows,
  * aggregations, explodes. Under graft.Verify (`graft.oracle.frames=1`) those
  * queries write their deterministic pre-relational frames here and READ THEM
  * BACK, so the engine consumes byte-for-byte what the oracle's
  * `read_parquet` replays — turning the relational half into a hard
  * rows+schema+hash check. Bench leaves the flag unset: no extra I/O in
  * timed runs, and the exact same relational code path runs either way (only
  * the materialization boundary differs).
  */
object OracleFrames {

  def enabled: Boolean = sys.props.get("graft.oracle.frames").contains("1")

  /** Resolved once per JVM; `graft.oracle.frames.dir` overrides for
    * checkouts living elsewhere. SparkEntry interpolates this SAME value
    * into the oracle SQL, so engine writes and DuckDB reads cannot drift.
    */
  val dir: String =
    sys.props.getOrElse("graft.oracle.frames.dir", "/root/repo/target/oracle_frames")

  /** Identity when disabled; write-then-reread under Verify. */
  def materialize(df: DataFrame, name: String): DataFrame =
    if (!enabled) df
    else {
      df.coalesce(4).write.mode("overwrite").parquet(s"$dir/$name")
      df.sparkSession.read.parquet(s"$dir/$name")
    }
}
