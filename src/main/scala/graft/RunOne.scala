package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query from SparkEntry.queries with timing —
  * `sbt "runMain graft.RunOne q_dedup_minhash /root/testdata/sf0.1 3"`.
  * Prints per-iteration wall time and (with EXPLAIN=1) the formatted plan.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.ui.enabled", sys.env.getOrElse("RUNONE_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("EXPLAIN"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[runone] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
