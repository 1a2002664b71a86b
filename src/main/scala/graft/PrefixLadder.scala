package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prefix-index crossover ladder (r11, VERDICT r10 nit #1): measures,
  * at 1× and N× the sf corpus, (a) the un-indexed autocomplete scan
  * (tokenize corpus → filter prefix → aggregate), (b) the one-time
  * index build, (c) the indexed serve. The claim under test: serve
  * latency is ~flat as the corpus grows while the scan grows ~linearly
  * — so past a modest query volume (crossover ≈ build / (scan − serve)
  * queries) the index wins, and at 100 TB the un-indexed scan is not a
  * serving option at all. Results land in PERF.md #28.
  *
  * Usage: `runMain graft.PrefixLadder [sfDir] [factor] [iters]`.
  */
object PrefixLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tokens(mult: Int): DataFrame = {
      val docs = Tables.documents(spark, sfDir)
      val big = (0 until mult)
        .map(i => docs.withColumn("doc_id",
          col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
      big.select(col("doc_id"),
          explode(split(lower(
            graft.functions.GraftFunctions.normalizeWs(col("text"))),
            " ")).as("tok"))
        .filter(length(col("tok")) > 0)
    }

    def time(label: String)(f: => Long): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        require(n >= 0)
        dt
      }
      val best = ts.min
      println(f"[prefix-ladder] $label%-28s min ${best}%.3f s " +
        f"(of ${ts.map(t => f"$t%.2f").mkString(", ")})")
      best
    }

    val tmp = java.nio.file.Files
      .createTempDirectory("graft_prefix_ladder").toString
    Seq(1, factor).foreach { m =>
      val toks = tokens(m)
      val scan = time(s"scan x$m (no index)") {
        toks.filter(col("tok").startsWith("s"))
          .groupBy(col("tok"))
          .agg(countDistinct(col("doc_id")).as("df"),
            count(lit(1)).as("tf_total"))
          .orderBy(col("df").desc, col("tok")).limit(10).count()
      }
      val path = s"$tmp/idx_x$m"
      val build = time(s"index build x$m (once)") {
        graft.operators.PrefixIndex.build(toks, path); 0L
      }
      val serve = time(s"indexed serve x$m") {
        graft.operators.PrefixIndex.serve(spark, path, "s").count()
      }
      val crossover = math.ceil(build / math.max(scan - serve, 1e-9)).toLong
      println(f"[prefix-ladder] x$m%d crossover ≈ $crossover%d queries " +
        f"(build $build%.2f s amortizes over scan−serve " +
        f"${scan - serve}%.3f s/query)")
    }
    spark.stop()
  }
}
