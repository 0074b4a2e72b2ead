package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe (round 19): per-round wall of BpeTrain.learnMerges
  * at 64 merges on the sf dir — prices the per-round driver floor the
  * BpeAdjacentPairs expression targets. Prints mean/median/head/tail. */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val merges = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.read(spark, sfDir, "documents")
    (1 to 2).foreach { pass =>
      val rounds = scala.collection.mutable.ArrayBuffer[Double]()
      val t0 = System.nanoTime()
      val learned = graft.operators.BpeTrain.learnMerges(docs, "text", merges,
        onRoundNanos = Some((_, ns) => rounds += ns / 1e6))
      val total = (System.nanoTime() - t0) / 1e9
      val s = rounds.sorted
      def pct(p: Double) = s((p * (s.length - 1)).round.toInt)
      println(f"[bpe] pass$pass merges=${learned.size} total=$total%.2f s " +
        f"mean=${rounds.sum / rounds.length}%.1f ms med=${pct(0.5)}%.1f ms " +
        f"p90=${pct(0.9)}%.1f ms max=${pct(1.0)}%.1f ms")
    }
    spark.stop()
  }
}
