package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: measured recall@k curve for the ANN operators
  * (VERDICT r11 #8). The s04/s06 gates pin plan shape and byte-exact
  * agreement with a SQL oracle at fixed parameters; this probe is the
  * missing empirical leg — how much recall the nprobe / refine
  * defaults actually buy against the brute-force ground truth, so the
  * defaults carry evidence instead of being spec constants.
  *
  * Protocol: corpus = an embeddings table, queries = every `qn`-th
  * vector (deterministic; no RNG in a probe that feeds SCALING.md),
  * truth = bruteTopK@k. recall@k = |approx ∩ truth| / k averaged over
  * queries, ties broken identically in all engines (sim desc, id asc —
  * the operators' own ordering). Prints one table row per setting.
  *
  * Usage: runMain graft.RecallProbe [embeddingsDir] [k] [queryStride]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val qn = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") % qn === 0).cache()
    val nq = queries.count()
    println(s"[recall] corpus=$n queries=$nq k=$k")

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("n_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    val truth = topSets(Similarity.bruteTopK(corpus, queries, k))

    def measure(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = topSets(f)
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size
      }.sum / truth.size
      println(f"[recall] $label%-34s recall@$k ${recall}%.4f  ${secs}%6.2f s")
    }

    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      measure(s"ivf    nlist=16 nprobe=$nprobe") {
        Similarity.ivfTopK(corpus, queries, k, nlist = 16, nprobe = nprobe)
      }
      measure(s"ivf-pq nlist=16 nprobe=$nprobe refine=3") {
        Similarity.ivfPqTopK(corpus, queries, k, nlist = 16, nprobe = nprobe)
      }
    }
    // refine sweep at the default nprobe: how much the exact re-rank
    // window buys back from ADC quantization error
    for (refine <- Seq(1, 2, 5)) {
      measure(s"ivf-pq nlist=16 nprobe=4 refine=$refine") {
        Similarity.ivfPqTopK(corpus, queries, k, nprobe = 4, refine = refine)
      }
    }
    // codebook-width sweep: ksub is the bits-per-subvector knob
    // (code size = m*log2(ksub)/8 bytes); the gate's ksub=16 keeps the
    // oracle tractable, production would run 256 (FAISS's default)
    for (ksub <- Seq(64, 256)) {
      measure(s"ivf-pq nprobe=4 ksub=$ksub refine=3") {
        Similarity.ivfPqTopK(corpus, queries, k, nprobe = 4, ksub = ksub)
      }
    }
    spark.stop()
  }
}
