package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scale design:
  *  - `bruteTopK` broadcasts the (small) query set and scans the corpus
  *    once — the right plan when queries ≪ corpus, which is the ANN
  *    serving shape; dot products run inside codegen via
  *    `aggregate`/`zip_with`, no UDFs.
  *  - `lshTopK` is the scale path: random-hyperplane signatures put
  *    near vectors in shared buckets; only bucket-mates are scored.
  *    At 100 TB the bucket join replaces the full cross product, and
  *    multi-probe (nProbes hyperplane sets) recovers recall.
  */
object Similarity {

  /** cosine similarity of two float-array columns. Elements are cast
    * to double BEFORE multiplying so the math matches engines that
    * compute in double over float32 storage (oracle parity + accuracy).
    */
  def cosine(a0: Column, b0: Column): Column = {
    val a = transform(a0, x => x.cast("double"))
    val b = transform(b0, x => x.cast("double"))
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact top-k neighbors (cosine) for each query vector.
    * Rounded similarity + id tie-break keep ranking deterministic
    * across engines and summation orders.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .join(q, col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"), col("sim"))
  }

  /** Deterministic ±1 hyperplane: component d = bit d of
    * md5("rhp_<seed>_<j>") (128 md5 bits ⇒ dims <= 128). A public,
    * engine-portable derivation: any SQL engine with md5 rebuilds the
    * identical plane, so LSH bucketing is oracle-checkable.
    */
  def rhpPlane(seed: Int, j: Int, dims: Int): Array[Double] = {
    require(dims <= 128, s"rhpPlane supports <= 128 dims, got $dims")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rhp_${seed}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Array.tabulate(dims) { d =>
      val nib = Integer.parseInt(hex.charAt(d / 4).toString, 16)
      if (((nib >> (d % 4)) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Random-hyperplane signature: bit j = sign of <v, r_j>. The planes
    * are driver-precomputed literal arrays — the per-row work is pure
    * codegen'd float math (no hashing in the hot path), which is the
    * plan you want scoring 100 TB of vectors.
    */
  def rhpSignature(vec: Column, bits: Int, dims: Int, seed: Int = 42): Column = {
    val projections: Seq[Column] = (0 until bits).map { j =>
      val plane = array(rhpPlane(seed, j, dims).map(lit): _*)
      val proj = aggregate(
        zip_with(vec, plane, (x, r) => x.cast("double") * r),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    projections.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: candidates share an exact signature bucket in
    * at least one of `nProbes` independent hyperplane sets; candidates
    * are then exactly re-scored. Recall < 1 by construction; raise
    * bits/probes to trade shuffle volume for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 12, nProbes: Int = 4, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def signed(df: DataFrame, prefix: String): DataFrame =
      df.select(Seq(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec")) ++
        (0 until nProbes).map(p =>
          rhpSignature(col(vecCol), bits, dims, seed = 42 + p).as(s"${prefix}_sig_$p")): _*)

    val c = signed(corpus, "n")
    val q = broadcast(signed(queries, "q"))
    // one EQUI-join per probe, unioned then deduped — an OR over probe
    // conditions would force a nested-loop over the full cross product;
    // per-probe hash joins shuffle only same-bucket pairs (the point of
    // LSH) and scale to arbitrarily many probes
    val cand = (0 until nProbes).map { p =>
      c.join(q, col(s"q_sig_$p") === col(s"n_sig_$p") &&
          col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
    }.reduce(_ union _).distinct()

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"), col("sim"))
  }

  /** embedding-cosine near-duplicate pairs above a threshold, via LSH
    * buckets (the embedding flavor of Dedup).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      bits: Int = 12, nProbes: Int = 4, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def signed(prefix: String): DataFrame =
      df.select(Seq(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec")) ++
        (0 until nProbes).map(p =>
          rhpSignature(col(vecCol), bits, dims, seed = 42 + p).as(s"${prefix}_sig_$p")): _*)
    // cache the signed side: it feeds one equi-join per probe (an OR
    // join would nested-loop the full N^2 pair space; per-probe hash
    // joins touch same-bucket pairs only — the point of LSH). The b
    // side is the same cached frame renamed, so signatures compute once.
    val a = signed("a").cache()
    val b = a.toDF(a.columns.map(_.replaceFirst("^a_", "b_")).toIndexedSeq: _*)
    (0 until nProbes).map { p =>
      a.join(b, col(s"a_sig_$p") === col(s"b_sig_$p") &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("a_vec"), col("b_id"), col("b_vec"))
    }.reduce(_ union _).distinct()
      .withColumn("sim", round(cosine(col("a_vec"), col("b_vec")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("sim"))
  }
}
