package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scale design:
  *  - `bruteTopK` broadcasts the (small) query set and scans the corpus
  *    once — the right plan when queries ≪ corpus, which is the ANN
  *    serving shape; dot products run via `aggregate`/`zip_with`
  *    column functions, no UDFs.
  *  - `lshTopK` is the scale path: random-hyperplane signatures put
  *    near vectors in shared buckets; only bucket-mates are scored.
  *    At 100 TB the bucket join replaces the full cross product, and
  *    multi-probe (nProbes hyperplane sets) recovers recall.
  *  - Vector norms are computed once per vector and joined into the
  *    scoring pass, so each candidate pair pays ONE array traversal
  *    (the dot product) instead of three — at 100 TB the candidate
  *    set dwarfs the corpus, so per-pair work dominates.
  */
object Similarity {

  /** dot product of two float-array columns in double math (elements
    * cast before multiplying — matches engines computing in double
    * over float32 storage; oracle parity + accuracy). Runs as the
    * native codegen'd VecDot expression: the same left-to-right IEEE
    * fold as `aggregate(zip_with(...))` — identical doubles — but one
    * compiled loop per pair instead of 2·dims interpreted lambdas.
    */
  def dot(a0: Column, b0: Column): Column =
    graft.functions.GraphdFunctions.vec_dot(a0, b0)

  /** L2 norm of a float-array column (double math, codegen'd) */
  def norm(a0: Column): Column = graft.functions.GraphdFunctions.vec_norm(a0)

  /** cosine similarity of two float-array columns */
  def cosine(a0: Column, b0: Column): Column = dot(a0, b0) / (norm(a0) * norm(b0))

  /** Exact top-k neighbors (cosine) for each query vector.
    * Rounded similarity + id tie-break keep ranking deterministic
    * across engines and summation orders.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"))
    val scored = c.join(q, col("q_id") =!= col("n_id"))
      .withColumn("sim",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
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
    * column-function float math (no hashing in the hot path).
    */
  def rhpSignature(vec: Column, bits: Int, dims: Int, seed: Int = 42): Column = {
    val projections: Seq[Column] = (0 until bits).map { j =>
      val plane = array(rhpPlane(seed, j, dims).map(lit): _*)
      val proj = dot(vec, plane) // codegen'd; same ordered double fold
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    projections.reduce(_.bitwiseOR(_))
  }

  /** (id, probe, sig) bucket rows: every probe's signature computed in
    * one scan, exploded to one row per probe — the join-ready LSH
    * index shape. Cached under FIXED column names so every operator
    * touching the same (df, params) shares one materialization via
    * plan-equality (renames happen outside the cached plan).
    */
  private[graft] def probeSigs(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, nProbes: Int, dims: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        posexplode(array((0 until nProbes).map(p =>
          rhpSignature(col(vecCol), bits, dims, seed = 42 + p)): _*))
          .as(Seq("probe", "sig")))
      .cache()

  /** Approximate top-k: candidates share an exact signature bucket in
    * at least one of `nProbes` independent hyperplane sets; candidates
    * are then exactly re-scored. Recall < 1 by construction; raise
    * bits/probes to trade shuffle volume for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 12, nProbes: Int = 4, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE equi-join on (probe, bucket) — not a join per probe: the plan
    // stays constant-size as probes grow, and a probe-OR condition
    // (which would nested-loop the cross product) never appears.
    // Candidates carry id pairs only: the distinct shuffles 16-byte
    // pairs, not embedding payloads.
    val c = probeSigs(corpus, idCol, vecCol, bits, nProbes, dims)
      .toDF("n_id", "n_probe", "n_sig")
    val q = broadcast(probeSigs(queries, idCol, vecCol, bits, nProbes, dims)
      .toDF("q_id", "q_probe", "q_sig"))
    val cand = c.join(q,
        col("q_probe") === col("n_probe") && col("q_sig") === col("n_sig") &&
          col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
      .distinct()

    val qv = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val nv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.join(qv, "q_id").join(nv, "n_id")
      .withColumn("sim",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"), col("sim"))
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the coarse-quantizer scale path
  // ------------------------------------------------------------------

  /** squared L2 distance of two double-array columns (ordered fold —
    * bit-identical across engines that fold list elements in order)
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic k-means coarse quantizer: centroids init from the
    * `nlist` smallest ids, then `iters` Lloyd rounds. Per-dimension
    * means are rounded to 6dp — summation order differs between
    * engines (and between Spark partitionings), and the rounding snaps
    * both to the same value, making assignments (computed from
    * identical centroids by an ordered fold) engine-portable.
    *
    * The centroid table is DRIVER-resident (nlist × dims doubles —
    * a coarse quantizer is small by construction), so each Lloyd
    * round is one narrow scan (assignment = literal argmin expression,
    * no join, no window shuffle) plus one small aggregation, and the
    * round's result is materialized by the collect — the lineage never
    * nests round over round. For an nlist too large to inline in an
    * expression (≳10k), the same rounds run with the centroids as a
    * broadcast DataFrame and a (dist, cid) min-struct aggregation.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): Array[(Int, Array[Double])] = {
    // ONE job collects the training vectors; the Lloyd rounds are
    // plain driver arithmetic (a 16×64 quantizer needs no cluster).
    // At 100 TB the only change is a `.limit(sampleN)` here — IVF
    // quantizers train on a corpus sample by construction.
    val rows = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    var cents: Array[(Int, Array[Double])] =
      rows.filter(_._1 < nlist).map { case (id, v) => (id.toInt, v) }
    for (_ <- 1 to iters) {
      val sum = scala.collection.mutable.Map.empty[Int, Array[Double]]
      val cnt = scala.collection.mutable.Map.empty[Int, Long]
      rows.foreach { case (_, v) =>
        // nearest centroid, L2 asc with cid-asc tiebreak; the distance
        // is the same left-to-right fold the scoring expressions use
        var bestD = 0.0; var bestC = -1
        cents.foreach { case (cid, cv) =>
          var s = 0.0; var i = 0
          while (i < cv.length) { val d = v(i) - cv(i); s += d * d; i += 1 }
          if (bestC < 0 || s < bestD) { bestD = s; bestC = cid }
        }
        val acc = sum.getOrElseUpdate(bestC, new Array[Double](v.length))
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        cnt(bestC) = cnt.getOrElse(bestC, 0L) + 1
      }
      // per-dimension means rounded to 6dp: summation order differs
      // between engines, the rounding snaps them to the same value
      cents = sum.keys.toArray.sorted.map { cid =>
        val m = sum(cid).map(s =>
          BigDecimal(s / cnt(cid))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        (cid, m)
      }
    }
    cents
  }

  /** the `n` nearest centroid ids (L2 asc, cid-asc tiebreak) for a
    * double-array vector column. A closure over the driver-resident
    * centroids: each distance is the same left-to-right
    * sum-of-squared-diffs fold the SQL `aggregate` form computes
    * (identical doubles, identical ranking), but runs as compiled
    * scalar code instead of nlist interpreted higher-order folds —
    * the centroid table rides into executors with the task closure.
    */
  private def nearestCids(vec: Column, cents: Array[(Int, Array[Double])],
      n: Int): Column = {
    val f = udf { (v: Seq[Double]) =>
      val scored = cents.map { case (cid, cvec) =>
        var s = 0.0
        var i = 0
        while (i < cvec.length) {
          val d = v(i) - cvec(i); s += d * d; i += 1
        }
        (s, cid)
      }
      scored.sortBy(identity).take(n).map(_._2)
    }
    f(vec)
  }

  /** IVF approximate top-k: corpus vectors are partitioned into
    * `nlist` inverted lists by nearest centroid; a query scores only
    * the lists of its `nprobe` nearest centroids. The 100 TB shape:
    * centroids broadcast (nlist ≪ corpus), the inverted-list table is
    * the corpus hash-partitioned by cid, and the probe is an equi-join
    * on cid — candidate volume is nprobe/nlist of the corpus instead
    * of all of it, and unlike multi-probe LSH each vector lives in
    * exactly ONE list, so no candidate dedup pass is needed.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, iters)
    def vd(c: Column) = transform(c, x => x.cast("double"))
    // the inverted lists: corpus + norm, keyed by centroid — the cid
    // is a projection (literal argmin), so building the index is one
    // shuffle-free scan of the corpus
    val inv = corpus.select(
      element_at(nearestCids(vd(col(vecCol)), cents, 1), 1).as("cid"),
      col(idCol).cast("long").as("n_id"),
      col(vecCol).as("n_vec"), norm(col(vecCol)).as("n_norm"))
    // nprobe nearest lists per query, again a projection
    val probes = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"),
      explode(nearestCids(vd(col(vecCol)), cents, nprobe)).as("cid"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    broadcast(probes).join(inv, "cid")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"), col("sim"))
  }

  /** embedding-cosine near-duplicate pairs above a threshold, via LSH
    * buckets (the embedding flavor of Dedup).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      bits: Int = 12, nProbes: Int = 4, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 100000): DataFrame = {
    // one self-join of the cached (id, probe, sig) bucket index —
    // same-bucket pairs only; candidates carry id pairs only and the
    // rescoring pass pays one dot product per pair (norms joined in).
    val a0 = probeSigs(df, idCol, vecCol, bits, nProbes, dims)
      .toDF("a_id", "a_probe", "a_sig")
    // hot-bucket skew guard, shared with Dedup.minhashLshPairs
    val a = Dedup.capBuckets(a0, Seq("a_probe", "a_sig"), maxBucket)
    val b = a.toDF("b_id", "b_probe", "b_sig")
    val cand = a.join(b,
        col("a_probe") === col("b_probe") && col("a_sig") === col("b_sig") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val av = df.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"),
      norm(col(vecCol)).as("a_norm"))
    val bv = df.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"),
      norm(col(vecCol)).as("b_norm"))
    cand.join(av, "a_id").join(bv, "b_id")
      .withColumn("sim",
        round(dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("sim"))
  }
}
