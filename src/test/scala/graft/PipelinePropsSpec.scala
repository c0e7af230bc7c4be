package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Analytics
import graft.operators.{Curation, Dedup, TextAnalysis, TrainingSet}

/** Property sweeps over the integer-arithmetic curation operators —
  * the parameter space (targetPpm maps incl. 0 / >1e6 / missing
  * domains; quality ties; duplicate-free vs duplicate-heavy corpora)
  * that a single-point oracle gate can't enumerate — plus the
  * adversarial-skew unit checks proving the hot-key caps ENGAGE (the
  * d08/a05/p12 gates show capped output matches the oracle; these show
  * the uncapped formulation would have blown up).
  */
class PipelinePropsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), p)
    // surface the real stack: PropException's toString drops it, which
    // turns any wrapped failure into an undiagnosable one-liner
    res.status match {
      case SCTest.PropException(_, e, _) => e.printStackTrace()
      case _ => ()
    }
    assert(res.passed, res.status.toString)
  }

  private val domains = Seq("en", "de", "fr", "code")

  test("mixtureResample: survivors = hash-accepted rows of mapped domains, exact integer rates") {
    // ids < 2^31 keep id * 2654435761 inside Long under ANSI arithmetic
    // (the operator's documented contract; larger ids go through
    // xxhash64 per the sampleStratified scaladoc)
    val genDocs = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, (1L << 31) - 1), Gen.oneOf(domains)))
    val genPpm = Gen.mapOf(Gen.zip(Gen.oneOf(domains),
      Gen.oneOf(0L, 1L, 17L, 313L, 999999L, 1000000L, 5000000L)))
    checkProp(Prop.forAll(genDocs, genPpm) { (rows0, ppm) =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "lang")
      val out = Curation.mixtureResample(df, "doc_id", "lang", ppm)
        .select("doc_id", "lang", "rate_ppm")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // local oracle in BigInt arithmetic: rate = min(1e6, ppm*n/nl)
      // exactly — any Long overflow or double rounding inside the
      // operator diverges here
      val byDom = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = rows.size.toLong
      val expected = rows.flatMap { case (id, dom) =>
        val p = ppm.getOrElse(dom, 0L)
        val rate = (BigInt(p) * n / byDom(dom)).min(BigInt(1000000L)).toLong
        if (java.lang.Math.floorMod(id * 2654435761L, 1000000L) < rate)
          Some((id, dom, rate))
        else None
      }
      out.toSet == expected.toSet
    })
  }

  test("keepBestQuality: argmax (quality, -id), ties resolve to the lowest id") {
    // a tiny word alphabet makes fingerprint collisions and exact
    // quality TIES common — the regime where a sloppy tiebreak
    // (double-cast ids, partition order) would diverge
    val words = Seq("alpha", "beta", "the", "and", "of", "code", "#!?.", "12345")
    val genText = Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.mkString(" "))
    val genDocs = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 1000000L), genText))
    checkProp(Prop.forAll(genDocs) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val out = Dedup.keepBestQuality(df, "doc_id", "text")
        .collect()
        .map(r => (r.getAs[String]("fp"),
          (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"),
            r.getAs[Double]("quality")))).toMap
      // recompute fp/quality with the same column functions; argmax
      // locally with the documented order
      val scored = df.select(
          TextAnalysis.fingerprint(col("text")).as("fp"),
          col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val exp = scored.groupBy(_._1).map { case (fp, g) =>
        val best = g.minBy(x => (-x._3, x._2))
        (fp, (best._2, g.size.toLong, g.map(_._3).max))
      }
      out == exp
    })
  }

  test("autoSigBits: ladder keeps expected bucket occupancy <= target across 6 decades") {
    import graft.operators.Similarity
    // boundary exactness: the SQL oracle mirrors these thresholds
    assert(Similarity.autoSigBits(0) == 6)
    assert(Similarity.autoSigBits((1L << 6) * 128) == 6)      // 8192 -> 6
    assert(Similarity.autoSigBits((1L << 6) * 128 + 1) == 7)  // 8193 -> 7
    assert(Similarity.autoSigBits(60000) == 9)
    assert(Similarity.autoSigBits(1L << 40) == 24)            // capped
    // the invariant the ladder encodes: occupancy n/2^b <= target
    // whenever the cap hasn't engaged
    for (n <- Seq(1L, 100L, 8192L, 10000L, 1000000L, 100000000L)) {
      val b = Similarity.autoSigBits(n)
      if (b < 24) assert(n <= (1L << b) * 128L, s"n=$n b=$b")
    }
  }

  test("cosineNearDupPairs auto-bits == explicit bits on a small corpus (low-bit prefix identity)") {
    import graft.operators.Similarity
    // 40 vectors -> ladder resolves to 6 bits; the auto path computes
    // 24-bit signatures and masks — output must be IDENTICAL to the
    // historical explicit-6-bit formulation (bit j depends only on
    // (seed, j), so the mask is a true prefix)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = Similarity.cosineNearDupPairs(vecs, threshold = 0.2,
      nProbes = 3, dims = 8)
    val explicit = Similarity.cosineNearDupPairs(vecs, threshold = 0.2,
      bits = 6, nProbes = 3, dims = 8)
    assert(rows(auto) == rows(explicit))
    assert(rows(auto).nonEmpty) // a vacuous identity proves nothing
  }

  test("jaccard df-cap engages: a corpus-wide boilerplate shingle yields zero spurious pairs") {
    // 30 boiler tokens after 2 unique ones: uncapped, every pair
    // shares the 28 in-boiler shingles -> J = 28/32 = 0.875 >= 0.8 ->
    // all C(60,2) pairs are "near-dups" of the template, not of each
    // other. The df-cap (boiler df = 60 > 30) drops those shingles and
    // with them every candidate.
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = (0 until 60)
      .map(i => (i.toLong, s"unique$i second$i " + boiler))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Int.MaxValue)
    assert(uncapped.count() == 60L * 59 / 2)
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = 30)
    assert(capped.count() == 0L)
  }

  test("co-occurrence per-key cap drops the hot key whole, keeps normal keys") {
    val normal = (0 until 10).flatMap(o =>
      Seq((100L + o, 1000L + o * 2), (100L + o, 1000L + o * 2 + 1)))
    val hub = (0 until 300).map(m => (7L, m.toLong))
    val links = (normal ++ hub).toDF("k", "m")
    val edges = Analytics.cooccurrenceEdges(links, "k", "m", maxPerKey = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges ==
      (0 until 10).map(o => (1000L + o * 2, 1000L + o * 2 + 1)).toSet)
    // without the cap the hub ALONE is C(300,2) = 44850 pairs — the
    // blowup the cap exists to stop
    val uncapped = Analytics.cooccurrenceEdges(links, "k", "m",
      maxPerKey = Int.MaxValue)
    assert(uncapped.count() == 44850L + 10L)
  }

  test("duplicatedSpans: matches a brute-force window model on messy whitespace/case") {
    // texts drawn from a tiny vocab with erratic whitespace and case
    // so (a) cross-doc window collisions are common and (b) the
    // operator's normalization (trim/lower/collapse-\s+) is actually
    // exercised, not bypassed
    val words = Seq("alpha", "BETA", "the", "And", "of", "code")
    val genSep = Gen.oneOf(" ", "  ", "\t", " \n ")
    val genText: Gen[String] = Gen.frequency(
      9 -> Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(words), genSep))
        .map(_.map { case (w, s) => w + s }.mkString),
      1 -> Gen.const(null: String))
    val genDocs = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 100000L), genText))
    val genW = Gen.chooseNum(4, 14)
    checkProp(Prop.forAll(genDocs, genW, Gen.chooseNum(1, 8)) { (rows0, w, st) =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val out = Dedup.duplicatedSpans(df, "doc_id", "text",
          width = w, stride = st, minDocs = 2)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .toMap
      // local model: identical normalization, every strided window,
      // distinct docs per span, count >= 2, min doc id
      val exp = rows.flatMap { case (id, text) =>
          // same order as the operator and the DuckDB oracle: collapse
          // \s+ FIRST, then strip edge spaces (SQL trim strips spaces
          // only, so trimming first would diverge on tab/newline edges)
          val t =
            if (text == null) ""
            else text.toLowerCase.replaceAll("\\s+", " ")
              .stripPrefix(" ").stripSuffix(" ")
          if (t.length < w) Nil
          else Range.inclusive(0, t.length - w, st)
            .map(i => (t.substring(i, i + w), id)).distinct
        }
        .groupBy(_._1).view
        .mapValues(g => (g.size.toLong, g.map(_._2).min))
        .filter(_._2._1 >= 2).toMap
      out == exp
    }, n = 12)
  }

  test("incrementalNew: identical to the plain fingerprint anti-join at every fpp") {
    // the bloom filter must only ROUTE rows (skip-shuffle vs confirm),
    // never change the answer — including a deliberately undersized
    // filter where nearly everything false-positives into the join
    val words = Seq("seen", "new", "doc", "alpha", "beta")
    // null texts included: fp(null) = null, and a null key never
    // matches in the anti-join — the bloom split must KEEP those rows,
    // not drop them through a null probe
    val genText: Gen[String] = Gen.frequency(
      9 -> Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.mkString(" ")),
      1 -> Gen.const(null: String))
    val genRows = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 100000L), genText))
    checkProp(Prop.forAll(genRows, genRows,
        Gen.oneOf(-1L, 1L), Gen.oneOf(0.01, 0.5)) { (h0, b0, items, fpp) =>
      val hist = h0.distinctBy(_._1).toDF("doc_id", "text")
      val batch = b0.distinctBy(_._1).toDF("doc_id", "text")
      val out = Dedup.incrementalNew(batch, hist, "doc_id", "text",
          expectedItems = items, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val plain = batch
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .join(hist.select(TextAnalysis.fingerprint(col("text")).as("fp")),
          Seq("fp"), "left_anti")
        .select("doc_id", "fp")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      out == plain
    }, n = 10)
  }

  test("sequence packing stays exact through a giant document") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, ("tok " * 10000).trim),
      (3L, "x y z")).toDF("doc_id", "text")
    val out = TrainingSet.packSequences(docs, "doc_id", "text", seqLen = 512)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"),
          r.getAs[Long]("seq_offset")))).toMap
    assert(out(1L) == ((5L, 0L, 0L)))
    assert(out(2L) == ((10000L, 0L, 5L)))
    val cum = 5L + 10000L
    assert(out(3L) == ((3L, cum / 512, cum % 512)))
  }
}
