package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.T
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over the documents/embeddings
  * tables — dedup, similarity search, text analysis, multimodal
  * plumbing — each wired into the DuckDB oracle gate where the
  * computation is SQL-expressible (hash-based candidate generation is
  * not; those entries are verified by exact re-scoring instead, and
  * where recall is provably total the exact-SQL oracle still applies).
  */
object PipelineQueries extends QueryPack {

  // DuckDB rendition of TextAnalysis.tokens (Pub aliases: shared with
  // the streaming gate in AnalyticsQueries)
  private val sqlToks = """regexp_split_to_array(trim(text), '\s+')"""
  private val sqlToksLower = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private[queries] def sqlToksPub = sqlToks
  private[queries] def sqlToksLowerPub = sqlToksLower
  private def sqlStopCount(words: Seq[String]) =
    s"""len(list_filter($sqlToksLower, x -> x IN (${words.map("'" + _ + "'").mkString(",")})))"""
  // DuckDB rendition of TextAnalysis.fingerprint
  private val sqlFp =
    """md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"""
  private[queries] def sqlFpPub = sqlFp
  // DuckDB rendition of TextAnalysis.round4 — tie-exact 4-decimal
  // rounding in pure IEEE double ops. Library round() half-up diverges
  // between engines exactly on .xxxx5 ties (shortest-decimal vs binary
  // rounding), so every quality/repetition ratio the gates compare is
  // rounded through this identical floor formulation on BOTH sides.
  private[queries] def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"

  def defs: Seq[QueryDef] = Seq(

    QueryDef("t01_token_count",
      (s, dir) => T(s, dir).documents
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")),
      Some(s"SELECT doc_id, len($sqlToks) AS n_tokens FROM documents")),

    QueryDef("t02_quality",
      (s, dir) => {
        val feats = TextAnalysis.qualityFeatures(col("text"))
          .map { case (n, c) => c.as(n) }
        T(s, dir).documents.select(col("doc_id") +: feats: _*)
      },
      Some(s"""SELECT doc_id,
             |  length(text) AS n_chars,
             |  len($sqlToks) AS n_tokens,
             |  ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             |        / length(text)""")} AS alpha_ratio,
             |  ${r4(s"""length(regexp_replace(text, '[^.,;:!?''"-]', '', 'g')) * 1.0
             |        / length(text)""")} AS punct_ratio,
             |  ${r4(s"""${sqlStopCount(graft.operators.Stopwords.en)} * 1.0
             |        / len($sqlToks)""")} AS stop_ratio
             |FROM documents""".stripMargin)),

    QueryDef("t03_langid",
      (s, dir) => T(s, dir).documents
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred")),
      Some {
        val scores = graft.operators.Stopwords.profiles.map { case (l, ws) =>
          s"${sqlStopCount(ws)} AS s_$l"
        }.mkString(", ")
        s"""WITH sc AS (SELECT doc_id, $scores FROM documents)
           |SELECT doc_id, CASE
           |  WHEN s_zh > greatest(s_en, s_de, s_es, s_fr) THEN 'zh'
           |  WHEN s_fr > greatest(s_en, s_de, s_es) THEN 'fr'
           |  WHEN s_es > greatest(s_en, s_de) THEN 'es'
           |  WHEN s_de > s_en THEN 'de'
           |  ELSE 'en' END AS lang_pred
           |FROM sc""".stripMargin
      }),

    QueryDef("t05_bpe_tokens",
      (s, dir) => T(s, dir).documents
        .select(col("doc_id"),
          size(TextAnalysis.bpeTokens(col("text"))).as("n_bpe")),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             |    AS n_bpe
             |FROM documents""".stripMargin)),

    QueryDef("t04_fingerprint",
      (s, dir) => T(s, dir).documents
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents""".stripMargin)),

    QueryDef("d01_dedup_exact",
      (s, dir) => Dedup.exact(T(s, dir).documents, "doc_id", "text"),
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY 1""".stripMargin)),

    // dedup with a retention policy: keep the highest-quality member
    // of each duplicate group (argmax quality, lowest-id tiebreak) —
    // canonical selection so dedup keeps the cleanest copy. One
    // partial-aggregable max_by shuffle on the Spark side; the oracle
    // states the same winner with a window.
    QueryDef("d07_dedup_best_quality",
      (s, dir) => Dedup.keepBestQuality(T(s, dir).documents, "doc_id", "text"),
      Some(s"""WITH f AS (SELECT doc_id, $sqlFp AS fp,
             |    ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             |          / length(text)""")} AS alpha_ratio,
             |    ${r4(s"""${sqlStopCount(graft.operators.Stopwords.en)} * 1.0
             |          / len($sqlToks)""")} AS stop_ratio,
             |    len($sqlToks) AS n_tokens
             |  FROM documents),
             |q AS (SELECT doc_id, fp,
             |  ${r4("""least(stop_ratio * 2.0, 1.0) * 0.4
             |    + least(alpha_ratio * 1.25, 1.0) * 0.4
             |    + CASE WHEN n_tokens BETWEEN 10 AND 100000
             |        THEN 0.2 ELSE 0.0 END""")} AS qv
             |  FROM f)
             |SELECT fp, n_dups, keep_id, quality FROM (
             |  SELECT fp, doc_id AS keep_id, qv AS quality,
             |    CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_dups,
             |    row_number() OVER (PARTITION BY fp
             |      ORDER BY qv DESC, doc_id ASC) AS rn
             |  FROM q) WHERE rn = 1""".stripMargin)),

    QueryDef("d02_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(T(s, dir).documents, "doc_id", "text",
        n = 3, threshold = 0.8, maxDf = 1000),
      Some(ngramJaccardSql(0.8, 1000))),

    // full dedup output: transitive near-dup clusters with one
    // survivor each (GraphX components; oracle = recursive CTE over
    // the same pair graph)
    QueryDef("d05_dedup_clusters",
      (s, dir) => Dedup.nearDupClusters(T(s, dir).documents, "doc_id", "text",
        n = 3, threshold = 0.8, maxDf = 1000),
      Some(s"""WITH RECURSIVE pairs AS (${ngramJaccardSql(0.8, 1000)}),
             |edges AS (
             |  SELECT id_a a, id_b b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT a, a FROM edges
             |  UNION
             |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
             |SELECT doc_id, coalesce(cluster, doc_id) AS cluster,
             |  coalesce(cluster, doc_id) = doc_id AS keep
             |FROM documents LEFT JOIN comp ON doc_id = id""".stripMargin)),

    // MinHash+LSH candidates, verified with exact Jaccard. At J>=0.8
    // with 16 bands x 4 rows the miss probability is ~2e-4 per pair
    // (pairs in this corpus sit at J~0.95+, where it is ~1e-9), so the
    // exact-Jaccard oracle applies.
    QueryDef("d03_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(T(s, dir).documents, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.8),
      Some(ngramJaccardSql(0.8, Int.MaxValue))),

    // ADVERSARIAL SKEW GATE: the same boilerplate sentence is appended
    // to EVERY document, so its shingles' document frequency (550) is
    // the whole corpus — the classic stop-shingle hot key. With
    // maxDf=400 the df-cap MUST engage (550 > 400) and drop those
    // shingles from candidate generation, or the self-join fans out
    // toward 550^2/2 pairs per hot shingle; the derived near-dup
    // copies (every 10th doc plus a tail marker) must still surface
    // through their document-specific shingles. Capped Jaccard drops
    // the boiler shingles from BOTH intersection and sizes, so the
    // oracle reproduces the exact scores.
    QueryDef("d08_jaccard_boilerplate",
      (s, dir) => {
        val boiler = " the very same boilerplate footer sentence appears " +
          "on every single page of this corpus courtesy of the template"
        val docs0 = T(s, dir).documents.select(col("doc_id"), col("text"))
        val salted = docs0
          .select(col("doc_id"), concat(col("text"), lit(boiler)).as("text"))
          .unionByName(docs0.filter(pmod(col("doc_id"), lit(10L)) === 0)
            .select((col("doc_id") + 500000L).as("doc_id"),
              concat(col("text"), lit(boiler + " trailing near dup marker"))
                .as("text")))
        Dedup.ngramJaccardPairs(salted, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 400)
      },
      Some(ngramJaccardSql(0.8, 400,
        srcSql = """SELECT doc_id, text ||
             | ' the very same boilerplate footer sentence appears on every single page of this corpus courtesy of the template'
             | AS text FROM documents
             |UNION ALL
             |SELECT doc_id + 500000, text ||
             | ' the very same boilerplate footer sentence appears on every single page of this corpus courtesy of the template trailing near dup marker'
             | FROM documents WHERE doc_id % 10 = 0""".stripMargin
          .replace("\n", " ")))),

    // exact duplicated-SPAN detection (window-level dedup): strided
    // 50-char windows over normalized text, spans appearing in >= 2
    // distinct docs. No pair join anywhere — boilerplate degrades into
    // one aggregation row, so this needs no df-cap. The oracle builds
    // the identical window set with generate_series + substring.
    QueryDef("d09_substring_spans",
      (s, dir) => Dedup.duplicatedSpans(T(s, dir).documents, "doc_id", "text",
        width = 50, stride = 25),
      Some("""WITH t AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
             |  FROM documents),
             |w AS (SELECT DISTINCT doc_id,
             |    substring(t, CAST(i AS INT), 50) AS span
             |  FROM t, LATERAL unnest(generate_series(1, length(t) - 49, 25)) AS g(i)
             |  WHERE length(t) >= 50)
             |SELECT span, count(*) AS n_docs, min(doc_id) AS first_doc
             |FROM w GROUP BY 1 HAVING count(*) >= 2""".stripMargin)),

    // incremental dedup of a new batch against history through a
    // Bloom-filter pre-prune + exact confirming anti-join (output is
    // byte-identical to the plain anti-join the oracle states; the
    // Bloom only decides which rows may skip the shuffle). The batch
    // mixes true dups (re-keyed copies of history docs — must NOT
    // surface) with genuinely new docs (marker-suffixed — must).
    QueryDef("p13_incremental_dedup",
      (s, dir) => {
        val docs = T(s, dir).documents.select(col("doc_id"), col("text"))
        val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(10L)) === 5)
            .select((col("doc_id") + 950000L).as("doc_id"),
              concat(col("text"), lit(" fresh novel tail")).as("text")))
        Dedup.incrementalNew(batch, docs, "doc_id", "text")
      },
      Some(s"""WITH batch AS (
             |  SELECT doc_id + 900000 AS doc_id, text
             |  FROM documents WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id + 950000, text || ' fresh novel tail'
             |  FROM documents WHERE doc_id % 10 = 5),
             |h AS (SELECT $sqlFp AS fp FROM documents)
             |SELECT doc_id, $sqlFp AS fp FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.fp = $sqlFp)""".stripMargin)),

    // SimHash hamming-distance pairs — md5-derived 60-bit signatures
    // are engine-portable, so the oracle rebuilds them bit-for-bit.
    QueryDef("d04_simhash",
      (s, dir) => Dedup.simhashPairs(T(s, dir).documents, "doc_id", "text",
        maxDist = 3),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
             |  FROM documents),
             |th AS (SELECT doc_id,
             |    ('0x' || substring(md5(t), 1, 15))::BIGINT AS h FROM tok),
             |bsum AS (
             |  SELECT doc_id, b,
             |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             |  FROM th, (SELECT unnest(range(60)) AS b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |    sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sg
             |  FROM bsum GROUP BY doc_id),
             |chunked AS (
             |  SELECT doc_id, sg, c, (sg >> CAST(c * 15 AS INT)) & 32767 AS ckey
             |  FROM sig, (SELECT unnest(range(4)) AS c)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS hamming
             |  FROM chunked a JOIN chunked b
             |    ON a.c = b.c AND a.ckey = b.ckey AND a.doc_id < b.doc_id)
             |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin)),

    QueryDef("s01_knn_brute",
      (s, dir) => {
        val emb = T(s, dir).embeddings
        Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 20), k = 5)
      },
      // double math spelled out — DuckDB's list_cosine_similarity
      // computes in float32 and drifts one ulp at 6dp from double
      Some("""WITH q AS (SELECT vec_id q_id,
             |    list_transform(embedding, x -> x::DOUBLE) q_vec
             |  FROM embeddings WHERE vec_id < 20),
             |c AS (SELECT vec_id n_id,
             |    list_transform(embedding, x -> x::DOUBLE) n_vec
             |  FROM embeddings),
             |scored AS (
             |  SELECT q_id, n_id,
             |    round(
             |      list_sum(list_transform(list_zip(q_vec, n_vec), s -> s[1] * s[2]))
             |      / (sqrt(list_sum(list_transform(q_vec, x -> x * x)))
             |         * sqrt(list_sum(list_transform(n_vec, x -> x * x)))), 6) sim
             |  FROM q, c WHERE n_id != q_id),
             |ranked AS (
             |  SELECT q_id, n_id, sim, row_number() OVER
             |    (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) rk
             |  FROM scored)
             |SELECT q_id, rk, n_id, sim FROM ranked WHERE rk <= 5""".stripMargin)),

    // LSH-bucketed ANN — approximate by construction, but the md5-
    // derived hyperplanes are engine-portable, so the oracle replays
    // the identical bucketing + rescoring and the output is exact.
    QueryDef("s02_ann_lsh",
      (s, dir) => {
        val emb = T(s, dir).embeddings
        // 6-bit buckets x 8 probes: sized for useful recall on random
        // 64-dim vectors where "near" neighbors sit at cosine ~0.3
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), k = 5,
          bits = 6, nProbes = 8, dims = 64)
      },
      Some(annLshSql(k = 5, bits = 6, nProbes = 8, dims = 64))),

    // IVF coarse-quantizer ANN — the inverted-list scale path next to
    // LSH: deterministic k-means (6dp-rounded means make the floating
    // point engine-portable), nprobe nearest lists per query, exact
    // rescoring. The oracle unrolls the same Lloyd rounds as CTEs.
    QueryDef("s04_ann_ivf",
      (s, dir) => {
        val emb = T(s, dir).embeddings
        // sampleN below the sf0.1 corpus size: the deterministic
        // training-sample path (smallest ids) is exercised by the gate
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), k = 5,
          nlist = 16, nprobe = 4, iters = 2, sampleN = 1024)
      },
      Some(annIvfSql(k = 5, nlist = 16, nprobe = 4, iters = 2, dims = 64,
        sampleN = 1024))),

    // Johnson-Lindenstrauss random projection 64->16 — the map-only
    // dimensionality cut upstream of ANN/clustering; md5-derived +/-1
    // planes make every component engine-portable, so the oracle
    // replays the projection bit-for-bit (flattened to one row per
    // component: the driver's comparator cannot sort array cells)
    QueryDef("s07_random_projection",
      (s, dir) => {
        val emb = T(s, dir).embeddings.filter(col("vec_id") < 200)
        Similarity.randomProject(emb, "vec_id", "embedding",
            outDims = 16, dims = 64)
          .select(col("vec_id"),
            posexplode(col("proj")).as(Seq("d", "x")))
      },
      Some(projectionSql(outDims = 16, dims = 64, seed = 42,
        idMax = 200))),

    // IVF-PQ — the memory-bounded ANN: inverted lists hold 8-int PQ
    // codes instead of 256-byte vectors, candidates score by ADC
    // (query x code reconstruction), the best refine*k re-rank on true
    // vectors. Codebooks train with the same deterministic 6dp Lloyd
    // protocol as s04, so the oracle unrolls coarse + PQ rounds + the
    // encode/ADC/refine chain and the output matches byte-for-byte.
    QueryDef("s06_ann_ivfpq",
      (s, dir) => {
        val emb = T(s, dir).embeddings
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 20), k = 5,
          nlist = 16, nprobe = 4, iters = 2, m = 8, ksub = 16,
          pqIters = 2, refine = 3, dims = 64, sampleN = 1024)
      },
      Some(annIvfPqSql(k = 5, nlist = 16, nprobe = 4, iters = 2, m = 8,
        ksub = 16, pqIters = 2, refine = 3, dims = 64, sampleN = 1024))),

    // embedding-cosine near-duplicate pairs via the same md5-derived
    // LSH bucketing — the embedding flavor of dedup, exactly replayed
    // by the oracle (bucket join + rescoring, threshold on double cos).
    // The bucket key AUTO-SIZES to the corpus (autoSigBits ladder,
    // mirrored in the SQL from its own count(*)): at sf0.01/sf0.1 it
    // resolves to the historical 6 bits byte-identically; at 10x it
    // widens so the same-bucket self-join stays linear.
    QueryDef("s03_embed_neardup",
      (s, dir) => Similarity.cosineNearDupPairs(T(s, dir).embeddings,
        threshold = 0.45, nProbes = 8, dims = 64),
      Some(embedNearDupSql(threshold = 0.45, nProbes = 8, dims = 64))),

    // scalar quality score (C4/Gopher-style heuristic blend over the
    // t02 features)
    QueryDef("t06_quality_score",
      (s, dir) => T(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality")),
      Some(s"""WITH f AS (SELECT doc_id,
             |    ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             |          / length(text)""")} AS alpha_ratio,
             |    ${r4(s"""${sqlStopCount(graft.operators.Stopwords.en)} * 1.0
             |          / len($sqlToks)""")} AS stop_ratio,
             |    len($sqlToks) AS n_tokens
             |  FROM documents)
             |SELECT doc_id,
             |  ${r4("""least(stop_ratio * 2.0, 1.0) * 0.4
             |    + least(alpha_ratio * 1.25, 1.0) * 0.4
             |    + CASE WHEN n_tokens BETWEEN 10 AND 100000
             |        THEN 0.2 ELSE 0.0 END""")} AS quality
             |FROM f""".stripMargin)),

    QueryDef("m01_multimodal_features",
      (s, dir) => {
        val media = Multimodal.mediaTable(T(s, dir).documents)
        Multimodal.extractFeatures(s, media).toDF()
          .select("doc_id", "media_type", "n_bytes", "width", "height", "n_frames")
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    ELSE 'video' END AS media_type,
             |  octet_length(encode(text)) AS n_bytes,
             |  64 + octet_length(encode(text)) % 1024 AS width,
             |  64 + (octet_length(encode(text)) * 7) % 768 AS height,
             |  CASE WHEN doc_id % 3 = 2
             |    THEN octet_length(encode(text)) // 1000 + 1 ELSE 1 END AS n_frames
             |FROM documents""".stripMargin)),

    // frame sampling over the video rows: decode (stub) → every 3rd
    // frame index, partition-preserving until the final small output
    QueryDef("m02_frame_sample",
      (s, dir) => {
        val media = Multimodal.mediaTable(T(s, dir).documents)
        Multimodal.sampleFrames(s, media, stride = 3)
      },
      Some("""WITH m AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n
             |  FROM documents WHERE doc_id % 3 = 2)
             |SELECT doc_id,
             |  unnest(generate_series(0, n // 1000, 3)) AS frame_idx,
             |  64 + n % 1024 AS width,
             |  64 + (n * 7) % 768 AS height
             |FROM m""".stripMargin)),

    // REAL frame decode through the MJPEG path: every 5th video row
    // becomes a genuine 4-frame MJPEG AVI (MediaFixtures — actual JPEG
    // pixels through ImageIO), the rest stay UTF-8 text payloads that
    // fall back to the metadata chain. The oracle states the decoded
    // output in closed form: real rows sample frames 0 and 2 of the
    // 8x6 fixture; fallback rows reproduce the stub arithmetic. The
    // raster signature column is excluded (JPEG encoder bytes may vary
    // across JDK builds; the unit spec pins it within one JVM).
    QueryDef("m03_decode_frames",
      (s, dir) => {
        import s.implicits._
        val media0 = Multimodal.mediaTable(T(s, dir).documents)
          .filter(col("media_type") === "video")
        val media = media0.as[Multimodal.MediaRow].map { m =>
          if (m.doc_id % 5 == 0)
            m.copy(media = Multimodal.MediaFixtures.mjpegAvi(4, 8, 6, m.doc_id))
          else m
        }.toDF()
        Multimodal.decodeFrameSamples(s, media, stride = 2)
          .select(col("doc_id"), col("frame_idx"), col("width"),
            col("height"), col("decoded"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n
             |  FROM documents WHERE doc_id % 3 = 2)
             |SELECT doc_id, unnest([0, 2]) AS frame_idx,
             |  8 AS width, 6 AS height, true AS decoded
             |FROM m WHERE doc_id % 5 = 0
             |UNION ALL
             |SELECT doc_id,
             |  unnest(generate_series(0, n // 1000, 2)) AS frame_idx,
             |  64 + n % 1024 AS width, 64 + (n * 7) % 768 AS height,
             |  false AS decoded
             |FROM m WHERE doc_id % 5 <> 0""".stripMargin)),

    // REAL image resize: every 5th image row becomes a genuine 40x30
    // PNG (decoded + Graphics2D-rescaled + re-encoded), the rest run
    // the stub byte-budget on stub geometry. Both paths bound geometry
    // through the same integer formula (floor(dim*maxSide/longSide),
    // min 1), so the oracle restates every output row exactly;
    // re-encoded byte size is excluded (encoder-dependent).
    QueryDef("m04_resize_images",
      (s, dir) => {
        import s.implicits._
        val media0 = Multimodal.mediaTable(T(s, dir).documents)
          .filter(col("media_type") === "image")
        val media = media0.as[Multimodal.MediaRow].map { m =>
          if (m.doc_id % 5 == 0)
            m.copy(media = Multimodal.MediaFixtures.png(40, 30, m.doc_id))
          else m
        }.toDF()
        Multimodal.resizeImages(s, media, maxSide = 10)
          .select(col("doc_id"), col("width"), col("height"), col("resized"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n
             |  FROM documents WHERE doc_id % 3 = 0),
             |s AS (
             |  SELECT doc_id, 64 + n % 1024 AS w, 64 + (n * 7) % 768 AS h
             |  FROM m WHERE doc_id % 5 <> 0)
             |SELECT doc_id, 10 AS width, 7 AS height, true AS resized
             |FROM m WHERE doc_id % 5 = 0
             |UNION ALL
             |SELECT doc_id,
             |  CAST(GREATEST(1, w * 10 // GREATEST(w, h)) AS INT) AS width,
             |  CAST(GREATEST(1, h * 10 // GREATEST(w, h)) AS INT) AS height,
             |  false AS resized
             |FROM s""".stripMargin)),

    // REAL audio feature extraction: every 5th audio row becomes a
    // genuine 64-sample 16-bit WAV whose samples follow the closed form
    // ((doc_id*7 + i) mod 201) - 100 — PCM is lossless, so the decoded
    // peak and integer sum of squares are exact and the oracle
    // recomputes them from the same formula. Non-decodable rows fall
    // back to metadata with zeroed amplitude stats.
    QueryDef("m05_pcm_features",
      (s, dir) => {
        import s.implicits._
        val media0 = Multimodal.mediaTable(T(s, dir).documents)
          .filter(col("media_type") === "audio")
        val media = media0.as[Multimodal.MediaRow].map { m =>
          if (m.doc_id % 5 == 0)
            m.copy(media = Multimodal.MediaFixtures.wavPcm(64, m.doc_id))
          else m
        }.toDF()
        Multimodal.pcmFeatures(s, media).toDF()
      },
      Some("""WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1)
             |SELECT doc_id, CAST(64 AS BIGINT) AS n_samples,
             |  CAST((SELECT max(abs((doc_id * 7 + g.i) % 201 - 100))
             |        FROM unnest(generate_series(0, 63)) g(i)) AS INT) AS peak,
             |  CAST((SELECT sum(((doc_id * 7 + g.i) % 201 - 100) *
             |                   ((doc_id * 7 + g.i) % 201 - 100))
             |        FROM unnest(generate_series(0, 63)) g(i)) AS BIGINT) AS sum_sq,
             |  true AS decoded
             |FROM a WHERE doc_id % 5 = 0
             |UNION ALL
             |SELECT doc_id, CAST(1 AS BIGINT), CAST(0 AS INT),
             |  CAST(0 AS BIGINT), false
             |FROM a WHERE doc_id % 5 <> 0""".stripMargin)),

    // train/test decontamination: corpus docs sharing any 5-gram with
    // the benchmark subset (docs with doc_id % 17 = 0 stand in for an
    // eval suite). Benchmark shingles broadcast; corpus scans once.
    QueryDef("d06_decontaminate",
      (s, dir) => graft.operators.Curation.decontaminate(
        T(s, dir).documents, "doc_id", "text",
        benchPred = col("doc_id") % 17 === 0, n = 5),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') w
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
             |  FROM toks, unnest(generate_series(1, len(w) - 4)) t(i)),
             |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0)
             |SELECT s.doc_id, count(DISTINCT s.g) AS n_hits
             |FROM sh s JOIN bench USING (g)
             |WHERE s.doc_id % 17 <> 0
             |GROUP BY 1""".stripMargin)),

    // token-repetition quality filter: 1 - distinct/total tokens
    QueryDef("t07_repetition",
      (s, dir) => T(s, dir).documents.select(col("doc_id"),
        graft.operators.Curation.repetitionRatio(col("text")).as("rep_ratio")),
      Some(s"""SELECT doc_id,
             |  ${r4("""1.0 - len(list_distinct(
             |      regexp_split_to_array(trim(lower(text)), '\s+'))) * 1.0
             |    / len(regexp_split_to_array(trim(lower(text)), '\s+'))""")}
             |    AS rep_ratio
             |FROM documents""".stripMargin)),

    // deterministic mixture rebalancing: downsample the dominant
    // language to 50 per mille, keep 200 per mille of the rest —
    // reproducible (multiplicative id hash), shuffle-free
    QueryDef("p01_sample_stratified",
      (s, dir) => graft.operators.Curation.sampleStratified(
        T(s, dir).documents, "doc_id",
        perMille = when(col("lang") === "en", 50L).otherwise(200L))
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE (doc_id * 2654435761) % 1000 <
             |  CASE WHEN lang = 'en' THEN 50 ELSE 200 END""".stripMargin)),

    // deterministic mixture resampling: thin over-represented domains
    // to target ppm shares of the original corpus (en is ~44% here and
    // thins toward 30%; the under-represented rest pass whole at the
    // 1e6 cap; es is absent from the target map and drops out)
    QueryDef("p10_mixture_resample",
      (s, dir) => graft.operators.Curation.mixtureResample(
        T(s, dir).documents, "doc_id", "lang",
        Map("en" -> 300000L, "de" -> 250000L, "fr" -> 200000L,
          "zh" -> 150000L))
        .select(col("doc_id"), col("lang"), col("rate_ppm")),
      Some("""WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
             |  FROM documents GROUP BY 1),
             |t AS (SELECT lang, nl,
             |  CAST(sum(nl) OVER () AS BIGINT) AS n FROM n),
             |r AS (SELECT lang,
             |  CAST(LEAST(1000000,
             |    (CASE lang WHEN 'en' THEN 300000 WHEN 'de' THEN 250000
             |      WHEN 'fr' THEN 200000 WHEN 'zh' THEN 150000
             |      ELSE 0 END) * n // nl) AS BIGINT) AS rate_ppm
             |  FROM t)
             |SELECT d.doc_id, d.lang, r.rate_ppm
             |FROM documents d JOIN r ON d.lang = r.lang
             |WHERE (d.doc_id * 2654435761) % 1000000 < r.rate_ppm""".stripMargin)),

    // END-TO-END curation pipeline: quality filter -> quality-retention
    // dedup -> sequence packing, composed from the gated operators —
    // the capstone proving the stages CHAIN (each stage's output is the
    // next one's input, no re-derivation); the oracle replays the same
    // three stages as one CTE chain
    QueryDef("p11_pipeline_e2e",
      (s, dir) => {
        import graft.operators.{Curation, Dedup}
        // the corpus is clean at gate scale, so the pipeline input
        // derives adversarial rows deterministically: a lowercased
        // DUPLICATE of every doc (same fingerprint, same quality —
        // the retention tiebreak must keep the original) and a
        // too-short junk row per doc (the filter must drop it)
        val docs0 = T(s, dir).documents.select(col("doc_id"), col("text"))
        val docs = docs0
          .unionByName(docs0.select((col("doc_id") + 100000L).as("doc_id"),
            lower(col("text")).as("text")))
          .unionByName(docs0.select((col("doc_id") + 200000L).as("doc_id"),
            lit("one two").as("text")))
        val kept = Curation.filterPipeline(docs, "doc_id", "text")
          .filter(col("keep")).select("doc_id")
        val docsKept = docs.join(kept, "doc_id")
        val keepers = Dedup.keepBestQuality(docsKept, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        graft.operators.TrainingSet.packSequences(
          docsKept.join(keepers, "doc_id"), "doc_id", "text", seqLen = 256)
      },
      Some(s"""WITH src AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, lower(text) FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, 'one two' FROM documents),
             |kept AS (SELECT doc_id, text FROM src
             |  WHERE NOT (len($sqlToks) < 5)
             |    AND NOT (${r4(s"""1.0 - len(list_distinct($sqlToksLower)) * 1.0
             |        / len($sqlToksLower)""")} > 0.8)
             |    AND NOT (${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             |        * 1.0 / length(text)""")} < 0.2)),
             |f AS (SELECT doc_id, text, $sqlFp AS fp,
             |    ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             |          / length(text)""")} AS alpha_ratio,
             |    ${r4(s"""${sqlStopCount(graft.operators.Stopwords.en)} * 1.0
             |          / len($sqlToks)""")} AS stop_ratio,
             |    len($sqlToks) AS n_tokens
             |  FROM kept),
             |q AS (SELECT doc_id, text, fp,
             |  ${r4("""least(stop_ratio * 2.0, 1.0) * 0.4
             |    + least(alpha_ratio * 1.25, 1.0) * 0.4
             |    + CASE WHEN n_tokens BETWEEN 10 AND 100000
             |        THEN 0.2 ELSE 0.0 END""")} AS qv
             |  FROM f),
             |dd AS (SELECT doc_id, text FROM (
             |  SELECT doc_id, text,
             |    row_number() OVER (PARTITION BY fp
             |      ORDER BY qv DESC, doc_id ASC) AS rn
             |  FROM q) WHERE rn = 1),
             |t AS (SELECT doc_id,
             |    CAST(len($sqlToks) AS BIGINT) AS n_tokens FROM dd),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum0 FROM t)
             |SELECT doc_id, n_tokens,
             |  CAST(cum0 // 256 AS BIGINT) AS seq_id,
             |  CAST(cum0 % 256 AS BIGINT) AS seq_offset
             |FROM c""".stripMargin)),

    // composite filtering decision with audit reasons (C4/Gopher-style
    // rule chain; first failing rule wins)
    QueryDef("t08_filter_pipeline",
      (s, dir) => graft.operators.Curation.filterPipeline(
        T(s, dir).documents, "doc_id", "text"),
      Some(s"""SELECT doc_id,
             |  CASE
             |    WHEN len($sqlToks) < 5 THEN 'too_short'
             |    WHEN ${r4(s"""1.0 - len(list_distinct($sqlToksLower)) * 1.0
             |        / len($sqlToksLower)""")} > 0.8 THEN 'repetition'
             |    WHEN ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             |        * 1.0 / length(text)""")} < 0.2 THEN 'non_text'
             |    ELSE NULL END AS drop_reason,
             |  CASE
             |    WHEN len($sqlToks) < 5 THEN false
             |    WHEN ${r4(s"""1.0 - len(list_distinct($sqlToksLower)) * 1.0
             |        / len($sqlToksLower)""")} > 0.8 THEN false
             |    WHEN ${r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             |        * 1.0 / length(text)""")} < 0.2 THEN false
             |    ELSE true END AS keep
             |FROM documents""".stripMargin)),

    // overlapping token-window chunking (RAG / context prep): width-32
    // windows every 24 tokens — map-only generator, zero shuffles; the
    // oracle replays the same start ladder with DuckDB range()+slicing
    QueryDef("t09_chunking",
      (s, dir) => graft.operators.TextAnalysis.chunk(
        T(s, dir).documents, "doc_id", "text", width = 32, stride = 24),
      Some(s"""WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents),
             |n AS (SELECT doc_id, toks, len(toks) AS nt FROM d),
             |g AS (SELECT doc_id, toks, nt,
             |    unnest(range(0, greatest(nt, 1), 24)) AS s FROM n)
             |SELECT doc_id,
             |  CAST(s // 24 AS INT) AS chunk_idx,
             |  array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text,
             |  CAST(least(32, nt - s) AS INT) AS n_tokens
             |FROM g""".stripMargin)),

    // statistical-LM quality score (CCNet/Wiki-filter shape): corpus
    // unigram model over the top-4096 case-folded tokens, per-doc mean
    // token log-probability, OOV at the corpus floor ln(1/total); the
    // oracle replays vocab selection, floor, and the order-independent
    // decimal mean exactly
    QueryDef("t10_unigram_logprob",
      (s, dir) => graft.operators.TextAnalysis.unigramLogProbScore(
        T(s, dir).documents, "doc_id", "text", topV = 4096),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, t AS token FROM (
             |    SELECT doc_id, unnest($sqlToksLower) AS t FROM documents)
             |  WHERE t <> ''),
             |cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cnt),
             |voc AS (SELECT token, ln(CAST(cnt AS DOUBLE) / total) AS logp
             |  FROM (SELECT token, cnt, row_number() OVER
             |      (ORDER BY cnt DESC, token ASC) AS rk FROM cnt), tot
             |  WHERE rk <= 4096),
             |lp AS (SELECT tok.doc_id, COALESCE(voc.logp, -ln(tot.total)) AS lp
             |  FROM tok LEFT JOIN voc USING (token), tot),
             |pd AS (SELECT doc_id,
             |    CAST(sum(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) / count(*)
             |      AS mean_lp
             |  FROM lp GROUP BY doc_id)
             |SELECT d.doc_id,
             |  ${r4("COALESCE(pd.mean_lp, -ln(tot.total))")} AS avg_logprob
             |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id, tot"""
        .stripMargin)),

    // per-domain mixture table: docs, tokens, corpus token share
    QueryDef("p02_domain_mixture",
      (s, dir) => graft.operators.Curation.domainMixture(
        T(s, dir).documents, "text", Seq("lang", "source")),
      Some("""WITH agg AS (
             |  SELECT lang, source, count(*) AS n_docs,
             |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             |      AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1, 2)
             |SELECT lang, source, n_docs, n_tokens,
             |  round(n_tokens * 1.0 / CAST(sum(n_tokens) OVER () AS DOUBLE), 6)
             |    AS token_share
             |FROM agg""".stripMargin)),

    // concat-then-chunk sequence-packing manifest: the oracle is the
    // single-partition global-window formulation; the engine computes
    // the identical result with the two-pass distributed prefix sum
    // (per-partition subtotals -> driver prefix over one row per
    // partition -> broadcast offsets), which is the form that scales
    QueryDef("p03_pack_sequences",
      (s, dir) => graft.operators.TrainingSet.packSequences(
        T(s, dir).documents, "doc_id", "text", seqLen = 512),
      Some(s"""WITH t AS (SELECT doc_id,
             |    CAST(len($sqlToks) AS BIGINT) AS n_tokens FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum0 FROM t)
             |SELECT doc_id, n_tokens,
             |  CAST(cum0 // 512 AS BIGINT) AS seq_id,
             |  CAST(cum0 % 512 AS BIGINT) AS seq_offset
             |FROM c""".stripMargin)),

    // ADVERSARIAL SKEW GATE: one 60k-token document (120x the corpus
    // average, spanning ~117 sequences by itself) is injected into the
    // packing input. The two-pass distributed prefix sum must stay
    // exact through the giant row — a per-partition running total that
    // overflowed Int, or a partitioner that assumed uniform row cost,
    // shows up as every post-giant offset shifting. Oracle = the same
    // global-window formulation as p03 over the salted source.
    QueryDef("p12_pack_giant",
      (s, dir) => {
        val giant = s.range(1).select(lit(900000L).as("doc_id"),
          trim(repeat(lit("tok "), 60000)).as("text"))
        val salted = T(s, dir).documents.select(col("doc_id"), col("text"))
          .unionByName(giant)
        graft.operators.TrainingSet.packSequences(
          salted, "doc_id", "text", seqLen = 512)
      },
      Some(s"""WITH src AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT 900000, trim(repeat('tok ', 60000))),
             |t AS (SELECT doc_id,
             |    CAST(len($sqlToks) AS BIGINT) AS n_tokens FROM src),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum0 FROM t)
             |SELECT doc_id, n_tokens,
             |  CAST(cum0 // 512 AS BIGINT) AS seq_id,
             |  CAST(cum0 % 512 AS BIGINT) AS seq_offset
             |FROM c""".stripMargin)),

    // deterministic seeded shuffle + shard assignment (reproducible
    // training-example order); one shuffle on the shard key — the
    // physical work of writing shard files in shuffled order
    QueryDef("p04_shard_shuffle",
      (s, dir) => graft.operators.TrainingSet.shardShuffle(
        T(s, dir).documents, "doc_id", seed = "s7", numShards = 8),
      Some("""WITH h AS (SELECT doc_id,
             |    md5(CAST(doc_id AS VARCHAR) || ':s7') AS rk FROM documents),
             |s AS (SELECT doc_id, rk,
             |    CAST(('0x' || substr(rk, 1, 8)) AS BIGINT) % 8 AS shard
             |  FROM h)
             |SELECT doc_id, rk, shard,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY rk, doc_id) AS BIGINT) AS pos
             |FROM s""".stripMargin)),

    // fixed-width token-length bucket accounting (padding-efficiency
    // table for length-bucketed batching): map-side bucket assignment,
    // one <=cap+1-group aggregation, integer math end to end
    QueryDef("p06_length_buckets",
      (s, dir) => graft.operators.TrainingSet.lengthBuckets(
        T(s, dir).documents, "doc_id", "text", width = 16, cap = 4),
      Some(s"""WITH t AS (SELECT
             |    CAST(len($sqlToks) AS BIGINT) AS nt FROM documents),
             |b AS (SELECT nt,
             |    LEAST(nt // 16, 4) AS bucket,
             |    CASE WHEN nt // 16 < 4 THEN (nt // 16 + 1) * 16 - nt
             |         ELSE 0 END AS pad FROM t)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS tok_total,
             |  CAST(sum(pad) AS BIGINT) AS pad_total
             |FROM b GROUP BY bucket""".stripMargin)),

    // per-language exact token-length percentiles (the length-cutoff
    // table a curation report reads): one aggregation shuffle
    QueryDef("p09_length_percentiles",
      (s, dir) => graft.operators.Curation.lengthPercentiles(
        T(s, dir).documents, "text", Seq("lang")),
      Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  round(quantile_cont(nt, 0.5), 4) AS p50,
             |  round(quantile_cont(nt, 0.9), 4) AS p90,
             |  round(quantile_cont(nt, 0.99), 4) AS p99
             |FROM (SELECT lang, CAST(len($sqlToks) AS BIGINT) AS nt
             |      FROM documents)
             |GROUP BY lang""".stripMargin)),

    // term/document frequency statistics (the exact-integer TF-IDF
    // input table): two aggregations + one token equi-join
    QueryDef("p08_tfidf_stats",
      (s, dir) => graft.operators.TextAnalysis.tfidfStats(
        T(s, dir).documents, "doc_id", "text"),
      Some(s"""WITH tok AS (SELECT doc_id, unnest($sqlToksLower) AS token
             |  FROM documents),
             |t AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok WHERE token <> '' GROUP BY doc_id, token),
             |d AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |  FROM tok WHERE token <> '' GROUP BY token)
             |SELECT doc_id, t.token, tf, df,
             |  (SELECT count(*) FROM documents) AS n_docs
             |FROM t JOIN d ON t.token = d.token""".stripMargin)),

    // corpus vocabulary induction: top-K tokens by frequency with a
    // deterministic dense rank — one explode + one agg shuffle, global
    // order collapses to a top-K heap (TakeOrdered), rank window over
    // the K survivors only
    QueryDef("p07_vocabulary",
      (s, dir) => graft.operators.TextAnalysis.vocabulary(
        T(s, dir).documents, "text", topK = 500),
      Some(s"""WITH tok AS (SELECT unnest($sqlToksLower) AS token
             |  FROM documents),
             |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
             |  FROM tok WHERE token <> '' GROUP BY token)
             |SELECT token, n,
             |  CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT)
             |    AS rank
             |FROM c ORDER BY n DESC, token ASC LIMIT 500""".stripMargin)),

    // symmetric int8 embedding quantization: scale = max|x|/127,
    // q = round(x/scale) — engine-portable float->double arithmetic,
    // every q byte identical under the DuckDB oracle
    // the gate projects the int8 array to a comma-joined string plus a
    // dims count: the driver's pandas checker sorts rows by every
    // column, and a raw array column is unhashable there — the string
    // form is byte-identical across Spark and DuckDB (int -> decimal
    // text in both) and keeps the comparison element-exact
    QueryDef("s05_quantize",
      (s, dir) => graft.operators.Similarity.quantizeInt8(
          T(s, dir).embeddings, "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          size(col("q")).cast("long").as("dims"),
          array_join(col("q").cast("array<string>"), ",").as("q_str")),
      Some("""WITH v AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
             |  FROM embeddings),
             |s AS (SELECT vec_id, ve,
             |    list_max(list_transform(ve, x -> abs(x))) / 127.0 AS scale
             |  FROM v),
             |qq AS (SELECT vec_id, scale,
             |  CASE WHEN scale = 0 THEN list_transform(ve, x -> 0)
             |       ELSE list_transform(ve,
             |         x -> CAST(round(x / scale) AS INT)) END AS q
             |FROM s)
             |SELECT vec_id, scale, CAST(len(q) AS BIGINT) AS dims,
             |  array_to_string(q, ',') AS q_str
             |FROM qq""".stripMargin)),

    // PII scrubbing: chained regexp_replace in the Java∩RE2 dialect —
    // map-only, zero shuffles, codegen'd
    QueryDef("p05_redact_pii",
      (s, dir) => {
        val red = graft.operators.Curation.redactPii(col("text"))
        T(s, dir).documents.select(col("doc_id"), red.as("red_text"),
          (red =!= col("text")).as("changed"))
      },
      Some(s"""SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '${graft.operators.Curation.EmailRe}', '<EMAIL>', 'g'),
             |    '${graft.operators.Curation.Ipv4Re}', '<IP>', 'g'),
             |    '${graft.operators.Curation.PhoneRe}', '<PHONE>', 'g')
             |    AS red_text,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '${graft.operators.Curation.EmailRe}', '<EMAIL>', 'g'),
             |    '${graft.operators.Curation.Ipv4Re}', '<IP>', 'g'),
             |    '${graft.operators.Curation.PhoneRe}', '<PHONE>', 'g')
             |    <> text AS changed
             |FROM documents""".stripMargin))
  )

  // --- shared SQL machinery for the md5-derived LSH oracles ---
  // the ±1 hyperplanes are rebuilt from md5("rhp_<seed>_<j>") exactly
  // as Similarity.rhpPlane derives them
  private def planeExpr(seed: Int, j: Int, dims: Int): String =
    s"""list_transform(range($dims), d -> CASE WHEN
       | ((((strpos('0123456789abcdef',
       |      substring(md5('rhp_${seed}_$j'), CAST(d // 4 AS INT) + 1, 1)) - 1)
       |    >> CAST(d % 4 AS INT)) & 1) = 1) THEN 1.0 ELSE -1.0 END)""".stripMargin
  private def projExpr(vec: String, seed: Int, j: Int, dims: Int): String =
    s"list_sum(list_transform(list_zip($vec, ${planeExpr(seed, j, dims)}), p -> p[1] * p[2]))"
  private def sigExpr(vec: String, seed: Int, bits: Int, dims: Int): String =
    (0 until bits).map(j =>
      s"(CASE WHEN ${projExpr(vec, seed, j, dims)} > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")
  private def cosExpr(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), s -> s[1] * s[2]))
       |      / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |         * sqrt(list_sum(list_transform($b, x -> x * x))))""".stripMargin

  /** DuckDB rendition of Similarity.randomProject, flattened: one
    * SELECT per output dimension (j is baked into the md5 plane
    * constant, so it cannot ride a column), unioned.
    */
  private def projectionSql(outDims: Int, dims: Int, seed: Int,
      idMax: Long): String = {
    val parts = (0 until outDims).map { j =>
      s"""SELECT vec_id, $j AS d,
         |  round(${projExpr("vec", seed, j, dims)} / sqrt(${outDims}.0), 6) AS x
         |FROM v""".stripMargin
    }
    s"""WITH v AS (SELECT vec_id,
       |    list_transform(embedding, y -> y::DOUBLE) AS vec
       |  FROM embeddings WHERE vec_id < $idMax)
       |${parts.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** DuckDB rendition of Similarity.lshTopK: identical bucketing +
    * exact cosine rescoring replayed.
    */
  private def annLshSql(k: Int, bits: Int, nProbes: Int, dims: Int): String = {
    val corpSigs = (0 until nProbes).map(p =>
      s"${sigExpr("n_vec", 42 + p, bits, dims)} AS n_sig_$p").mkString(",\n  ")
    val querySigs = (0 until nProbes).map(p =>
      s"${sigExpr("q_vec", 42 + p, bits, dims)} AS q_sig_$p").mkString(",\n  ")
    val probeCond = (0 until nProbes).map(p => s"q_sig_$p = n_sig_$p")
      .mkString("(", " OR ", ")")
    s"""WITH c AS (SELECT vec_id AS n_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS n_vec FROM embeddings),
       |q AS (SELECT vec_id AS q_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS q_vec FROM embeddings
       |  WHERE vec_id < 20),
       |cs AS (SELECT n_id, n_vec, $corpSigs FROM c),
       |qs AS (SELECT q_id, q_vec, $querySigs FROM q),
       |cand AS (SELECT DISTINCT q_id, q_vec, n_id, n_vec
       |  FROM cs JOIN qs ON $probeCond AND q_id != n_id),
       |scored AS (SELECT q_id, n_id,
       |    round(
       |      list_sum(list_transform(list_zip(q_vec, n_vec), s -> s[1] * s[2]))
       |      / (sqrt(list_sum(list_transform(q_vec, x -> x * x)))
       |         * sqrt(list_sum(list_transform(n_vec, x -> x * x)))), 6) AS sim
       |  FROM cand),
       |ranked AS (SELECT q_id, n_id, sim, row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, n_id, sim FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** DuckDB rendition of Similarity.cosineNearDupPairs: same bucket
    * join over one table, same threshold on the rescored double cosine.
    */
  private def embedNearDupSql(threshold: Double, nProbes: Int,
      dims: Int): String = {
    // full-width signatures + a count(*)-driven low-bit mask: the SQL
    // rendition of Similarity.autoSigBits — the exact same ladder
    // (smallest b in [6,24] with n <= 2^b * 128), so both engines pick
    // the same bucket width from the same corpus
    val w = graft.operators.Similarity.AutoSigWidth
    val ladder = (6 until w).map(b =>
      s"WHEN c <= ${(1L << b) * 128L} THEN ${(1L << b) - 1}").mkString(" ")
    val sigs = (p: String) => (0 until nProbes).map(i =>
      s"${sigExpr("vec", 42 + i, w, dims)} AS ${p}_sig_$i").mkString(",\n  ")
    val probeCond = (0 until nProbes).map(i =>
      s"(a_sig_$i & (SELECT msk FROM prm)) = (b_sig_$i & (SELECT msk FROM prm))")
      .mkString("(", " OR ", ")")
    s"""WITH prm AS (SELECT CASE $ladder ELSE ${(1L << w) - 1} END AS msk
       |  FROM (SELECT count(*) AS c FROM embeddings)),
       |v AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS vec FROM embeddings),
       |av AS (SELECT vec_id AS a_id, vec AS a_vec, ${sigs("a")} FROM v),
       |bv AS (SELECT vec_id AS b_id, vec AS b_vec, ${sigs("b")} FROM v),
       |cand AS (SELECT DISTINCT a_id, a_vec, b_id, b_vec
       |  FROM av JOIN bv ON $probeCond AND a_id < b_id),
       |scored AS (SELECT a_id AS id_a, b_id AS id_b,
       |    round(${cosExpr("a_vec", "b_vec")}, 6) AS sim
       |  FROM cand)
       |SELECT id_a, id_b, sim FROM scored WHERE sim >= $threshold""".stripMargin
  }

  /** DuckDB rendition of Similarity.ivfTopK: the same deterministic
    * k-means (training sample = sampleN smallest ids, init = nlist
    * smallest ids, Lloyd rounds with 6dp-rounded per-dimension means),
    * nearest-list assignment, nprobe probing and exact cosine
    * rescoring, with every distance an ordered list fold so the
    * doubles match Spark's bit-for-bit.
    */
  private def annIvfSql(k: Int, nlist: Int, nprobe: Int, iters: Int,
      dims: Int, sampleN: Int): String = {
    def l2(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2])))"
    def assignCte(name: String, cents: String, src: String = "v"): String =
      s"""$name AS (
         |  SELECT id, cid, vec FROM (
         |    SELECT v.id, v.vec, c.cid, row_number() OVER (PARTITION BY v.id
         |      ORDER BY ${l2("v.vec", "c.cvec")} ASC, c.cid ASC) AS rk
         |    FROM $src v, $cents c) WHERE rk = 1)""".stripMargin
    def centsCte(name: String, assign: String): String =
      s"""$name AS (
         |  SELECT cid, list(round(m, 6) ORDER BY d) AS cvec FROM (
         |    SELECT a.cid, ds.d, avg(a.vec[ds.d]) AS m
         |    FROM $assign a, (SELECT unnest(range(1, ${dims + 1})) AS d) ds
         |    GROUP BY a.cid, ds.d)
         |  GROUP BY cid)""".stripMargin
    // training rounds run over the SAMPLE (t); the final assignment
    // (afin) and the probes run over the full corpus (v) — exactly the
    // engine's split
    val rounds = (1 to iters).flatMap { t =>
      Seq(assignCte(s"a$t", s"c${t - 1}", src = "t"), centsCte(s"c$t", s"a$t"))
    }
    val steps = Seq(
      s"""v AS (SELECT vec_id AS id,
         |  list_transform(embedding, x -> x::DOUBLE) AS vec FROM embeddings)""".stripMargin,
      s"t AS (SELECT * FROM v ORDER BY id LIMIT $sampleN)",
      s"""c0 AS (SELECT CAST(id AS INT) AS cid, vec AS cvec
         |  FROM t WHERE id < $nlist)""".stripMargin) ++
      rounds ++ Seq(
      assignCte("afin", s"c$iters"),
      s"""inv AS (
         |  SELECT a.cid, a.id AS n_id, a.vec AS n_vec,
         |    sqrt(list_sum(list_transform(a.vec, x -> x * x))) AS n_norm
         |  FROM afin a)""".stripMargin,
      s"""probes AS (
         |  SELECT q_id, q_vec, q_norm, cid FROM (
         |    SELECT v.id AS q_id, v.vec AS q_vec,
         |      sqrt(list_sum(list_transform(v.vec, x -> x * x))) AS q_norm,
         |      c.cid, row_number() OVER (PARTITION BY v.id
         |        ORDER BY ${l2("v.vec", "c.cvec")} ASC, c.cid ASC) AS rk
         |    FROM v, c$iters c WHERE v.id < 20)
         |  WHERE rk <= $nprobe)""".stripMargin,
      s"""scored AS (
         |  SELECT p.q_id, i.n_id,
         |    round(list_sum(list_transform(list_zip(p.q_vec, i.n_vec),
         |        s -> s[1] * s[2])) / (p.q_norm * i.n_norm), 6) AS sim
         |  FROM probes p JOIN inv i USING (cid)
         |  WHERE p.q_id != i.n_id)""".stripMargin,
      s"""ranked AS (
         |  SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id ASC) AS rk
         |  FROM scored)""".stripMargin)
    "WITH " + steps.mkString(",\n") +
      s"\nSELECT q_id, rk, n_id, sim FROM ranked WHERE rk <= $k"
  }

  /** DuckDB rendition of Similarity.ivfPqTopK: the coarse-quantizer
    * chain of annIvfSql, plus PQ codebook training per subspace (the
    * same deterministic Lloyd protocol over (id, m, subvector) rows),
    * full-corpus encode, ADC scoring against the code reconstruction,
    * refine*k preselection and exact re-rank — every distance an
    * ordered list fold, every mean 6dp-rounded, so the doubles match
    * Spark's bit-for-bit.
    */
  private def annIvfPqSql(k: Int, nlist: Int, nprobe: Int, iters: Int,
      m: Int, ksub: Int, pqIters: Int, refine: Int, dims: Int,
      sampleN: Int): String = {
    val dsub = dims / m
    def l2(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2])))"
    def dotS(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), s -> s[1] * s[2]))"
    def assignCte(name: String, cents: String, src: String = "v"): String =
      s"""$name AS (
         |  SELECT id, cid, vec FROM (
         |    SELECT v.id, v.vec, c.cid, row_number() OVER (PARTITION BY v.id
         |      ORDER BY ${l2("v.vec", "c.cvec")} ASC, c.cid ASC) AS rk
         |    FROM $src v, $cents c) WHERE rk = 1)""".stripMargin
    def centsCte(name: String, assign: String): String =
      s"""$name AS (
         |  SELECT cid, list(round(mu, 6) ORDER BY d) AS cvec FROM (
         |    SELECT a.cid, ds.d, avg(a.vec[ds.d]) AS mu
         |    FROM $assign a, (SELECT unnest(range(1, ${dims + 1})) AS d) ds
         |    GROUP BY a.cid, ds.d)
         |  GROUP BY cid)""".stripMargin
    val coarse = (1 to iters).flatMap { t =>
      Seq(assignCte(s"a$t", s"c${t - 1}", src = "t"), centsCte(s"c$t", s"a$t"))
    }
    // PQ training rounds over the sample's (id, m, subvector) rows
    def pqAssign(name: String, cb: String): String =
      s"""$name AS (
         |  SELECT id, m, sv, j FROM (
         |    SELECT s.id, s.m, s.sv, c.j, row_number() OVER
         |        (PARTITION BY s.id, s.m
         |         ORDER BY ${l2("s.sv", "c.csv")} ASC, c.j ASC) AS rk
         |    FROM tsub s JOIN $cb c USING (m)) WHERE rk = 1)""".stripMargin
    def pqCents(name: String, assign: String): String =
      s"""$name AS (
         |  SELECT m, j, list(round(mu, 6) ORDER BY d) AS csv FROM (
         |    SELECT a.m, a.j, ds.d, avg(a.sv[ds.d]) AS mu
         |    FROM $assign a, (SELECT unnest(range(1, ${dsub + 1})) AS d) ds
         |    GROUP BY a.m, a.j, ds.d)
         |  GROUP BY m, j)""".stripMargin
    val pq = (1 to pqIters).flatMap { t =>
      Seq(pqAssign(s"pa$t", s"pc${t - 1}"), pqCents(s"pc$t", s"pa$t"))
    }
    def subCte(name: String, src: String): String =
      s"""$name AS (SELECT id, ms.m,
         |    vec[ms.m * $dsub + 1 : (ms.m + 1) * $dsub] AS sv
         |  FROM $src, (SELECT unnest(range(0, $m)) AS m) ms)""".stripMargin
    val steps = Seq(
      s"""v AS (SELECT vec_id AS id,
         |  list_transform(embedding, x -> x::DOUBLE) AS vec FROM embeddings)""".stripMargin,
      s"t AS (SELECT * FROM v ORDER BY id LIMIT $sampleN)",
      s"""c0 AS (SELECT CAST(id AS INT) AS cid, vec AS cvec
         |  FROM t WHERE id < $nlist)""".stripMargin) ++
      coarse ++ Seq(
      subCte("tsub", "t"),
      s"""pc0 AS (SELECT CAST(id AS INT) AS j, m, sv AS csv
         |  FROM tsub WHERE id < $ksub)""".stripMargin) ++
      pq ++ Seq(
      assignCte("afin", s"c$iters"),
      subCte("vsub", "v"),
      s"""enc AS (
         |  SELECT id, m, j FROM (
         |    SELECT s.id, s.m, c.j, row_number() OVER (PARTITION BY s.id, s.m
         |      ORDER BY ${l2("s.sv", "c.csv")} ASC, c.j ASC) AS rk
         |    FROM vsub s JOIN pc$pqIters c USING (m)) WHERE rk = 1)""".stripMargin,
      s"""recon AS (
         |  SELECT e.id, flatten(list(c.csv ORDER BY e.m)) AS rec
         |  FROM enc e JOIN pc$pqIters c ON e.m = c.m AND e.j = c.j
         |  GROUP BY e.id)""".stripMargin,
      s"""inv AS (
         |  SELECT a.cid, a.id AS n_id, r.rec,
         |    sqrt(list_sum(list_transform(a.vec, x -> x * x))) AS n_norm
         |  FROM afin a JOIN recon r ON a.id = r.id)""".stripMargin,
      s"""probes AS (
         |  SELECT q_id, q_vec, q_norm, cid FROM (
         |    SELECT v.id AS q_id, v.vec AS q_vec,
         |      sqrt(list_sum(list_transform(v.vec, x -> x * x))) AS q_norm,
         |      c.cid, row_number() OVER (PARTITION BY v.id
         |        ORDER BY ${l2("v.vec", "c.cvec")} ASC, c.cid ASC) AS rk
         |    FROM v, c$iters c WHERE v.id < 20)
         |  WHERE rk <= $nprobe)""".stripMargin,
      s"""adc AS (
         |  SELECT q_id, q_vec, q_norm, n_id, row_number() OVER
         |      (PARTITION BY q_id
         |       ORDER BY round(${dotS("q_vec", "rec")} / (q_norm * n_norm), 6)
         |         DESC, n_id ASC) AS ark
         |  FROM probes p JOIN inv i USING (cid) WHERE q_id != n_id)""".stripMargin,
      s"""rers AS (
         |  SELECT a.q_id, a.n_id,
         |    round(${dotS("a.q_vec", "x.vec")} / (a.q_norm *
         |      sqrt(list_sum(list_transform(x.vec, y -> y * y)))), 6) AS sim
         |  FROM adc a JOIN v x ON a.n_id = x.id
         |  WHERE a.ark <= ${refine * k})""".stripMargin,
      s"""ranked AS (
         |  SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, n_id ASC) AS rk
         |  FROM rers)""".stripMargin)
    "WITH " + steps.mkString(",\n") +
      s"\nSELECT q_id, rk, n_id, sim FROM ranked WHERE rk <= $k"
  }

  /** DuckDB rendition of Dedup.ngramJaccardPairs (3-gram shingles,
    * distinct per doc, df cap mirrored: sizes over df<=maxDf shingles,
    * intersections over df in [2, maxDf]).
    */
  private def ngramJaccardSql(threshold: Double, maxDf: Int,
      srcSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH src AS ($srcSql),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') w
       |  FROM src),
       |sh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |      for i in range(1, len(w) - 1)]) sh FROM toks)),
       |kept AS (SELECT sh FROM sh GROUP BY sh
       |         HAVING count(*) BETWEEN 2 AND $maxDf),
       |capped AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxDf),
       |sizes AS (SELECT doc_id, count(*) n_sh
       |          FROM sh JOIN capped USING (sh) GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) i
       |  FROM (SELECT s.* FROM sh s JOIN kept USING (sh)) a
       |  JOIN (SELECT s.* FROM sh s JOIN kept USING (sh)) b
       |    ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 3) AS jaccard
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= $threshold""".stripMargin
}
