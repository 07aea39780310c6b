package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/**
 * Driver-facing correctness queries for the dedup operator family
 * (SURVEY.md §2.5). The Spark side runs the graft.operators.Dedup API; the
 * oracle replays the SAME deterministic md5-based pipeline in DuckDB SQL,
 * so even MinHash/SimHash LSH candidate generation hash-matches exactly.
 * Outputs are integer-only (ids, intersection/union sizes, hamming) —
 * no floats to drift.
 */
object DedupQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // DuckDB CTE fragments shared by the minhash oracles. `hs` carries one
  // md5-derived base hash per shingle; permutations are the same universal
  // hash (a_p*h + b_p) % p the Spark operator uses, coefficient literals
  // generated from Dedup.minhashCoeffs.
  private def duckShinglesFrom(rel: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $rel),
      |sh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(len(t) - 2),
      |           i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))
      |    ELSE [array_to_string(t, ' ')] END) AS shingles FROM toks),
      |hsh AS (SELECT doc_id, shingles,
      |  list_transform(shingles,
      |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs
      |  FROM sh)""".stripMargin

  private val duckShingles = duckShinglesFrom("documents")

  private def minhashPairsOracleFrom(rel: String): String =
    s"""${duckShinglesFrom(rel)},
       |sig AS (SELECT doc_id, shingles,
       |  list_transform(range(32), p -> list_min(list_transform(hs,
       |    h -> (($duckA)[p + 1] * h + ($duckB)[p + 1]) % 2147483647)))
       |    AS sg FROM hsh),
       |bands AS (SELECT doc_id, b,
       |  md5(array_to_string(list_transform(
       |    list_slice(sg, b*4 + 1, b*4 + 4), x -> x::VARCHAR), ',')) AS bh
       |  FROM sig, unnest(range(8)) AS br(b)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
       |SELECT c.id_a, c.id_b,
       |  CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
       |  CAST(len(a.shingles) + len(b.shingles)
       |       - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS uni
       |FROM cand c JOIN sh a ON c.id_a = a.doc_id
       |            JOIN sh b ON c.id_b = b.doc_id
       |WHERE len(list_intersect(a.shingles, b.shingles)) >=
       |      (len(a.shingles) + len(b.shingles)
       |       - len(list_intersect(a.shingles, b.shingles))) * 0.5""".stripMargin

  private lazy val minhashPairsOracle: String =
    minhashPairsOracleFrom("documents")

  /** Tagged CTE chain: (doc_id, b, bh) LSH band keys of `rel` — the same
    * shingle/signature/band arithmetic as [[duckShinglesFrom]] +
    * minhashPairsOracleFrom, instantiable twice in one query (incoming
    * batch vs historical index). */
  private def duckBandsCtes(rel: String, tag: String): String =
    s"""toks$tag AS (SELECT doc_id, string_split(text, ' ') AS t FROM $rel),
       |sh$tag AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(len(t) - 2),
       |           i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))
       |    ELSE [array_to_string(t, ' ')] END) AS shingles FROM toks$tag),
       |hsh$tag AS (SELECT doc_id,
       |  list_transform(shingles,
       |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs
       |  FROM sh$tag),
       |sig$tag AS (SELECT doc_id,
       |  list_transform(range(32), p -> list_min(list_transform(hs,
       |    h -> (($duckA)[p + 1] * h + ($duckB)[p + 1]) % 2147483647)))
       |    AS sg FROM hsh$tag),
       |bands$tag AS (SELECT doc_id, b,
       |  md5(array_to_string(list_transform(
       |    list_slice(sg, b*4 + 1, b*4 + 4), x -> x::VARCHAR), ',')) AS bh
       |  FROM sig$tag, unnest(range(8)) AS br(b))""".stripMargin

  /** Exact-dedup survivors (min id per content hash). */
  private val duckExactKeep =
    "SELECT MIN(doc_id) FROM documents GROUP BY md5(text)"

  /** Paragraph-boilerplate survivors among the exact-dedup survivors:
    * mirrors Pipeline.cleanCorpus stage 2 (window 15, frac <= 0.6). */
  // `trim(text) <> ''` mirrors Dedup.paragraphizeByWindow's blank-text
  // branch (zero paragraphs); DuckDB string_split('', ' ') would otherwise
  // fabricate one empty paragraph and keep the doc.
  private val duckParaFilter: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents WHERE doc_id IN ($duckExactKeep)
       |             AND trim(text) <> ''),
       |p AS (SELECT doc_id, array_to_string(
       |        toks[u.i*15+1 : u.i*15+15], ' ') AS para
       |      FROM w CROSS JOIN
       |        unnest(range(0, (SELECT (MAX(len(toks))+14)//15 FROM w))) u(i)
       |      WHERE u.i*15 < len(toks)),
       |pst AS (SELECT para, count(DISTINCT doc_id) AS df FROM p GROUP BY para),
       |pagg AS (SELECT p.doc_id, COUNT(*) AS np,
       |           SUM(CASE WHEN s.df > 1 THEN 1 ELSE 0 END) AS nd
       |         FROM p JOIN pst s ON p.para = s.para GROUP BY p.doc_id)
       |SELECT doc_id FROM pagg WHERE nd <= np * 0.6""".stripMargin

  /** The corpus Pipeline.cleanCorpus stage 3 sees: exact survivors that
    * passed the paragraph-boilerplate filter. */
  private val duckStage2Rel: String =
    s"""(SELECT * FROM documents
       | WHERE doc_id IN ($duckExactKeep)
       |   AND doc_id IN ($duckParaFilter)) s2src""".stripMargin

  /** DuckDB losers set for min-label connected components, exact for ANY
    * pair graph (recursive transitive closure): an id is dropped iff some
    * reachable node has a smaller id. Replaces the earlier
    * NOT IN (id_b) shortcut, which was only valid when every non-min
    * member of a component appears on the id_b side of some pair. */
  private def duckComponentLosers(pairsSql: String): String =
    s"""WITH RECURSIVE pr AS ($pairsSql),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pr
       |          UNION SELECT id_b, id_a FROM pr),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a FROM reach GROUP BY a HAVING MIN(b) < a""".stripMargin

  private lazy val mhCoeffs = graft.operators.Dedup.minhashCoeffs(32)
  private lazy val duckA =
    mhCoeffs.map(_._1).mkString("[", ", ", "]::BIGINT[]")
  private lazy val duckB =
    mhCoeffs.map(_._2).mkString("[", ", ", "]::BIGINT[]")

  private val duckSimhashSums: String = {
    val sums = (0 until 48).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
    val assemble = (0 until 48).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok),
       |s AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
       |sim AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM s)""".stripMargin
  }

  /** Parameterized DuckDB replay of Dedup.simhash + simhashWideBands over
    * relation `rel` (doc_id, text): sim{tag} signatures and wband{tag}
    * wide 4 x 12-bit (band, nib) rows carrying the signature. */
  private def duckSimhashWideBands(rel: String, tag: String): String = {
    val sums = (0 until 48).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
    val assemble = (0 until 48).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""tok$tag AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM $rel),
       |hh$tag AS (SELECT doc_id,
       |  ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok$tag),
       |ss$tag AS (SELECT doc_id, $sums FROM hh$tag GROUP BY doc_id),
       |sim$tag AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
       |  FROM ss$tag),
       |wband$tag AS (SELECT doc_id, b AS band,
       |    (simhash >> (b*12)) & 4095 AS nib, simhash
       |  FROM sim$tag, unnest(range(4)) AS br(b))""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_stats" -> { (s, dir) =>
      Dedup.exactKeepFirst(docs(s, dir), "doc_id", "text")
        .agg(count(lit(1)).as("n_unique"), sum(col("copies")).as("n_docs"),
          max(col("copies")).as("max_copies"))
    },
    "dedup_exact_keep_first" -> { (s, dir) =>
      Dedup.exactKeepFirst(docs(s, dir), "doc_id", "text")
        .select("keep_id", "copies")
    },
    "dedup_minhash_sigs" -> { (s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), posexplode(col("sig")))
        .select(col("doc_id"), col("pos").cast("long").as("perm"),
          col("col").as("minhash"))
    },
    "dedup_minhash_pairs" -> { (s, dir) =>
      Dedup.minhashNearDuplicates(docs(s, dir), "doc_id", "text", threshold = 0.5)
    },
    "dedup_simhash_sigs" -> { (s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text")
    },
    "dedup_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashNearDuplicates(docs(s, dir), "doc_id", "text")
    },
    "dedup_ngram_pairs" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text")
    },
    // Pairs -> connected components -> corpus minus non-representatives.
    // The planted sf pairs are disjoint, so the oracle is the corpus minus
    // each pair's larger id (replaying the minhash pair CTE).
    "dedup_resolve_keep" -> { (s, dir) =>
      val d = docs(s, dir)
      Dedup.keepRepresentatives(d, "doc_id",
        Dedup.minhashNearDuplicates(d, "doc_id", "text", 0.5)
          .select("id_a", "id_b"))
        .select("doc_id")
    },
    // Cluster resolution keeping the HIGHEST-QUALITY member per near-dup
    // cluster (ties -> lower id) — the production rule: of five crawls of
    // the same page, keep the cleanest capture, not the first id.
    "dedup_resolve_best" -> { (s, dir) =>
      val d = docs(s, dir)
      Dedup.keepBestRepresentatives(d, "doc_id",
        Dedup.minhashNearDuplicates(d, "doc_id", "text", 0.5)
          .select("id_a", "id_b"),
        graft.operators.TextAnalysis.qualityScore(col("text")))
        .select("doc_id")
    },
    // INTENDED-quadratic all-pairs baseline witness (the scale path is
    // sim_lsh_neardup, which this exists to validate recall against). A
    // baseline witness doesn't need the full table: the deterministic
    // 1-in-2 id slice keeps the O(n^2) compare 4x cheaper at every sf
    // while exercising the identical operator (same precedent as the
    // graph_bfs_hops dialect witness, r8 verdict).
    "dedup_embedding_pairs" -> { (s, dir) =>
      Dedup.embeddingNearDuplicates(
        Tables.load(s, dir, "embeddings").where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", 0.45)
    },
    // Leak-proof split: near-dup CLUSTERS (not documents) are the unit of
    // train/val assignment, so no near-identical pair straddles the
    // boundary — the eval-contamination guard a per-doc hash split
    // silently violates. Gated on per-split counts, distinct clusters,
    // and the id checksum.
    "sample_split_leakproof" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.operators.Sampling.leakproofSplit(d, "doc_id",
          Dedup.minhashNearDuplicates(d, "doc_id", "text", 0.5)
            .select("id_a", "id_b"),
          Seq("train" -> 0.9, "val" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("doc_id")).as("id_sum"))
    },
    // Incremental (daily-ingestion) exact dedup: history = hashes of docs
    // 0..249; the incoming batch mixes genuinely-new docs (250+),
    // re-crawls of old content (ids+10000, dropped via the index), and
    // in-batch duplicates (ids+20000, dropped by keep-first).
    "dedup_incremental" -> { (s, dir) =>
      val d = docs(s, dir)
      val seen = d.where(col("doc_id") < 250)
        .select(md5(col("text")).as("content_hash"))
      val incoming = d.where(col("doc_id") >= 250)
        .unionAll(d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 10000))
        .unionAll(d.where(col("doc_id") >= 300 && col("doc_id") < 320)
          .withColumn("doc_id", col("doc_id") + 20000))
      Dedup.incrementalExactKeepFirst(incoming, "doc_id", "text", seen)
        .select("doc_id")
    },
    // Incremental NEAR-dedup vs a historical MinHash band index: history
    // = docs 0..249 (present only as band keys); the incoming batch
    // mixes genuinely-new docs (250+, though any planted near-dup of an
    // old doc is caught by the index), near-re-crawls of old content
    // (ids+10000 with one appended word — caught by the index, not by
    // exact hashing), and in-batch near-dups (ids+20000 with a different
    // appended word — dropped by band-key keep-first).
    "dedup_incremental_minhash" -> { (s, dir) =>
      val d = docs(s, dir)
      val history = d.where(col("doc_id") < 250)
      val incoming = d.where(col("doc_id") >= 250)
        .unionAll(d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 10000)
          .withColumn("text", concat(col("text"), lit(" update"))))
        .unionAll(d.where(col("doc_id") >= 300 && col("doc_id") < 320)
          .withColumn("doc_id", col("doc_id") + 20000)
          .withColumn("text", concat(col("text"), lit(" extra"))))
      val index = Dedup.minhashBandIndex(history, "doc_id", "text")
      Dedup.incrementalMinhashKeepFirst(incoming, "doc_id", "text", index)
        .select("doc_id")
    },
    // SimHash sibling of the incremental gate: same day-over-day fixture,
    // but near-dup evidence is a shared wide 12-bit band CONFIRMED by
    // Hamming <= 3 against the indexed signature (SimHash bands collide
    // randomly at 2^-12 — verification is part of the contract).
    "dedup_incremental_simhash" -> { (s, dir) =>
      val d = docs(s, dir)
      val history = d.where(col("doc_id") < 250)
      val incoming = d.where(col("doc_id") >= 250)
        .unionAll(d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 10000)
          .withColumn("text", concat(col("text"), lit(" update"))))
        .unionAll(d.where(col("doc_id") >= 300 && col("doc_id") < 320)
          .withColumn("doc_id", col("doc_id") + 20000)
          .withColumn("text", concat(col("text"), lit(" extra"))))
      val index = Dedup.simhashBandIndex(history, "doc_id", "text")
      Dedup.incrementalSimhashKeepFirst(incoming, "doc_id", "text", index)
        .select("doc_id")
    },
    // STREAMING incremental near-dedup: two daily document files arrive
    // as micro-batches; day 0 is screened against the day-(-1) history
    // index, day 1 against history PLUS day-0 survivors (the index grows
    // per batch — the +20000 re-crawls of day-0 docs are only caught if
    // it does). Output = union of per-batch survivors.
    "stream_dedup_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      val day0 = d.where(col("doc_id") >= 100 && col("doc_id") < 200)
        .unionAll(d.where(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"), lit(" update")).as("text")))
      val day1 = d.where(col("doc_id") >= 200 && col("doc_id") < 300)
        .unionAll(d.where(col("doc_id") >= 100 && col("doc_id") < 150)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" update")).as("text")))
      val logDir = Staging.batchLog("sdedup", dir, "day", Seq(day0, day1))
      graft.streaming.DedupStream.incrementalMinhash(s, history, logDir,
          day0.schema,
          s"${Staging.freshStateRoot("graft_sdedup")}/state",
          "doc_id", "text")
        .select("doc_id")
    },
    // STREAMING DEDUP UNDER DELETES (takedowns): day 0 deletes history
    // doc 7 (D applies before the batch's inserts probe the index), so
    // day 1's re-crawl of doc 7's text is NOT suppressed as a dup —
    // "removed" must not survive as an invisible dedup witness — while
    // day 1's re-crawl of the still-live doc 20 IS suppressed; day 1
    // also deletes day-0-landed doc 150, which drops out of the returned
    // surviving corpus. The oracle unrolls both batches with D-before-I
    // tombstone semantics on the band index.
    "stream_dedup_delete" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.where(col("doc_id") < 100)
      def ins(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("op", lit("I"))
      def del(ids: Seq[Long]) = ids.toDF("doc_id")
        .withColumn("text", lit(null).cast("string"))
        .withColumn("op", lit("D"))
      val day0 = ins(d.where(col("doc_id") >= 100 && col("doc_id") < 200))
        .unionByName(del(Seq(7L)))
      val day1 = ins(d.where(col("doc_id") >= 200 && col("doc_id") < 260)
          .unionAll(d.where(col("doc_id") === 7)
            .select((col("doc_id") + 30000).as("doc_id"),
              concat(col("text"), lit(" update")).as("text")))
          .unionAll(d.where(col("doc_id") === 20)
            .select((col("doc_id") + 20000).as("doc_id"),
              concat(col("text"), lit(" update")).as("text"))))
        .unionByName(del(Seq(150L)))
      val logDir = Staging.batchLog("sdedupdel", dir, "day",
        Seq(day0, day1))
      graft.streaming.DedupStream.incrementalMinhashWithDeletes(s, history,
          logDir, day0.schema,
          s"${Staging.freshStateRoot("graft_sdedupdel")}/state",
          "doc_id", "text", "op")
        .select("doc_id")
    },
    // Exact-substring duplicated spans (Lee et al. 2022): overlapping
    // 8-token windows catch copied passages at ANY offset (aligned-block
    // paragraph dedup misses off-by-one copies); per-doc duplicated-token
    // coverage via exact interval union.
    "text_dup_spans" -> { (s, dir) =>
      Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text", 8)
    },
    // The REMOVAL the detector exists for: every token covered by a
    // cross-doc duplicated 8-token window is cut; the oracle rebuilds
    // each cleaned text token by token.
    "text_dup_remove" -> { (s, dir) =>
      Dedup.removeDuplicatedSpans(docs(s, dir), "doc_id", "text", 8)
    },
    // Paragraph-level dedup: 15-word-window paragraphs, cross-doc exact
    // dup detection, first-occurrence-wins cleaning. The fixture's planted
    // near-dup documents share long aligned stretches, so their windows
    // collide across docs and the boilerplate fraction is non-trivial.
    "dedup_paragraph" -> { (s, dir) =>
      Dedup.paragraphDedup(docs(s, dir), "doc_id", "text",
          Dedup.paragraphizeByWindow(col("text"), 15))
        .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
          (col("n_dup_paras").cast("double") / col("n_paras"))
            .as("boilerplate_frac"),
          col("clean_text"))
    },
    // End-to-end cleaning pipeline: exact dedup -> paragraph-boilerplate
    // filter (frac <= 0.6) -> minhash near-dup -> quality >= 0.7 ->
    // langid != 'und'. Oracle replays every stage, including the minhash
    // pass running only over the boilerplate-filtered survivors.
    "pipeline_clean_corpus" -> { (s, dir) =>
      graft.operators.Pipeline.cleanCorpus(docs(s, dir), "doc_id", "text")
        .select("doc_id")
    },
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact_stats" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_unique,
        |       CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |       CAST(MAX(cnt) AS BIGINT) AS max_copies
        |FROM (SELECT md5(text) AS h, COUNT(*) AS cnt
        |      FROM documents GROUP BY md5(text)) t""".stripMargin,
    "dedup_exact_keep_first" ->
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_minhash_sigs" ->
      s"""$duckShingles
         |SELECT doc_id, CAST(p AS BIGINT) AS perm,
         |  list_min(list_transform(hs,
         |    h -> (($duckA)[p + 1] * h + ($duckB)[p + 1]) % 2147483647))
         |    AS minhash
         |FROM hsh, unnest(range(32)) AS pr(p)""".stripMargin,
    "dedup_minhash_pairs" -> minhashPairsOracle,
    "dedup_simhash_sigs" ->
      s"""$duckSimhashSums
         |SELECT doc_id, simhash FROM sim""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""$duckSimhashSums,
         |banded AS (SELECT doc_id, simhash, b, (simhash >> (b*4)) & 15 AS nib
         |  FROM sim, unnest(range(12)) AS br(b))
         |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM banded x JOIN banded y
         |  ON x.b = y.b AND x.nib = y.nib AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin,
    "dedup_ngram_pairs" ->
      """WITH grams AS (SELECT doc_id,
        |  list_distinct(CASE WHEN length(text) >= 5
        |    THEN list_transform(range(length(text) - 4), i -> substr(text, i + 1, 5))
        |    ELSE [text] END) AS g FROM documents),
        |ex AS (SELECT doc_id, unnest(g) AS gr FROM grams),
        |kept AS (SELECT gr, list(doc_id) AS ids FROM ex
        |         GROUP BY gr HAVING count(*) <=
        |           (SELECT greatest(50, CAST(ceil(0.001 * count(*)) AS BIGINT))
        |            FROM documents)),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        |          FROM (SELECT unnest(ids) AS doc_id FROM kept) GROUP BY doc_id),
        |e1 AS (SELECT unnest(ids) AS id_a, ids FROM kept),
        |e2 AS (SELECT id_a, unnest(ids) AS id_b FROM e1),
        |pairs AS (SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS inter
        |  FROM e2 WHERE id_a < id_b GROUP BY id_a, id_b)
        |SELECT p.id_a, p.id_b, p.inter,
        |  sa.n_grams + sb.n_grams - p.inter AS uni
        |FROM pairs p JOIN sizes sa ON p.id_a = sa.doc_id
        |             JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE p.inter >= (sa.n_grams + sb.n_grams - p.inter) * 0.5""".stripMargin,
    "dedup_incremental" ->
      """WITH seen AS (SELECT md5(text) AS h FROM documents WHERE doc_id < 250),
        |incoming AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 20000, text FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 320),
        |unseen AS (SELECT doc_id, md5(text) AS h FROM incoming
        |           WHERE md5(text) NOT IN (SELECT h FROM seen))
        |SELECT doc_id FROM unseen
        |WHERE doc_id IN (SELECT MIN(doc_id) FROM unseen GROUP BY h)""".stripMargin,
    "dedup_incremental_minhash" ->
      s"""WITH inc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' update' FROM documents
         |  WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' extra' FROM documents
         |  WHERE doc_id >= 300 AND doc_id < 320),
         |hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |${duckBandsCtes("inc", "i")},
         |${duckBandsCtes("hist", "h")},
         |hit AS (SELECT DISTINCT i.doc_id FROM bandsi i
         |  WHERE EXISTS (SELECT 1 FROM bandsh h
         |                WHERE h.b = i.b AND h.bh = i.bh)),
         |fresh AS (SELECT * FROM bandsi
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
         |losers AS (SELECT DISTINCT x.doc_id FROM fresh x JOIN fresh y
         |  ON x.b = y.b AND x.bh = y.bh AND x.doc_id > y.doc_id)
         |SELECT doc_id FROM inc
         |WHERE doc_id NOT IN (SELECT doc_id FROM hit)
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "stream_dedup_incremental" ->
      s"""WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |d0 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id >= 100 AND doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' update' FROM documents
         |  WHERE doc_id < 100),
         |d1 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id >= 200 AND doc_id < 300
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' update' FROM documents
         |  WHERE doc_id >= 100 AND doc_id < 150),
         |${duckBandsCtes("hist", "h")},
         |${duckBandsCtes("d0", "a")},
         |${duckBandsCtes("d1", "c")},
         |hit0 AS (SELECT DISTINCT i.doc_id FROM bandsa i
         |  WHERE EXISTS (SELECT 1 FROM bandsh h
         |                WHERE h.b = i.b AND h.bh = i.bh)),
         |fresh0 AS (SELECT * FROM bandsa
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit0)),
         |losers0 AS (SELECT DISTINCT x.doc_id FROM fresh0 x JOIN fresh0 y
         |  ON x.b = y.b AND x.bh = y.bh AND x.doc_id > y.doc_id),
         |surv0 AS (SELECT doc_id FROM d0
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit0)
         |    AND doc_id NOT IN (SELECT doc_id FROM losers0)),
         |idx1 AS (SELECT b, bh FROM bandsh
         |  UNION ALL
         |  SELECT b, bh FROM bandsa
         |  WHERE doc_id IN (SELECT doc_id FROM surv0)),
         |hit1 AS (SELECT DISTINCT i.doc_id FROM bandsc i
         |  WHERE EXISTS (SELECT 1 FROM idx1 h
         |                WHERE h.b = i.b AND h.bh = i.bh)),
         |fresh1 AS (SELECT * FROM bandsc
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit1)),
         |losers1 AS (SELECT DISTINCT x.doc_id FROM fresh1 x JOIN fresh1 y
         |  ON x.b = y.b AND x.bh = y.bh AND x.doc_id > y.doc_id),
         |surv1 AS (SELECT doc_id FROM d1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit1)
         |    AND doc_id NOT IN (SELECT doc_id FROM losers1))
         |SELECT doc_id FROM surv0
         |UNION ALL
         |SELECT doc_id FROM surv1""".stripMargin,
    // Dedup under deletes: day-0 tombstone of history doc 7 applies
    // BEFORE day 0's inserts probe the index (idx0 excludes 7's bands),
    // day 1's tombstone of landed doc 150 excludes its bands from idx1
    // AND drops it from the returned corpus; doc 7's day-1 re-crawl
    // (30007) is only suppressed if something OTHER than 7 collides,
    // while live doc 20's re-crawl (20020) hits 20's bands.
    "stream_dedup_delete" ->
      s"""WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |d0 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id >= 100 AND doc_id < 200),
         |d1 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id >= 200 AND doc_id < 260
         |  UNION ALL
         |  SELECT doc_id + 30000, text || ' update' FROM documents
         |  WHERE doc_id = 7
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' update' FROM documents
         |  WHERE doc_id = 20),
         |${duckBandsCtes("hist", "h")},
         |${duckBandsCtes("d0", "a")},
         |${duckBandsCtes("d1", "c")},
         |idx0 AS (SELECT doc_id, b, bh FROM bandsh WHERE doc_id <> 7),
         |hit0 AS (SELECT DISTINCT i.doc_id FROM bandsa i
         |  WHERE EXISTS (SELECT 1 FROM idx0 h
         |                WHERE h.b = i.b AND h.bh = i.bh)),
         |fresh0 AS (SELECT * FROM bandsa
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit0)),
         |losers0 AS (SELECT DISTINCT x.doc_id FROM fresh0 x JOIN fresh0 y
         |  ON x.b = y.b AND x.bh = y.bh AND x.doc_id > y.doc_id),
         |surv0 AS (SELECT doc_id FROM d0
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit0)
         |    AND doc_id NOT IN (SELECT doc_id FROM losers0)),
         |idx1 AS (SELECT b, bh FROM idx0
         |  UNION ALL
         |  SELECT b, bh FROM bandsa
         |  WHERE doc_id IN (SELECT doc_id FROM surv0) AND doc_id <> 150),
         |hit1 AS (SELECT DISTINCT i.doc_id FROM bandsc i
         |  WHERE EXISTS (SELECT 1 FROM idx1 h
         |                WHERE h.b = i.b AND h.bh = i.bh)),
         |fresh1 AS (SELECT * FROM bandsc
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit1)),
         |losers1 AS (SELECT DISTINCT x.doc_id FROM fresh1 x JOIN fresh1 y
         |  ON x.b = y.b AND x.bh = y.bh AND x.doc_id > y.doc_id),
         |surv1 AS (SELECT doc_id FROM d1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit1)
         |    AND doc_id NOT IN (SELECT doc_id FROM losers1))
         |SELECT doc_id FROM surv0 WHERE doc_id <> 150
         |UNION ALL
         |SELECT doc_id FROM surv1""".stripMargin,
    "dedup_incremental_simhash" ->
      s"""WITH inc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' update' FROM documents
         |  WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' extra' FROM documents
         |  WHERE doc_id >= 300 AND doc_id < 320),
         |hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |${duckSimhashWideBands("inc", "i")},
         |${duckSimhashWideBands("hist", "h")},
         |hit AS (SELECT DISTINCT i.doc_id FROM wbandi i
         |  WHERE EXISTS (SELECT 1 FROM wbandh h
         |    WHERE h.band = i.band AND h.nib = i.nib
         |      AND bit_count(xor(h.simhash, i.simhash)) <= 3)),
         |fresh AS (SELECT * FROM wbandi
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
         |losers AS (SELECT DISTINCT x.doc_id FROM fresh x JOIN fresh y
         |  ON x.band = y.band AND x.nib = y.nib
         |    AND bit_count(xor(x.simhash, y.simhash)) <= 3
         |    AND x.doc_id > y.doc_id)
         |SELECT doc_id FROM inc
         |WHERE doc_id NOT IN (SELECT doc_id FROM hit)
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "dedup_paragraph" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE trim(text) <> ''),
        |p AS (SELECT doc_id, u.i AS pidx,
        |        array_to_string(toks[u.i*15+1 : u.i*15+15], ' ') AS para
        |      FROM w CROSS JOIN
        |        unnest(range(0, (SELECT (MAX(len(toks))+14)//15 FROM w))) u(i)
        |      WHERE u.i*15 < len(toks)),
        |st AS (SELECT para, count(DISTINCT doc_id) AS df, min(doc_id) AS kd
        |       FROM p GROUP BY para),
        |ki AS (SELECT p.para, min(p.pidx) AS kidx
        |       FROM p JOIN st s ON p.para = s.para AND p.doc_id = s.kd
        |       GROUP BY p.para)
        |SELECT p.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN s.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_paras,
        |  sum(CASE WHEN s.df > 1 THEN 1 ELSE 0 END) / count(*)
        |    AS boilerplate_frac,
        |  COALESCE(array_to_string(list(p.para ORDER BY p.pidx)
        |      FILTER (s.df = 1 OR (p.doc_id = s.kd AND p.pidx = k.kidx)), ' '),
        |    '') AS clean_text
        |FROM p JOIN st s ON p.para = s.para
        |       JOIN ki k ON p.para = k.para
        |GROUP BY p.doc_id""".stripMargin,
    "dedup_resolve_keep" ->
      s"""SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (
         |${duckComponentLosers(
             s"SELECT id_a, id_b FROM (\n$minhashPairsOracle\n) mp")}
         |)""".stripMargin,
    // Replays the full chain: minhash pairs -> transitive closure ->
    // min-id representative -> salted-hash bucket on the REPRESENTATIVE.
    "sample_split_leakproof" ->
      s"""WITH RECURSIVE pr AS (
         |  SELECT id_a, id_b FROM (\n$minhashPairsOracle\n) mp),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pr
         |          UNION SELECT id_b, id_a FROM pr),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |rep AS (SELECT a AS doc_id, least(a, MIN(b)) AS rep
         |        FROM reach GROUP BY a),
         |asgn AS (SELECT d.doc_id, COALESCE(r.rep, d.doc_id) AS rep
         |         FROM documents d LEFT JOIN rep r USING (doc_id)),
         |sp AS (SELECT doc_id, rep,
         |         CASE WHEN ('0x' || substr(md5('split:' || CAST(rep AS VARCHAR)),
         |                    1, 15))::BIGINT % 10000 < 9000
         |              THEN 'train' ELSE 'val' END AS split
         |       FROM asgn)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM sp GROUP BY 1""".stripMargin,
    "text_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE length(trim(text)) > 0),
        |win AS (SELECT doc_id, len(toks) AS ntok, p AS pos,
        |          md5(array_to_string(toks[p+1:p+8], ' ')) AS wh
        |        FROM d, unnest(generate_series(0,
        |          CASE WHEN len(toks) >= 8 THEN len(toks) - 8 ELSE 0 END))
        |          AS t(p)),
        |st AS (SELECT wh, COUNT(DISTINCT doc_id) AS df FROM win GROUP BY wh),
        |dup AS (SELECT w.doc_id, w.ntok, w.pos
        |        FROM win w JOIN st USING (wh) WHERE st.df >= 2),
        |c AS (SELECT doc_id, ntok, pos,
        |        lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |      FROM dup),
        |agg AS (SELECT doc_id, CAST(MAX(ntok) AS BIGINT) AS n_tokens,
        |          CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
        |          CAST(SUM(CASE WHEN nxt IS NULL
        |                THEN least(8, ntok - pos)
        |                ELSE least(nxt - pos, 8) END) AS BIGINT) AS dup_tokens
        |        FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_dup_windows, dup_tokens,
        |  round(dup_tokens::DOUBLE / n_tokens, 6) AS dup_frac
        |FROM agg""".stripMargin,
    // Same window/df machinery as text_dup_spans, then per-token
    // coverage via nested list lambdas (DuckDB lambda index is 1-based,
    // hence i-1).
    "text_dup_remove" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE length(trim(text)) > 0),
        |win AS (SELECT doc_id, len(toks) AS ntok, p AS pos,
        |          md5(array_to_string(toks[p+1:p+8], ' ')) AS wh
        |        FROM d, unnest(generate_series(0,
        |          CASE WHEN len(toks) >= 8 THEN len(toks) - 8 ELSE 0 END))
        |          AS t(p)),
        |st AS (SELECT wh, COUNT(DISTINCT doc_id) AS df FROM win GROUP BY wh),
        |dp AS (SELECT w.doc_id, list_sort(list(w.pos)) AS dups
        |       FROM win w JOIN st USING (wh) WHERE st.df >= 2
        |       GROUP BY w.doc_id),
        |alltoks AS (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents),
        |cut AS (SELECT a.doc_id, a.toks,
        |          list_filter(a.toks, (t, i) -> len(list_filter(
        |            COALESCE(dp.dups, []), p -> p <= i - 1 AND i - 1 < p + 8))
        |            = 0) AS kept
        |        FROM alltoks a LEFT JOIN dp USING (doc_id))
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS kept_tokens,
        |  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM cut""".stripMargin,
    "dedup_resolve_best" ->
      s"""WITH RECURSIVE pr AS (
         |  SELECT id_a, id_b FROM (\n$minhashPairsOracle\n) mp),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pr
         |          UNION SELECT id_b, id_a FROM pr),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (SELECT a AS id, least(a, MIN(b)) AS cluster
         |        FROM reach GROUP BY a),
         |scored AS (SELECT l.id, l.cluster,
         |             ${TextEventsQueries.duckQualityExpr} AS q
         |           FROM lbl l JOIN documents d ON d.doc_id = l.id),
         |ranked AS (SELECT id, ROW_NUMBER() OVER (PARTITION BY cluster
         |             ORDER BY q DESC, id) AS rn FROM scored)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)""".stripMargin,
    "dedup_embedding_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 0
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""SELECT doc_id FROM documents
         |WHERE doc_id IN ($duckExactKeep)
         |  AND doc_id IN ($duckParaFilter)
         |  AND doc_id NOT IN (
         |${duckComponentLosers(
             s"SELECT id_a, id_b FROM (\n${minhashPairsOracleFrom(duckStage2Rel)}\n) mp")}
         |)
         |  AND ${TextEventsQueries.duckQualityExpr} >= 0.7
         |  AND (${TextEventsQueries.duckLangCase}) != 'und'""".stripMargin,
  )
}
