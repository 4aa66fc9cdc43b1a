package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (driver-mandated LLM-pipeline
  * extension).
  *
  * Scale design: every operator here is shuffle-minimal —
  *  - exact dedup is one hash aggregate on the fingerprint;
  *  - MinHash/LSH shuffles once on band signatures (the classic
  *    shingle → minhash → band → bucket-join pipeline), never all-pairs;
  *  - n-gram Jaccard joins through an inverted shingle index, so only
  *    documents sharing a shingle ever meet;
  *  - SimHash is a pure per-document map (pairing happens downstream on
  *    the 32-bit signature).
  * All hash functions are the portable md5-based 60-bit hash so every
  * operator has a full DuckDB oracle (Portable.md5Long).
  */
object Dedup {
  import Tables.t
  import Portable._

  /** MinHash permutation parameters: h_j(x) = (a_j * x + b_j) mod P over
    * the base hash reduced mod M. Constants are small enough that
    * a_j * (x mod M) never overflows a signed 64-bit int in either
    * engine. Fixed (seed-42-generated) literals so the DuckDB oracle can
    * inline them.
    */
  private val M = 1000003L
  private val P = 999983L
  private val As = Seq(656961L, 380884L, 918225L, 611331L, 266057L, 962015L, 126966L, 755677L)
  private val Bs = Seq(463174L, 534096L, 392005L, 657170L, 881634L, 532155L, 542388L, 879771L)
  private val BandRows = 4 // 8 hashes → 2 bands of 4

  /** d2 document-frequency cap: a shingle appearing in more than
    * max(50, 1% of the corpus) documents carries no Jaccard signal
    * (boilerplate) and makes its inverted-index bucket O(df²) in the
    * self-join — the classic hot-key scale-killer. Dropping them first is
    * standard in production dedup. Corpus-relative so the cap stays
    * meaningful from the sf0.01 gate to a 100 TB corpus; the oracle
    * computes the same bound in SQL.
    */
  val MinShingleDfCap = 50L
  def shingleDfCap(nDocs: Long): Long = math.max(MinShingleDfCap, nDocs / 100)

  private def normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Documents table re-sharded across the cluster before per-document
    * EXPLOSION (shingles ×~2000, words ×tokens): a compact corpus file
    * arrives in far fewer input splits than the explode output warrants
    * (sf0.1 = one 0.6 MB row group = ONE scan task feeding a ~10M-row
    * md5 pipeline single-threaded). Hash-sharding on doc_id costs one
    * tiny shuffle of the raw text and buys full-cluster parallelism for
    * the hash/explode stage — the same re-shard a 100 TB corpus of
    * many small objects needs before fan-out work.
    */
  private def docsSharded(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents").repartition(col("doc_id"))

  def all: Seq[Q] = Seq(
    // ---- d1: exact dedup — group by normalized-text fingerprint, keep min id ----
    Q(
      "d1_exact_dedup",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
          .groupBy(col("fingerprint"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .filter(col("n_copies") >= 1),
      Some(s"""
        SELECT md5($normSql) AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 HAVING count(*) >= 1"""),
    ),

    // ---- d2: n-gram Jaccard near-dup — inverted shingle index, no all-pairs ----
    Q(
      "d2_ngram_jaccard",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = docsSharded(s, dir)
          .select(col("doc_id"), shingles3(words(col("text"))).as("sh"))
        // join key = 60-bit shingle hash: an 8-byte long shuffles and
        // compares far cheaper than a ~20-char string; the oracle hashes
        // identically so semantics match (collisions: ~n^2/2^61, nil)
        // materialize the inverted shingle index ONCE — it feeds the hot
        // set, both self-join sides, and the size table (without the
        // persist each consumer re-runs the explode+distinct pipeline,
        // the dominant cost; at 100 TB the index is a materialized table)
        val allSh = docs
          .select(col("doc_id"), explode(col("sh")).as("shingle"))
          .select(col("doc_id"), md5Long(col("shingle")).as("h"))
          .distinct() // set semantics for Jaccard
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tau = shingleDfCap(t(s, dir, "documents").count())
        // hot-shingle cap: the hot set is small by definition (few
        // boilerplate shingles exceed the df cap), so a broadcast
        // anti-join removes them without shuffling the big side
        val hot = allSh.groupBy("h")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > tau)
          .select("h")
        val exploded = allSh.join(broadcast(hot), Seq("h"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the capped index EAGERLY: the self-join below reads
        // it from three branches of ONE job, and a lazy persist lets those
        // branches race to fill the cache (each recomputing the full
        // explode+distinct — measured 3x slower than round 1's no-cache
        // version). One count() = one build, then pure cache reads.
        exploded.count()
        allSh.unpersist(false) // superseded by the capped index
        val sizes = exploded.groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"))
        // inverted index self-join: only docs sharing a shingle meet.
        // (A collect_list-per-bucket variant benches identically at
        // sf0.1 — the 40M-pair space is the cost — but the join wins at
        // scale: AQE can split skewed shingle buckets, an in-memory
        // bucket array cannot.)
        val pairs = exploded.as("x")
          .join(exploded.as("y"),
            col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
          .agg(count(lit(1)).as("n_common"))
        pairs
          .join(broadcast(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1")), "doc1")
          .join(broadcast(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2")), "doc2")
          .withColumn("jac_raw",
            col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
          .filter(col("jac_raw") >= 0.2) // threshold on RAW value, like the oracle
          .select(col("doc1"), col("doc2"), round(col("jac_raw"), 6).as("jaccard"))
      },
      Some(s"""
        WITH sh0 AS (
          SELECT DISTINCT doc_id, ${md5LongSql("shingle")} AS h
          FROM (SELECT doc_id,
                       unnest(${shingles3Sql(wordsSql("text"))}) AS shingle
                FROM documents)),
        sh AS (
          SELECT * FROM sh0 WHERE h NOT IN (
            SELECT h FROM sh0 GROUP BY h
            HAVING count(*) > greatest($MinShingleDfCap,
                                       (SELECT count(*) // 100 FROM documents)))),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        pairs AS (
          SELECT x.doc_id AS doc1, y.doc_id AS doc2, count(*) AS n_common
          FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT doc1, doc2,
               round(n_common / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE), 6) AS jaccard
        FROM pairs JOIN sizes s1 ON doc1 = s1.doc_id
                   JOIN sizes s2 ON doc2 = s2.doc_id
        WHERE n_common / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE) >= 0.2"""),
    ),

    // ---- d3: MinHash signatures + LSH band buckets ----
    Q(
      "d3_minhash",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // NO distinct before the min-aggregation: min over a multiset
        // equals min over its set, so deduplicating shingles first would
        // only add a full shuffle of every (doc, shingle) string pair —
        // the signature pipeline's partial mins combine map-side and the
        // one real shuffle carries |docs| rows, not |shingles|. (The
        // oracle keeps its DISTINCT; both reduce to the same mins.)
        val sh = docsSharded(s, dir)
          .select(col("doc_id"), explode(shingles3(words(col("text")))).as("shingle"))
          .withColumn("h", pmod(md5Long(col("shingle")), lit(M)))
        val mhCols = As.zip(Bs).zipWithIndex.map { case ((a, b), j) =>
          min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"mh$j")
        }
        val mins = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
        mins.select(
          col("doc_id"),
          concat_ws("_", (0 until BandRows).map(j => col(s"mh$j")): _*).as("band0"),
          concat_ws("_", (BandRows until 2 * BandRows).map(j => col(s"mh$j")): _*).as("band1"))
      },
      Some(s"""
        WITH sh AS (
          SELECT DISTINCT doc_id, shingle
          FROM (SELECT doc_id,
                       unnest(${shingles3Sql(wordsSql("text"))}) AS shingle
                FROM documents)),
        h AS (SELECT doc_id, ${md5LongSql("shingle")} % $M AS h FROM sh),
        mins AS (
          SELECT doc_id,
                 ${As.zip(Bs).zipWithIndex.map { case ((a, b), j) =>
                   s"min(($a * h + $b) % $P) AS mh$j"
                 }.mkString(",\n                 ")}
          FROM h GROUP BY 1)
        SELECT doc_id,
               concat_ws('_', ${(0 until BandRows).map(j => s"mh$j").mkString(", ")}) AS band0,
               concat_ws('_', ${(BandRows until 2 * BandRows).map(j => s"mh$j").mkString(", ")}) AS band1
        FROM mins"""),
    ),

    // ---- d3b: LSH candidate pairs — bucket-join on band signatures ----
    Q(
      "d3b_lsh_pairs",
      (s, dir) => {
        // materialize the signature table once (the pattern a 100 TB
        // dedup uses: signatures are computed in one pass and reused by
        // every band join) — without this, the self-join below would
        // recompute the full shingle -> minhash pipeline for BOTH sides
        val sig = all.find(_.name == "d3_minhash").get.run(s, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sig.count() // eager: both self-join sides must READ the cache,
                    // not race to fill it (see d2's materialize note)
        val bands = sig.select(col("doc_id"), explode(array(
          concat_ws("|", lit(0), col("band0")),
          concat_ws("|", lit(1), col("band1")))).as("bucket"))
        bands.as("x").join(bands.as("y"),
            col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
          .distinct()
      },
      Some(s"""
        WITH sh AS (
          SELECT DISTINCT doc_id, shingle
          FROM (SELECT doc_id,
                       unnest(${shingles3Sql(wordsSql("text"))}) AS shingle
                FROM documents)),
        h AS (SELECT doc_id, ${md5LongSql("shingle")} % $M AS h FROM sh),
        mins AS (
          SELECT doc_id,
                 ${As.zip(Bs).zipWithIndex.map { case ((a, b), j) =>
                   s"min(($a * h + $b) % $P) AS mh$j"
                 }.mkString(",\n                 ")}
          FROM h GROUP BY 1),
        bands AS (
          SELECT doc_id, concat_ws('|', '0', concat_ws('_', ${(0 until BandRows).map(j => s"mh$j").mkString(", ")})) AS bucket FROM mins
          UNION ALL
          SELECT doc_id, concat_ws('|', '1', concat_ws('_', ${(BandRows until 2 * BandRows).map(j => s"mh$j").mkString(", ")})) AS bucket FROM mins)
        SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
        FROM bands x JOIN bands y ON x.bucket = y.bucket AND x.doc_id < y.doc_id"""),
    ),

    // ---- d4: SimHash — 32-bit signature from token hashes, per document ----
    Q(
      "d4_simhash",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val tok = docsSharded(s, dir)
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
          .withColumn("h", md5Long(col("tok")))
        val bits = tok
          .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("bit"))
          .withColumn("contrib",
            when(expr("(h div shiftleft(1L, bit)) % 2") === 1L, 1L).otherwise(-1L))
          .groupBy(col("doc_id"), col("bit"))
          .agg(sum(col("contrib")).as("w"))
        bits.groupBy("doc_id")
          .agg(sum(when(col("w") > 0, expr("shiftleft(1L, bit)")).otherwise(0L)).as("simhash32"))
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, ${md5LongSql("tok")} AS h
          FROM (SELECT doc_id, unnest(${wordsSql("text")}) AS tok FROM documents)),
        bits AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h // (1::BIGINT << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS w
          FROM tok, (SELECT unnest(generate_series(0, 31)) AS bit)
          GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash32
        FROM bits GROUP BY 1"""),
    ),
  )
}
