package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`).
  *
  * s1 is the exact brute-force baseline (broadcast the query set, scan
  * the corpus once — the corpus side never shuffles, so it scales to any
  * corpus size; k stays in a per-query top-k window).
  * s2 is the scale path: random-hyperplane LSH — each vector hashes to a
  * band signature, candidates meet through a bucket equi-join instead of
  * a cross join, then exact cosine re-ranks. At 100 TB the bucket join
  * shuffles only (vector, signature) pairs, never the n² pair space.
  * s3 is blocked near-dup detection: exact cosine pairs within a
  * blocking key (`label`) — the classic "cluster then compare" shape.
  *
  * Cosine is computed with codegen'd array expressions
  * (`zip_with`/`aggregate`) — no UDF, stays in WholeStageCodegen.
  */
object Similarity {
  import Tables.t

  /** Exact cosine similarity between two array<double> columns, via the
    * custom fused [[graft.functions.VecDot]] expression (same fold order
    * as the `aggregate(zip_with(...))` spelling — bitwise-equal results,
    * one loop instead of two lambda chains + intermediate array).
    */
  private def cosine(a: String, b: String): Column =
    expr(s"vec_dot($a, $b) / (sqrt(vec_dot($a, $a)) * sqrt(vec_dot($b, $b)))")

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
  }

  /** 16 seed-7 hyperplanes over 64 dims, folded to 4 bands of 4 sign
    * bits. Literal constants so the computation is pure column algebra.
    */
  private val Hyperplanes: Seq[Seq[Double]] = {
    val rng = new Random(7)
    Seq.fill(16)(Seq.fill(64)(math.rint((rng.nextDouble() * 2 - 1) * 1000) / 1000))
  }

  def all: Seq[Q] = Seq(
    // ---- s1: brute-force cosine top-k for a fixed query set ----
    Q(
      "s1_knn_brute",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
        e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("cos_sim", round(cosine("qv", "v"), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("vec_id"), col("cos_sim"), col("rn"))
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        p AS (SELECT qid, vec_id,
                     round(list_dot_product(qv, v)
                           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
              FROM q, e WHERE vec_id != qid)
        SELECT qid, vec_id, cos_sim, rn
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                           ORDER BY cos_sim DESC, vec_id ASC) AS rn
              FROM p)
        WHERE rn <= 10"""),
    ),

    // ---- s2: LSH-bucketed ANN — no SQL oracle (hyperplane constants);
    //      recall vs s1 is asserted in SimilaritySpec ----
    Q(
      "s2_knn_lsh",
      (s, dir) => {
        val e = vecs(s, dir)
        val planes = Hyperplanes.zipWithIndex.map { case (p, i) =>
          val dot = expr(s"""aggregate(zip_with(v, array(${p.mkString(",")}),
                                       (x, y) -> x * y), 0D, (acc, c) -> acc + c)""")
          when(dot >= 0, lit(1)).otherwise(lit(0)).as(s"b$i")
        }
        val signed = e.select(col("vec_id") +: col("label") +: col("v") +: planes: _*)
        def band(lo: Int, hi: Int) =
          concat_ws("", (lo until hi).map(i => col(s"b$i")): _*)
        // 4 bands of 4 sign bits: tuned for the modest-cosine kNN regime
        // (random corpus: top-10 cosine ≈ 0.4 → p_bit ≈ 0.63, band hit
        // p^4 ≈ 0.16, any-of-4 ≈ 50% recall at ~25% of the corpus probed)
        val banded = signed
          .withColumn("bucket", explode(array(
            (0 until 4).map(bi =>
              concat_ws("|", lit(bi), band(bi * 4, bi * 4 + 4))): _*)))
          .select(col("vec_id"), col("v"), col("bucket"))
        val q = banded.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
        // candidates share a band bucket with the query → equi-join
        banded.join(q, Seq("bucket")).filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("qv"), col("v")).distinct()
          .withColumn("cos_sim", round(cosine("qv", "v"), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("vec_id"), col("cos_sim"), col("rn"))
      },
      None, // hyperplane constants live in Scala; driver records rows>0
    ),

    // ---- s3: blocked cosine near-dup pairs (block on label) ----
    Q(
      "s3_cosine_neardup",
      (s, dir) => {
        val e = vecs(s, dir)
        val x = e.select(col("vec_id").as("id1"), col("label"), col("v").as("v1"))
        val y = e.select(col("vec_id").as("id2"), col("label"), col("v").as("v2"))
        x.join(y, Seq("label")).filter(col("id1") < col("id2"))
          .withColumn("cos_raw", cosine("v1", "v2"))
          .filter(col("cos_raw") >= 0.25) // threshold on RAW value, like the oracle
          .select(col("label"), col("id1"), col("id2"), round(col("cos_raw"), 6).as("cos_sim"))
      },
      Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT x.label AS label, x.vec_id AS id1, y.vec_id AS id2,
               round(list_dot_product(x.v, y.v)
                     / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cos_sim
        FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= 0.25"""),
    ),
  )
}
