package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `run_stats` (round 13) replaces the t7/t14
  * `aggregate(array_sort(...), ...)` interpreted fold — this spec pins
  * bitwise equality against that original spelling, element by element,
  * on crafted edge cases and on real gate documents.
  */
class RunStatsSpec extends SparkSpec {

  private val foldSql =
    """aggregate(array_sort(arr),
         named_struct('prev', CAST(NULL AS STRING),
                      'run', 0L, 'maxrun', 0L, 'dup', 0L),
         (a, x) -> named_struct(
           'prev', x,
           'run', IF(x <=> a.prev, a.run + 1L, 1L),
           'maxrun', GREATEST(a.maxrun, IF(x <=> a.prev, a.run + 1L, 1L)),
           'dup', a.dup + IF(x <=> a.prev, IF(a.run = 1L, 2L, 1L), 0L)))"""

  test("run_stats equals the aggregate(array_sort) fold on crafted arrays") {
    GraftFunctions.register(spark)
    def arrLit(xs: Seq[String]): String =
      if (xs.isEmpty) "CAST(array() AS ARRAY<STRING>)"
      else xs.map(x => if (x == null) "CAST(NULL AS STRING)" else s"'$x'")
        .mkString("array(", ", ", ")")
    val cases: Seq[Seq[String]] = Seq(
      Seq.empty,
      Seq("a"),
      Seq("a", "a"),
      Seq("b", "a", "b", "a", "b"),
      Seq("x", "y", "z"),
      Seq("dup", "dup", "dup", "one", "two", "two"),
      Seq("", "", "a"),            // empty strings are legal tokens (t14's split)
      Seq("á", "a", "á"),          // non-ASCII: binary UTF-8 order
      Seq(null, "a", null),        // null-safe equality branch
      (1 to 200).map(i => s"w${i % 7}")) // long mixed runs
    val df = spark.sql(
      cases.map(c => s"SELECT ${arrLit(c)} AS arr").mkString(" UNION ALL "))
    val both = df.select(
      expr("run_stats(arr)").as("k"),
      expr(foldSql).as("f"))
      .select(col("k.maxrun"), col("k.dup"),
        col("f.maxrun").as("fmax"), col("f.dup").as("fdup"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3),
        s"kernel (${r.getLong(0)}, ${r.getLong(1)}) != fold (${r.getLong(2)}, ${r.getLong(3)})")
    }
  }

  test("run_stats equals the fold on real gate documents (words and trigrams)") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(split(lower(trim(col("text"))), "\\s+").as("arr"))
    val diff = docs.select(
        expr("run_stats(arr)").as("k"), expr(foldSql).as("f"))
      .filter(col("k.maxrun") =!= col("f.maxrun") || col("k.dup") =!= col("f.dup"))
      .count()
    assert(diff == 0L, s"$diff documents diverge from the fold spelling")
  }
}
