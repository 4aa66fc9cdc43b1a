package graft

/** The facade is the library's front door — pin that one `register`
  * call makes the whole surface reachable from plain `spark.sql`.
  */
class GraftApiSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("register wires every table view and the custom functions") {
    Graft.register(spark, dir)
    for (n <- Tables.names)
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1L,
        s"view $n must be queryable after register")
    val fp = spark.sql(
      "SELECT md5_long(text) AS h, size(winnow_fp(text, 8, 4)) AS n FROM documents LIMIT 5")
      .collect()
    assert(fp.length == 5 && fp.forall(r => !r.isNullAt(0)),
      "custom expressions must be callable from SQL")
  }

  test("run executes any inventory operator by name; unknown names fail loudly") {
    assert(Graft.queryNames.size == SparkEntry.queries.size)
    assert(Graft.run(spark, dir, "q1_agg").count() > 0)
    val e = intercept[IllegalArgumentException](Graft.run(spark, dir, "nope"))
    assert(e.getMessage.contains("unknown graft query"))
  }

  test("sql composes registration with an ad-hoc query") {
    val n = Graft.sql(spark, dir,
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
