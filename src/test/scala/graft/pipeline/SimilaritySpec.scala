package graft.pipeline

import graft.SparkSpec
import graft.SparkEntry

class SimilaritySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("s2 LSH ANN has sane recall vs s1 brute force and never invents neighbors") {
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "LSH should produce candidates")
    // every LSH result is a true vector pair from the corpus (sanity)
    val overlap = lsh.intersect(brute).size.toDouble / brute.size
    // random-hyperplane LSH on random vectors: recall is modest but must
    // be far above chance (chance ≈ k/N = 10/500 = 2%)
    assert(overlap >= 0.1, f"recall vs brute force too low: $overlap%.2f")
  }

  test("s2 driver query: every query meets the recall_ok contract") {
    val out = SparkEntry.queries("s2_knn_lsh")(spark, dir).collect()
    assert(out.length == 5)
    out.foreach(r => assert(r.getBoolean(r.fieldIndex("recall_ok")),
      s"query ${r.get(0)} below the recall floor"))
  }

  test("s2 band width is corpus-derived: probe fraction DECAYS across SFs, recall holds") {
    // round 3's fixed 4x4-bit geometry probed ~25% of the corpus per
    // query forever; the ladder must widen the bands at sf0.1 (n=2000)
    // so the probed fraction falls, while the recall contract stays
    // green at the larger SF too
    val big = "/root/testdata/sf0.1"
    assert(Similarity.s2Bits(500) == Similarity.S2MinBits)
    assert(Similarity.s2Bits(2000) > Similarity.S2MinBits,
      "ladder must engage at the sf0.1 corpus")
    val fracSmall = Similarity.s2ProbeFraction(spark, dir)
    val fracBig = Similarity.s2ProbeFraction(spark, big)
    assert(fracBig < fracSmall,
      f"probe fraction not shrinking: $fracSmall%.3f -> $fracBig%.3f")
    val out = SparkEntry.queries("s2_knn_lsh")(spark, big).collect()
    assert(out.length == 5)
    out.foreach(r => assert(r.getBoolean(r.fieldIndex("recall_ok")),
      s"query ${r.get(0)} below the recall floor at sf0.1"))
  }

  test("s4 IVF ANN: full top-10 per query, exact within probed cells, sane recall") {
    val ivf = SparkEntry.queries("s4_knn_ivf")(spark, dir).collect()
    assert(ivf.length == 50, s"expected 5 queries x 10 rows, got ${ivf.length}")
    // per query: ranks are 1..10 and cos_sim is non-increasing in rank
    ivf.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to 10),
        s"query $qid ranks not 1..10")
      val sims = byRank.map(_.getDouble(2)).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $qid cos_sim not sorted")
    }
    // probing NProbe of NumCentroids cells must beat chance recall by a
    // wide margin (near vectors concentrate in the query's own cells)
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = hits.intersect(brute).size.toDouble / brute.size
    assert(overlap >= 0.1, f"IVF recall vs brute force too low: $overlap%.2f")
  }

  test("s5 SQ8 ANN: perfect top-10 recall vs brute force after exact rerank") {
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = SparkEntry.queries("s5_knn_sq8")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // symmetric int8 + a 5x rerank pool loses nothing at the gate SFs
    // (measured 10/10 on every query at sf0.001 AND sf0.01); gate at 80%
    // to leave room for genuinely adversarial future fixtures only
    val overlap = sq8.intersect(brute).size.toDouble / brute.size
    assert(overlap >= 0.8, f"SQ8 recall vs brute force too low: $overlap%.2f")
  }

  test("s5 quantized corpus stays in int8 range and reuses one materialized table") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    // the memory-traffic claim is PHYSICAL: the stored element type must
    // be TINYINT (1 B/coord -> 64 B/vector at 64 dims), not a long that
    // happens to hold int8 values (8 B/coord, zero bandwidth saved)
    val qz = Similarity.sq8Corpus(spark, dir)
    assert(qz.schema("qv").dataType == ArrayType(ByteType, containsNull = false)
      || qz.schema("qv").dataType == ArrayType(ByteType),
      s"quantized corpus must be array<tinyint>: ${qz.schema("qv").dataType}")
    val dims = qz.select(max(size(col("qv")))).first().getInt(0)
    assert(dims <= 64, s"payload must be <=64 B/vector at the testdata dims: $dims B")
    val bounds = qz.select(
      min(expr("aggregate(qv, 127L, (a, q) -> least(a, CAST(q AS BIGINT)))")).as("lo"),
      max(expr("aggregate(qv, -128L, (a, q) -> greatest(a, CAST(q AS BIGINT)))")).as("hi")).first()
    assert(bounds.getLong(0) >= -128 && bounds.getLong(1) <= 127,
      s"quantized coords outside int8: $bounds")
    // and the quantizer actually uses the range (not collapsed to 0)
    assert(bounds.getLong(1) > 64, s"scale wastes the int8 range: $bounds")
    val out = SparkEntry.queries("s5_knn_sq8")(spark, dir)
    assert(out.count() == 50)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    out.collect() // second evaluation: must reuse the materialized qz table
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore)
  }

  test("s17 binary ANN: two packed 32-bit sign words per vector, pinned pool recall") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val codes = Similarity.binCorpus(spark, dir)
    assert(codes.schema("c0").dataType == LongType
      && codes.schema("c1").dataType == LongType)
    // each word uses exactly 32 bits — the 16 B/vector physical claim
    // (and bit 63 never set, the cross-engine overflow seam the
    // two-word layout exists to avoid)
    val b = codes.agg(
      min(least(col("c0"), col("c1"))).as("lo"),
      max(greatest(col("c0"), col("c1"))).as("hi")).first()
    assert(b.getLong(0) >= 0L && b.getLong(1) < (1L << 32),
      s"packed word outside 32 bits: $b")
    // the code IS the sign pattern of the raw embedding: recompute a
    // sample independently, bit for bit
    val byId = codes.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 8).collect().foreach { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding"))
        def pack(off: Int) = (0 until 32).foldLeft(0L)((acc, i) =>
          if (v(off + i) > 0f) acc | (1L << i) else acc)
        assert(byId(r.getLong(0)) == ((pack(0), pack(32))),
          s"sign pack mismatch for vec ${r.getLong(0)}")
      }
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bin = SparkEntry.queries("s17_knn_binary")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = bin.intersect(brute).size.toDouble / brute.size
    // measured 0.68 / 0.72 / 0.38 at sf0.001/0.01/0.1 — 1-bit codes on
    // ISOTROPIC vectors are the lossy extreme of the quantization
    // ladder (S17Pool scaladoc has the pool-fraction curve). Floor at
    // 0.4 = 4x the 10% chance line (pool 50 of n=500), with margin
    // under the measured value so noise can't flake the pin.
    assert(overlap >= 0.4, f"binary pool recall too low: $overlap%.2f")
  }

  test("s6 PQ ANN: high top-10 recall vs brute force after exact rerank") {
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("s6_knn_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16x4 codebooks + the 5x rerank pool: measured 7-9/10 per query at
    // sf0.001 and 7-10/10 at sf0.01 on uniform random vectors (real
    // clustered embeddings quantize better); gate at 60% aggregate
    val overlap = pq.intersect(brute).size.toDouble / brute.size
    assert(overlap >= 0.6, f"PQ recall vs brute force too low: $overlap%.2f")
  }

  test("s6 code table is the 64x-smaller artifact: one packed 8-byte code per vector") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val codes = Similarity.pqCodes(spark, dir)
    // ONE row, ONE 8-byte BIGINT per vector — the stored artifact really
    // is 8 B/vector (a row-per-subspace table would be ~384 B/vector)
    assert(codes.columns.toSeq == Seq("vec_id", "code"),
      "the scanned artifact must hold one packed code column, never vectors")
    assert(codes.schema("code").dataType == LongType,
      s"packed code must be a single BIGINT: ${codes.schema("code").dataType}")
    val perVec = codes.groupBy("vec_id").count()
      .agg(min("count").as("lo"), max("count").as("hi")).first()
    assert(perVec.getLong(0) == 1 && perVec.getLong(1) == 1,
      s"expected exactly one packed code per vector: $perVec")
    // the map-side unpack restores PqSubs in-codebook codes per vector
    val unpacked = Similarity.pqCodesUnpacked(spark, dir)
    val perVecU = unpacked.groupBy("vec_id").count()
      .agg(min("count").as("lo"), max("count").as("hi")).first()
    assert(perVecU.getLong(0) == Similarity.PqSubs && perVecU.getLong(1) == Similarity.PqSubs,
      s"expected exactly ${Similarity.PqSubs} unpacked codes per vector: $perVecU")
    val cidRange = unpacked.agg(min("cid").as("lo"), max("cid").as("hi")).first()
    assert(cidRange.getLong(0) >= 0 && cidRange.getLong(1) < Similarity.PqK,
      s"codes outside the codebook: $cidRange")
    // repeated queries reuse the materialized index tables
    SparkEntry.queries("s6_knn_pq")(spark, dir).collect()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("s6_knn_pq")(spark, dir).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore)
  }

  test("s8 served layout: equals s7 exactly, probe prunes cell partitions at plan time") {
    val viaIndex = SparkEntry.queries("s7_knn_ivfpq")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val df = SparkEntry.queries("s8_ann_layout")(spark, dir)
    val served = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == viaIndex,
      "the persisted layout must serve exactly the in-session index's results")
    // the LAYOUT scan must prune to the probed cells BEFORE any I/O
    // (other scans in the plan — embeddings — are unpartitioned and
    // print empty PartitionFilters; the assertion targets the cid scan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid#"),
      s"probe must plan a non-empty partition filter on cid:\n$plan")
  }

  test("s7 IVF-PQ: full top-10 per query, recall bounded by the probe, sane vs chance") {
    val ivfpq = SparkEntry.queries("s7_knn_ivfpq")(spark, dir).collect()
    assert(ivfpq.length == 50, s"expected 5 queries x 10 rows, got ${ivfpq.length}")
    ivfpq.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.sortBy(_.getInt(3)).map(_.getInt(3)).toSeq == (1 to 10),
        s"query $qid ranks not 1..10")
    }
    val brute = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivfpq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = hits.intersect(brute).size.toDouble / brute.size
    // the composition can't beat the IVF probe's own recall; it must
    // still beat chance (10/500 = 2%) by a wide margin
    assert(overlap >= 0.1, f"IVF-PQ recall vs brute force too low: $overlap%.2f")
    // and every IVF-PQ hit must come from the probed cells: the result
    // is a subset of what full-precision IVF (same probes) can see
    val ivf = SparkEntry.queries("s4_knn_ivf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (not asserting subset of s4's top-10 — PQ may surface a different
    // probed-cell vector — but the probe sets match, so candidates do)
    assert(hits.nonEmpty && ivf.nonEmpty)
  }

  test("d3b LSH candidate pairs cover the high-jaccard near-dup pairs") {
    val jacPairs = SparkEntry.queries("d2_ngram_jaccard")(spark, dir)
      .filter("jaccard >= 0.5")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = SparkEntry.queries("d3b_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // MinHash-LSH with 2 bands of 4 at jaccard 0.5: P(candidate) =
    // 1-(1-0.5^4)^2 ≈ 12% per pair — assert coverage only if any exist,
    // and that LSH found at least as many buckets as exact dup groups
    if (jacPairs.nonEmpty) {
      val covered = jacPairs.intersect(lshPairs).size.toDouble / jacPairs.size
      assert(covered >= 0.0) // coverage reported, not gated (probabilistic)
    }
    assert(lshPairs.forall { case (a, b) => a < b })
  }

  test("d10 semantic clusters: min-labeled, transitive over the >=0.4 pairs, subset of s3") {
    val roots = SparkEntry.queries("d10_semantic_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots.nonEmpty, "sf0.001 must produce at least one semantic cluster")
    assert(roots.forall { case (id, root) => root <= id },
      "every root must be the component's minimum id")
    val dupPairs = Similarity.s3RawPairs(spark, dir)
      .filter(org.apache.spark.sql.functions.col("cos_raw") >= Similarity.SemanticDupCos)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty)
    dupPairs.foreach { case (a, b) =>
      assert(roots(a) == roots(b), s"pair ($a,$b) must share a root")
    }
    // membership is exactly the vertices of the dup-pair graph
    val verts = dupPairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(roots.keySet == verts, "cluster membership must equal the pair-graph vertices")
    // d10's threshold is strictly above s3's report cut, so its pairs
    // are a subset of the s3 report
    val s3Ids = SparkEntry.queries("s3_cosine_neardup")(spark, dir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.forall(s3Ids.contains), "d10 pairs must be a subset of s3's report")
  }
}
