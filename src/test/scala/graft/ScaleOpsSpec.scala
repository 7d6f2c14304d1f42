package graft

import graft.ops.{Salting, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Scale-path machinery: stored IVF partition pruning, salted joins/aggs. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stored IVF: results == in-memory IVF; scan prunes to probed partitions") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    SimilaritySearch.ivfWrite(vecs, dir, "embedding", dim = 8, numPlanes = 4)

    val q = Array.fill(8)(0.3)
    val stored = SimilaritySearch.ivfTopKStored(spark, dir, "vec_id", "embedding", q,
      k = 5, nProbe = 3)
    val inMem = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", 8, q,
      k = 5, numPlanes = 4, nProbe = 3)
    assert(stored.select("vec_id").as[Long].collect().toSeq ==
      inMem.select("vec_id").as[Long].collect().toSeq)

    // pruning is static: the scan's partition filter names `bucket`,
    // and the files read are only the probed buckets' directories
    val scanText = stored.queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") && scanText.contains("bucket"),
      s"expected partition filters on bucket in:\n$scanText")

    // full probe == brute force on the stored layout
    val all = SimilaritySearch.ivfTopKStored(spark, dir, "vec_id", "embedding", q,
      k = 5, nProbe = 16)
    val brute = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
    assert(all.select("vec_id").as[Long].collect().toSeq ==
      brute.select("vec_id").as[Long].collect().toSeq)
  }

  test("salted join == plain join, exactly, with a hot key") {
    val large = ((1 to 3000).map(i => (1L, i.toLong)) ++ // hot key 1
      (1 to 300).map(i => (i.toLong % 7 + 2, i.toLong + 10000))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (5L, "c")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Salting.saltedJoin(large, small, "k", factor = 8,
        spreadCols = Seq("payload"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 3000)
  }

  test("salted agg == plain agg for sum/count/min merges") {
    val df = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (2L, i.toLong))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"), min("v").as("m"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val salted = Salting.saltedAgg(df, "k", factor = 16, spreadCols = Seq("v"),
        aggs = Seq(
          ("s", sum("v"), (c: org.apache.spark.sql.Column) => sum(c)),
          ("c", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
          ("m", min("v"), (c: org.apache.spark.sql.Column) => min(c))))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }
}
