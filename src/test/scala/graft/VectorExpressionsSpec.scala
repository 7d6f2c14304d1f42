package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: correctness vs scala-computed reference,
  * both float and double array children, codegen path (DataFrame eval
  * exercises doGenCode inside WholeStageCodegen). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, -5.0f, 6.0f)

  private def refDot(x: Array[Float], y: Array[Float]): Double =
    x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
  private def refCos(x: Array[Float], y: Array[Float]): Double = {
    val d = refDot(x, y)
    val nx = refDot(x, x); val ny = refDot(y, y)
    if (nx == 0 || ny == 0) 0.0 else d / math.sqrt(nx * ny)
  }

  test("dot / cosine / euclidean on float arrays match reference math") {
    val df = Seq((a, b)).toDF("x", "y")
    val row = df.select(
      VectorFunctions.dotProduct($"x", $"y"),
      VectorFunctions.cosineSimilarity($"x", $"y"),
      VectorFunctions.euclideanDistance($"x", $"y")).head
    assert(row.getDouble(0) == refDot(a, b))
    assert(math.abs(row.getDouble(1) - refCos(a, b)) < 1e-12)
    val l2 = math.sqrt(a.zip(b).map { case (p, q) => val d = p - q; d.toDouble * d }.sum)
    assert(math.abs(row.getDouble(2) - l2) < 1e-12)
  }

  test("double-array literal query side (mixed float/double children)") {
    val df = Seq(Tuple1(a)).toDF("x")
    val q = lit(b.map(_.toDouble))
    val got = df.select(VectorFunctions.cosineSimilarity($"x", q)).head.getDouble(0)
    assert(math.abs(got - refCos(a, b)) < 1e-12)
  }

  test("zero vector -> cosine 0.0, null -> null") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("x", "y")
    assert(df.select(VectorFunctions.cosineSimilarity($"x", $"y")).head.getDouble(0) == 0.0)
    val withNull = Seq((null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("x", "y")
    assert(withNull.select(VectorFunctions.cosineSimilarity($"x", $"y")).head.isNullAt(0))
  }

  test("l2_normalize produces unit vectors; zero vector unchanged") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0.0f, 0.0f))).toDF("x")
    val rows = df.select(VectorFunctions.l2Normalize($"x").as("n")).collect()
    val n0 = rows(0).getSeq[Float](0)
    assert(math.abs(n0(0) - 0.6f) < 1e-6 && math.abs(n0(1) - 0.8f) < 1e-6)
    assert(rows(1).getSeq[Float](0) == Seq(0.0f, 0.0f))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))").head.getDouble(0)
    assert(got == 1.0)
  }

  test("LshBucket expression == scala lshBucket for random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 50L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val got = df.select($"id",
        graft.ops.SimilaritySearch.lshBucketColumn($"v", 16, 8).as("b"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (i, v) =>
      val expect = graft.ops.SimilaritySearch.lshBucket(v.map(_.toDouble), 8)
      assert(got(i) == expect, s"bucket mismatch for id=$i")
    }
  }

  test("sorted_intersect_count == size(array_intersect) on sorted sets") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 40).map { i =>
      val x = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val y = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (i, x, y)
    }
    val df = rows.toDF("id", "x", "y")
    val got = df.select($"id",
        graft.functions.ArrayFunctions.sortedIntersectCount($"x", $"y").as("c"),
        size(array_intersect($"x", $"y")).cast("long").as("ref"))
      .as[(Int, Long, Long)].collect()
    got.foreach { case (id, c, ref) => assert(c == ref, s"mismatch at id=$id") }
  }

  test("expressions stay inside WholeStageCodegen (scan hot path)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // the real shape: vectors scanned from parquet, scored in-plan
    val dir = java.nio.file.Files.createTempDirectory("graft-codegen").toString
    val rnd = new scala.util.Random(1)
    (1 to 256).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
      .toDF("id", "vector").write.mode("overwrite").parquet(dir)
    val q = lit(Array.fill(16)(0.25))
    val df = spark.read.parquet(dir)
      .select(VectorFunctions.cosineSimilarity($"vector", q).as("c"))
    val inCodegen = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains("cosinesimilarity") => w
    }
    assert(inCodegen.nonEmpty,
      s"cosine not inside a codegen span:\n${df.queryExecution.executedPlan}")
    assert(df.agg(sum($"c")).head.getDouble(0) > 0.0) // executes the codegen path
  }
}
