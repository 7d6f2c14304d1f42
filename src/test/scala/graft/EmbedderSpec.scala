package graft

import graft.embed.{DeterministicBatchedEmbedder, DeterministicEmbedder}
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("batched mapPartitions embedder == expression embedder, bit for bit") {
    val df = Seq((1L, "hello world"), (2L, "spark vector search"), (3L, " "),
      (4L, "a"), (5L, "the quick brown fox")).toDF("id", "text")
    val expr = DeterministicEmbedder(dim = 16).embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    val batched = DeterministicBatchedEmbedder(dim = 16, batchSize = 2).embed(df, "text")
      .select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(expr.keySet == batched.keySet)
    expr.foreach { case (id, v) =>
      assert(v.sameElements(batched(id)), s"vector mismatch for id=$id")
    }
  }

  test("batched embedder: batch sizing doesn't change results; schema appended") {
    val df = (1 to 37).map(i => (i.toLong, s"document number $i")).toDF("id", "text")
      .repartition(3)
    val a = DeterministicBatchedEmbedder(dim = 8, batchSize = 4).embed(df, "text")
    val b = DeterministicBatchedEmbedder(dim = 8, batchSize = 100).embed(df, "text")
    assert(a.schema.fieldNames.toSeq == Seq("id", "text", "vector"))
    val av = a.select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    val bv = b.select($"id", $"vector").as[(Long, Array[Float])].collect().toMap
    assert(av.size == 37)
    av.foreach { case (id, v) => assert(v.sameElements(bv(id))) }
    // vectors are L2-normalized
    av.values.foreach { v =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    }
  }

  test("query embedding matches document embedding of the same text") {
    val e = DeterministicBatchedEmbedder(dim = 8)
    val viaQuery = e.embedQuery(spark, "some text")
    val viaBatch = e.encodeBatch(Seq("some text")).head
    assert(viaQuery.sameElements(viaBatch))
  }
}
