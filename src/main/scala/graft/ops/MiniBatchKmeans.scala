package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Mini-batch k-means maintenance (Sculley 2010, "Web-Scale K-Means
  * Clustering") — the streaming counterpart of [[Clustering.kmeans]]:
  * each arriving batch updates the persisted centroids by the
  * per-center running mean
  *
  *   c_j ← (c_j·n_j + Σ_{x∈batch_j} x) / (n_j + m_j),  n_j += m_j
  *
  * which is exactly Sculley's per-center learning rate η = 1/n_j
  * applied batch-wise. Clusters keep improving as data streams in
  * with O(k·dim) state and ONE assignment pass + ONE partial-agg
  * shuffle per batch — no iteration over history.
  *
  * Determinism: vector components are micro-unit rounded on read, so
  * per-cluster sums are exact LONG sums (order-independent across
  * partitionings — the repo's integer micro-unit convention) and the
  * running-mean division is a pure function of exact integers. The
  * state file records the last applied stream batch id, so a replayed
  * foreachBatch trigger (at-least-once delivery) is a no-op — same
  * fence discipline as the snapshot log.
  *
  * Initialization: first batch seeds centroids from its k lowest-id
  * vectors (the [[Clustering.kmeans]] seeding rule). */
object MiniBatchKmeans {

  private val mapper = new ObjectMapper()

  /** Persisted state: micro-unit centroid components, per-centroid
    * observation counts, replay fence. */
  final case class State(centroidsMicro: Vector[Vector[Long]],
      counts: Vector[Long], lastBatchId: Long) {
    def k: Int = centroidsMicro.size
    def centroids: Vector[Vector[Double]] =
      centroidsMicro.map(_.map(_ / 1e6))
  }

  def read(path: Path): Option[State] = {
    if (!Files.exists(path)) return None
    val node = mapper.readTree(Files.readAllBytes(path))
    val cents = node.get("centroids").elements().asScala
      .map(c => c.elements().asScala.map(_.asLong()).toVector).toVector
    val counts = node.get("counts").elements().asScala.map(_.asLong()).toVector
    Some(State(cents, counts, node.get("last_batch_id").asLong()))
  }

  def write(path: Path, s: State): Unit = {
    val root = mapper.createObjectNode()
    val ca = root.putArray("centroids")
    s.centroidsMicro.foreach { c =>
      val row = ca.addArray(); c.foreach(row.add)
    }
    val na = root.putArray("counts")
    s.counts.foreach(na.add)
    root.put("last_batch_id", s.lastBatchId)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The pure update rule — exact integers in, exact integers out.
    * `batchStats`: per cluster index, (m_j, per-dim micro sums). */
  def updateState(s: State, batchStats: Map[Int, (Long, Vector[Long])],
      batchId: Long): State = {
    val cents = s.centroidsMicro.zipWithIndex.map { case (c, j) =>
      batchStats.get(j) match {
        case None => c
        case Some((m, sums)) =>
          val n = s.counts(j)
          c.indices.toVector.map { d =>
            // (c_d·n + sum_d) / (n + m): exact rational, half-up —
            // BigInt/BigDecimal so c·n cannot overflow at any n
            val num = BigInt(c(d)) * n + sums(d)
            (BigDecimal(num) / BigDecimal(n + m))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
          }
      }
    }
    val counts = s.counts.zipWithIndex.map { case (n, j) =>
      n + batchStats.get(j).map(_._1).getOrElse(0L)
    }
    State(cents, counts, batchId)
  }

  /** Process one micro-batch against the state at `statePath`:
    * initialize on first contact, assign + partial-agg + running-mean
    * update otherwise, skip batches at or below the replay fence. */
  def processBatch(batch: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, statePath: Path, batchId: Long): Unit = {
    val prev = read(statePath)
    if (prev.exists(_.lastBatchId >= batchId)) return // replayed trigger
    val mv = batch.select(col(idCol).as("__id"),
      expr(s"transform(cast($vecCol AS array<double>), x -> cast(round(x * 1000000) AS bigint))")
        .as("__mv"))
    val state0 = prev.getOrElse {
      val seeds = mv.orderBy(col("__id").asc).limit(k).collect()
        .map(_.getSeq[Long](1).toVector).toVector
      require(seeds.size == k,
        s"first mini-batch must carry >= k vectors to seed (got ${seeds.size} < $k)")
      State(seeds, Vector.fill(k)(0L), -1L)
    }
    val cands = state0.centroids.zipWithIndex.map { case (c, j) =>
      struct(VectorFunctions.euclideanDistance(
        expr("transform(__mv, m -> m / 1e6)"),
        array(c.map(lit): _*)).as("d"), lit(j).as("cl"))
    }
    val sumCols = (0 until dim).map(i => sum(col("__mv")(i)).as(s"s$i"))
    val stats = mv.withColumn("__cl", least(cands: _*).getField("cl"))
      .groupBy(col("__cl"))
      .agg(count(lit(1)).as("m"), sumCols: _*)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        (0 until dim).map(i => r.getLong(2 + i)).toVector)))
      .toMap
    write(statePath, updateState(state0, stats, batchId))
  }
}
