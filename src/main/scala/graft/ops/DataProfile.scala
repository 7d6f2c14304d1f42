package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset profiling and constraint validation — the data-quality gate
  * a pipeline runs before committing a table to a training run (the
  * published Deequ/TFDV pattern: profile once, assert declaratively).
  *
  * Scale shape: ONE pass — every per-column statistic is a
  * partial-aggregating expression in a single `agg`, so profiling a
  * 100 TB table costs one scan regardless of how many columns/checks
  * ride along; `approx_count_distinct` keeps distinct estimation
  * sketch-sized. Constraint checks reuse the same single-scan
  * aggregate form (a violation COUNT per rule, never a row dump — the
  * violating-row sample is a separate bounded query when needed). */
object DataProfile {

  /** One profile row per requested column: nulls, distincts (HLL
    * estimate by default, exact via `exactDistinct = true`), min/max
    * (numeric and string both — rendered as strings for a uniform
    * schema), and for numerics the mean in exact integer micro-units
    * (order-independent across partitionings, the repo convention).
    *
    * The HLL default is the at-scale shape: multiple EXACT distincts
    * in one agg pay Spark's Expand — one duplicated scan pass per
    * distinct column (probed 4.16 s exact vs 1.39 s HLL on the sf0.1
    * profile, and the tax grows linearly in profiled columns), while
    * `approx_count_distinct` keeps the whole profile a single
    * partial-agg scan however many columns ride along.
    *
    * The exact form remains for oracle replay (the `schema_profile`
    * query pins it) — but NOT via the multi-distinct Expand: each
    * exact distinct runs as its OWN single-distinct aggregation
    * (Spark rewrites a lone countDistinct into a partial-distinct
    * two-stage, so the map side dedups before the exchange) over a
    * column-pruned scan of just that column, cross-joined back onto
    * the base profile row. p columns = p+1 pruned scans instead of
    * one scan Expanded p+1-fold through a full-row shuffle — measured
    * 121.7 → ~8 s on the 15M-row sf10 profile, identical counts. */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"),
        // Exact integer micro sum as a TWO-LONG decomposition:
        // lo = micro % 1e9, hi = (micro − lo) / 1e9 per row, each
        // summed as a plain codegen'd long; the total reconstructs in
        // decimal(38,0) on the (columns-sized) OUTPUT row only. This
        // replaces the previous per-row decimal(28,0) sum — one
        // BigDecimal allocation per (row, column), measured as 43 of
        // schema_profile's 50 s at sf10 — with primitive arithmetic,
        // same integer total, same mean to the bit.
        // Envelopes (all ANSI-loud, never silent): round(col·1e6) is
        // exact while |value| ≤ ~9.0e9 (the 2^53 micro range — r10
        // ADVICE; feed decimal sources beyond it); the hi/lo long
        // sums overflow-throw past ~9·10^9 rows (lo < 1e9 each) /
        // ~10^12 rows (hi ≤ 9e6 each) per profiled table.
        // Deterministic: integer addition in any order; the downstream
        // double division rounds the same integer value identically.
        (if (isNum) {
          val L = round(col(c).cast("double") * 1000000).cast("long")
          sum(L % lit(1000000000L))
        } else lit(null).cast("long")).as(s"__mlo_$c"),
        (if (isNum) {
          val L = round(col(c).cast("double") * 1000000).cast("long")
          val lo = L % lit(1000000000L)
          sum(((L - lo) / lit(1000000000L)).cast("long"))
        } else lit(null).cast("long")).as(s"__mhi_$c"))
    }
    val ndAggs: Seq[Column] =
      if (exactDistinct) Nil
      else cols.map(c => approx_count_distinct(col(c), rsd = 0.02).as(s"__nd_$c"))
    val allAggs = aggs ++ ndAggs
    val base = df.agg(allAggs.head, allAggs.tail: _*)
    val row =
      if (exactDistinct)
        cols.foldLeft(base) { (r, c) =>
          r.crossJoin(df.select(col(c))
            .agg(countDistinct(col(c)).as(s"__nd_$c")))
        }
      else base
    val perCol = cols.map { c =>
      // exact reconstruction hi·1e9 + lo in decimal(38,0) — one
      // decimal op per OUTPUT row, not per input row
      val micro = col(s"__mhi_$c").cast("decimal(38,0)") *
        lit(1000000000L) + col(s"__mlo_$c")
      struct(lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        when(col(s"__mlo_$c").isNotNull && col(s"__n_$c") > col(s"__nulls_$c"),
          round(micro.cast("double") / 1e6 /
            (col(s"__n_$c") - col(s"__nulls_$c")).cast("double"), 6))
          .as("mean"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Declarative row-level constraint. `predicate` must be TRUE for a
    * conforming row; violations are counted, never collected. */
  final case class Check(name: String, predicate: Column)

  /** Pearson correlation matrix of numeric columns in ONE pass — the
    * multivariate face of [[profile]], via the exact-integer gram
    * aggregate ([[graft.functions.GramMatrix]]): each row contributes
    * its scaled column vector to one bounded buffer per partition, so
    * p columns cost p(p+1)/2 longs of shuffle, not p² scans (Spark's
    * own `corr` is one pass PER PAIR). Correlation is scale-invariant,
    * so each column ships with a fixed `scale` divisor that brings its
    * range near the unit ball — the micro-unit gram needs |x| ≲ 1 for
    * overflow headroom (scaladoc on GramBuffer) and the divisor drops
    * out of the ratio. Deterministic: integer moments are
    * partition-order invariant; output rounds 6 dp. Zero-variance
    * columns yield null correlations. */
  def correlationMatrix(df: DataFrame,
      cols: Seq[(String, Double)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val d = cols.size
    val vec = array(cols.map { case (c, s) =>
      (col(c).cast("double") / lit(s)) }: _*)
    // sharded exact moments: one shard (bit-identical to the plain
    // aggregate) until ~4M rows, then content-hash shards + BigInt
    // combine — sf10's 60M-row lineitem overflowed the single long
    // buffer's documented ~9.2M-row envelope (loudly, by design)
    val (n, sArr, g) = graft.functions.GramFunctions.momentsSharded(df, vec, d)
    require(n > 1, s"correlation needs at least 2 rows, got $n")
    val mean = sArr.map(_.toDouble / 1e6 / n)
    def gIdx(i: Int, j: Int): Int = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      a * d - a * (a - 1) / 2 + (b - a)
    }
    def cov(i: Int, j: Int): Double =
      g(gIdx(i, j)).toDouble / 1e12 / n - mean(i) * mean(j)
    val out = for {
      i <- 0 until d
      j <- (i + 1) until d
    } yield {
      val vi = cov(i, i)
      val vj = cov(j, j)
      // variance below the micro-unit quantization floor (~1e-12) is
      // indistinguishable from zero in this representation — and a
      // 1-ulp positive residue from E[x²]−E[x]² must not divide
      val r: java.lang.Double =
        if (vi <= 1e-12 || vj <= 1e-12) null
        else BigDecimal(cov(i, j) / math.sqrt(vi * vj))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cols(i)._1, cols(j)._1, r)
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("col_a", "col_b", "corr")
  }

  def notNull(c: String): Check = Check(s"not_null($c)", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      col(c).isNotNull && col(c) >= lo && col(c) <= hi)
  def matches(c: String, regex: String): Check =
    Check(s"matches($c)", col(c).isNotNull && col(c).rlike(regex))
  def oneOf(c: String, values: Seq[String]): Check =
    Check(s"one_of($c)", col(c).isin(values: _*))

  /** Run all checks in ONE scan: a row per check with its violation
    * count and pass flag. Uniqueness checks need a keyed aggregate,
    * not a row predicate — [[checkUnique]] below. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val aggs = checks.zipWithIndex.map { case (ck, i) =>
      sum(when(ck.predicate, 0L).otherwise(1L)).as(s"__v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCheck = checks.zipWithIndex.map { case (ck, i) =>
      struct(lit(ck.name).as("check"),
        col(s"__v_$i").as("n_violations"),
        (col(s"__v_$i") === 0L).as("passed"))
    }
    row.select(explode(array(perCheck: _*)).as("c")).select(col("c.*"))
  }

  /** Persisted validation report for continuous monitoring: per-check
    * cumulative violation and row counts, merged trigger by trigger
    * (exact long sums — mergeable by construction), batch-id fenced
    * like every maintained summary in the engine. */
  def mergeReport(path: java.nio.file.Path, batch: DataFrame,
      checks: Seq[Check], batchId: Long): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val (prevCounts, prevRows, fence) =
      if (!java.nio.file.Files.exists(path)) (Map.empty[String, Long], 0L, -1L)
      else {
        val node = mapper.readTree(java.nio.file.Files.readAllBytes(path))
        val cs = node.get("checks")
        val m = checks.map(_.name).flatMap { n =>
          Option(cs.get(n)).map(n -> _.asLong())
        }.toMap
        (m, node.get("n_rows").asLong(), node.get("last_batch_id").asLong())
      }
    if (batchId <= fence) return
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (ck, i) =>
        sum(when(ck.predicate, 0L).otherwise(1L)).as(s"__v_$i")
      }
    val row = batch.agg(aggs.head, aggs.tail: _*).head()
    val root = mapper.createObjectNode()
    root.put("n_rows", prevRows + row.getLong(0))
    root.put("last_batch_id", batchId)
    val cs = root.putObject("checks")
    checks.zipWithIndex.foreach { case (ck, i) =>
      cs.put(ck.name, prevCounts.getOrElse(ck.name, 0L) + row.getLong(1 + i))
    }
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Key-uniqueness check: one keyed partial-agg count, violations =
    * rows beyond the first per duplicate key (so 0 ⇔ unique). */
  def checkUnique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "checkUnique needs key columns")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(s"unique(${keyCols.mkString(",")})").as("check"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
  }
}
