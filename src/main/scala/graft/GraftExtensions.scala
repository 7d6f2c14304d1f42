package graft

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance, L2Normalize, LshBucket, SortedLongIntersectCount, TopKHits}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: registers every graft expression and
  * aggregate as a SQL function at session build time, so a cluster can
  * enable the whole engine surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver code
  * required. (The per-session `VectorFunctions.register` remains for
  * programmatic use on an existing session.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def inject(e: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name),
      (es: Seq[Expression]) => builder(es)))

  override def apply(e: SparkSessionExtensions): Unit = {
    // window-top-k → bounded heap aggregate (see TopKWindowRewrite)
    e.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    inject(e, "dot_product", es => DotProduct(es(0), es(1)))
    inject(e, "cosine_similarity", es => CosineSimilarity(es(0), es(1)))
    inject(e, "euclidean_distance", es => EuclideanDistance(es(0), es(1)))
    inject(e, "l2_normalize", es => L2Normalize(es(0)))
    inject(e, "sorted_intersect_count", es => SortedLongIntersectCount(es(0), es(1)))
    inject(e, "lsh_bucket", es => LshBucket(es(0),
      es(1).eval().asInstanceOf[Number].intValue()))
    // implicit casts: SQL callers may pass float scores / int ids
    inject(e, "top_k_hits", es => TopKHits(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.LongType),
      es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "misra_gries", es => graft.functions.MisraGries(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.StringType),
      es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "quantile_sketch", es => graft.functions.QuantileSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.DoubleType),
      es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    // pattern list = a foldable array literal (array('a','b',...)):
    // evaluated once at plan time, so SQL callers get the same
    // per-executor cached automaton as the programmatic API
    def patterns(p: Expression): Seq[String] = {
      val arr = p.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until arr.numElements()).map(i =>
        arr.getUTF8String(i).toString)
    }
    inject(e, "multi_match_total", es =>
      graft.functions.MultiMatchTotal(es(0), patterns(es(1))))
    inject(e, "multi_match_counts", es =>
      graft.functions.MultiMatchCounts(es(0), patterns(es(1))))
    inject(e, "count_min", es => graft.functions.CountMinAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.StringType),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "gram_matrix", es => graft.functions.GramMatrix(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "bloom_sketch", es => graft.functions.BloomSketch(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.StringType),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "kmv_sketch", es => graft.functions.KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.StringType),
      es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
    inject(e, "nfc_normalize", es => graft.functions.NfcNormalize(es(0)))
    inject(e, "fix_mojibake", es => graft.functions.FixMojibake(es(0)))
    inject(e, "deflate_length", es => graft.functions.DeflateLength(es(0),
      if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue() else -1))
    // graft_search(db, query[, k, threshold, term, types]) — the full
    // O2→O4→P4-P6 search chain as a TABLE-VALUED function: a pure-SQL
    // session (`--conf spark.sql.extensions=graft.GraftExtensions`)
    // runs the same plan VectorSearch.search builds, no driver code.
    // Arguments are foldable literals, evaluated once at analysis time
    // (the same contract as the pattern lists above).
    e.injectTableFunction((FunctionIdentifier("graft_search"),
      info("graft_search"),
      (es: Seq[Expression]) => {
        // a SQL NULL argument means "omitted" — same default as the
        // programmatic SearchOptions field (keyword/type predicates
        // already treat null/empty as a no-op; a null k or threshold
        // falls back to the config.py defaults), never an NPE
        def str(i: Int, dflt: String): String =
          if (es.length > i) Option(es(i).eval()).map(_.toString).getOrElse(dflt)
          else dflt
        // SQL numeric literals arrive as Decimal (0.4), Integer (6) or
        // Double (0.4D) — normalize all three
        def num(i: Int, dflt: Double): Double =
          if (es.length <= i) dflt
          else es(i).eval() match {
            case null => dflt
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number => n.doubleValue()
            case other => other.toString.toDouble
          }
        val opts = graft.search.SearchOptions(
          k = num(2, graft.search.SearchOptions.DefaultK.toDouble).toInt,
          scoreThreshold = num(3, graft.search.SearchOptions.DefaultThreshold),
          searchTerm = str(4, ""),
          documentTypes = str(5, ""))
        // db path and query text have no sensible default: NULL is a
        // caller bug and gets a named error at analysis time
        def reqStr(i: Int, what: String): String = {
          val v = es(i).eval()
          require(v != null, s"graft_search: $what must not be NULL")
          v.toString
        }
        graft.search.VectorSearch.searchSql(
          org.apache.spark.sql.SparkSession.active,
          reqStr(0, "db path"), reqStr(1, "query text"), opts)
          .queryExecution.logical
      }))
  }
}
