package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators — the 100 TB training-data-pipeline
  * extensions (SURVEY.md §2.3 extension surface, §7.1 module 7). The
  * reference only has content-hash identity (document_processor.py:42-50,
  * used as the file natural key); everything past exactDedup is the
  * standard large-corpus dedup ladder: exact hash → n-gram Jaccard →
  * MinHash+LSH → embedding cosine.
  *
  * Scale notes, operator by operator:
  *  - exact: one hash-shuffle on sha256; partial agg map-side.
  *  - shingles: explode is map-side only (no shuffle); `maxDocFreq`
  *    caps stop-shingle posting lists, which is what keeps the
  *    candidate self-join from exploding on 100 TB (frequency cap =
  *    standard posting-list pruning).
  *  - minhash/LSH: signatures are one groupBy(doc, seed); banding turns
  *    the all-pairs problem into equality buckets — the join is on
  *    (band, key), never all-pairs.
  *  - embedding near-dup: brute-force pairs only for small candidate
  *    sets; at scale feed LSH/IVF buckets in as `candidates`.
  */
object Dedup {

  /** Exact dedup by content hash: keep the lowest-id row per distinct
    * text (deterministic winner), drop the rest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Distinct character n-gram shingles per document:
    * (id, shingle) rows. Windows start at 1..max(len-n+1, 1), so every
    * non-empty doc has ≥1 shingle (the final one may be short). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        explode(expr(s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substring($textCol, i, $n))"))
          .as("shingle"))
      .distinct()

  /** Drop shingles occurring in more than `maxDocFreq` docs (posting-list
    * pruning; 0 disables). */
  private def pruneByDf(sh: DataFrame, maxDocFreq: Int): DataFrame =
    if (maxDocFreq <= 0) sh
    else {
      val hot = sh.groupBy("shingle").agg(count("*").as("df"))
        .filter(col("df") > maxDocFreq).select("shingle")
      sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }

  /** All pairs (a < b) with n-gram Jaccard similarity ≥ threshold.
    * Jaccard from set sizes: |A∩B| via the shingle self-join,
    * |A∪B| = |A| + |B| − |A∩B|. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Int = 0): DataFrame = {
    val sh = pruneByDf(shingles(df, idCol, textCol, n), maxDocFreq)
    val sizes = sh.groupBy("sid").agg(count("*").as("sz"))
    val inter = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
      .filter(col("a.sid") < col("b.sid"))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count("*").as("inter"))
    inter
      .join(broadcast(sizes.select(col("sid").as("id_a"), col("sz").as("sz_a"))), "id_a")
      .join(broadcast(sizes.select(col("sid").as("id_b"), col("sz").as("sz_b"))), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: for each seed 0..numHashes-1 the minimum of
    * md5(seed || ':' || shingle) — lexicographic min over hex strings is
    * a valid min-wise hash and is reproducible in any engine with md5
    * (the oracle replays it verbatim in SQL). Output: (sid, seed, mh). */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.select(col("sid"),
        explode(expr(s"sequence(0, ${numHashes - 1})")).as("seed"), col("shingle"))
      .groupBy("sid", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle")))).as("mh"))

  /** LSH banding: group the signature into bands of `rowsPerBand` seeds;
    * band key = ordered concat of the band's min-hashes. Docs sharing
    * any (band, key) are candidate near-duplicates. */
  def lshBandKeys(signatures: DataFrame, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("sid", "band")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          s => s.getField("mh"))).as("band_key"))

  /** Candidate pairs (a < b) from LSH banding over character n-grams. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, maxDocFreq: Int = 0): DataFrame = {
    val sh = pruneByDf(shingles(df, idCol, textCol, n), maxDocFreq)
    val bands = lshBandKeys(minhashSignatures(sh, numHashes), rowsPerBand)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .distinct()
  }

  /** SimHash: 64-bit fingerprint from per-shingle xxhash64 bit votes;
    * near-dups = fingerprints within `maxHammingDistance`. JVM-hash
    * based (no SQL oracle — verified by property tests instead). */
  def simhash(sh: DataFrame): DataFrame = {
    val h = xxhash64(col("shingle"))
    val bitVotes = (0 until 64).map { b =>
      sum(when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val votes = sh.groupBy("sid").agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("sid"), fp.as("simhash"))
  }

  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, n: Int,
      maxHammingDistance: Int): DataFrame = {
    val fps = simhash(shingles(df, idCol, textCol, n))
    // block on 4×16-bit chunks: pairs within distance d ≤ 3 share at
    // least one exact 16-bit chunk (pigeonhole) — avoids all-pairs
    val chunks = fps.select(col("sid"), col("simhash"),
      explode(expr("sequence(0, 3)")).as("ci"))
      .withColumn("chunk", expr("shiftright(simhash, ci * 16)").bitwiseAND(lit(0xFFFFL)))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHammingDistance)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * All-pairs within `df` — intended for candidate sets / small-to-mid
    * tables; for 100 TB pre-bucket with LSH and pass buckets here. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= lit(threshold))
      .select("id_a", "id_b", "cosine")
  }
}
