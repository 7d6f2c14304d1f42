package graft.embed

/** HuggingFace-BERT-compatible WordPiece tokenizer, pure JVM.
  *
  * The reference embeds with SentenceTransformer models whose first
  * stage is exactly this tokenizer (embedding_models.py:54-131 loads
  * BERT-family models; their `vocab.txt` + BasicTokenizer + WordPiece
  * contract is what produces the input_ids the model was trained on).
  * A hash-vocab stand-in produces ids outside the model's vocabulary —
  * syntactically valid, semantically garbage — so this class implements
  * the real thing:
  *
  *  1. basic tokenization: control-char cleanup, CJK char isolation,
  *     whitespace split, optional lowercase + accent strip (NFD, drop
  *     combining marks), punctuation split;
  *  2. WordPiece: per word, greedy LONGEST-match-first against the
  *     vocab, continuation pieces prefixed `##`; if any position has no
  *     match the WHOLE word becomes one `[UNK]` (not just the tail);
  *     words longer than `maxInputCharsPerWord` are `[UNK]` outright;
  *  3. encode: `[CLS] pieces [SEP]`, pieces truncated to `maxLen - 2`;
  *     `[PAD]` (id 0 in BERT vocab files) is applied by the batcher,
  *     not here.
  *
  * Vocab ids are the line numbers of the model's `vocab.txt` (the HF
  * file contract: one token per line, id = 0-based line index).
  * Deterministic and side-effect free — safe inside any Spark closure.
  */
final class WordPieceTokenizer(
    val vocab: Map[String, Int],
    val lowercase: Boolean = true,
    val maxInputCharsPerWord: Int = 100,
    val unkToken: String = "[UNK]",
    val clsToken: String = "[CLS]",
    val sepToken: String = "[SEP]",
    val padToken: String = "[PAD]") extends Serializable {

  require(vocab.contains(unkToken) && vocab.contains(clsToken) &&
    vocab.contains(sepToken) && vocab.contains(padToken),
    s"vocab must contain $unkToken/$clsToken/$sepToken/$padToken")
  val unkId: Int = vocab(unkToken)
  val clsId: Int = vocab(clsToken)
  val sepId: Int = vocab(sepToken)
  val padId: Int = vocab(padToken)

  private def isPunctuation(c: Char): Boolean = {
    val cp = c.toInt
    // BERT treats all non-letter/digit ASCII as punctuation (including
    // $, +, ~ which Unicode classifies as symbols), plus category P*
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
        val t = Character.getType(c)
        t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION ||
        t == Character.OTHER_PUNCTUATION
      }
  }

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def isWhitespaceChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      Character.getType(c) == Character.SPACE_SEPARATOR

  private def isControlChar(c: Char): Boolean =
    c != '\t' && c != '\n' && c != '\r' && {
      val t = Character.getType(c)
      t == Character.CONTROL || t == Character.FORMAT
    }

  /** Steps 1-2 of BasicTokenizer: cleanup + CJK isolation + whitespace
    * split + per-word lowercase/accent-strip + punctuation split. */
  def basicTokenize(text: String): Seq[String] = {
    val cleaned = new StringBuilder(text.length)
    text.foreach { c =>
      if (c.toInt == 0 || c == '�' || isControlChar(c)) ()
      else if (isWhitespaceChar(c)) cleaned.append(' ')
      else if (isCjk(c.toInt)) { cleaned.append(' '); cleaned.append(c); cleaned.append(' ') }
      else cleaned.append(c)
    }
    cleaned.toString.split(' ').iterator.filter(_.nonEmpty).flatMap { w0 =>
      val w =
        if (!lowercase) w0
        else java.text.Normalizer.normalize(w0.toLowerCase, java.text.Normalizer.Form.NFD)
          .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
      // split on punctuation: each punct char is its own token
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      w.foreach { c =>
        if (isPunctuation(c)) {
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
          out += c.toString
        } else cur.append(c)
      }
      if (cur.nonEmpty) out += cur.toString
      out
    }.toSeq
  }

  /** Greedy longest-match-first WordPiece of one basic token. */
  def wordpiece(word: String): Seq[Int] = {
    if (word.length > maxInputCharsPerWord) return Seq(unkId)
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found = -1
      while (end > start && found < 0) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        vocab.get(sub) match {
          case Some(id) => found = id
          case None => end -= 1
        }
      }
      if (found < 0) return Seq(unkId) // any unmatched position UNKs the whole word
      pieces += found
      start = end
    }
    pieces.toSeq
  }

  /** Piece ids of the text body (no special tokens, no truncation). */
  def tokenize(text: String): Seq[Int] = basicTokenize(text).flatMap(wordpiece)

  /** Model input ids: `[CLS] pieces [SEP]`, pieces truncated to
    * `maxLen - 2`. Unpadded — the device batcher right-pads with
    * `[PAD]` and builds the attention mask. */
  def encode(text: String, maxLen: Int): Array[Long] = {
    require(maxLen >= 2, s"maxLen $maxLen cannot fit [CLS]+[SEP]")
    val body = tokenize(text).take(maxLen - 2)
    val out = new Array[Long](body.length + 2)
    out(0) = clsId.toLong
    var i = 0
    while (i < body.length) { out(i + 1) = body(i).toLong; i += 1 }
    out(out.length - 1) = sepId.toLong
    out
  }
}

object WordPieceTokenizer {
  /** Build from vocab lines: id = 0-based line index (the `vocab.txt`
    * file contract). Later duplicates win, matching HF's dict build. */
  def fromLines(lines: Seq[String], lowercase: Boolean = true): WordPieceTokenizer =
    new WordPieceTokenizer(lines.iterator.zipWithIndex.map { case (t, i) => (t, i) }.toMap,
      lowercase = lowercase)

  /** Load a model directory's `vocab.txt` (UTF-8, one token per line). */
  def fromFile(path: String, lowercase: Boolean = true): WordPieceTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromLines(src.getLines().toSeq, lowercase) finally src.close()
  }
}
