package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (WordPiece-style encode)
  * against a literal piece vocabulary, as ONE fused codegen expression —
  * the tokenizer-application step of a training-data pipeline, without
  * per-word UDF dispatch or any intermediate token arrays.
  *
  * Semantics (pinned by GreedyPieceEncodeSpec and the t33 recursive-CTE
  * oracle): within each space-delimited word, repeatedly take the
  * LONGEST vocabulary piece (length >= 2) matching at the cursor, else
  * fall back to a single character; pieces are joined by '|' inside a
  * word and words by ' ', reproducing the input's word structure.
  *
  * The vocabulary compiles once into a character trie held as a codegen
  * reference object; matching is a single forward trie walk per cursor
  * position (no substring allocation, no per-length hash probes), so the
  * whole encode stays inside whole-stage codegen as a narrow projection —
  * the 100 TB path is scan → encode → downstream, shuffle-free.
  */
case class GreedyPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(p =>
    p.length >= 2 && p.forall(c => c > ' ' && c < 127)),
    "vocab pieces must be printable ASCII, no spaces, length >= 2")

  override def dataType: DataType = StringType
  override def prettyName: String = "greedy_piece_encode"

  @transient private lazy val trie: PieceTrie = PieceTrie.build(vocab)

  override def nullSafeEval(text: Any): Any =
    PieceTrie.encode(text.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("pieceTrie", trie, classOf[PieceTrie].getName)
    val kernel = PieceTrie.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.encode($c, $trieRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GreedyPieceEncode {
  def apply(text: Column, vocab: Seq[String]): Column =
    GraftShims.column(GreedyPieceEncode(GraftShims.expression(text), vocab))
}

/** ASCII character trie over the piece vocabulary. Children are direct
  * arrays indexed by char (vocab is printable ASCII by construction), so
  * a walk is branch + array-load per character.
  */
final class PieceTrie extends Serializable {
  val children = new Array[PieceTrie](128)
  var terminal = false
}

object PieceTrie {
  def build(vocab: Seq[String]): PieceTrie = {
    val root = new PieceTrie
    vocab.foreach { p =>
      var n = root
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i).toInt
        if (n.children(c) == null) n.children(c) = new PieceTrie
        n = n.children(c)
        i += 1
      }
      n.terminal = true
    }
    root
  }

  /** Shared by interpreted eval and generated code. Non-ASCII characters
    * never match the (ASCII) trie and fall back to a one-CHARACTER piece
    * (code point, not byte), matching the oracle's char-based substring.
    */
  def encode(text: UTF8String, trie: PieceTrie): UTF8String = {
    val s = text.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(len * 2)
    var i = 0
    var firstPieceInWord = true
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') {
        sb.append(' ')
        firstPieceInWord = true
        i += 1
      } else {
        // longest trie match at i (pieces never contain ' ', so the walk
        // cannot cross a word boundary)
        var node = trie
        var k = 0
        var best = 0
        var done = false
        while (!done && i + k < len) {
          val ch = s.charAt(i + k).toInt
          val next = if (ch < 128) node.children(ch) else null
          if (next == null) done = true
          else {
            node = next
            k += 1
            if (node.terminal) best = k
          }
        }
        val pieceLen =
          if (best >= 2) best
          else if (Character.isHighSurrogate(s.charAt(i)) && i + 1 < len) 2
          else 1
        if (!firstPieceInWord) sb.append('|')
        sb.append(s, i, i + pieceLen)
        firstPieceInWord = false
        i += pieceLen
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
