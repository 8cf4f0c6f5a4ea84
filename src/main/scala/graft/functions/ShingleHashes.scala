package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hashing: tokenize (trim → lowercase → split on \s+), slide
  * an n-token window, FNV-1a-64 each window's space-joined string, and return
  * the DISTINCT hashes — the whole dedup-family shingle pass as one codegen'd
  * expression.
  *
  * Replaces the typed flatMap in `Dedup.shingleIndexHashed`: the typed pass
  * was itself the fix for the Column form's triple regex-split inlining, but
  * it pays an InternalRow→Scala→InternalRow serialization boundary per doc;
  * this expression runs inside WholeStageCodegen (one static call per row,
  * like [[DotProduct]]) and never leaves Tungsten. The FNV stream equals
  * `fnv64(g.mkString(" "))` char for char — hashes, and therefore every
  * downstream join/aggregate and oracle, are unchanged. Per-doc dedup is
  * sort+unique over the window hashes (the typed path's `.distinct`); the
  * emitted ORDER differs (sorted vs first-occurrence) which no consumer
  * observes — the index is set-semantic (joins, counts, column-wise mins). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Empty = new GenericArrayData(Array.empty[Long])

  /** Static so generated code calls it directly. */
  def compute(t: UTF8String, n: Int): ArrayData = {
    val toks = t.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val m = toks.length - n + 1
    if (m <= 0) return Empty
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      // FNV-1a over the chars of toks(i), ' ', toks(i+1), ' ', ... — the
      // exact stream fnv64(window.mkString(" ")) hashes
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < n) {
        if (k > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
        val s = toks(i + k)
        var j = 0
        while (j < s.length) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
        k += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }
}
