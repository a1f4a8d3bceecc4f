package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/**
 * Custom Catalyst expressions for the dedup hot path (north rule: "batched
 * MinHash signatures computed per-partition via Catalyst expressions").
 *
 * Every expression implements `doGenCode` as a direct static call into
 * [[Kernels]], so the whole signature stage stays inside a single
 * WholeStageCodegen span — no UDF serialization, no CodegenFallback
 * (SURVEY.md §7.3). These replace the reference's per-record predicate loop
 * (`blocking.py:58-115`) and its Cython shingler (`cpredicates.pyx`).
 */
object Exprs {

  private val K = "graft.expr.Kernels"
  private val longArray = ArrayType(LongType, containsNull = false)
  private val intArray = ArrayType(IntegerType, containsNull = false)

  /** Reference-parity text normalization (`benchmarks/common.py:12-19`). */
  case class NormalizeText(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(s: Any): Any =
      Kernels.normalizeText(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    // result can be null for empty/whitespace-only input even when child isn't
    override def nullable: Boolean = true
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val code = nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.normalizeText($c);
        ${ev.isNull} = ${ev.value} == null;""")
      code
    }
    override protected def withNewChildInternal(newChild: Expression): NormalizeText =
      copy(child = newChild)
  }

  /** Sorted-distinct xxhash64 char-k-shingles (`cpredicates.pyx:24-42`
    * semantics), truncated to 32 bits and shipped as array<int> — HALF the
    * raw bytes of array<bigint> through the verify exchange, the pipeline's
    * bandwidth-bound stage (see [[graft.texthash.TextHash.ShingleMask]]). */
  case class CharShingleHashes(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = intArray
    override def nullSafeEval(s: Any): Any =
      Kernels.shingleHashes(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, seed)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.shingleHashes($c, $k, ${seed}L);")
    override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
      copy(child = newChild)
  }

  /** MinHash signature over shingle hashes; empty input -> empty signature. */
  case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = longArray
    override def nullSafeEval(a: Any): Any =
      Kernels.minhashSignature(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes, seed)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.minhashSignature($c, $numHashes, ${seed}L);")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** LSH band keys from a signature (band index folded into each key). */
  case class BandKeys(child: Expression, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = longArray
    override def nullSafeEval(a: Any): Any =
      Kernels.bandKeys(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.bandKeys($c, $bands);")
    override protected def withNewChildInternal(newChild: Expression): BandKeys =
      copy(child = newChild)
  }

  /** 64-bit SimHash of the text's word tokens (secondary fingerprint). */
  case class SimHash64(child: Expression, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any): Any =
      Kernels.simhash64(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], seed)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.simhash64($c, ${seed}L);")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Exact Jaccard of two sorted-distinct int arrays (linear merge).
    * Input types are ENFORCED: the int32-shingle schema changed in round 3,
    * and an untyped read of a pre-migration array<bigint> table would either
    * misread with a 4-byte stride (silent garbage scores) or throw a raw
    * ClassCastException — `inputTypes` turns both into an analysis-time
    * failure naming the expected element type (see also
    * [[graft.io.TableIO.requireIntShingles]] for the migration message on
    * persisted-table read paths). */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects two ARRAY<INT> shingle columns, got " +
          s"${left.dataType.sql} and ${right.dataType.sql} — a pre-int32-shingle " +
          "table must be re-generated, not cast (sort order changed)")
    }
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.jaccardSorted(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $K.jaccardSorted($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(left = l, right = r)
  }

  /** Normalized affine-gap string distance — the String/ShortString
    * variable comparator (`variables/string.py:70-109` binds the public
    * `affinegap` package's `normalizedAffineGapDistance`), as a codegen'd
    * expression so the trained featurizer stays inside whole-stage codegen
    * (one static DP call per pair; see [[graft.texthash.AffineGap]]).
    * Float32 DP like the reference, widened to double at the boundary. */
  case class AffineGapNorm(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.affineGapNorm(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $K.affineGapNorm($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): AffineGapNorm =
      copy(left = l, right = r)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  case class Hamming64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $K.hamming64($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
      copy(left = l, right = r)
  }

  /** Longest-common-substring length of two strings (code-point units) —
    * the codegen'd verify kernel of the suffix-pass LCS queries: for a
    * candidate pair KNOWN to share a w-char window, the diagonal-run
    * identity (LCS = w-1 + longest run of shared aligned windows) equals
    * the direct DP, so one static call replaces the exploded window
    * equi-joins + run-walk aggregation (guide §2.4: remove shuffles
    * outright; OpsSpec pins identity == DP by property test). */
  case class LcsLen(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.lcsLen(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $K.lcsLen($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): LcsLen =
      copy(left = l, right = r)
  }

  /** Integer dot product of two ARRAY<BIGINT> columns, with the exact null
    * semantics of `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)`: a length
    * mismatch (zip_with null-padding) yields SQL NULL. Codegen'd so the
    * ANN/embedding cosine re-rank stays out of interpreted HOF evaluation. */
  case class DotI64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (aa.numElements() != bb.numElements()) null else Kernels.dotI64(aa, bb)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |else { ${ev.value} = $K.dotI64($a, $b); }""".stripMargin)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI64 =
      copy(left = l, right = r)
  }

  /** Integer squared L2 distance of two ARRAY<BIGINT> columns, with the
    * exact null semantics of the zip_with/aggregate form (length mismatch
    * -> SQL NULL), codegen'd for the ANN re-rank loop. */
  case class DistSqI64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (aa.numElements() != bb.numElements()) null else Kernels.distSqI64(aa, bb)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |else { ${ev.value} = $K.distSqI64($a, $b); }""".stripMargin)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DistSqI64 =
      copy(left = l, right = r)
  }

  /** Integer sum of squares of an ARRAY<BIGINT> column
    * (== `aggregate(a, 0L, (acc,x) -> acc + x*x)`), codegen'd. */
  case class Norm2I64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any): Any =
      Kernels.norm2I64(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.norm2I64($c);")
    override protected def withNewChildInternal(newChild: Expression): Norm2I64 =
      copy(child = newChild)
  }

  /** Sampled fixed-width suffix keys — the scale-safe `suffixArray`
    * (`predicate_functions.py:142-147`) variant, SURVEY.md §7.5(4). */
  case class SuffixKeys(child: Expression, width: Int, every: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = longArray
    override def nullSafeEval(s: Any): Any =
      Kernels.suffixKeys(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width, every, seed)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $K.suffixKeys($c, $width, $every, ${seed}L);")
    override protected def withNewChildInternal(newChild: Expression): SuffixKeys =
      copy(child = newChild)
  }
}

/** Public column-function surface (the Spark-idiomatic analogue of dedupe's
  * predicate/fingerprinter API). */
object functions {
  import Exprs._
  private def col(e: Expression): Column = GraftShim.column(e)
  private def ex(c: Column): Expression = GraftShim.expression(c)

  def normalize_text(c: Column): Column = col(NormalizeText(ex(c)))
  def shingle_hashes(c: Column, k: Int, seed: Long = 42L): Column =
    col(CharShingleHashes(ex(c), k, seed))
  def minhash_sig(c: Column, numHashes: Int, seed: Long = 42L): Column =
    col(MinHashSig(ex(c), numHashes, seed))
  def band_keys(c: Column, bands: Int): Column = col(BandKeys(ex(c), bands))
  def simhash64(c: Column, seed: Long = 42L): Column = col(SimHash64(ex(c), seed))
  def jaccard_sorted(a: Column, b: Column): Column = col(JaccardSorted(ex(a), ex(b)))
  def affine_gap(a: Column, b: Column): Column = col(AffineGapNorm(ex(a), ex(b)))
  def hamming64(a: Column, b: Column): Column = col(Hamming64(ex(a), ex(b)))
  def suffix_keys(c: Column, width: Int, every: Int, seed: Long = 42L): Column =
    col(SuffixKeys(ex(c), width, every, seed))
  def lcs_len(a: Column, b: Column): Column = col(LcsLen(ex(a), ex(b)))
  def dot_i64(a: Column, b: Column): Column = col(DotI64(ex(a), ex(b)))
  def dist_sq_i64(a: Column, b: Column): Column = col(DistSqI64(ex(a), ex(b)))
  def norm2_i64(a: Column): Column = col(Norm2I64(ex(a)))
}
