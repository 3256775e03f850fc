package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |A ∩ B| of two ASC-sorted long arrays via a
  * single merge scan — no result-array allocation, no hash set, stays in
  * WholeStageCodegen.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect is interpreted,
  * builds a hash map of one side and materializes the intersection array
  * per row, only for `size` to throw it away. On the dedup verify path
  * (hundreds of thousands of candidate pairs × ~300-element shingle sets)
  * that allocation is the dominant cost — measured 1.9 s → 0.2 s at sf0.1.
  * Precondition (held by Dedup.shingled, which sorts once at build): both
  * inputs sorted ascending, duplicate-free.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int graftNx = $a.numElements(); int graftNy = $b.numElements();
         |int graftI = 0; int graftJ = 0; int graftC = 0;
         |while (graftI < graftNx && graftJ < graftNy) {
         |  long graftXv = $a.getLong(graftI); long graftYv = $b.getLong(graftJ);
         |  if (graftXv == graftYv) { graftC++; graftI++; graftJ++; }
         |  else if (graftXv < graftYv) { graftI++; } else { graftJ++; }
         |}
         |${ev.value} = graftC;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The one shingle-hash definition both shingle expressions share: each
  * token hashed once (xxhash64, seed 42), then each n-gram's token hashes
  * chained with the same seed-fold Spark's `xxhash64(...)` uses —
  * bit-identical to `shingleSetFromHashes(tokenHashes(t), n)` (asserted
  * in DedupSpec/ExpressionParitySpec). Living in ONE place is
  * load-bearing: the sorted and positional expressions must emit the
  * same values or the sort+distinct parity invariant silently breaks. */
private object ShingleHashing {
  import org.apache.spark.sql.types.{LongType, StringType}

  /** Position-ordered chained hashes; short docs (nt < n) emit one
    * partial shingle, matching `sequence(0, greatest(size - n, 0))`. */
  def positional(toks: ArrayData, n: Int): Array[Long] = {
    val nt = toks.numElements()
    val th = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      th(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(toks.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val nsh = math.max(nt - n, 0) + 1
    val out = new Array[Long](nsh)
    i = 0
    while (i < nsh) {
      var h = 42L
      var j = 0
      while (j < n && i + j < nt) {
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(th(i + j), LongType, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }
}

/** Native expression: ASC-sorted distinct 64-bit hashes of all word
  * n-gram shingles of a token array, in one pass per row.
  *
  * Replaces a four-deep higher-order pipeline (tokenHashes → sequence →
  * transform(xxhash64) → array_distinct → array_sort) whose per-element
  * interpreted-lambda overhead (~2 µs/shingle) dominates dedup's map side.
  * Sort + adjacent-dedupe over [[ShingleHashing.positional]]. One virtual
  * call per ROW (CodegenFallback), tight JIT'd loops inside — shingling is
  * the single biggest map-side cost of every dedup pipeline at 100 TB.
  */
case class SortedHashedShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val out = ShingleHashing.positional(input.asInstanceOf[ArrayData], n)
    val nsh = out.length
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < nsh) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: the full winnowing selection (gram hashing + run
  * counting) of `llm_winnow`, one row-level pass over the token array.
  *
  * The Column-API formulation (nested transform/aggregate/element_at
  * higher-order functions) is interpreted per element — measured ~3.7 s
  * at sf0.1 where this pass is ~0.3 s. Semantics are pinned three ways:
  * the DuckDB oracle (identical rolling hash and run rule), CorpusSpec's
  * window-enumeration reference, and the k/w constants shared with the
  * query.
  *
  * Hash parity contract (must match the SQL oracle exactly): per-token
  * h = (codepoint of first char)·31 + numChars; gram hash = left fold
  * (acc·131 + h) mod 1e9+7 over k consecutive token hashes. Selection:
  * position j (1-based) is kept iff L+R ≥ min(w, n)−1, where L counts
  * consecutive left neighbors with hash ≥ h(j) and R consecutive right
  * neighbors with hash > h(j) (the ≥/> asymmetry is the rightmost-tie
  * rule). */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val p = 1000000007L
    val nG = nTok - k + 1
    if (nG <= 0) return ArrayData.toArrayData(Array.empty[Any])
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      val s = toks.getUTF8String(i)
      val str = s.toString
      val first = if (str.isEmpty) 0 else str.codePointAt(0)
      th(i) = first.toLong * 31L + s.numChars()
      i += 1
    }
    val g = new Array[Long](nG)
    var j = 0
    while (j < nG) {
      var acc = 0L
      var t = 0
      while (t < k) { acc = (acc * 131L + th(j + t)) % p; t += 1 }
      g(j) = acc
      j += 1
    }
    val need = math.min(w, nG) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any](nG / w + 2)
    j = 0
    while (j < nG) {
      val h = g(j)
      var l = 0
      while (l < w - 1 && j - l - 1 >= 0 && g(j - l - 1) >= h) l += 1
      var r = 0
      while (r < w - 1 && j + r + 1 < nG && g(j + r + 1) > h) r += 1
      if (l + r >= need)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](j + 1, h))
      j += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: k-permutation MinHash signature of a hashed-shingle
  * array, one row-level pass.
  *
  * The aggregate formulation (explode shingles → shuffle → k min-aggs)
  * moves |shingles| rows through a shuffle to compute what is a pure
  * function of data already collected on the row: for each shingle,
  * base = xxhash64(shingle) mod P once, then min-fold the k affine
  * permutations (a_j·base + b_j) mod P in a JIT'd loop. Zero shuffle,
  * ~40 µs/doc at 300 shingles × k=128 — measured 2.9 s → scan-cost at
  * sf0.1. Bit-identical to the min()-aggregate and Aggregator forms
  * (AggregatorParitySpec asserts all three agree).
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{ArrayType, LongType}

  private val P = TextFunctions.MinhashPrime
  private val as: Array[Long] = TextFunctions.minhashCoeffs(k, seed).map(_._1).toArray
  private val bs: Array[Long] = TextFunctions.minhashCoeffs(k, seed).map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val sig = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      val h0 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(sh.getLong(i), LongType, 42L)
      val base = ((h0 % P) + P) % P // pmod: xxhash64 output can be negative
      var j = 0
      while (j < k) {
        val v = (as(j) * base + bs(j)) % P // a,base < 2^31: no overflow
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: 64-bit SimHash of a token array, one row-level pass.
  *
  * The dataflow formulation (explode tokens × explode 64 bit positions →
  * two grouped shuffles) moves |tokens|×64 rows through the cluster to
  * compute a pure per-row function: hash each token (xxhash64, seed 42 —
  * same values as the `xxhash64($"tok")` column form), vote each bit ±1,
  * emit the majority bits. ~150 tokens × 64 bits = 9.6k JIT'd adds per
  * document vs a 48M-row shuffle at sf0.1.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(toks.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: hashed word n-gram shingles in POSITION order (no
  * sort, no dedupe) — the positional twin of [[SortedHashedShingles]],
  * same chained token-hash values (parity-pinned: sort+distinct of this
  * equals the sorted form). For operators that need gram offsets
  * (duplicated-substring coverage), where building gram STRINGS via
  * concat_ws just to hash them afterwards doubles the map-side cost.
  */
case class PositionalHashedShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      ShingleHashing.positional(input.asInstanceOf[ArrayData], n))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: SimHash over PRE-COMPUTED per-token hashes — one
  * row-level pass, parameterized on signature width.
  *
  * Exists for hash functions an external oracle must reproduce (the
  * md5-derived 60-bit hashes of llm_dedup_simhash_poly): the token hash
  * stays a codegen'd built-in chain (md5 → substring → conv), while the
  * vote fold runs here in a tight JIT'd loop. The declarative twin —
  * aggregate(sequence(0,59), …, aggregate(hashes, …)) — re-traverses the
  * hash array once per bit position through interpreted lambdas
  * (O(bits × tokens) closure calls; measured 33.9 s at sf0.1, vs ~1 s
  * here). Bit-identical to that form: arithmetic shift equals logical for
  * the non-negative inputs, ties (vote sum 0) emit 0 in both
  * (ExpressionParitySpec pins parity on fixture data).
  */
case class SimHashFromHashes(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_winnow_select",
      exprs => WinnowSelect(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      exprs => SortedLongIntersectSize(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_shingles",
      exprs => SortedHashedShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_positional_shingles",
      exprs => PositionalHashedShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash_from_hashes",
      exprs => SimHashFromHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig",
      exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Long]), "built-in")
  }

  /** |A ∩ B| for ASC-sorted duplicate-free array<long> columns. */
  def sortedIntersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_sorted_intersect_size", a, b)
  }

  /** Sorted distinct hashed n-gram shingle set of an array<string> column. */
  def sortedShingles(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    call_function("graft_sorted_shingles", tokens,
      org.apache.spark.sql.functions.lit(n))
  }

  /** k-permutation MinHash signature of a hashed-shingle array<long>. */
  def minhashSignature(spark: SparkSession, shingles: Column, k: Int,
                       seed: Long = 42L): Column = {
    register(spark)
    call_function("graft_minhash_sig", shingles,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(seed))
  }

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("graft_simhash64", tokens)
  }

  /** Position-ordered hashed n-gram shingles of an array<string> column. */
  def positionalShingles(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    call_function("graft_positional_shingles", tokens,
      org.apache.spark.sql.functions.lit(n))
  }

  /** `bits`-wide SimHash of a pre-hashed array<long> token column. */
  def simhashFromHashes(spark: SparkSession, hashes: Column, bits: Int): Column = {
    register(spark)
    call_function("graft_simhash_from_hashes", hashes,
      org.apache.spark.sql.functions.lit(bits))
  }

  /** Winnowing selection over an array<string> token column:
    * array<struct<pos int, fp long>> of the selected k-gram fingerprints
    * (llm_winnow's semantics, one JIT'd row-level pass). */
  def winnowSelect(spark: SparkSession, tokens: Column, k: Int, w: Int): Column = {
    register(spark)
    call_function("graft_winnow_select", tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }
}
