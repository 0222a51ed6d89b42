package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Mutable per-group state for [[CentroidAggF]]: per-element scale-7
  * fixed-point sums plus the two per-element tallies the exploded form's
  * `count(lit(1))` / null-skipping `sum` kept implicitly. Arrays grow to
  * the longest input seen (ragged inputs match posexplode, which emits
  * only existing elements). */
final class CentroidState(var dim: Int, var sums: Array[Long],
    var counts: Array[Long], var finite: Array[Long]) {
  def ensure(n: Int): Unit = if (n > dim) {
    sums = java.util.Arrays.copyOf(sums, n)
    counts = java.util.Arrays.copyOf(counts, n)
    finite = java.util.Arrays.copyOf(finite, n)
    dim = n
  }
}

/** Native vector-sum centroid aggregate — the explode-free form of the
  * exact-decimal centroid convention shared by x73/x85
  * ([[graft.ext.Similarity.semanticDedup]] /
  * [[graft.ext.Similarity.ivfDeterministicTopK]]):
  *
  * {{{
  *   posexplode(d(emb)).groupBy(bucket, i)
  *     .agg(sum(round(x, 7).cast("decimal(20,7)")).cast("double")
  *            / count(lit(1)))
  *     .groupBy(bucket).agg(array_sort(collect_list(struct(i, c))) → cent)
  * }}}
  *
  * expanded every corpus row into `dim` rows (12.8M at sf10's 200k×64 —
  * VERDICT r16 #5, x73's dominant term) to compute what is, per row,
  * `dim` fixed-point adds. This aggregate is the [[DotF32]]/[[PqDecodeF]]
  * pattern applied to ACCUMULATION: array in, per-element exact sums in
  * the buffer, one (3·dim longs) partial per partition per group on the
  * exchange — no row expansion anywhere, group keys shuffle once.
  *
  * Output is BIT-IDENTICAL to the exploded form (CentroidAggSpec pins it
  * property-style, adversarial inputs included) because every step is
  * replicated exactly, not approximated:
  *   - `round(x, 7)`: `BigDecimal.valueOf(x).setScale(7, HALF_UP)
  *     .doubleValue` — Spark's `RoundBase` for doubles (`Double.toString`
  *     shortest-repr semantics), NaN/±Inf pass through;
  *   - `cast(decimal(20,7))`: re-round the ROUNDED double
  *     (`valueOf(r).setScale(7, HALF_UP)`); NaN/±Inf → null (pinned
  *     empirically in CentroidAggSpec — `Decimal.set(Double)` nulls
  *     non-finites under either ansi setting);
  *   - decimal `sum` skips nulls, `count(lit(1))` does not: per-element
  *     `finite`/`counts` tallies keep the two denominators distinct, and
  *     an element with no finite contribution evaluates to null exactly
  *     as the null decimal sum did;
  *   - scale-7 longs ARE the decimal arithmetic (order-independent,
  *     partitioning-proof); the final `.cast("double") / count` is one
  *     `BigDecimal(sum, 7).doubleValue / count` per element.
  *
  * The overflow story (the engine runs Spark 4's DEFAULT ansi=true —
  * nothing in the repo overrides it): the exploded form's cast THROWS
  * SparkArithmeticException past decimal(20,7)'s 13 integer digits, so
  * crash-on-garbage is the deployed semantics, not a regression. This
  * kernel refuses from ~9.2e11 (scale-7 long capacity) instead of 1e13
  * — the one honest narrowing, a band real embeddings (unit-scale
  * values; headroom ~9e9 rows per group at |x|≤100) never enter — and
  * the refusal is LOUD (`Math.addExact`/`longValueExact` wrapped with
  * the remedy named) rather than a wrap, the pair-guard fail-closed
  * convention.
  *
  * A group whose every row is null (posexplode would emit nothing, so
  * the group vanished from the old centroid frame) evaluates to null —
  * call sites filter `cent IS NOT NULL` to restore the inner-join drop. */
case class CentroidAggF(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CentroidState]
    with UnaryLike[Expression] {

  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(child).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_centroid expects array<float|double>, got " +
        child.dataType.simpleString)

  // element null iff no finite contribution reached its decimal sum
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  private lazy val isFloat = elemOf(child).contains(FloatType)

  override def createAggregationBuffer(): CentroidState =
    new CentroidState(0, Array.emptyLongArray, Array.emptyLongArray,
      Array.emptyLongArray)

  override def update(buf: CentroidState, input: InternalRow): CentroidState = {
    val v = child.eval(input)
    if (v == null) return buf // posexplode emits nothing for a null array
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    buf.ensure(n)
    var i = 0
    while (i < n) {
      buf.counts(i) += 1 // count(lit(1)) counted null/NaN elements too
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (!x.isNaN && !x.isInfinite) {
          // round(x, 7) — Spark RoundBase double semantics
          val r = JBigDecimal.valueOf(x)
            .setScale(7, RoundingMode.HALF_UP).doubleValue()
          // cast(decimal(20,7)) re-rounds the ROUNDED double; under the
          // engine's default ansi=true an overflowing cast THROWS in the
          // exploded form — here every out-of-capacity value refuses
          // loudly (scale-7 long capacity ~9.2e11, just narrower than
          // the decimal's 1e13 — the scaladoc's documented band)
          val bd = JBigDecimal.valueOf(r).setScale(7, RoundingMode.HALF_UP)
          val scaled =
            try bd.movePointRight(7).longValueExact()
            catch { case _: ArithmeticException => refuse() }
          buf.sums(i) = addExactOrRefuse(buf.sums(i), scaled)
          buf.finite(i) += 1
        }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: CentroidState, other: CentroidState): CentroidState = {
    buf.ensure(other.dim)
    var i = 0
    while (i < other.dim) {
      buf.sums(i) = addExactOrRefuse(buf.sums(i), other.sums(i))
      buf.counts(i) += other.counts(i)
      buf.finite(i) += other.finite(i)
      i += 1
    }
    buf
  }

  private def refuse(): Nothing =
    throw new IllegalStateException(
      "graft_centroid: a per-element value or group sum exceeds scale-7 " +
        "long capacity (|x| ~9.2e11) — the corpus is far outside " +
        "embedding scale; use the posexplode decimal(30,7) reference " +
        "form (Similarity.centroidsViaPosexplode) for this data")

  private def addExactOrRefuse(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch { case _: ArithmeticException => refuse() }

  override def eval(buf: CentroidState): Any = {
    if (buf.dim == 0) return null // all-null group: old frame had no row
    val out = new Array[Any](buf.dim)
    var i = 0
    while (i < buf.dim) {
      out(i) = if (buf.finite(i) == 0) null
      else new JBigDecimal(java.math.BigInteger.valueOf(buf.sums(i)), 7)
        .doubleValue() / buf.counts(i).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CentroidState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.dim)
    bb.putInt(buf.dim)
    var i = 0
    while (i < buf.dim) {
      bb.putLong(buf.sums(i)); bb.putLong(buf.counts(i))
      bb.putLong(buf.finite(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CentroidState = {
    val bb = ByteBuffer.wrap(bytes)
    val dim = bb.getInt
    val st = new CentroidState(dim, new Array[Long](dim),
      new Array[Long](dim), new Array[Long](dim))
    var i = 0
    while (i < dim) {
      st.sums(i) = bb.getLong; st.counts(i) = bb.getLong
      st.finite(i) = bb.getLong; i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CentroidAggF =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CentroidAggF =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CentroidAggF =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid"
}
