package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/**
 * Two-level IVF cell router — the fix for the flat coarse quantizer's
 * quadratic scaling, caught by the 100× certification
 * (BENCH_NOTES "100× scale certification"): with the production knob
 * `nlist ∝ N` (constant cell size ⇒ linear pair scoring), a FLAT
 * router makes both the encode argmin and the probe ranking
 * O(N · nlist) = O(N²) — measured as a 152× wall ratio at 100× data.
 * Routing through a √nlist-way super-level drops both to
 * O(N · √nlist), restoring (sub-)linear growth end to end.
 *
 * The model is trained ONCE on a driver-local bounded sample
 * (hierarchical Lloyd — the standard ANN practice: FAISS trains its
 * quantizers on an in-memory sample for exactly this reason; a cell
 * layout learned from a bounded sample routes as well as one learned
 * from the full corpus) and rides into the executors as a plan
 * reference object; per-row routing is a codegen'd expression —
 * no join, no shuffle, no per-row UDF boundary.
 *
 * Leaf cells are numbered globally 0..nlist-1, GROUPED BY PARENT:
 * super p owns exactly the contiguous id range
 * [offsets(p), offsets(p+1)), and every super owns at least one leaf
 * (so routing can never land in an empty range).
 */
final case class IvfRouterModel(
    supers: Array[Array[Float]],
    leaves: Array[Array[Float]],
    offsets: Array[Int]) extends Serializable {
  require(supers.nonEmpty && leaves.nonEmpty, "router must have centroids")
  require(offsets.length == supers.length + 1 &&
    offsets.head == 0 && offsets.last == leaves.length,
    "offsets must partition the leaf range")
  require(offsets.sliding(2).forall(w => w(1) > w(0)),
    "every super must own at least one leaf")
  def dim: Int = supers.head.length
  def nlist: Int = leaves.length
}

object AnnRouter {

  /** Squared L2 distance of a Catalyst numeric array to a float centroid. */
  def l2sq(emb: ArrayData, isFloat: Boolean, c: Array[Float]): Double = {
    val n = c.length
    if (emb.numElements() != n)
      throw new IllegalArgumentException(
        s"ivf_route: embedding dim ${emb.numElements()} != router dim $n")
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) - c(i)
      s += x * x
      i += 1
    }
    s
  }

  private def nearestSuper(emb: ArrayData, isFloat: Boolean, m: IvfRouterModel): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var p = 0
    while (p < m.supers.length) {
      val d = l2sq(emb, isFloat, m.supers(p))
      if (d < bestD) { bestD = d; best = p }
      p += 1
    }
    best
  }

  /** Two-level argmin: nearest super, then nearest leaf within it.
    * O(k1 + k2) distance evaluations per row instead of O(nlist). */
  def route(emb: ArrayData, isFloat: Boolean, m: IvfRouterModel): Int = {
    val p = nearestSuper(emb, isFloat, m)
    var best = m.offsets(p)
    var bestD = Double.MaxValue
    var c = m.offsets(p)
    while (c < m.offsets(p + 1)) {
      val d = l2sq(emb, isFloat, m.leaves(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /**
   * Hierarchical probe: the `superProbe` nearest supers, then the
   * `nprobe` nearest leaves among THEIR children — O(k1 +
   * superProbe·k2) per row, never a corpus × nlist ranking. Ties
   * break on the lower cell id (deterministic). With superProbe >=
   * k1 and nprobe >= nlist this returns every cell — the exact-gate
   * configuration under which hierarchical IVF is provably identical
   * to brute force (each corpus vector lives in exactly one cell, so
   * probing all cells scores every pair exactly once).
   */
  def probe(emb: ArrayData, isFloat: Boolean, m: IvfRouterModel,
      superProbe: Int, nprobe: Int): ArrayData = {
    val k1 = m.supers.length
    val sp = math.min(superProbe, k1)
    // top-sp supers by distance (selection over k1 — small by design)
    val sd = new Array[Double](k1)
    var p = 0
    while (p < k1) { sd(p) = l2sq(emb, isFloat, m.supers(p)); p += 1 }
    val chosen = new Array[Int](sp)
    val taken = new Array[Boolean](k1)
    var s = 0
    while (s < sp) {
      var best = -1
      var bestD = Double.MaxValue
      p = 0
      while (p < k1) {
        // strict < plus the ascending scan already yields the
        // lowest-index super on distance ties — the first equal-
        // distance candidate is taken and later ones can never beat it
        if (!taken(p) && sd(p) < bestD) {
          bestD = sd(p); best = p
        }
        p += 1
      }
      taken(best) = true
      chosen(s) = best
      s += 1
    }
    // candidate leaves of the chosen supers
    var nCand = 0
    s = 0
    while (s < sp) { nCand += m.offsets(chosen(s) + 1) - m.offsets(chosen(s)); s += 1 }
    val cd = new Array[Double](nCand)
    val cc = new Array[Int](nCand)
    var j = 0
    s = 0
    while (s < sp) {
      var c = m.offsets(chosen(s))
      while (c < m.offsets(chosen(s) + 1)) {
        cd(j) = l2sq(emb, isFloat, m.leaves(c))
        cc(j) = c
        j += 1
        c += 1
      }
      s += 1
    }
    val np = math.min(nprobe, nCand)
    val out = new Array[Int](np)
    val used = new Array[Boolean](nCand)
    var r = 0
    while (r < np) {
      var best = -1
      var bestD = Double.MaxValue
      j = 0
      while (j < nCand) {
        if (!used(j) && (cd(j) < bestD ||
            (cd(j) == bestD && best >= 0 && cc(j) < cc(best)))) {
          bestD = cd(j); best = j
        }
        j += 1
      }
      used(best) = true
      out(r) = cc(best)
      r += 1
    }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Driver-local hierarchical Lloyd on a bounded sample: k1 = ⌈√nlist⌉
   * supers over the whole sample, then per-super sub-clusterings whose
   * leaf counts are proportional to branch mass (every super gets at
   * least one leaf) and sum to exactly nlist. Deterministic for a
   * given (sample order, seed): seeded hash init, fixed iterations,
   * empty clusters keep their previous centroid.
   */
  def train(sample: Array[Array[Float]], nlist: Int, iters: Int = 5,
      seed: Long = 42L): IvfRouterModel = {
    require(sample.nonEmpty, "router training sample is empty")
    require(nlist >= 1, s"nlist=$nlist must be >= 1")
    val k1 = math.min(math.ceil(math.sqrt(nlist.toDouble)).toInt, nlist)
    val supers = lloyd(sample, k1, iters, seed)
    // assign the sample to supers
    val branch = Array.fill(k1)(new scala.collection.mutable.ArrayBuffer[Array[Float]]())
    sample.foreach { v =>
      var best = 0
      var bestD = Double.MaxValue
      var p = 0
      while (p < k1) {
        val d = l2sqLocal(v, supers(p))
        if (d < bestD) { bestD = d; best = p }
        p += 1
      }
      branch(best) += v
    }
    // proportional leaf allocation, >=1 per super, total exactly nlist
    val total = sample.length.toDouble
    val alloc = Array.tabulate(k1)(p =>
      math.max(1, math.round(nlist * branch(p).length / total).toInt))
    var diff = nlist - alloc.sum
    while (diff != 0) {
      // trim from / grant to the largest branches first (deterministic)
      val order = (0 until k1).sortBy(p => (-branch(p).length, p))
      var i = 0
      while (diff != 0 && i < k1) {
        val p = order(i)
        if (diff > 0) { alloc(p) += 1; diff -= 1 }
        else if (alloc(p) > 1) { alloc(p) -= 1; diff += 1 }
        i += 1
      }
    }
    val leaves = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    val offsets = new Array[Int](k1 + 1)
    var p = 0
    while (p < k1) {
      offsets(p) = leaves.length
      val pts = branch(p).toArray
      if (pts.isEmpty) {
        // super kept a stale centroid with no sample mass: its leaves
        // are copies of the super itself (routing stays total)
        var i = 0
        while (i < alloc(p)) { leaves += supers(p); i += 1 }
      } else {
        lloyd(pts, alloc(p), iters, seed + 1 + p).foreach(leaves += _)
      }
      p += 1
    }
    offsets(k1) = leaves.length
    IvfRouterModel(supers, leaves.toArray, offsets)
  }

  private def l2sqLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val x = a(i).toDouble - b(i); s += x * x; i += 1 }
    s
  }

  /** Plain Lloyd iterations; k > |points| duplicates points (empty
    * cells are harmless — they are never the argmin for any row that
    * has a closer non-empty twin, and probing one scores nothing). */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val n = points.length
    val init = (0 until n).sortBy(i => TextHash.splitmix64(seed ^ (i.toLong * 0x9E3779B97F4A7C15L)))
    var centroids = Array.tabulate(k)(i => points(init(i % n)).clone())
    val d = points.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val cnts = new Array[Int](k)
      points.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val dist = l2sqLocal(v, centroids(c))
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        cnts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (cnts(c) == 0) centroids(c)
        else Array.tabulate(d)(j => (sums(c)(j) / cnts(c)).toFloat)
      }
      it += 1
    }
    centroids
  }
}

/** `ivf_route(embedding)` → the vector's global leaf-cell id via the
  * two-level router — codegen'd, O(√nlist) per row. */
case class IvfRoute(child: Expression, model: IvfRouterModel)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_route"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_route requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AnnRouter.route(input.asInstanceOf[ArrayData], isFloat, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfRouter", model, classOf[IvfRouterModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.AnnRouter.route($c, $isFloat, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfRoute =
    copy(child = newChild)
}

/** `ivf_probe(embedding)` → the query's probe cells (array<int>) via
  * the two-level router — codegen'd, O(k1 + superProbe·k2) per row. */
case class IvfProbe(child: Expression, model: IvfRouterModel,
    superProbe: Int, nprobe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (superProbe >= 1 && nprobe >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"ivf_probe superProbe=$superProbe and nprobe=$nprobe must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probe requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AnnRouter.probe(input.asInstanceOf[ArrayData], isFloat, model, superProbe, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfRouter", model, classOf[IvfRouterModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnRouter.probe($c, $isFloat, $m, $superProbe, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbe =
    copy(child = newChild)
}
