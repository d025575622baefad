package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import VectorOps._

/** Pluggable KG-embedding scoring functions (SURVEY §2.6) as pure Spark SQL
  * column expressions over `ARRAY<DOUBLE>` embeddings — the Spark analog of
  * the reference's `KnowledgeGraphEmbedding` ABC
  * (knovex/structure/kg_embedding/abstract_kge.py:11-164).
  *
  * All expressions are codegen'd higher-order functions; no UDFs.
  */
sealed trait KGEModel {
  /** F-score of a triple given embeddings (embedding_score). Higher = better. */
  def score(h: Column, r: Column, t: Column): Column
  /** Predicted tail embedding from (head, relation) (estimate_tail_emb). */
  def estimateTail(h: Column, r: Column): Column
  /** Score between a predicted embedding and a candidate entity embedding
    * (entity_pair_scoring where the reference defines it; falls back to
    * negative L2 otherwise). */
  def pairScore(est: Column, t: Column): Column = -lpDist(est, t, 2.0)
  /** True when `score(h, r, t) ≡ pairScore(estimateTail(h, r), t)`
    * bit-exactly AND the estimate is expensive enough that the beam
    * should materialize it ONCE per frontier row instead of per
    * (frontier × candidate) pair (CQDBeam honors this for
    * head-to-candidate edges). Opt-in per model: the fused 3-arg
    * kernels are already allocation-free, so only estimate-heavy
    * scorers (ConvE's seeded forward pass) benefit. */
  def scoreOnFrontier: Boolean = false
}

/** F1/F2: TransE — score `-‖h + r − t‖_p`, tail estimate `h + r`
  * (transe.py:36-46). */
final case class TransE(p: Double = 2.0) extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    -lpDist(addVec(h, r), t, p)
  def estimateTail(h: Column, r: Column): Column = addVec(h, r)
  override def pairScore(est: Column, t: Column): Column = -lpDist(est, t, p)
}

/** F3: DistMult — score `-Σ h⊙r⊙t` (sign as written in the reference,
  * distmult.py:36-41), tail estimate `h⊙r`. */
case object DistMult extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    -dot(estimateTail(h, r), t)
  def estimateTail(h: Column, r: Column): Column = mulVec(h, r)
  override def pairScore(est: Column, t: Column): Column = -dot(est, t)
}

/** F4/F5: ComplEx — embeddings are `2d` arrays, re‖im split at d
  * (complex.py:99-122). Tail estimate = complex multiply; pair score = dot. */
case object ComplEx extends KGEModel {
  def estimateTail(h: Column, r: Column): Column = {
    val (hr, hi) = (firstHalf(h), secondHalf(h))
    val (rr, ri) = (firstHalf(r), secondHalf(r))
    concat(subVec(mulVec(hr, rr), mulVec(hi, ri)),
           addVec(mulVec(hr, ri), mulVec(hi, rr)))
  }
  def score(h: Column, r: Column, t: Column): Column =
    dot(estimateTail(h, r), t)
  override def pairScore(est: Column, t: Column): Column = dot(est, t)

  /** F17: N3 regularization `Σ (√(re²+im²))³` (complex.py:124-128). */
  def regularization(e: Column): Column =
    sumArr(transform(zip_with(firstHalf(e), secondHalf(e),
      (a, b) => sqrt(a * a + b * b)), n => n * n * n))
}

/** F7/F8: RotatE — entity embeddings `2d` (re‖im), relation embedding `d`
  * of phases; tail estimate rotates by the phase (rotate.py:51-79); pair
  * score is the *positive* L2 distance as written (rotate.py:104-106) —
  * ranking uses descending argsort, so the reference quirk is preserved. */
case object RotatE extends KGEModel {
  def estimateTail(h: Column, r: Column): Column = {
    val (hr, hi) = (firstHalf(h), secondHalf(h))
    val (rc, rs) = (transform(r, cos(_)), transform(r, sin(_)))
    concat(subVec(mulVec(hr, rc), mulVec(hi, rs)),
           addVec(mulVec(hr, rs), mulVec(hi, rc)))
  }
  def score(h: Column, r: Column, t: Column): Column =
    pairScore(estimateTail(h, r), t)
  override def pairScore(est: Column, t: Column): Column =
    lpDist(est, t, 2.0)
}

/** F10: RESCAL — relation embedding is a flattened d×d matrix
  * (rescal.py:23-26); tail estimate `h^T W_r` via bmm (rescal.py:38-41).
  * NOTE the reference's `embedding_score` is latently buggy (uses TransE's
  * distance with an undefined `self.p`, rescal.py:32-36 — SURVEY §5); we
  * implement the *intended* bilinear form `h^T W_r t`. */
case object Rescal extends KGEModel {
  def estimateTail(h: Column, r: Column): Column = {
    val d = size(h)
    // out[j] = Σ_i h[i] * W[i*d + j]
    transform(sequence(lit(0), d - 1), j =>
      aggregate(sequence(lit(0), d - 1), lit(0.0),
        (acc, i) => acc + element_at(h, i + 1) * element_at(r, i * d + j + 1)))
  }
  def score(h: Column, r: Column, t: Column): Column =
    dot(estimateTail(h, r), t)
  override def pairScore(est: Column, t: Column): Column = dot(est, t)
}

/** F11: SWTransE — entity embedding is d×m particles flattened row-major
  * (swtranse.py:29-32); score translates head particles by the relation,
  * sorts both particle sets per dimension, and sums the per-dimension Lp
  * distances (swtranse.py:40-68). */
final case class SWTransE(particles: Int, p: Double = 2.0) extends KGEModel {
  private val m = particles
  private def dimSlice(v: Column, i: Column): Column =
    slice(v, i * m + 1, lit(m))
  def score(h: Column, r: Column, t: Column): Column = {
    val d = size(r)
    -aggregate(sequence(lit(0), d - 1), lit(0.0), (acc, i) => {
      val est = array_sort(transform(dimSlice(h, i), x => x + element_at(r, i + 1)))
      val tl = array_sort(dimSlice(t, i))
      val diffP = aggregate(zip_with(est, tl, (a, b) => pow(abs(a - b), p)),
                            lit(0.0), (a2, x) => a2 + x)
      acc + pow(diffP, 1.0 / p)
    })
  }
  def estimateTail(h: Column, r: Column): Column =
    // h + r broadcast across particles (swtranse.py:92-93)
    zip_with(h, sequence(lit(0), size(h) - 1),
             (x, i) => x + element_at(r, (i / m) + 1))
}

/** F1 via the native fused Catalyst kernel (graft.functions.TranseScore):
  * identical math to TransE(2) — `-‖h+r−t‖₂` — but one codegen'd pass with
  * no intermediate arrays. Requires ArrayKernels.register(spark) (or the
  * GraftExtensions session extension). */
case object NativeTransE extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.transeScore(h, r, t)
  def estimateTail(h: Column, r: Column): Column = addVec(h, r)
  override def pairScore(est: Column, t: Column): Column = -lpDist(est, t, 2.0)
}

/** F4/F5 via the fused kernel (graft.functions.ComplexScore): identical
  * math AND identical fold order to [[ComplEx]] — re terms then im terms,
  * sequentially — so scores are bit-identical; one codegen'd pass with no
  * intermediate arrays (the HOF form allocates six per scored pair).
  * Requires ArrayKernels.register(spark) or GraftExtensions. */
case object NativeComplEx extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.complexScore(h, r, t)
  def estimateTail(h: Column, r: Column): Column = ComplEx.estimateTail(h, r)
  override def pairScore(est: Column, t: Column): Column =
    graft.functions.ArrayKernels.arrayDot(est, t)
}

/** F7/F8 via the fused kernel (graft.functions.RotateScore): same math
  * and fold order as [[RotatE]] (positive-L2 reference quirk kept),
  * bit-identical scores, zero per-pair allocation. */
case object NativeRotatE extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.rotateScore(h, r, t)
  def estimateTail(h: Column, r: Column): Column = RotatE.estimateTail(h, r)
  override def pairScore(est: Column, t: Column): Column = lpDist(est, t, 2.0)
}

/** F3 via the fused kernel (graft.functions.DistmultScore): same single
  * sequential fold as [[DistMult]], bit-identical scores. */
case object NativeDistMult extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.distmultScore(h, r, t)
  def estimateTail(h: Column, r: Column): Column = mulVec(h, r)
  override def pairScore(est: Column, t: Column): Column = -dot(est, t)
}

/** F10 via the fused kernel (graft.functions.RescalScore): the bilinear
  * `h^T W_r t` with the same inner-i / outer-j fold nesting as
  * [[Rescal]]'s `dot(transform(aggregate))` form — bit-identical scores,
  * one codegen'd d² loop instead of d² interpreted `element_at` calls
  * per scored pair. */
case object NativeRescal extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.rescalScore(h, r, t)
  def estimateTail(h: Column, r: Column): Column = Rescal.estimateTail(h, r)
  override def pairScore(est: Column, t: Column): Column = dot(est, t)
}

/** F11 via the fused kernel (graft.functions.SwtranseScore): per-dim
  * particle translate + sort + Lp fold in the exact HOF evaluation
  * sequence — bit-identical scores, no per-pair array churn. */
final case class NativeSWTransE(particles: Int, p: Double = 2.0)
    extends KGEModel {
  def score(h: Column, r: Column, t: Column): Column =
    graft.functions.ArrayKernels.swtranseScore(h, r, t, particles, p)
  def estimateTail(h: Column, r: Column): Column =
    SWTransE(particles, p).estimateTail(h, r)
}

/** F12: ConvE — 2-D convolutional scorer (conve.py:8-95), INFERENCE-ONLY
  * with fixed seeded parameters.
  *
  * The reference's own ranking path cannot run (embedding_score calls a
  * nonexistent `estimte_tail_emb`, conve.py:143 — SURVEY §5); this
  * implements the evident intent: est = ConvEScorer(h, r) (conve.py:74-96),
  * score = Σ est·t (conve.py:140-144). Since no trained checkpoint can
  * exist for a scorer that cannot train, the filters/projection are a FIXED
  * deterministic sin-seeded parameterization ([[ConvE.weights]]) — the same
  * convention as the deterministic embeddings — and the affine-free
  * BatchNorms run with unit statistics (identity), dropout off. The per-row
  * forward pass is the fused codegen kernel
  * [[graft.functions.ConvEEst]].
  *
  * `dim` must satisfy (dim − 1) = aspectRatio · hgt² for integer hgt
  * (conve.py:27-41's aspect-ratio check); the default 9 → 2×4 planes. */
final case class ConvE(dim: Int = 9, aspectRatio: Int = 2,
                       outChannels: Int = 32) extends KGEModel {
  private val d1 = dim - 1
  val hgt: Int = math.round(math.sqrt(d1.toDouble / aspectRatio)).toInt
  val wid: Int = hgt * aspectRatio
  require(hgt * wid == d1 && wid >= 3 && 2 * hgt >= 3,
    s"dim=$dim incompatible with aspect ratio $aspectRatio (need (dim-1)=ar·h², planes ≥ 3 wide)")
  private val wLit = typedLit(ConvE.weights(hgt, wid, outChannels).toSeq)
  def estimateTail(h: Column, r: Column): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn.of(graft.functions.ConvEEst(
      GraftColumn.expr(h), GraftColumn.expr(r), GraftColumn.expr(wLit),
      hgt, wid, outChannels))
  }
  def score(h: Column, r: Column, t: Column): Column =
    pairScore(estimateTail(h, r), t)
  /** Fused dot (same sequential fold as the HOF form — bit-identical;
    * FunctionsSpec asserts the equivalence class). Requires
    * ArrayKernels.register(spark) or GraftExtensions. */
  override def pairScore(est: Column, t: Column): Column =
    graft.functions.ArrayKernels.arrayDot(est, t)
  /** The forward pass (conv + ReLU + d²-sized projection) is ~10³ flops
    * and depends only on (h, r): materialize per frontier row, not per
    * scored pair — score = dot(est, t) is the same fold either way. */
  override def scoreOnFrontier: Boolean = true
}

object ConvE {
  // Seeded-parameter formulas; the DuckDB oracle replays these verbatim
  // with SQL SIN over the same segment-local indices.
  val ConvWSeed = 2.4; val ConvWScale = 0.1
  val ConvBSeed = 2.5; val ConvBScale = 0.1
  val ProjWSeed = 2.6; val ProjWScale = 0.05
  val ProjBSeed = 2.7; val ProjBScale = 0.05
  private def seeded(n: Int, seed: Double, scale: Double): Array[Double] =
    Array.tabulate(n)(j => math.sin((j + 1) * 0.013 + seed) * scale)

  /** Flattened parameters in [[graft.functions.ConvEEst]] layout. */
  def weights(hgt: Int, wid: Int, oc: Int): Array[Double] = {
    val flatN = oc * (2 * hgt - 2) * (wid - 2)
    val d1 = hgt * wid
    seeded(oc * 9, ConvWSeed, ConvWScale) ++
      seeded(oc, ConvBSeed, ConvBScale) ++
      seeded(d1 * flatN, ProjWSeed, ProjWScale) ++
      seeded(d1, ProjBSeed, ProjBScale)
  }
}

object KGE {
  /** F13: negation flip `where(neg==1, -score, score)`
    * (abstract_kge.py:160-163). */
  def negFlip(score: Column, neg: Column): Column =
    when(neg, -score).otherwise(score)

  /** F14: inverse-relation id `r XOR 1` — inverse pairs 2i/2i+1
    * (transe.py:48-56, dataloader.py:16-29). */
  def inverseRel(rel: Column): Column = rel.bitwiseXOR(lit(1L))

  def byName(name: String): KGEModel = name.toLowerCase match {
    case "transe"        => TransE()
    case "distmult"      => DistMult
    case "complex"       => ComplEx
    case "rotate"        => RotatE
    case "rescal"        => Rescal
    case "swtranse"      => SWTransE(particles = 4)
    case "native_transe"   => NativeTransE
    case "native_complex"  => NativeComplEx
    case "native_rotate"   => NativeRotatE
    case "native_distmult" => NativeDistMult
    case "native_rescal"   => NativeRescal
    case "native_swtranse" => NativeSWTransE(particles = 4)
    case "conve"         => ConvE() // inference-only, fixed seeded parameters
    case other => throw new IllegalArgumentException(s"unknown KGE model: $other")
  }
}

/** F16: t-norms (language/tnorm.py:5-37). Product and Gödel families;
  * t-conorm via De Morgan. */
sealed trait TNorm {
  def conj(a: Column, b: Column): Column
  def neg(a: Column): Column = lit(1.0) - a
  def disj(a: Column, b: Column): Column = neg(conj(neg(a), neg(b)))
}
case object ProductTNorm extends TNorm {
  def conj(a: Column, b: Column): Column = a * b
}
case object GodelTNorm extends TNorm {
  def conj(a: Column, b: Column): Column = least(a, b)
  override def disj(a: Column, b: Column): Column = greatest(a, b)
}
