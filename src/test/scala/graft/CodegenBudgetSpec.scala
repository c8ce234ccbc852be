package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.apache.spark.sql.functions._

/** Codegen-budget pins for the production operating points.
  *
  * Round 8 found the same scaling defect twice: a per-row expression whose
  * SIZE grows with an operating-point parameter (k centroids, L×p planes),
  * composed from literal stacks, silently blows the codegen method limits
  * and drops the projection to interpreted evaluation — the "zero-shuffle
  * map-side pass" became 10-20× slower than its own join alternative
  * (SCALE.md round 8: k=141 argmax 16.5 s → 1.4 s; 8×7-band SRP hash
  * 9.5-10 s → 1.5-1.7 s). The cure both times was a native expression
  * carrying the parameter matrix as a codegen reference object.
  *
  * These tests pin the cure at the production sizes: the whole-stage
  * generated code must (a) exist, (b) contain the native loop call — not
  * a fallback projection around it — and (c) compile with every method
  * under the 8000-byte HotSpot JIT threshold (Spark's own
  * `spark.sql.codegen.hugeMethodLimit` default guards 65535; JIT refuses
  * to compile methods past ~8000, which is where "compiled" quietly
  * stops meaning "fast"). A regression back to composed literal stacks
  * fails (b) or (c) immediately, at spec time, not at the next sf1 bench.
  */
class CodegenBudgetSpec extends SparkSpec {

  private val jitMethodLimit = 8000

  /** All whole-stage subtrees of the df's executed plan, compiled, with
    * every max-method-size asserted under the JIT threshold. Returns the
    * concatenated generated source for content assertions.
    */
  private def compiledCode(df: DataFrame, what: String): String = {
    // codegenStringSeq does not recurse into an AdaptiveSparkPlanExec
    // wrapper (shuffle-bearing plans): callers run one action first so
    // the adaptive plan is FINAL, then the compiled stages are collected
    // from the unwrapped physical plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val subtrees = codegenStringSeq(plan)
    assert(subtrees.nonEmpty, s"$what: no whole-stage codegen subtree")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats.maxMethodCodeSize < jitMethodLimit,
        s"$what: generated method of ${stats.maxMethodCodeSize} bytes " +
          s"(>= $jitMethodLimit JIT limit) in subtree:\n$subtree")
    }
    subtrees.map(_._2).mkString("\n")
  }

  test("banded SRP hash at the 8-band production point is one JIT-sized " +
    "generated loop per band, inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val law = 7 // the sf1 law planes; 8 bands is the production point
    val hashed = emb.select(col("vec_id"),
      explode(array((0 until 8).map(b => struct(lit(b).as("_band"),
        Similarity.srpBucketBand(col("embedding"), b, law).as("_bkt"))): _*))
        .as("_e"))
    val code = compiledCode(hashed, "banded srp hash")
    assert(code.contains("VecSrpBucket.bucket"),
      "banded hash projection is not on the native srp_bucket loop")
  }

  test("centroid argmax at k=141 (the sf1 sqrt-n production cell count) is " +
    "one JIT-sized generated loop, inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = 64
    val cents = Seq.tabulate(141) { cid =>
      (cid.toLong, Seq.tabulate(dim)(i => math.sin(cid * dim + i)))
    }
    val assigned = Similarity.withCell(emb, "vec_id", "embedding", cents)
    val code = compiledCode(assigned, "k=141 argmax")
    assert(code.contains("VecArgmaxCell.argmax"),
      "assignment projection is not on the native vec_argmax_cell loop")
  }

  test("the guard bites: the composed literal-branch argmax at k=141 " +
    "violates the codegen budget (the regression this spec exists to catch)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = 64
    val cents = Seq.tabulate(141) { cid =>
      (cid.toLong, Seq.tabulate(dim)(i => math.sin(cid * dim + i)))
    }
    // the RAW unwrapped literal stack — the exact shape whose silent
    // codegen failure round 8 caught. cellsByLiteral itself now wraps
    // this in a null-element CASE WHEN (the round-9 three-way-contract
    // fix), and the wrapper changes the codegen fate: Spark splits the
    // CASE branches into JIT-sized methods, so the WRAPPED stack
    // compiles — and runs ~8× slower than the native loop (measured at
    // sf1/k=141: 4.3-7.7 s vs 0.5-1.5 s native; the unwrapped stack's
    // interpreted fallback was 15-16 s). The budget guard pins the
    // unwrapped shape; the wrapped path's cost is the native
    // expression's continued reason to exist.
    import org.apache.spark.sql.functions._
    val composed = emb.select(col("vec_id"),
      array_max(array(cents.map { case (cid, cv) =>
        val cvLit = array(cv.map(lit): _*)
        struct(round(Similarity.cosine(col("embedding"), cvLit), 9).as("s"),
          lit(-cid).as("nid"))
      }: _*)).getField("nid") * -1)
    val violates =
      try {
        val subtrees =
          codegenStringSeq(composed.queryExecution.executedPlan)
        subtrees.isEmpty ||
          subtrees.exists { t =>
            val size = t._3.maxMethodCodeSize
            // negative = ByteCodeStats.UNAVAILABLE: codegenStringSeq
            // swallowed a Janino refusal (the generated method blew the
            // 64KB bytecode hard limit outright) — the strongest form of
            // the violation, and the mode this k×dim point actually hits
            // since the zero-norm NaN guard widened each cosine branch
            size >= jitMethodLimit || size < 0
          }
      } catch {
        case _: Exception => true // Janino refuses outright: also a violation
      }
    assert(violates,
      "composed k=141 argmax now fits the codegen budget — if Spark " +
        "learned to split it, this guard and SCALE.md's rule need review")
  }

  test("the residual IVFADC encode at k=141 cells / (m=8, ks=16) codes " +
    "stays inside whole-stage codegen on the native sub + argmin loops") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = 64
    val cents = Seq.tabulate(141) { cid =>
      (cid.toLong, Seq.tabulate(dim)(i => math.sin(cid * dim + i)))
    }
    val model = Similarity.PqModel(dim, Seq.tabulate(8)(s =>
      IndexedSeq.tabulate(16)(c =>
        Seq.tabulate(8)(i => math.cos(s * 128 + c * 8 + i)))))
    val enc = Similarity.pqEncode(
      Similarity.ivfPqResiduals(emb, "vec_id", "embedding", cents),
      "vec_id", "_rv", model, keep = Seq("_cell"))
    val code = compiledCode(enc, "residual encode")
    assert(code.contains("VecSubAt.subAt"),
      "residual projection is not on the native vec_sub_at loop")
    assert(code.contains("VecArgminL2.argmin"),
      "encode projection is not on the native vec_argmin_l2 loop")
  }

  test("the winnow fingerprint pass at the production (k=32, w=8) point " +
    "stays inside whole-stage codegen on the native one-pass deque loop") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fps = graft.ops.Text.winnowFingerprints(docs, "doc_id", "text")
    // spread()'s redistribution puts an Exchange under the projection, so
    // the plan is adaptive — finalize THIS dataset's own QueryExecution
    // with an action (a write would execute a separate QueryExecution and
    // leave this one's adaptive plan un-finalized) or there are no
    // whole-stage subtrees to compile yet
    fps.collect()
    val code = compiledCode(fps, "winnow fingerprints")
    assert(code.contains("WinnowFp") && code.contains(".fingerprints("),
      "winnow projection is not on the native winnow_fp one-pass loop")
    // the retired composed formulation's signature pieces must be gone
    assert(!code.contains("ZipWith") && !code.contains("ArrayTransform"),
      "a higher-order fallback crept back into the winnow pass")
  }

  test("the classifier-score gate stays inside whole-stage codegen on the " +
    "native hashed-vocab loop (no aggregate-HOF fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val weights = Seq.tabulate(64)(i => s"w$i" -> (i - 32) / 8.0).toMap
    val scored = docs.select(col("doc_id"),
      graft.ops.Text.classifierScore(col("text"), weights, bias = -0.25)
        .as("score"))
    val code = compiledCode(scored, "classifier score")
    assert(code.contains("ClassifierScore") && code.contains(".score("),
      "classifier projection is not on the native classifier_score loop")
    // the retired composed formulation's CodegenFallback fold must be gone
    assert(!code.contains("ArrayAggregate"),
      "the CodegenFallback aggregate-HOF fold crept back into the " +
        "classifier gate")
  }

  test("the 3-token shingle pass stays inside whole-stage codegen on the " +
    "native token_shingles window join (no zip_with fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = docs.select(col("doc_id"),
      explode(graft.ops.Text.shingles(col("text"), 3)).as("s"))
    val code = compiledCode(sh, "token shingles")
    assert(code.contains("TokenShingles") && code.contains(".shingle("),
      "shingle projection is not on the native token_shingles loop")
    assert(!code.contains("ZipWith"),
      "the CodegenFallback zip_with fold crept back into the shingle pass")
  }
}
