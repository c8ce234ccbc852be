package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Micro A/B harness for operator-variant decisions (the SCALE.md
  * "measured, not assumed" methodology): times named variants of the same
  * logical result on a given sf dir, N runs each after a warmup, on one
  * warm session. Usage:
  *   sbt "runMain graft.ABBench <sfDir> <case> [runs]"
  * Cases: closure | breadcrumb | minhash | kmeans (kmeans is not an
  * A/B — it prints `Similarity.kmeansFitTrace`'s per-iteration seconds
  * and centroid shift to convergence, the SCALE.md slope evidence for
  * the iterated trainer; [runs] is the iteration cap, default 12) |
  * shardorder (a shard-count sweep of Text.shardOrder — validates the
  * documented numShards sizing rule with a measured per-shard sort
  * cost: wall time should stay flat as shards grow because the window
  * is shard-PARTITIONED, never a global sort).
  */
object ABBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "breadcrumb"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (which == "kmeans") {
      import org.apache.spark.sql.functions.col
      val emb = Tables(spark, sfDir, "embeddings")
      emb.cache()
      val n = emb.count()
      val iters = if (args.length > 2) args(2).toInt else 12
      // k defaults to the round-7 slope's k=8; pass "sqrt" for the
      // production sqrt-n cell count (the IVF/semDeDup discipline, only
      // trainable since the native vec_argmax_cell assignment)
      val k = if (args.length > 3) {
        if (args(3) == "sqrt") math.sqrt(n.toDouble).round.toInt
        else args(3).toInt
      } else 8
      // warmup: one full round compiles the assignment/mean plans so the
      // first timed iteration isn't charged for codegen + JIT
      ops.Similarity.kmeansFit(emb.limit(256), "vec_id", "embedding", 4, 1)
      val (_, trace) = ops.Similarity.kmeansFitTrace(
        emb, "vec_id", "embedding", k = k, iters = iters, tol = 1e-6)
      trace.foreach(t => println(
        f"KMEANS n=$n k=$k iter=${t.iter} time=${t.seconds}%.2f s " +
          f"max_shift=${t.maxShift}%.2e"))
      println(f"KMEANS n=$n k=$k converged_iters=${trace.length} " +
        f"total=${trace.map(_.seconds).sum}%.2f s (tol=1e-6, cap=$iters)")
      spark.stop()
      return
    }

    if (which == "shardorder") {
      val docs = Tables(spark, sfDir, "documents")
        .select("doc_id", "source", "text")
      docs.cache()
      val n = docs.count()
      def force(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      force(ops.Text.shardOrder(docs.limit(256), "doc_id", 8)) // warmup
      for (shards <- Seq(8, 256, 2048, 8192)) {
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          force(ops.Text.shardOrder(docs, "doc_id", shards))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"SHARDORDER n=$n shards=$shards min=${times.min}%.2f s " +
          s"runs=${times.map(x => f"$x%.2f").mkString(",")}")
      }
      spark.stop()
      return
    }

    val tasks = reports.TaskTree.tasks(spark, sfDir)
    tasks.cache().count()

    val variants: Seq[(String, () => DataFrame)] = which match {
      case "closure" => Seq(
        "iterative" -> (() =>
          ops.Closure.transitiveClosure(tasks, "task_id", "parent_id")),
        "recursive" -> (() =>
          ops.Closure.transitiveClosureRecursive(tasks, "task_id", "parent_id")),
        "doubling" -> (() =>
          ops.Closure.transitiveClosureDoubling(tasks, "task_id", "parent_id")))
      case "minhash" =>
        import org.apache.spark.sql.functions.col
        val shingled = ops.Text.spread(Tables(spark, sfDir, "documents"))
          .select(col("doc_id"),
            ops.Text.shingles(col("text"), 3).as("_sh"))
        shingled.cache().count()
        Seq(
          "builtin" -> (() => shingled.select(
            ops.Dedup.minhashSignatureBuiltin(col("_sh"), 8).as("_sig"))),
          "native" -> (() => shingled.select(
            ops.Dedup.minhashSignature(col("_sh"), 8).as("_sig"))))
      case "srp" =>
        // SRP hashing cost in isolation: the single law table vs the
        // banded production point's L×p plane-dot hash pass
        import org.apache.spark.sql.functions.{col, explode, array, struct, lit}
        val emb = Tables(spark, sfDir, "embeddings")
        val n = emb.cache().count()
        val law = ops.Similarity.numPlanesFor(n)
        Seq(
          s"single_p$law" -> (() => emb.select(col("vec_id"),
            ops.Similarity.srpBucket(col("embedding"), law).as("_bkt"))),
          s"banded_p${law}x8" -> (() => emb.select(col("vec_id"),
            explode(array((0 until 8).map(b => struct(lit(b).as("_band"),
              ops.Similarity.srpBucketBand(col("embedding"), b, law).as("_bkt"))): _*))
              .as("_e"))))
      case "assign" =>
        // isolate the two withCell strategies at a large k (the join
        // path's regime) — semDeDup/kmeans cost attribution
        val emb = Tables(spark, sfDir, "embeddings")
        val n = emb.cache().count()
        val sqrtN = math.max(4, math.sqrt(n.toDouble).toInt)
        val cents = ops.Similarity.seedCentroidsFor(emb, "vec_id", "embedding", sqrtN)
        Seq(
          s"literal_k$sqrtN" -> (() =>
            ops.Similarity.cellsByLiteral(emb, "vec_id", "embedding", cents)),
          s"join_k$sqrtN" -> (() =>
            ops.Similarity.cellsByJoin(emb, "vec_id", "embedding", cents)),
          s"native_k$sqrtN" -> (() =>
            ops.Similarity.withCell(emb, "vec_id", "embedding", cents)))
      case "bpe" =>
        // BPE at the production operating point: the golden fixture is
        // 13 merges, a deployed merges.txt is ~50k. Three things scale
        // with vocabulary: the plan-side merges literal (the A/B's
        // third leg times the rejected CreateArray-of-50k-lits shape
        // against the single-Literal shape bpeTokens ships), the
        // per-JVM Table.ranks hash build, and the per-row merge loop
        // (more ranks -> deeper merge chains per pre-token).
        import org.apache.spark.sql.functions.{array, col, lit, size => fsize, call_function}
        val docs = Tables(spark, sfDir, "documents")
        docs.cache().count()
        val G = "Ġ"
        val fixture = Seq("h e", "l l", "he ll", "hell o",
          s"$G w", s"${G}w o", s"${G}wo r", s"${G}wor ld",
          "l d", s"${G}wor l", "1 2", "12 3")
        // deterministic production-sized vocabulary: wave-generated
        // pairs over the lowercase (and space-marked) alphabet — early
        // waves are 2-3 char fusions that actually fire on English-ish
        // text, later waves pad rank depth the way a real table's long
        // tail does
        val letters = ('a' to 'z').map(_.toString)
        val big = scala.collection.mutable.ArrayBuffer.empty[String]
        var lefts: Seq[String] = letters ++ letters.map(G + _)
        while (big.size < 50000) {
          val wave = for (l <- lefts; r <- letters) yield s"$l $r"
          wave.take(50000 - big.size).foreach(big += _)
          lefts = (for (l <- lefts; r <- letters) yield l + r).take(120)
        }
        val bigSeq = big.toSeq
        Seq(
          "fixture13" -> (() => docs.select(
            ops.Text.bpeTokenCount(col("text"), fixture).as("n"))),
          "vocab50k_literal" -> (() => docs.select(
            ops.Text.bpeTokenCount(col("text"), bigSeq).as("n"))),
          "vocab50k_createarray" -> (() => docs.select(
            fsize(call_function("bpe_encode", col("text"),
              array(bigSeq.map(lit): _*))).as("n"))))
      case "semdedup" =>
        // the Σ|cell|² law: in-cell pair work at the graded k=4 vs the
        // production √n cells — the semDeDup analog of numPlanesFor's
        // plane-density evidence (more cells = smaller buckets = less
        // pair work, with the same keep-min-id semantics per cell count)
        val emb = Tables(spark, sfDir, "embeddings")
        val n = emb.cache().count()
        val sqrtN = math.max(4, math.sqrt(n.toDouble).toInt)
        Seq(
          "k4" -> (() =>
            ops.Similarity.semDeDup(emb, "vec_id", "embedding", 4, 0.4)),
          s"k$sqrtN" -> (() =>
            ops.Similarity.semDeDup(emb, "vec_id", "embedding", sqrtN, 0.4)))
      case _ => Seq(
        "iterative" -> (() =>
          ops.Closure.breadcrumbs(tasks, "task_id", "parent_id", "name")),
        "recursive" -> (() =>
          ops.Closure.breadcrumbsRecursive(tasks, "task_id", "parent_id", "name")),
        "doubling" -> (() =>
          ops.Closure.breadcrumbsDoubling(tasks, "task_id", "parent_id", "name")))
    }
    // noop-sink forcing, not count(): a bare count() column-prunes every
    // deterministic projection, so variants whose difference lives in a
    // projection (e.g. the minhash signature) would both time a no-op.
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    variants.foreach { case (name, f) =>
      force(f()) // warmup (codegen + JIT)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        force(f())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"AB $which/$name: ${times.map(t => f"$t%.2f").mkString("/")} s")
    }
    spark.stop()
  }
}
