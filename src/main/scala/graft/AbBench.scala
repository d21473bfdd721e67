package graft

import org.apache.spark.sql.DataFrame

import graft.query.{DatsGen, DatsQueries}

/** Same-JVM adjacent A/B instrument for the r18 attribution work. The
  * shared machine drifts ±2× across processes (ARCHITECTURE.md's
  * machine-drift evidence; the identical-work descent gate measured
  * 181–383 s in one night), so pricing a change as two separate
  * process runs is meaningless — every comparison here runs BOTH
  * variants inside one JVM, adjacently, in BOTH orders, and the
  * analysis quotes the order-cancelled geomean. Three A/Bs:
  *
  *  1. `q4_face` / `q4_noface` — Q4 over the SAME bucketed layout with
  *     the derivesFrom edge face used vs ignored (the r17 plan), both
  *     from one loadBucketed graph, so only the extract-side scan
  *     distribution differs. Plus `materialize_face` /
  *     `materialize_noface` write rows pricing the face's one-off
  *     write cost.
  *  2. `q7_direct_union` / `q7_direct_persource` — the view-path pivot
  *     shapes (r17 regressed direct 4.0 → 6.4 s at sf0.1 by paying the
  *     per-source split without bucketed scans under it; r18 keys the
  *     shape off the layout). Per-source on a view graph is forced by
  *     marking the graph bucketed — tabularDump only inspects presence.
  *  3. `winnow_precat` / `winnow_postcat` — text_winnow_fingerprint
  *     before vs after a saveAsTable catalog exists in the session
  *     (the r17 suite's one session-state change), to attribute its
  *     0.77 → 1.66 s sf0.1 drift to machine vs state.
  *
  * `--explain` prints the two Q4 physical plans (auto-broadcast off)
  * instead of timing. `--mat-only` runs ONLY the materialize face/noface
  * pairings (r18 verdict #3: the r18 face-write A/B landed on a
  * contended box — calib 0.22–0.37 s — so the face's write cost needs a
  * calm-machine reprice without paying the full A/B suite per attempt).
  * `--q4parts` A/Bs q4-direct under 32 vs 256 shuffle partitions in one
  * JVM (r19: the sf100 point hit the single-box spill wall — q4's
  * sf10→sf100 step was 15.7× at 32 partitions. The cluster guidance in
  * [[Tables.session]] says "raise partitions at scale" because per-task
  * working sets shrink with the partition count and spill falls with
  * them; this mode converts that claim into an order-cancelled
  * measurement at the exact scale point that exposed the wall).
  *
  * `--q4collapse` prices the (rejected) r19 Q4 pre-collapse candidate:
  * an answer-checked A/B of collapsing extracts to sample grain before
  * the join vs the shipped plan — kept runnable so the rejection stays
  * reproducible.
  *
  * Usage: runMain graft.AbBench [sfDir] [outJsonl] [reps]
  *        [--explain] [--mat-only] [--q4parts] [--q4collapse]
  * The four mode flags are mutually exclusive (at most one per run).
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    // a typo'd mode flag must fail loudly, not silently run the full
    // (possibly hours-long) A/B suite instead of the mode asked for
    val known = Set("--explain", "--mat-only", "--q4parts", "--q4collapse")
    require(flags.subsetOf(known), s"unknown flags: ${flags -- known} (known: $known)")
    // the modes are mutually exclusive in effect (each early-returns or
    // gates the suite), so two at once would silently run only the
    // first-checked one — the exact silent-ignore the require above
    // exists to prevent
    require(flags.size <= 1,
      s"mode flags are mutually exclusive, got ${flags.mkString(" ")}")
    val pos = args.filterNot(_.startsWith("--"))
    val dir = pos.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get(pos.lift(1).getOrElse("ab_bench.jsonl"))
    val reps = pos.lift(2).map(_.toInt).getOrElse(3)
    val spark = Tables.session("ab-bench",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    // shared scaffolding ([[BenchKit]]): one escape table / timing /
    // sentinel protocol across instruments, so these rows are directly
    // comparable to DatsModeBench's
    def record(name: String, secs: Double): Unit =
      BenchKit.record(out, name, secs, dir)
    def timed(f: => Unit): Double = BenchKit.timed(f)
    def sentinel(tag: String): Unit = BenchKit.sentinel(spark, out, tag, dir)
    def bench(name: String, df: () => DataFrame): Unit = {
      def once(): Double = timed(df().count())
      once() // untimed warm-up
      record(name, (1 to reps).map(_ => once()).min)
    }

    // same warm-up discipline as Bench/DatsModeBench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "orders", "lineitem")
      .foreach(n => Tables.load(spark, dir, n).count())

    // per-source pivot forced on a view graph = the r17 direct plan.
    // The marker carries the REAL chain relation (EntityStore's single
    // definition), so even though tabularDump reads only its presence,
    // the graph stays fully valid — a Q4 over it would answer
    // correctly, not silently empty as a placeholder would.
    def persourceView() = {
      val g = DatsGen.graph(spark, dir)
      g.copy(bucketedDerives = Some(
        graft.io.EntityStore.chainRelation(g.materials)))
    }

    // every layout this run creates, reclaimed in the finally below so
    // a mid-run failure (bad sfDir, OOM, a failing query) cannot leak
    // full entity-table copies under /tmp
    val createdDirs = scala.collection.mutable.Buffer.empty[String]
    def newLayoutDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_ab_").toString
      createdDirs += d
      d
    }
    def dropAll(): Unit = createdDirs.foreach(d =>
      try graft.io.EntityStore.dropBucketed(spark, d)
      catch { case _: Throwable => () })

    try {
      if (flags("--explain")) {
        val matDir = newLayoutDir()
        DatsGen.materialize(spark, dir, matDir)
        val gFace = graft.io.EntityStore.loadBucketed(spark, matDir)
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        println("===== q4_mat WITH derives face (auto-broadcast off) =====")
        DatsQueries.listSubjectSamples(gFace).explain("formatted")
        println("===== q4_mat WITHOUT face — r17 plan (auto-broadcast off) =====")
        DatsQueries.listSubjectSamples(gFace.copy(bucketedDerives = None))
          .explain("formatted")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return
      }

      sentinel("start")

      if (flags("--q4collapse")) {
        // r19 candidate pricing (NOT shipped — a shipped plan change
        // would invalidate the round's already-measured headline): Q4
        // currently joins the corpus-sized extract side first and
        // DISTINCTs after; the candidate collapses extracts to sample
        // grain BEFORE the join — groupBy(sample_fk) + collect_set(role)
        // + explode — which (a) shrinks the join's big side ~5× (one row
        // per (sample, role) instead of one per extract), (b) is
        // exchange-free on the bucketed face (the derives_from-hashed
        // scan satisfies the groupBy clustering), and (c) leaves the
        // final joins co-partitioned on sample_fk. Semantics-preserving:
        // every output column is a function of (sample_fk, role) through
        // unique sample/subject ids, and the final DISTINCT is kept, so
        // the collapse only removes multiplicity the DISTINCT removed
        // anyway — asserted below by a two-way except() before timing.
        import org.apache.spark.sql.functions.{col, collect_set, explode}
        def collapsed(g: graft.etl.GtexEtl.EntityGraph): DataFrame = {
          val extractRoles = g.bucketedDerives.getOrElse(g.materials)
            .filter(col("material_type") === "extract" &&
              col("role").isin("DNA extract", "RNA extract"))
            .select(col("role"), col("derives_from").as("sample_fk"))
            .groupBy("sample_fk").agg(collect_set(col("role")).as("rs"))
            .select(col("sample_fk"), explode(col("rs")).as("extract_role"))
          val samples = g.materials.filter(col("material_type") === "sample")
            .select(col("material_id").as("sample_id_"),
              col("name").as("sample_name"), col("derives_from").as("subject_fk"))
          val subjects = g.materials.filter(col("material_type") === "subject")
            .select(col("material_id").as("subject_id_"), col("name").as("subject_name"))
          extractRoles.join(samples, col("sample_fk") === col("sample_id_"))
            .join(subjects, col("subject_fk") === col("subject_id_"))
            .select(col("subject_name"), col("sample_name"), col("extract_role"))
            .distinct().orderBy("subject_name", "sample_name", "extract_role")
        }
        val matDir = newLayoutDir()
        DatsGen.materialize(spark, dir, matDir)
        val gMat = graft.io.EntityStore.loadBucketed(spark, matDir)
        val gView = DatsGen.graph(spark, dir)
        // correctness first: the candidate must answer EXACTLY Q4
        Seq("mat" -> gMat, "view" -> gView).foreach { case (tag, g) =>
          val (old, neu) = (graft.query.DatsQueries.listSubjectSamples(g), collapsed(g))
          require(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty,
            s"q4collapse($tag): candidate answers differ from shipped Q4")
        }
        bench("q4_mat_shipped_1", () => graft.query.DatsQueries.listSubjectSamples(gMat))
        bench("q4_mat_collapsed_1", () => collapsed(gMat))
        bench("q4_mat_collapsed_2", () => collapsed(gMat))
        bench("q4_mat_shipped_2", () => graft.query.DatsQueries.listSubjectSamples(gMat))
        bench("q4_view_shipped_1", () => graft.query.DatsQueries.listSubjectSamples(gView))
        bench("q4_view_collapsed_1", () => collapsed(gView))
        bench("q4_view_collapsed_2", () => collapsed(gView))
        bench("q4_view_shipped_2", () => graft.query.DatsQueries.listSubjectSamples(gView))
        sentinel("end")
        return
      }

      if (flags("--q4parts")) {
        // single-rep per cell: each run is minutes at the scale points
        // this mode exists for, so order cancellation (not rep-min)
        // carries the noise control; the warm-up run page-caches the
        // source parquet so no cell pays the cold read.
        // AQE partition COALESCING is pinned off for the cells: at
        // small sanity-check scale points it would merge the
        // 256-partition cells back toward 32 and the A/B would falsely
        // read "partition count doesn't matter" (at sf100 per-partition
        // shuffle sizes dwarf the 64 MB advisory target, so coalescing
        // is a no-op there either way — the pin makes every sf honest).
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        def q4At(parts: Int): Double = {
          spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
          timed(DatsGen.queryOver(4, DatsGen.graph(spark, dir)).count())
        }
        q4At(32) // untimed warm-up
        record("q4_direct_p32_1", q4At(32))
        record("q4_direct_p256_1", q4At(256))
        record("q4_direct_p256_2", q4At(256))
        record("q4_direct_p32_2", q4At(32))
        sentinel("end")
        return
      }

      // (1) the face's write cost, adjacently in both orders. The dirs
      // are kept (not dropped per-write) until after winnow_postcat so
      // the catalog-state A/B below sees the registered tables.
      def mat(face: Boolean): Double =
        timed(graft.io.EntityStore.saveBucketed(
          DatsGen.graph(spark, dir), newLayoutDir(), derivesFace = face))

      if (flags("--mat-only")) {
        record("materialize_face_1", mat(face = true))
        record("materialize_noface_1", mat(face = false))
        record("materialize_noface_2", mat(face = false))
        record("materialize_face_2", mat(face = true))
        sentinel("end")
        return
      }

      // (3a) winnow BEFORE any catalog table exists in the session
      bench("winnow_precat",
        () => SparkEntry.queries("text_winnow_fingerprint")(spark, dir))

      record("materialize_face_1", mat(face = true))
      record("materialize_noface_1", mat(face = false))
      record("materialize_noface_2", mat(face = false))
      record("materialize_face_2", mat(face = true))

      // (3b) winnow AFTER the materialize writes registered catalog tables
      bench("winnow_postcat",
        () => SparkEntry.queries("text_winnow_fingerprint")(spark, dir))

      // (1) Q4 over one shared layout, face used vs ignored, both orders
      val matDir = newLayoutDir()
      graft.io.EntityStore.saveBucketed(DatsGen.graph(spark, dir), matDir)
      val gFace = graft.io.EntityStore.loadBucketed(spark, matDir)
      val gBase = gFace.copy(bucketedDerives = None)
      bench("q4_face_1", () => DatsQueries.listSubjectSamples(gFace))
      bench("q4_noface_1", () => DatsQueries.listSubjectSamples(gBase))
      bench("q4_noface_2", () => DatsQueries.listSubjectSamples(gBase))
      bench("q4_face_2", () => DatsQueries.listSubjectSamples(gFace))

      // (2) Q7 direct pivot shapes, both orders
      bench("q7_direct_union_1", () => DatsGen.queryOver(7, DatsGen.graph(spark, dir)))
      bench("q7_direct_persource_1", () => DatsGen.queryOver(7, persourceView()))
      bench("q7_direct_persource_2", () => DatsGen.queryOver(7, persourceView()))
      bench("q7_direct_union_2", () => DatsGen.queryOver(7, DatsGen.graph(spark, dir)))

      sentinel("end")
    } finally {
      dropAll()
      spark.stop()
    }
  }
}
