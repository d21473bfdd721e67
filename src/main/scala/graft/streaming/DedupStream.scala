package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{DedupOps, Texty}

/** Streaming twin of the exact content-hash dedup
  * ([[graft.operators.DedupOps.exact]], reference analogue U4,
  * ccmm/mgd/human_homologs.py:39-42): documents arrive as a stream and
  * the operator maintains, per fingerprint, the canonical assignment
  * `canonical_id = min(doc_id)` as a CHANGELOG.
  *
  * The out-of-order hazard is a LATE SMALLER ID: once doc 5 is the
  * canonical of its fingerprint group, a late-arriving doc 2 with the
  * same fingerprint takes over canonicality — every existing member's
  * assignment row must be retracted (delta -1) and re-emitted pointing
  * at the new canonical. A rollup that sums deltas therefore converges
  * to exactly the batch operator's output on any arrival order.
  *
  * State is keyed by fingerprint and holds the group's member ids — the
  * same O(group size) class as the funnel/as-of states (per-key lists),
  * and inherent to the semantics: re-pointing a group on canonical
  * change requires knowing its members. At 100 TB the key space shards
  * across executors by fingerprint hash; no key's state exceeds its
  * duplicate-group size, and NoTimeout is deliberate — dedup state must
  * outlive any watermark (the batch twin scans all history too).
  * At-least-once sources are absorbed: a redelivered (fp, doc_id) is
  * already in the member list and emits nothing.
  */
object DedupStream {

  final case class FpDoc(fp: String, doc_id: Long)
  final case class AssignDelta(doc_id: Long, fp_md5: String,
                               canonical_id: Long, is_canonical: Long, delta: Long)
  /** Member ids of one fingerprint group, ascending; head = canonical. */
  final case class FpGroup(members: List[Long])

  /** The batch operator's fingerprint expression, verbatim: md5 of the
    * whitespace-normalized text (DedupOps.exact's `norm`). */
  def withFingerprint(docs: DataFrame): Dataset[FpDoc] = {
    import docs.sparkSession.implicits._
    docs.select(md5(concat_ws(" ", Texty.tokens(col("text")))).as("fp"),
      col("doc_id")).as[FpDoc]
  }

  /** Bounded documents file-stream carrying the fingerprint column. */
  def readDocuments(spark: SparkSession, dir: String): Dataset[FpDoc] = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    withFingerprint(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir))
  }

  /** Per-fingerprint canonical-assignment changelog. */
  def exactDeltas(docs: Dataset[FpDoc]): Dataset[AssignDelta] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpGroup, AssignDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: String, it: Iterator[FpDoc], state: GroupState[FpGroup]) =>
          val old = state.getOption.map(_.members).getOrElse(Nil)
          val fresh = it.map(_.doc_id).toSet -- old
          if (fresh.isEmpty) Iterator.empty
          else {
            val merged = (old ++ fresh).sorted
            state.update(FpGroup(merged))
            val newCanonical = merged.head
            def rows(ids: Seq[Long], canonical: Long, delta: Long) =
              ids.map(id => AssignDelta(id, fp, canonical,
                if (id == canonical) 1L else 0L, delta))
            old.headOption match {
              case Some(oldCanonical) if oldCanonical != newCanonical =>
                // late smaller id took over: retract the whole group's
                // assignments, re-emit them under the new canonical
                (rows(old, oldCanonical, -1L) ++
                  rows(merged, newCanonical, 1L)).iterator
              case _ =>
                rows(fresh.toSeq.sorted, newCanonical, 1L).iterator
            }
          }
      }
  }

  /** Net assignments from the changelog — equals the batch operator's
    * frame (DedupOps.exact) once the stream is drained. */
  def exactRollup(deltas: DataFrame): DataFrame =
    deltas.groupBy("doc_id", "fp_md5", "canonical_id", "is_canonical")
      .agg(sum(col("delta")).as("net"))
      .filter(col("net") > 0)
      .select(col("doc_id"), col("fp_md5"), col("canonical_id"), col("is_canonical"))
      .orderBy("doc_id")

  // ───────────────────────── MinHash-LSH twin ─────────────────────────
  //
  // Streaming face of DedupOps.minhashLsh: candidate GENERATION is the
  // streaming half (per-doc signatures are a stateless projection —
  // DedupOps.bandsExpr — and band buckets are keyed state emitting each
  // new member's pairs), while exact-Jaccard VERIFICATION stays a lookup
  // join against the corpus shingle store (DedupOps.verifiedJaccard, the
  // code path the batch operator itself runs, so the two cannot drift).
  // The pair set only grows — no retractions — so the changelog is
  // monotone and the rollup is a distinct. State per bucket is the
  // member id list: the same occupancy class as the batch band join's
  // per-key build side, sharded across executors by band hash.

  final case class BandDoc(band: String, doc_id: Long)
  final case class PairDelta(doc_a: Long, doc_b: Long)
  /** Member ids of one band bucket (insertion order; order-free use). */
  final case class Bucket(members: List[Long])

  /** Stateless per-row banding; drops documents too short to shingle
    * (the batch operator never sees them either — they produce no
    * shingle rows). */
  def bandedDocs(docs: DataFrame): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    docs.select(DedupOps.bandsExpr(col("text")).as("bands"), col("doc_id"))
      .filter(col("bands").isNotNull)
      .select(explode(col("bands")).as("band"), col("doc_id"))
      .as[BandDoc]
  }

  /** Bounded documents file-stream, banded. */
  def readBandedDocuments(spark: SparkSession, dir: String): Dataset[BandDoc] = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    bandedDocs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir))
  }

  /** Per-bucket candidate-pair changelog: each document new to a bucket
    * emits its pairs against the existing members (and among the batch's
    * own new members). Redelivered ids are already members and emit
    * nothing. A pair colliding in several bands is emitted once per
    * band — the rollup's distinct absorbs it, exactly like the batch
    * operator's distinct over its band join. */
  def lshCandidateDeltas(bands: Dataset[BandDoc]): Dataset[PairDelta] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(_.band)
      .flatMapGroupsWithState[Bucket, PairDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (band: String, it: Iterator[BandDoc], state: GroupState[Bucket]) =>
          val old = state.getOption.map(_.members).getOrElse(Nil)
          val fresh = (it.map(_.doc_id).toSet -- old).toList.sorted
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(Bucket(old ++ fresh))
            val vsOld = for { f <- fresh; o <- old }
              yield PairDelta(math.min(f, o), math.max(f, o))
            val among = for { i <- fresh; j <- fresh if i < j }
              yield PairDelta(i, j)
            (vsOld ++ among).iterator
          }
      }
  }

  /** Distinct candidates from the changelog, exact-verified against the
    * corpus shingle store — equals DedupOps.minhashLsh once drained. */
  def lshRollup(spark: SparkSession, dir: String, deltas: DataFrame): DataFrame = {
    val sh = graft.Caches.cached(DedupOps.shingleTable(spark, dir))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    DedupOps.verifiedJaccard(
      deltas.select("doc_a", "doc_b").distinct(), sh, counts)
  }
}
